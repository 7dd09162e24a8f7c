"""Per-step collective byte accounting + projected multi-chip efficiency.

VERDICT r2 #5: the virtual-CPU-mesh timings are core-limited and say nothing
about ICI efficiency. This tool makes the scaling story quantitative WITHOUT
multi-chip hardware: it compiles the real sharded train step
(parallel/sharding.py) over a virtual mesh, walks the optimized HLO for every
collective op (all-gather / all-reduce / reduce-scatter / collective-permute /
all-to-all), sums the bytes each moves per chip per step, and projects
scaling efficiency from measured single-chip compute time + an ICI bandwidth
parameter.

Collective byte model (ring algorithms, the standard on TPU torus links):
  all-gather        out_bytes * (n-1)/n      received per chip
  reduce-scatter    in_bytes  * (n-1)/n      sent per chip
  all-reduce        in_bytes  * 2(n-1)/n     (reduce-scatter + all-gather)
  collective-permute  shape bytes            (one neighbor hop)
The collective sizes come from shard_map's program and are LAYOUT-INDEPENDENT,
so the CPU-compiled HLO carries the same collectives the TPU program would.

Projected 2-host note: two v5e-4 hosts form one v5e-8 ICI slice, so the
">=85% at 2 hosts" target rides ICI, not DCN; the ICI bandwidth is a
PARAMETER (--ici-gbps, default 90 GB/s effective per chip — v5e-class 2D
torus; re-measure on real hardware).

    python scripts/collective_budget.py --devices 8 --data 2 --tile 4 \
        [--capacity 131072] [--width 640 --height 480] [--compute-ms 26.5]

Prints a per-op table + one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
from collections import defaultdict
from pathlib import Path

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}

_COLLECTIVES = (
    "all-gather",
    "all-reduce",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)


def _shape_bytes(shape_str: str) -> int:
    """'f32[131072,11]{1,0}' -> bytes (tuples/multi-shapes handled upstream)."""
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    size = DTYPE_BYTES.get(dt, 4)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * size


def _group_size(line: str, default: int) -> int:
    """Participants per replica group from HLO replica_groups syntax."""
    m = re.search(r"replica_groups=\{\{([\d,]+)\}", line)
    if m:
        return len(m.group(1).split(","))
    m = re.search(r"replica_groups=\[(\d+),(\d+)\]", line)
    if m:  # iota groups: [num_groups, group_size]
        return int(m.group(2))
    return default


def collect_collectives(hlo_text: str, default_group: int):
    """Yield (op, group_size, out_bytes, name) per collective op.

    Async pairs (`all-reduce-start` / `-done`) count once via the start op;
    the shapes of `-start` outputs include the result buffer."""
    out = []
    for line in hlo_text.splitlines():
        ls = line.strip()
        m = re.match(r"%?([\w.\-]+) = (\([^)]*\)|\S+) ([\w\-]+)\(", ls)
        if not m:
            continue
        name, shape_str, op = m.groups()
        if op.endswith("-done"):
            continue
        base = op[:-6] if op.endswith("-start") else op
        if base not in _COLLECTIVES:
            continue
        shape_str = re.sub(r"/\*[^*]*\*/", "", shape_str)
        shape_str = re.sub(r"\{[^}]*\}", "", shape_str)  # layout annotations
        if shape_str.startswith("("):
            # tuple results: XLA fuses many buffers into ONE collective (the
            # gradient psum reduces all 37 param tensors in one all-reduce
            # tuple) — the moved volume is the SUM of the tuple's arrays.
            # Tuple entries like 'f32[131072,11]' split on ','; rejoin by
            # bracket balance.
            joined, cur = [], ""
            for piece in shape_str[1:-1].split(","):
                cur = cur + ("," if cur else "") + piece
                if cur.count("[") == cur.count("]") and "[" in cur:
                    joined.append(cur.strip())
                    cur = ""
            out_bytes = sum(_shape_bytes(s) for s in joined if "[" in s)
            if op.endswith("-start"):
                # async-start tuples carry (aliased operands, results)
                out_bytes //= 2
        else:
            out_bytes = _shape_bytes(shape_str)
        g = _group_size(ls, default_group)
        out.append((base, g, out_bytes, name))
    return out


def bytes_moved(op: str, g: int, out_bytes: int) -> float:
    """Per-chip bytes over the interconnect for one execution (ring model).

    out_bytes is the op's RESULT buffer:
      all-gather     result = full array       -> (g-1)/g received per chip
      all-reduce     result = input size       -> 2 (g-1)/g (rs + ag phases)
      reduce-scatter result = input / g        -> input (g-1)/g = out (g-1)
      permute        result = shape            -> one neighbor hop
    """
    if g <= 1:
        return 0.0
    f = (g - 1) / g
    if op == "all-gather":
        return out_bytes * f
    if op == "reduce-scatter":
        return out_bytes * (g - 1)
    if op == "all-reduce":
        return out_bytes * 2 * f
    if op == "collective-permute":
        return out_bytes
    if op == "all-to-all":
        return out_bytes * f
    return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--data", type=int, default=2)
    ap.add_argument("--tile", type=int, default=4)
    ap.add_argument("--capacity", type=int, default=131072)
    ap.add_argument("--gauss", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--flow", action="store_true", default=True)
    ap.add_argument("--no-flow", dest="flow", action="store_false")
    ap.add_argument("--zero1", action="store_true",
                    help="reduce-scatter + data-sharded Adam (ZeRO-1)")
    ap.add_argument("--grad-dtype", default=None,
                    help="bfloat16 for the bf16 wire-leg gradient reduction")
    ap.add_argument(
        "--compute-ms", type=float, default=16.4,
        help="measured single-chip device step time at this operating point "
        "(BENCH r4: 16.4 ms; the collective-free compute term of the projection)",
    )
    ap.add_argument(
        "--ici-gbps", type=float, default=90.0,
        help="assumed effective per-chip ICI bandwidth (GB/s); v5e-class "
        "2D-torus default — a PARAMETER, re-measure on hardware",
    )
    ap.add_argument("--dump", default="", help="also write the HLO here")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}"
    ).strip()
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import jax

    jax.config.update("jax_platforms", "cpu")
    import dataclasses as dc

    import jax.numpy as jnp

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft", Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    )
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)

    from freegaussian_tpu.models.densify import DensifyConfig
    from freegaussian_tpu.parallel import (
        make_mesh,
        make_parallel_train_step,
        replicate_state,
        stack_cameras,
    )

    H, W = args.height, args.width
    data, tile = args.data, args.tile
    assert H % (tile * 16) == 0, "height must split into 16px-multiple bands"
    cfg, deform, state, camera, optimizers = graft._tiny_setup(
        capacity=args.capacity, n_gauss=args.gauss, width=W, height=H
    )
    if args.flow:
        cfg = dc.replace(cfg, flow_loss_weight=0.01, flow_3d_loss_weight=0.1)
    mesh = make_mesh(data=data, tile=tile)
    step_fn = make_parallel_train_step(
        cfg,
        DensifyConfig(),
        optimizers,
        deform.apply,
        num_train_data=data,
        mesh=mesh,
        image_hw=(H, W),
        with_flow=args.flow,
        zero1=args.zero1,
        grad_reduce_dtype=args.grad_dtype,
    )
    state = replicate_state(state, mesh)
    cams = stack_cameras(
        [camera.replace(time=jnp.asarray(i * 0.1)) for i in range(data)]
    )
    imgs = jnp.zeros((data, H, W, 3))
    fl_args = ()
    if args.flow:
        cams0 = stack_cameras(
            [camera.replace(time=jnp.asarray(0.0)) for _ in range(data)]
        )
        fl_args = (cams0, jnp.zeros((data, H, W, 2)), jnp.full((data, H, W, 1), 3.0))

    print(
        f"lowering sharded step: mesh=(data={data}, tile={tile}), "
        f"capacity={args.capacity}, image={W}x{H}, flow={args.flow}",
        file=sys.stderr,
    )
    lowered = jax.jit(step_fn, static_argnames=("sh_degree_now",)).lower(
        state, cams, imgs, *fl_args, sh_degree_now=3
    )
    hlo = lowered.compile().as_text()
    if args.dump:
        Path(args.dump).write_text(hlo)

    cols = collect_collectives(hlo, default_group=args.devices)
    per_op = defaultdict(lambda: [0, 0.0])
    total = 0.0
    print(f"{'op':<20}{'group':>6}{'out MB':>10}{'moved MB/chip':>16}  name")
    for op, g, ob, name in cols:
        mv = bytes_moved(op, g, ob)
        total += mv
        per_op[op][0] += 1
        per_op[op][1] += mv
        print(f"{op:<20}{g:>6}{ob / 1e6:>10.3f}{mv / 1e6:>16.3f}  {name}")
    print("-" * 70)
    for op, (cnt, mv) in sorted(per_op.items()):
        print(f"{op:<20}{cnt:>6}{'':>10}{mv / 1e6:>16.3f}  (total)")

    bw = args.ici_gbps * 1e9
    t_coll_ms = total / bw * 1e3
    tc = args.compute_ms
    eff_serial = tc / (tc + t_coll_ms)
    eff_overlap = tc / (tc + 0.2 * t_coll_ms)  # 80% hidden behind compute
    summary = {
        "metric": "collective_bytes_per_step",
        "value": total,
        "unit": "bytes/chip/step",
        "mesh": f"data{data}xtile{tile}",
        "zero1": args.zero1,
        "grad_dtype": args.grad_dtype,
        "per_op_mb": {k: round(v[1] / 1e6, 3) for k, v in per_op.items()},
        "ici_gbps_assumed": args.ici_gbps,
        "collective_ms": round(t_coll_ms, 3),
        "compute_ms": tc,
        "projected_efficiency_serial": round(eff_serial, 4),
        "projected_efficiency_80pct_overlap": round(eff_overlap, 4),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
