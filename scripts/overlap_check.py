"""Verify psum/backward overlap in the REAL v5e-compiled sharded step.

The CPU virtual-mesh HLO (scripts/collective_budget.py) lowers collectives
as synchronous `all-reduce` ops, so "XLA overlaps the gradient all-reduce
with the backward" stayed an assertion. This script AOT-compiles the full
sharded train step for an 8-chip **v5e:2x4 topology** (PJRT compile-only —
no 8-chip hardware needed) and reads the compiled module's schedule:

  - every `all-reduce-start` / `all-reduce-done` pair is located in the
    entry computation's scheduled instruction order;
  - the `estimated_cycles` of compute ops scheduled BETWEEN start and done
    (the latency-hiding scheduler's overlap window) are summed and reported
    in ms at the v5e clock.

Output: one JSON line with per-pair bytes / overlap-window cycles, plus the
totals SCALING.md cites. (VERDICT r3 item 6; BASELINE north star "psum
overlapped with the backward".)
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

V5E_HZ = 940e6  # v5e clock (TensorCore), for cycles -> ms


def build_lowered(data: int, tile: int, capacity: int, gauss: int,
                  width: int, height: int, flow: bool,
                  zero1: bool = False, grad_dtype: str | None = None,
                  force_cpu_backend: bool = False):
    import dataclasses as dc
    import importlib.util

    import jax

    if force_cpu_backend:
        # AOT topology compiles don't need devices; keep the default backend
        # on CPU so this can run while another process holds the chip.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    topo = topologies.get_topology_desc(topology_name="v5e:2x4", platform="tpu")
    ndev = data * tile
    devices = np.asarray(topo.devices[:ndev]).reshape(data, tile)
    mesh = Mesh(devices, ("data", "tile"))

    spec = importlib.util.spec_from_file_location(
        "graft", Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    )
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)

    from freegaussian_tpu.models.densify import DensifyConfig
    from freegaussian_tpu.parallel import make_parallel_train_step, stack_cameras

    cfg, deform, state, camera, optimizers = graft._tiny_setup(
        capacity=capacity, n_gauss=gauss, width=width, height=height
    )
    if flow:
        cfg = dc.replace(cfg, flow_loss_weight=0.01, flow_3d_loss_weight=0.1)
    step_fn = make_parallel_train_step(
        cfg, DensifyConfig(), optimizers, deform.apply,
        num_train_data=data, mesh=mesh, image_hw=(height, width),
        with_flow=flow, zero1=zero1, grad_reduce_dtype=grad_dtype,
    )

    def abstract(tree, pspec):
        sh = NamedSharding(mesh, pspec)
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                jnp.shape(x), jnp.result_type(x), sharding=sh
            )
            if hasattr(x, "shape") or isinstance(x, (int, float))
            else x,
            tree,
        )

    cams = stack_cameras(
        [camera.replace(time=jnp.asarray(i * 0.1)) for i in range(data)]
    )
    imgs = jnp.zeros((data, height, width, 3))
    args = [abstract(state, P()), abstract(cams, P("data")),
            abstract(imgs, P("data", "tile"))]
    if flow:
        cams0 = stack_cameras(
            [camera.replace(time=jnp.asarray(0.0)) for _ in range(data)]
        )
        args += [
            abstract(cams0, P("data")),
            abstract(jnp.zeros((data, height, width, 2)), P("data")),
            abstract(jnp.full((data, height, width, 1), 3.0), P("data")),
        ]
    print(f"AOT-lowering for v5e mesh (data={data}, tile={tile}) ...",
          file=sys.stderr)
    return jax.jit(step_fn, static_argnames=("sh_degree_now",)).lower(
        *args, sh_degree_now=3
    )


_CYCLES = re.compile(r'"estimated_cycles":"(\d+)"')
_SHAPE = re.compile(r"^\s*(?:ROOT )?%[\w.\-]+ = \(?([a-z0-9]+)\[([\d,]*)\]")

_DTBYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2, "pred": 1,
            "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8, "s16": 2, "u16": 2}


def _bytes_of(line: str) -> int:
    total = 0
    for dt, dims in re.findall(r"([a-z0-9]+)\[([\d,]*)\]", line.split("=", 1)[1][:400]):
        if dt not in _DTBYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTBYTES[dt]
        break  # first shape = result
    return total


def analyze(hlo: str):
    """Walk each computation in schedule order. For every collective -start,
    sum estimated_cycles of ops until its -done (the async overlap window).
    Collectives WITHOUT a start/done pair lower synchronously — their bytes
    are the serial window SCALING.md models (VERDICT r4 #2). Returns
    (async_pairs, sync_ops)."""
    pairs = []
    sync_ops = []
    open_windows = {}  # start op name -> [kind, bytes, cycles accumulated]
    for line in hlo.splitlines():
        m = re.match(r"^\s*(?:ROOT )?%([\w.\-]+) = ", line)
        if not m:
            continue
        name = m.group(1)
        kind = None
        sync_kind = None
        for k in ("all-reduce", "all-gather", "reduce-scatter",
                  "collective-permute"):
            if f" {k}-start(" in line:
                kind = f"{k}-start"
            elif f" {k}-done(" in line:
                kind = f"{k}-done"
            elif f" {k}(" in line:
                sync_kind = k
        if kind and kind.endswith("-start"):
            open_windows[name] = [kind[:-6], _bytes_of(line), 0.0, 0]
        elif kind and kind.endswith("-done"):
            dm = re.search(r"\(%([\w.\-]+)\)", line)
            key = dm.group(1) if dm else None
            if key in open_windows:
                k2, b, cyc, nops = open_windows.pop(key)
                pairs.append(
                    dict(op=k2, start=key, bytes=b,
                         overlap_cycles=cyc, overlap_ops=nops,
                         overlap_ms=round(cyc / V5E_HZ * 1e3, 3))
                )
        else:
            if sync_kind is not None:
                sync_ops.append(dict(op=sync_kind, name=name,
                                     bytes=_bytes_of(line)))
            cm = _CYCLES.search(line)
            if cm and open_windows:
                c = int(cm.group(1))
                for w in open_windows.values():
                    w[2] += c
                    w[3] += 1
    return pairs, sync_ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", type=int, default=2)
    ap.add_argument("--tile", type=int, default=2)
    ap.add_argument("--capacity", type=int, default=131072)
    ap.add_argument("--gauss", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--flow", action="store_true", default=True)
    ap.add_argument("--no-flow", dest="flow", action="store_false")
    ap.add_argument("--zero1", action="store_true")
    ap.add_argument("--grad-dtype", default=None,
                    help="bfloat16 for the bf16 wire-leg reduction")
    ap.add_argument("--cpu-backend", action="store_true",
                    help="keep the default jax backend on CPU (AOT compile "
                         "needs no devices; lets this run beside a chip job)")
    ap.add_argument("--dump", default="/tmp/sharded_step_v5e.hlo")
    args = ap.parse_args()

    lowered = build_lowered(args.data, args.tile, args.capacity, args.gauss,
                            args.width, args.height, args.flow,
                            zero1=args.zero1, grad_dtype=args.grad_dtype,
                            force_cpu_backend=args.cpu_backend)
    print("compiling (TPU AOT)...", file=sys.stderr)
    hlo = lowered.compile().as_text()
    if args.dump:
        Path(args.dump).write_text(hlo)
    pairs, sync_ops = analyze(hlo)
    pairs.sort(key=lambda p: -p["bytes"])
    sync_ops.sort(key=lambda p: -p["bytes"])
    async_bytes = sum(p["bytes"] for p in pairs)
    overlap_ms = sum(p["overlap_ms"] for p in pairs)
    sync_bytes = sum(p["bytes"] for p in sync_ops)
    for p in pairs[:12]:
        print(json.dumps(p))
    for p in sync_ops[:12]:
        print(json.dumps(p))
    print(json.dumps({
        "metric": "async_collective_overlap",
        "pairs": len(pairs),
        "async_bytes_total": async_bytes,
        "overlap_ms_total": round(overlap_ms, 3),
        "sync_ops": len(sync_ops),
        "sync_bytes_total": sync_bytes,
        "mesh": f"data{args.data}xtile{args.tile}",
        "zero1": args.zero1,
        "grad_dtype": args.grad_dtype,
        "note": "async = cycles of compute inside start..done windows; "
                "sync_bytes = collectives lowered WITHOUT start/done (the "
                "serial window). v5e:2x4 AOT; clock 940 MHz",
    }))


if __name__ == "__main__":
    main()
