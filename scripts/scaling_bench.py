"""Scaling-efficiency benchmark for the sharded train step (BASELINE metric:
">=85% scaling efficiency at 2 hosts").

Real multi-chip hardware is not available in this environment (one tunneled
v5e chip), so this harness measures the sharded step over the N-virtual-device
CPU mesh (`xla_force_host_platform_device_count`) — the same mechanism the
driver's multichip dryrun uses. The numbers validate that the collective
layout (psum-in-backward, primitive-shard all_gather reshard, halo exchange)
scales structurally; absolute ICI efficiency must be re-measured on a pod
slice. The host has few cores, so meshes are capped at the core count.

    python scripts/scaling_bench.py [--devices 4] [--gauss 4000] [--size 128]

KNOWN FLAKE (virtual CPU mesh only): at --gauss 4000 the (1, 4) mesh can hit
the in-process CPU communicator's 40 s collective-permute rendezvous
watchdog (all 4 virtual devices share 4 cores; one device's thunk schedule
can starve past the watchdog) and abort the process. The driver's
multichip dryrun (tiny shapes, (2, 4) mesh) and tests/test_parallel's
tile=4 loss-parity runs do not hit it. Use --gauss 1000 if it triggers.

Prints one JSON line per mesh shape and a final summary line:
    {"metric": "scaling_efficiency_data2", "value": ..., ...}
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _enable_cache():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from freegaussian_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()


def main():
    _enable_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=4)
    ap.add_argument("--gauss", type=int, default=4000)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument(
        "--reshard-ab", action="store_true",
        help="A/B the primitive-shard all_gather reshard on the (1, N) mesh: "
        "with primitive_sharding the per-Gaussian stages run on 1/N shards "
        "and all_gather into the band rasterizer; without, every chip runs "
        "the full per-Gaussian stage (no reshard collectives). The delta "
        "is the reshard's structural cost (VERDICT r2 #5).",
    )
    ap.add_argument("--zero1", action="store_true",
                    help="ZeRO-1 sharded optimizer in the sharded step")
    ap.add_argument("--grad-dtype", default=None,
                    help="bfloat16 for the bf16 wire-leg gradient reduction")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}"
    ).strip()
    import sys

    sys.path.insert(0, str(os.path.join(os.path.dirname(__file__), "..")))
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
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

    H = W = args.size
    capacity = 1 << (args.gauss - 1).bit_length()  # pow2 >= gauss

    def run_mesh(data, tile, primitive_sharding=True):
        cfg, deform, state, camera, optimizers = graft._tiny_setup(
            capacity=capacity, n_gauss=args.gauss, width=W, height=H
        )
        mesh = make_mesh(data=data, tile=tile)
        step = make_parallel_train_step(
            cfg,
            DensifyConfig(refine_start=10**9),
            optimizers,
            deform.apply,
            num_train_data=data,
            mesh=mesh,
            image_hw=(H, W),
            with_refine=False,
            primitive_sharding=primitive_sharding,
            zero1=args.zero1,
            grad_reduce_dtype=args.grad_dtype,
        )
        state = replicate_state(state, mesh)
        cams = stack_cameras(
            [camera.replace(time=jnp.asarray(i * 0.1)) for i in range(data)]
        )
        imgs = jnp.zeros((data, H, W, 3))
        state, m = step(state, cams, imgs, sh_degree_now=3)  # compile
        jax.block_until_ready(m["loss"])
        t0 = time.time()
        for _ in range(args.iters):
            state, m = step(state, cams, imgs, sh_degree_now=3)
        jax.block_until_ready(m["loss"])
        dt = (time.time() - t0) / args.iters
        pix = data * H * W / dt  # global train-step pixel throughput
        return dt, pix

    if args.reshard_ab:
        t_mesh = min(args.devices, 4)
        for ps in (True, False):
            dt, pix = run_mesh(1, t_mesh, primitive_sharding=ps)
            print(
                json.dumps(
                    {
                        "metric": f"reshard_ab_tile{t_mesh}_ps_{'on' if ps else 'off'}",
                        "value": dt * 1e3,
                        "unit": "ms",
                        "pixels_per_sec": pix,
                    }
                ),
                flush=True,
            )
        return

    n = args.devices
    shapes = [(1, 1)]
    if n >= 2:
        shapes += [(2, 1), (1, 2)]
    if n >= 4:
        shapes += [(4, 1), (1, 4), (2, 2)]
    results = {}
    for d, t in shapes:
        dt, pix = run_mesh(d, t)
        results[(d, t)] = (dt, pix)
        print(
            json.dumps(
                {
                    "metric": f"vmesh_step_ms_data{d}_tile{t}",
                    "value": dt * 1e3,
                    "unit": "ms",
                    "pixels_per_sec": pix,
                }
            ),
            flush=True,
        )

    base_dt, base_pix = results[(1, 1)]
    summary = {"metric": "scaling_efficiency_vmesh", "unit": "ratio"}
    if (2, 1) in results:
        # weak scaling on data: 2 frames in the time of 1
        summary["data2"] = base_dt / results[(2, 1)][0]
    if (4, 1) in results:
        summary["data4"] = base_dt / results[(4, 1)][0]
    if (1, 2) in results:
        # strong scaling on tile: one frame split across chips
        summary["tile2"] = base_dt / (2 * results[(1, 2)][0]) * 2
        summary["tile2_speedup"] = base_dt / results[(1, 2)][0]
    if (1, 4) in results:
        summary["tile4_speedup"] = base_dt / results[(1, 4)][0]
    summary["value"] = summary.get("data2", 1.0)
    summary["vs_baseline"] = summary["value"] / 0.85
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
