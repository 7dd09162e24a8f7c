"""Benchmark: pixels/s for the stage-1 train step (fwd+bwd+Adam) on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Measures the full differentiable pipeline — projection, tile binning, Pallas
forward, analytic backward with absgrad, per-group Adam — on a synthetic
CoNeRF-scale scene, timed with an on-device lax.scan loop (one host round
trip; the axon tunnel adds ~25 ms per host->device call otherwise).

vs_baseline: ratio against the BASELINE.json north-star target of 2x an H100
running gsplat on this workload class. Calibration (single source of truth,
matching the `baseline = 6e7` constant below): gsplat trains ~0.3 Mpixel
scenes at a few hundred k Gaussians at ~100 steps/s on an H100-class GPU,
i.e. ~3e7 train-step pixels/s; the north star is 2x that = 6e7 pixels/s per
v5e chip.
"""

import json
import time

import numpy as np


def main(cfg_overrides=None, label=None, calibrate=True, profile_dir=None,
         resolution=None, headroom=1.35):
    """cfg_overrides: optional dict of SplatConfig field overrides (used by
    scripts/tpu_checks.py stepab for on-chip A/B runs). `calibrate=False`
    pins an explicit `isect_capacity` override instead of shrinking it to
    the measured-kept fit (for capacity-axis A/B legs). `profile_dir`
    additionally records a jax.profiler trace of the timed run there
    (tpu_checks `benchprof` parses it into a per-op table). `resolution`
    overrides the frame size (the full-res leg passes the native CoNeRF
    1296x968; focal scales with width so the scene stays the same)."""
    import jax

    from freegaussian_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    jax.config.update("jax_default_matmul_precision", "float32")
    import jax.numpy as jnp

    from freegaussian_tpu.data.cameras import Camera
    from freegaussian_tpu.engine.optimizers import (
        OptimizersConfig,
        init_opt_states,
        make_optimizers,
    )
    from freegaussian_tpu.engine.train_step import GAUSSIAN_GROUPS
    from freegaussian_tpu.models.fields import DeformField
    from freegaussian_tpu.models.gaussians import init_gaussians
    from freegaussian_tpu.models.splat_model import SplatConfig, forward, loss_fn
    from freegaussian_tpu.engine.optimizers import apply_group_updates

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    # CoNeRF-scale operating point: ~100k Gaussians, 2x-downscaled capture.
    n_gauss, width, height = (100_000, 640, 480) if on_tpu else (2_000, 128, 128)
    if resolution is not None:
        width, height = resolution
    iters = 30 if on_tpu else 3
    capacity = n_gauss

    rng = np.random.default_rng(0)
    seed_xyz = rng.normal(scale=1.0, size=(n_gauss, 3)).astype(np.float32)
    seed_rgb = rng.uniform(0, 255, size=(n_gauss, 3)).astype(np.float32)
    params, alive = init_gaussians(
        jax.random.PRNGKey(0), capacity, seed_points=(seed_xyz, seed_rgb), sh_degree=3
    )
    # Trained-scene operating point: ~4 px screen radius (the kNN init on a
    # random cloud gives ~20 px blobs, an unrealistically dense overlap), and
    # a trained-like opacity mixture — init_gaussians' logit(0.1) is the
    # UNTRAINED init, where pixels never saturate; steady-state 3DGS scenes
    # are bimodal (opaque surface + a near-cull tail), which is what the
    # termination-dependent kernel paths (early-out, tight radius) see in
    # the reference workload. Mixture: 50% in [0.55, 0.99] (surface), 30% in
    # [0.1, 0.55], 20% in [0.02, 0.1] (near cull_alpha_thresh = 0.005-0.1).
    params["scales"] = jnp.full_like(params["scales"], jnp.log(0.015))
    u = rng.uniform(size=n_gauss).astype(np.float32)
    op = np.where(
        u < 0.5,
        rng.uniform(0.55, 0.99, n_gauss),
        np.where(
            u < 0.8,
            rng.uniform(0.1, 0.55, n_gauss),
            rng.uniform(0.02, 0.1, n_gauss),
        ),
    ).astype(np.float32)
    params["opacities"] = jnp.asarray(np.log(op / (1.0 - op)))[:, None]  # logit (N, 1)
    cfg = SplatConfig(
        warm_up=0, background_color="black", isect_capacity_factor=3,
        **(cfg_overrides or {}),
    )
    from freegaussian_tpu.models.splat_model import make_deform_apply, make_deform_field

    deform = make_deform_field(cfg)
    deform_apply = make_deform_apply(cfg, deform)
    dvars = deform.init(jax.random.PRNGKey(1), jnp.zeros((1, 3)), jnp.zeros((1, 1)))
    # Trained-like deform magnitude: at random init the four output heads
    # emit O(1) values, and the reference's ADDITIVE d_scaling
    # (freegaussian_model.py:844) then inflates every Gaussian from the
    # intended ~4 px to ~20 px screen radius — that's the warm-up-boundary
    # transient, not the steady state this bench models (trained deform
    # heads emit small deltas). Scale the head layers down; the trunk keeps
    # its full compute cost.
    head_names = sorted(
        dvars["params"].keys(), key=lambda k: int(k.split("_")[-1])
    )[-4:]
    dvars = {
        "params": {
            k: (
                jax.tree.map(lambda a: a * 0.01, v) if k in head_names else v
            )
            for k, v in dvars["params"].items()
        }
    }

    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 6.0
    focal = 500.0 * width / 640.0  # constant FOV: the same scene at any res
    camera = Camera(
        c2w=jnp.asarray(c2w[:3]),
        fx=jnp.asarray(focal),
        fy=jnp.asarray(focal),
        cx=jnp.asarray(width / 2.0),
        cy=jnp.asarray(height / 2.0),
        time=jnp.asarray(0.5),
        width=width,
        height=height,
    )
    # Self-calibrate the intersection capacity the way the Trainer does
    # (grow at 85% / shrink to 1.35x measured KEPT pairs — with the ellipse
    # precull, num_isects counts kept pairs, ~2.7x below the bbox totals the
    # old factor-3 sizing assumed). One extra small compile; every
    # capacity-sized cost (sort, gathers, cumsum, reduction) then matches a
    # trainer steady state instead of a 2.7x-oversized pipeline.
    @jax.jit
    def _measure_isects(p, dv):
        out = forward(
            cfg, p, alive, camera,
            deform_variables=dv, deform_apply=deform_apply,
            sh_degree_now=3, warmed_up=jnp.asarray(True),
            train=True, bg_rng=None,
        )
        return out["num_isects"]

    kept = int(_measure_isects(params, dvars))
    cap_fit = max((int(headroom * kept) + 127) // 128 * 128, 1 << 14)
    if not calibrate and cfg.isect_capacity is not None:
        cap_fit = cfg.isect_capacity
    if cfg.isect_capacity is None or cfg.isect_capacity > cap_fit:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, isect_capacity=cap_fit)

    optimizers = make_optimizers(OptimizersConfig(max_steps=30000))
    params_by_group = {k: params[k] for k in GAUSSIAN_GROUPS}
    params_by_group["deform"] = dvars
    opt_states = init_opt_states(optimizers, params_by_group)
    target = jnp.asarray(rng.uniform(size=(height, width, 3)).astype(np.float32))

    def train_step(carry, _):
        params, dvars, opt_states, t = carry

        def compute_loss(p, dv):
            out = forward(
                cfg, p, alive, camera.replace(time=t),
                deform_variables=dv, deform_apply=deform_apply,
                sh_degree_now=3, warmed_up=jnp.asarray(True),
                train=True, bg_rng=None,
            )
            return loss_fn(cfg, out, {"image": target}, p, alive)["main_loss"]

        loss, (gp, gd) = jax.value_and_grad(compute_loss, argnums=(0, 1))(params, dvars)
        pbg = {k: params[k] for k in GAUSSIAN_GROUPS}
        pbg["deform"] = dvars
        gbg = {k: gp[k] for k in GAUSSIAN_GROUPS}
        gbg["deform"] = gd
        new_groups, new_states = apply_group_updates(optimizers, opt_states, pbg, gbg)
        new_params = {k: new_groups[k] for k in GAUSSIAN_GROUPS}
        return (new_params, new_groups["deform"], new_states, t + 1e-5), loss

    @jax.jit
    def run(params, dvars, opt_states):
        carry, losses = jax.lax.scan(
            train_step, (params, dvars, opt_states, jnp.asarray(0.5)), None,
            length=iters,
        )
        return losses

    losses = run(params, dvars, opt_states)
    jax.block_until_ready(losses)
    # Min over repeated identical runs: the dispatch path needs host CPU
    # (axon tunnel client), so a transiently loaded host inflates wall time
    # ~13x against unchanged device time (docs/NOTES_ROUND2.md session-5
    # incident). The min of three runs of the SAME compiled scan is the
    # honest device-throughput estimate.
    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        losses = run(params, dvars, opt_states)
        jax.block_until_ready(losses)
        dt = min(dt, (time.time() - t0) / iters)
    if profile_dir is not None:
        with jax.profiler.trace(profile_dir):
            jax.block_until_ready(run(params, dvars, opt_states))

    pixels_per_sec = width * height / dt
    # North-star target (BASELINE.json): 2x an H100 running gsplat on the
    # same workload. gsplat trains ~1.3 Mpix scenes at ~20-25 steps/s on
    # H100-class GPUs at a few hundred k Gaussians => ~3e7 train-step
    # pixels/s; target = 2x that.
    baseline = 6e7
    record = {
        "metric": "train_step_pixels_per_sec",
        "value": pixels_per_sec,
        "unit": "pixels/s",
        "vs_baseline": pixels_per_sec / baseline,
    }
    if label is not None:
        record["label"] = label
    print(json.dumps(record))


if __name__ == "__main__":
    # Second driver-visible leg at the NATIVE CoNeRF capture resolution
    # (reference full-res frames are 1296x968; the default leg is the 2x
    # downscale the reference trains at). Fixed per-step costs (deform MLP,
    # projection, binning scatter, Adam) amortize over 4.1x the pixels here,
    # so this leg shows the pixel-stage-limited throughput. Printed FIRST:
    # the driver parses the LAST JSON line as the headline (the honest
    # 2x-downscale operating point, comparable across rounds). The roofline
    # reading of both legs vs the 6e7 north star: docs/SCALING.md.
    import os
    import sys as _sys

    if os.environ.get("FREEGAUSSIAN_BENCH_FULLRES", "1") != "0":
        try:
            main(label="conerf_fullres_1296x968", resolution=(1296, 968))
        except Exception:
            import traceback

            traceback.print_exc(file=_sys.stderr)
            print("bench: full-res leg failed; continuing", file=_sys.stderr)
    try:
        main()
    except Exception:
        # Never leave the driver without a bench line: retry once with the
        # newest kernel-path features disabled (a hardware-only failure in a
        # feature that interpret-mode tests cannot reach should cost its
        # speedup, not the whole measurement).
        import sys
        import traceback

        traceback.print_exc(file=sys.stderr)
        print("bench: retrying with conservative kernel flags", file=sys.stderr)
        from freegaussian_tpu.ops import rasterize_pallas as _rp

        _rp.ELLIPSE_CULL = False
        _rp.FWD_EARLY_OUT = False
        _rp.BWD_EARLY_OUT = False
        main(label="conservative_fallback")
