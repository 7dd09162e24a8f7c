"""Multi-chip scaling: mesh + shard_map training step.

Replaces the reference's torch-DDP data parallelism (the only parallelism it
has, SURVEY §2.3: NCCL all-reduce in DDP backward, freegaussian_pipeline.py:
31-40) with a TPU-native layout over a `jax.sharding.Mesh`:

  - `data` axis: one camera (full image) per data-group — the DP analogue.
    Gradients are `psum`ed over ICI, fused by XLA into the backward.
  - `tile` axis, pixel stage: image rows sharded within a data group — each
    chip rasterizes its horizontal band by shifting the camera's principal
    point (the tile-sharded rasterizer of SURVEY §2.3).
  - `tile` axis, primitive stage: the SAME chips shard the Gaussian capacity
    axis for the deform MLP / projection / SH (splat_model.forward
    `primitive_shard_axis`), then all_gather the render attributes into the
    band rasterizer; the gather's transpose (psum_scatter) reduces
    per-Gaussian gradients back to their shard — SURVEY §2.3's
    projection(primitive-sharded) <-> rasterization(tile-sharded) reshard.

The scaling axes of this workload are N-Gaussians / intersections / pixels —
not sequence length — so the tile axis is the SP/CP analogue and the psum
plays the role of NCCL all-reduce, riding ICI.

Loss parity with the single-chip step (round-2; VERDICT weak #2/#3):
  - SSIM windows crossing band boundaries are computed via a halo exchange
    (lax.ppermute of 5 boundary rows) + per-band window maps + a psum'd
    sum/count — EXACTLY the single-chip SSIM (band-exact when the band height
    is a tile_size multiple, which keeps the tile grid identical).
  - The flow-derivative losses run in the sharded step: the 2D rendered-flow
    loss aggregates sum/count over bands; the 3D lift uses the full
    (tile-replicated) interflow/depth with globalized means2d.
  - SH degree is a per-call static argument and images may be passed at any
    downscale phase, matching the single-chip schedules.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.cameras import Camera
from ..models.densify import DensifyConfig, refine, update_stats, zero_moment_rows
from ..models.splat_model import SplatConfig, forward, loss_fn, psnr
from ..models.ssim import ssim_map
from ..engine.optimizers import apply_group_updates
from ..engine.train_step import GAUSSIAN_GROUPS, TrainState

try:
    from jax.experimental.shard_map import shard_map
except ImportError:  # newer JAX
    from jax.shard_map import shard_map  # type: ignore

SSIM_WIN = 11
HALO = SSIM_WIN // 2


def make_mesh(data: int, tile: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: data * tile]).reshape(data, tile)
    return Mesh(devices, ("data", "tile"))


def stack_cameras(cameras) -> Camera:
    """Stack a list of Cameras into one pytree with a leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cameras)


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x, state
    )


def _halo_rows(x: jax.Array, halo: int) -> jax.Array:
    """Extend a (Hs, W, C) band with `halo` rows from each tile-axis
    neighbor. Ring wrap at the outer edges produces garbage rows there; the
    caller masks windows whose global centers fall outside the image."""
    n = jax.lax.axis_size("tile")
    perm_down = [(i, (i + 1) % n) for i in range(n)]  # send to next band
    perm_up = [(i, (i - 1) % n) for i in range(n)]  # send to previous band
    from_prev = jax.lax.ppermute(x[-halo:], "tile", perm_down)
    from_next = jax.lax.ppermute(x[:halo], "tile", perm_up)
    return jnp.concatenate([from_prev, x, from_next], axis=0)


def _band_ssim_parts(
    pred: jax.Array, gt: jax.Array, Hs: int, H: int
) -> Tuple[jax.Array, jax.Array]:
    """(sum, count) of valid SSIM windows whose centers lie in this band."""
    ty = jax.lax.axis_index("tile")
    ext_p = _halo_rows(pred, HALO)
    ext_g = _halo_rows(gt, HALO)
    m = ssim_map(ext_g, ext_p, win_size=SSIM_WIN)  # (1, C, Hs, W - 10)
    centers = ty * Hs + jnp.arange(Hs)
    valid = (centers >= HALO) & (centers <= H - 1 - HALO)
    vmask = valid.astype(m.dtype).reshape(1, 1, Hs, 1)
    s = jnp.sum(m * vmask)
    cnt = jnp.sum(vmask) * m.shape[1] * m.shape[3]
    return s, cnt


def make_parallel_train_step(
    splat_cfg: SplatConfig,
    densify_cfg: DensifyConfig,
    optimizers: Dict[str, Any],
    deform_apply,
    num_train_data: int,
    mesh: Mesh,
    image_hw: Tuple[int, int],
    *,
    train_deform: bool = True,
    with_refine: bool = True,
    with_flow: bool = False,
    primitive_sharding: bool = True,
    grad_reduce_dtype: str | None = None,
    zero1: bool = False,
):
    """Build the pjit'd multi-chip train step.

    Inputs: state (replicated), cameras (stacked, sharded on `data`), images
    ((D, H, W, 3), sharded (data, tile) over rows); with `with_flow` also
    cameras0 (sharded `data`), flows (D, H, W, 2) and depth0s (D, H, W, 1)
    sharded on `data` only (replicated over tile — the 3D lift samples them
    at arbitrary pixel coordinates). Returns
    step_fn(state, cams, imgs[, cams0, flows, depth0s], sh_degree_now=...)
    with sh_degree_now static.

    Parameters stay replicated; every chip applies the identical update (the
    DDP pattern — no weight sharding needed at 3DGS model sizes). The image
    height must divide the tile axis; band-exact loss parity additionally
    wants (H / tile) % tile_size == 0 so the band tile grids align with the
    single-chip grid.

    Serial-collective controls (VERDICT r4 #2 — the gradient all-reduce
    lowers SYNCHRONOUSLY at the end of the backward in this XLA, see
    scripts/overlap_check.py / docs/NOTES_ROUND4.md):

    - `grad_reduce_dtype="bfloat16"`: cast gradients to bf16 for the wire
      leg of the reduction and back to f32 before Adam (f32 master params +
      moments throughout). Halves the serial collective bytes; gradient
      noise is bounded by bf16's ~2^-8 relative rounding, downstream of
      Adam's sqrt(v) normalization (the standard DDP gradient-compression
      trade). Default off = bit-compatible with round-4 behavior.
    - `zero1=True`: ZeRO-1 sharded optimizer — Gaussian-group gradients are
      reduce-scattered over the flattened (data, tile) device axis, Adam
      runs on each chip's 1/ndev row shard with the optimizer moments
      STORED sharded (in/out specs partition the moment leaves' capacity
      axis), and the updated parameter shards are all-gathered back to
      replicated. Per-chip optimizer memory and update FLOPs drop by 1/ndev
      and the end-of-backward serial window carries the reduce-scatter's
      one-way bytes instead of the all-reduce's two-way bytes; composes
      with `grad_reduce_dtype` (bf16 reduce-scatter + f32 param gather).
      Requires capacity % (data*tile) == 0. The deform MLP (irregular leaf
      shapes, ~2 MB) stays on the replicated all-reduce path.
    """
    H, W = image_hw
    n_tile = mesh.shape["tile"]
    n_data = mesh.shape["data"]
    assert H % n_tile == 0, "image height must divide the tile axis"
    Hs = H // n_tile
    use_flow_2d = with_flow and splat_cfg.flow_loss_weight > 0
    use_flow_3d = with_flow and splat_cfg.flow_3d_loss_weight > 0
    shard_axis = "tile" if primitive_sharding and n_tile > 1 else None
    ndev = n_data * n_tile
    rdt = jnp.dtype(grad_reduce_dtype) if grad_reduce_dtype else None

    def _wire(g):
        return g.astype(rdt) if rdt is not None else g

    def _unwire(g):
        return g.astype(jnp.float32) if rdt is not None else g

    def device_step(sh_degree_now, state: TrainState, cam: Camera, img, *flow_args):
        # cam leaves have leading axis 1 (this device's camera); img (1, Hs, W, 3)
        cam = jax.tree.map(lambda x: x[0], cam)
        img = img[0]
        if with_flow:
            cam0, flow_full, depth0_full = flow_args
            cam0 = jax.tree.map(lambda x: x[0], cam0)
            flow_full = flow_full[0]
            depth0_full = depth0_full[0]
        ty = jax.lax.axis_index("tile")
        key, k_bg, k_refine = jax.random.split(state.key, 3)
        # All data-groups share k_bg per step (same as one background draw).
        warmed_up = state.step >= splat_cfg.warm_up
        capacity = state.alive.shape[0]

        def compute_loss(params, deform_vars, sink):
            # The FULL camera drives projection (bit-identical per-Gaussian
            # attributes vs the single-chip path); the band enters only via
            # band_origin_y/band_height in the pixel stage.
            outputs = forward(
                splat_cfg,
                params,
                state.alive,
                cam,
                deform_variables=deform_vars if train_deform else None,
                deform_apply=deform_apply if train_deform else None,
                sh_degree_now=sh_degree_now,
                warmed_up=warmed_up,
                train=True,
                bg_rng=k_bg,
                means2d_sink=sink,
                camera0=cam0 if with_flow else None,
                render_flow=use_flow_2d,
                primitive_shard_axis=shard_axis,
                band_origin_y=ty * Hs,
                band_height=Hs,
            )
            losses = loss_fn(
                splat_cfg,
                outputs,
                {"image": img},
                params,
                state.alive,
                apply_scale_reg=(state.step % 10 == 0),
            )
            # --- exact distributed loss, chip-LOCAL form -------------------
            # CRITICAL shard_map autodiff rule (check_rep=False): psum's
            # transpose is psum, so any collective on a DIFFERENTIATED path
            # inside value_and_grad multiplies cotangents by the axis size.
            # The global loss is therefore expressed as Sum_chips(local_t)
            # where every cross-chip quantity entering local_t is a
            # stop-gradient denominator; the value is psum'd OUTSIDE the
            # grad, and the plain psum of raw gradients is exact.
            gt = img[..., :3]
            pred = outputs["rgb"]
            l1_local = jnp.sum(jnp.abs(gt - pred)) / (H * W * gt.shape[-1])
            s_sum, s_cnt = _band_ssim_parts(pred, gt, Hs, H)
            total_cnt = jnp.clip(
                jax.lax.psum(jax.lax.stop_gradient(s_cnt), "tile"), 1.0, None
            )
            # global main = (1-l)*l1 + l*(1 - ssim); the constant 1 is split
            # evenly so Sum_t local_t reproduces it exactly.
            main_local = (1 - splat_cfg.ssim_lambda) * l1_local + (
                splat_cfg.ssim_lambda * (1.0 / n_tile - s_sum / total_cnt)
            )
            # scale_reg comes from replicated params: identical on every tile
            # chip -> divide so the grad psum restores a single contribution.
            frame_local = main_local + losses["scale_reg"] / n_tile

            gate = jnp.asarray(warmed_up, jnp.float32)
            if use_flow_2d:
                # sum/sum aggregation over bands (weights are band-local)
                flow_band = jax.lax.dynamic_slice_in_dim(
                    flow_full, ty * Hs, Hs, axis=0
                )
                w = jax.lax.stop_gradient(outputs["accumulation"])
                num_local = jnp.sum(w * jnp.abs(outputs["flow"] - (-flow_band)))
                den = jnp.clip(
                    jax.lax.psum(jnp.sum(w), "tile") * 2.0, 1.0, None
                )  # stop-gradient weights: safe inside grad
                fl_local = num_local / den
                losses["flow_2d_local"] = fl_local
                w2d = splat_cfg.flow_loss_weight
                if splat_cfg.flow_px_ref > 0:
                    # resolution-invariant effective weight; must match the
                    # single-chip path (SplatConfig.flow_px_ref) for the
                    # tile-parity tests
                    w2d = w2d * splat_cfg.flow_px_ref / max(H, W)
                frame_local = frame_local + gate * w2d * fl_local
            if use_flow_3d:
                from ..ops.flow import flow_supervision_loss, query_3d_gaussian_flow

                # outputs["means2d"] is already in FULL-frame coordinates
                lifted = query_3d_gaussian_flow(
                    outputs["means2d"],
                    depth0_full,
                    flow_full,
                    cam0.c2w_opencv,
                    cam.K,
                    valid=state.alive,
                )
                fl3 = flow_supervision_loss(
                    outputs["means_prev"],
                    lifted,
                    outputs["radii"],
                    alive=state.alive,
                )
                losses["flow_3d"] = fl3
                # full-array computation, identical on every tile chip
                frame_local = frame_local + (
                    gate * splat_cfg.flow_3d_loss_weight * fl3 / n_tile
                )
            # frame mean over the data axis: constant 1/n_data scaling
            loss_local = frame_local / n_data
            # aux metric values (NOT differentiated -> psums here are safe)
            losses["l1"] = jax.lax.psum(l1_local, "tile")
            losses["ssim"] = jax.lax.psum(s_sum, "tile") / total_cnt
            if use_flow_2d:
                losses["flow_2d"] = jax.lax.psum(
                    losses.pop("flow_2d_local"), "tile"
                )
            return loss_local, (outputs, losses)

        sink = jnp.zeros((capacity, 2), jnp.float32)
        grad_fn = jax.value_and_grad(compute_loss, argnums=(0, 1, 2), has_aux=True)
        (loss_local, (outputs, losses)), (g_params, g_deform, absgrad) = grad_fn(
            state.params, state.deform_vars, sink
        )

        # The loss is a sum of chip-local terms (see compute_loss), so the
        # DDP all-reduce is a plain psum of both the value and the partial
        # gradients (primitive shards + bands + data groups), fused into the
        # backward by XLA. `grad_reduce_dtype` casts the wire leg; `zero1`
        # replaces the Gaussian-group psum with a reduce-scatter + sharded
        # Adam + param all-gather (see docstring).
        axes = ("data", "tile")
        loss = jax.lax.psum(loss_local, axes)
        g_deform = jax.tree.map(
            lambda g: _unwire(jax.lax.psum(_wire(g), axes)), g_deform
        )
        # Densification stats: the sink cotangents already carry the loss's
        # 1/n_data frame averaging, so a plain psum assembles the per-frame
        # absgrad (bands + shards) and averages over frames in one go.
        absgrad = jax.lax.psum(absgrad, axes)
        radii = jax.lax.pmax(outputs["radii"], axes)

        if zero1:
            shard_rows = capacity // ndev
            my = jax.lax.axis_index("data") * n_tile + jax.lax.axis_index("tile")
            row0 = my * shard_rows

            def rs(g):
                # data-major shard layout: scatter over "data" first, then
                # "tile", matching the P(("data", "tile")) moment specs
                g = jax.lax.psum_scatter(
                    _wire(g), "data", scatter_dimension=0, tiled=True
                )
                g = jax.lax.psum_scatter(g, "tile", scatter_dimension=0, tiled=True)
                return _unwire(g)

            def shard(x):
                return jax.lax.dynamic_slice_in_dim(x, row0, shard_rows, axis=0)

            alive_shard = shard(state.alive)
            g_shard = {
                k: jnp.where(
                    alive_shard.reshape((-1,) + (1,) * (g_params[k].ndim - 1)),
                    rs(g_params[k]),
                    0.0,
                )
                for k in GAUSSIAN_GROUPS
            }
            p_shard = {k: shard(state.params[k]) for k in GAUSSIAN_GROUPS}
            grads_by_group = dict(g_shard)
            params_by_group = dict(p_shard)
        else:
            g_params = jax.tree.map(
                lambda g: _unwire(jax.lax.psum(_wire(g), axes)), g_params
            )
            g_params = {
                k: jnp.where(
                    state.alive.reshape((-1,) + (1,) * (v.ndim - 1)), v, 0.0
                )
                for k, v in g_params.items()
            }
            params_by_group = {k: state.params[k] for k in GAUSSIAN_GROUPS}
            grads_by_group = {k: g_params[k] for k in GAUSSIAN_GROUPS}
        if train_deform:
            params_by_group["deform"] = state.deform_vars
            grads_by_group["deform"] = g_deform
        new_groups, new_opt_states = apply_group_updates(
            optimizers, state.opt_states, params_by_group, grads_by_group
        )
        if zero1:
            def ag(p):
                # inverse of rs(): gather "tile" (innermost) then "data"
                p = jax.lax.all_gather(p, "tile", axis=0, tiled=True)
                return jax.lax.all_gather(p, "data", axis=0, tiled=True)

            new_params = {k: ag(new_groups[k]) for k in GAUSSIAN_GROUPS}
        else:
            new_params = {k: new_groups[k] for k in GAUSSIAN_GROUPS}
        new_deform = new_groups.get("deform", state.deform_vars)
        opt_states = dict(state.opt_states)
        opt_states.update(new_opt_states)

        dstate = update_stats(state.densify, radii, absgrad, (H, W))

        if with_refine:

            def do_refine(operand):
                params, alive, dstate, opt_states = operand
                params, alive, dstate, info = refine(
                    densify_cfg, params, alive, dstate, k_refine, state.step,
                    (H, W), num_train_data,
                )
                mask = info["moment_zero_mask"]
                if zero1:
                    # moments live sharded: slice the surgery mask and the
                    # shape-matching templates to this chip's row shard
                    my = (
                        jax.lax.axis_index("data") * n_tile
                        + jax.lax.axis_index("tile")
                    )
                    row0 = my * (capacity // ndev)

                    def tmpl(name):
                        return jax.lax.dynamic_slice_in_dim(
                            params[name], row0, capacity // ndev, axis=0
                        )

                    mask = jax.lax.dynamic_slice_in_dim(
                        mask, row0, capacity // ndev, axis=0
                    )
                else:
                    def tmpl(name):
                        return params[name]
                new_opt = {}
                for name in GAUSSIAN_GROUPS:
                    st = zero_moment_rows(opt_states[name], mask, tmpl(name))
                    if name == "opacities":
                        # opacity reset also resets its Adam moments, exactly
                        # as the single-chip step does (train_step.py do_refine)
                        op_shape = tmpl("opacities").shape
                        st = jax.tree.map(
                            lambda leaf: (
                                jnp.where(
                                    info["reset_opacity_moments"],
                                    jnp.zeros_like(leaf),
                                    leaf,
                                )
                                if hasattr(leaf, "shape")
                                and leaf.shape == op_shape
                                else leaf
                            ),
                            st,
                        )
                    new_opt[name] = st
                opt_states = dict(opt_states)
                opt_states.update(new_opt)
                return params, alive, dstate, opt_states

            should = (state.step >= densify_cfg.refine_start) & (
                state.step % densify_cfg.refine_every == 0
            )
            new_params, new_alive, dstate, opt_states = jax.lax.cond(
                should, do_refine, lambda op: op,
                (new_params, state.alive, dstate, opt_states),
            )
        else:
            new_alive = state.alive

        axes = ("data", "tile")
        metrics = {
            "loss": loss,
            "main_loss": jax.lax.pmean(
                (1 - splat_cfg.ssim_lambda) * losses["l1"]
                + splat_cfg.ssim_lambda * (1 - losses["ssim"]),
                "data",
            ),
            "l1": jax.lax.pmean(losses["l1"], "data"),
            "ssim": jax.lax.pmean(losses["ssim"], "data"),
            "psnr": jax.lax.pmean(psnr(outputs["rgb"], img[..., :3]), axes),
            "gaussian_count": jnp.sum(new_alive),
            "num_isects": jax.lax.psum(outputs["num_isects"], axes) // n_data,
        }
        for k in ("flow_2d", "flow_3d"):
            if k in losses:
                metrics[k] = jax.lax.pmean(losses[k], "data")
        new_state = state.replace(
            params=new_params,
            alive=new_alive,
            deform_vars=new_deform,
            opt_states=opt_states,
            densify=dstate,
            step=state.step + 1,
            key=key,
        )
        return new_state, metrics

    def _state_spec(state: TrainState):
        """Spec tree for the state: everything replicated, except (zero1)
        the Gaussian-group Adam moment leaves, whose capacity axis is
        partitioned data-major over the flattened device grid."""
        spec = jax.tree.map(lambda _: P(), state)
        if not zero1:
            return spec
        cap = state.alive.shape[0]
        assert cap % ndev == 0, (
            f"zero1 needs capacity ({cap}) divisible by the device count "
            f"({ndev})"
        )
        sharded = P(("data", "tile"))

        def opt_spec(group, sub):
            if group in GAUSSIAN_GROUPS:
                return jax.tree.map(
                    lambda leaf: sharded
                    if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] == cap
                    else P(),
                    sub,
                )
            return jax.tree.map(lambda _: P(), sub)

        return spec.replace(
            opt_states={
                k: opt_spec(k, v) for k, v in state.opt_states.items()
            }
        )

    def build(sh_degree_now, state):
        sspec = _state_spec(state)
        in_specs = [sspec, P("data"), P("data", "tile")]
        if with_flow:
            in_specs += [P("data"), P("data"), P("data")]
        return shard_map(
            functools.partial(device_step, sh_degree_now),
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(sspec, P()),
            check_rep=False,
        )

    @functools.partial(jax.jit, static_argnames=("sh_degree_now",))
    def step(state, cams, imgs, *flow_args, sh_degree_now=splat_cfg.sh_degree):
        return build(sh_degree_now, state)(state, cams, imgs, *flow_args)

    return step
