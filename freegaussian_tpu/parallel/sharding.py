"""Multi-chip scaling: mesh + shard_map training step.

Replaces the reference's torch-DDP data parallelism (the only parallelism it
has, SURVEY §2.3: NCCL all-reduce in DDP backward, freegaussian_pipeline.py:
31-40) with a TPU-native layout over a `jax.sharding.Mesh`:

  - `data` axis: one camera (full image) per data-group — the DP analogue.
    Gradients are `psum`ed over ICI, fused by XLA into the backward.
  - `tile` axis: image rows sharded within a data group — each chip
    rasterizes its horizontal band by shifting the camera's principal point
    (the tile-sharded rasterizer of SURVEY §2.3). Gaussians are replicated;
    per-Gaussian gradients are reduced with the same psum.

The scaling axes of this workload are N-Gaussians / intersections / pixels —
not sequence length — so the tile axis is the SP/CP analogue and the psum
plays the role of NCCL all-reduce, riding ICI.

Note: SSIM is computed per row-band (windows crossing band boundaries are
dropped); with tile=1 this is exactly the single-chip loss.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.cameras import Camera
from ..models.densify import DensifyConfig, refine, update_stats, zero_moment_rows
from ..models.splat_model import SplatConfig, forward, loss_fn, psnr
from ..engine.optimizers import apply_group_updates
from ..engine.train_step import GAUSSIAN_GROUPS, TrainState

try:
    from jax.experimental.shard_map import shard_map
except ImportError:  # newer JAX
    from jax.shard_map import shard_map  # type: ignore


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
):
    """Build the pjit'd multi-chip train step.

    Inputs: state (replicated), cameras (stacked, sharded on `data`), images
    ((D, H, W, 3), sharded (data, tile) over rows). Each chip renders its row
    band of its camera; grads psum over both axes; parameters stay replicated
    (every chip applies the identical update — the DDP pattern, no weight
    sharding needed at 3DGS model sizes).
    """
    H, W = image_hw
    n_tile = mesh.shape["tile"]
    n_data = mesh.shape["data"]
    assert H % n_tile == 0, "image height must divide the tile axis"
    Hs = H // n_tile

    def device_step(state: TrainState, cam: Camera, img: jax.Array):
        # cam leaves have leading axis 1 (this device's camera); img (1, Hs, W, 3)
        cam = jax.tree.map(lambda x: x[0], cam)
        img = img[0]
        ty = jax.lax.axis_index("tile")
        cam_local = cam.replace(
            cy=cam.cy - ty * Hs,
            width=W,
            height=Hs,
        )
        key, k_bg, k_refine = jax.random.split(state.key, 3)
        # All data-groups share k_bg per step (same as one background draw).
        warmed_up = state.step >= splat_cfg.warm_up
        capacity = state.alive.shape[0]

        def compute_loss(params, deform_vars, sink):
            outputs = forward(
                splat_cfg,
                params,
                state.alive,
                cam_local,
                deform_variables=deform_vars if train_deform else None,
                deform_apply=deform_apply if train_deform else None,
                sh_degree_now=splat_cfg.sh_degree,
                warmed_up=warmed_up,
                train=True,
                bg_rng=k_bg,
                means2d_sink=sink,
            )
            losses = loss_fn(splat_cfg, outputs, {"image": img}, params, state.alive)
            return losses["main_loss"], (outputs, losses)

        sink = jnp.zeros((capacity, 2), jnp.float32)
        grad_fn = jax.value_and_grad(compute_loss, argnums=(0, 1, 2), has_aux=True)
        (local_loss, (outputs, losses)), (g_params, g_deform, absgrad) = grad_fn(
            state.params, state.deform_vars, sink
        )

        # DDP gradient all-reduce -> psum over both mesh axes (ICI).
        axes = ("data", "tile")
        scale = 1.0 / (n_data * n_tile)
        g_params = jax.tree.map(lambda g: jax.lax.psum(g, axes) * scale, g_params)
        g_deform = jax.tree.map(lambda g: jax.lax.psum(g, axes) * scale, g_deform)
        loss = jax.lax.psum(local_loss, axes) * scale
        # Densification stats: absgrad accumulates (sum), visibility ORs.
        absgrad = jax.lax.psum(absgrad, axes) / n_data
        radii = jax.lax.pmax(outputs["radii"], axes)

        g_params = {
            k: jnp.where(state.alive.reshape((-1,) + (1,) * (v.ndim - 1)), v, 0.0)
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
                new_opt = {
                    name: zero_moment_rows(opt_states[name], mask, params[name])
                    for name in GAUSSIAN_GROUPS
                }
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

        metrics = {
            "loss": loss,
            "psnr": jax.lax.pmean(psnr(outputs["rgb"], img[..., :3]), axes),
            "gaussian_count": jnp.sum(new_alive),
        }
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

    cam_spec = P("data")
    sharded = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), cam_spec, P("data", "tile")),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return jax.jit(sharded)
