"""The jitted stage-1 training step: forward, loss, per-group Adam, absgrad
stats, and in-jit densification.

The whole step — including refinement — compiles once per (image size,
SH degree) phase, because Gaussian arrays are capacity-padded and refinement
is masked scatter work under lax.cond. This replaces the reference's
eager-callback structure (Trainer.train + AFTER_TRAIN_ITERATION callbacks,
freegaussian_model.py:573-591) with a pure function of TrainState.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from ..data.cameras import Camera
from ..models.densify import (
    DensifyConfig,
    DensifyState,
    refine,
    update_stats,
    zero_moment_rows,
)
from ..models.gaussians import GaussianParams
from ..models.splat_model import SplatConfig, forward, loss_fn, psnr
from .optimizers import apply_group_updates

GAUSSIAN_GROUPS = ("means", "scales", "quats", "features_dc", "features_rest", "opacities")


@flax.struct.dataclass
class TrainState:
    params: GaussianParams
    alive: jax.Array
    deform_vars: Any
    control_vars: Any
    opt_states: Dict[str, Any]
    densify: DensifyState
    step: jax.Array
    key: jax.Array
    camera_opt: Any = None  # (num_cameras, 6) SO3xR3 tangents when enabled
    bilagrid: Any = None  # (num_images, W, Y, X, 12) grids when enabled


def make_train_step(
    splat_cfg: SplatConfig,
    densify_cfg: DensifyConfig,
    optimizers: Dict[str, Any],
    deform_apply,
    num_train_data: int,
    *,
    train_deform: bool = True,
    train_camera_opt: bool = False,
    jit: bool = True,
):
    """Build the jitted train step.

    Static per-call args: sh_degree_now (int), image size via camera pytree
    metadata. Returns step_fn(state, camera, batch, sh_degree_now) ->
    (state, metrics).
    """

    use_flow = splat_cfg.flow_loss_weight > 0 or splat_cfg.flow_3d_loss_weight > 0
    train_camera_opt = train_camera_opt or splat_cfg.camera_optimizer_mode != "off"
    use_bilagrid = splat_cfg.use_bilateral_grid

    def step_fn(
        state: TrainState,
        camera: Camera,
        batch: Dict[str, jax.Array],
        sh_degree_now: int,
        camera0: Camera | None = None,
        cam_idx: jax.Array | int = 0,
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        key, k_bg, k_refine = jax.random.split(state.key, 3)
        capacity = state.alive.shape[0]
        warmed_up = state.step >= splat_cfg.warm_up
        last_size = (camera.height, camera.width)
        flow_active = use_flow and camera0 is not None and "flow" in batch

        def compute_loss(params, deform_vars, sink, cam_adjust, grids):
            if train_camera_opt and cam_adjust is not None:
                from ..models.camera_opt import apply_camera_opt

                cam_in = apply_camera_opt(cam_adjust, camera, cam_idx)
            else:
                cam_in = camera
            outputs = forward(
                splat_cfg,
                params,
                state.alive,
                cam_in,
                deform_variables=deform_vars if train_deform else None,
                deform_apply=deform_apply if train_deform else None,
                step=0,  # schedules passed explicitly below
                sh_degree_now=sh_degree_now,
                warmed_up=warmed_up,
                train=True,
                bg_rng=k_bg,
                means2d_sink=sink,
                camera0=camera0 if flow_active else None,
                render_flow=flow_active and splat_cfg.flow_loss_weight > 0,
                bilagrid=grids if use_bilagrid else None,
                image_idx=cam_idx,
            )
            losses = loss_fn(
                splat_cfg, outputs, batch, params, state.alive,
                apply_scale_reg=(state.step % 10 == 0),
            )
            total = losses["main_loss"] + losses["scale_reg"]
            if flow_active:
                from ..ops.flow import (
                    flow_supervision_loss,
                    query_3d_gaussian_flow,
                    rendered_flow_loss,
                )

                # flow_valid / depth0_valid: traced 0/1 gates the trainer sets
                # for frames lacking flow or depth files (zero-filled batch
                # entries keep the jit signature stable across frames).
                gate = jnp.asarray(warmed_up, jnp.float32) * jnp.asarray(
                    batch.get("flow_valid", 1.0), jnp.float32
                )
                if splat_cfg.flow_loss_weight > 0:
                    fl = rendered_flow_loss(
                        outputs["flow"], batch["flow"], outputs["accumulation"]
                    )
                    losses["flow_2d"] = fl
                    w2d = splat_cfg.flow_loss_weight
                    if splat_cfg.flow_px_ref > 0:
                        # pixel-unit L1 -> resolution-invariant effective
                        # weight (see SplatConfig.flow_px_ref)
                        w2d = w2d * splat_cfg.flow_px_ref / max(
                            outputs["flow"].shape[0], outputs["flow"].shape[1]
                        )
                    total = total + gate * w2d * fl
                if splat_cfg.flow_3d_loss_weight > 0 and "depth0" in batch:
                    gate = gate * jnp.asarray(
                        batch.get("depth0_valid", 1.0), jnp.float32
                    )
                    lifted = query_3d_gaussian_flow(
                        outputs["means2d"],
                        batch["depth0"],
                        batch["flow"],
                        camera0.c2w_opencv,
                        camera.K,
                        valid=state.alive,
                    )
                    fl3 = flow_supervision_loss(
                        outputs["means_prev"], lifted, outputs["radii"],
                        alive=state.alive,
                    )
                    losses["flow_3d"] = fl3
                    total = total + gate * splat_cfg.flow_3d_loss_weight * fl3
            if train_camera_opt and cam_adjust is not None:
                from ..models.camera_opt import camera_opt_reg_loss

                total = total + camera_opt_reg_loss(cam_adjust)
            if use_bilagrid:
                from ..models.bilagrid import total_variation_loss

                tv = total_variation_loss(grids)
                losses["tv_loss"] = tv
                total = total + 10.0 * tv  # ref weight (freegaussian_model.py:989)
            return total, (outputs, losses)

        sink = jnp.zeros((capacity, 2), jnp.float32)
        grad_fn = jax.value_and_grad(
            compute_loss, argnums=(0, 1, 2, 3, 4), has_aux=True
        )
        # dummies keep one grad signature when a feature is off (their grads
        # are zeros and are simply dropped below)
        cam_in_arg = (
            state.camera_opt if state.camera_opt is not None else jnp.zeros((1, 6))
        )
        grids_arg = (
            state.bilagrid
            if state.bilagrid is not None
            else jnp.zeros((1, 2, 2, 2, 12))
        )
        (total, (outputs, losses)), (
            g_params,
            g_deform,
            absgrad,
            g_cam,
            g_grids,
        ) = grad_fn(state.params, state.deform_vars, sink, cam_in_arg, grids_arg)

        # Dead slots must not move.
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
        if train_camera_opt and state.camera_opt is not None:
            params_by_group["camera_opt"] = state.camera_opt
            grads_by_group["camera_opt"] = g_cam
        if use_bilagrid and state.bilagrid is not None:
            params_by_group["bilateral_grid"] = state.bilagrid
            grads_by_group["bilateral_grid"] = g_grids

        new_groups, new_opt_states = apply_group_updates(
            optimizers, state.opt_states, params_by_group, grads_by_group
        )
        new_params = {k: new_groups[k] for k in GAUSSIAN_GROUPS}
        new_deform = new_groups.get("deform", state.deform_vars)
        opt_states = dict(state.opt_states)
        opt_states.update(new_opt_states)

        # --- densification bookkeeping (AFTER_TRAIN_ITERATION callbacks) ---
        dstate = update_stats(state.densify, outputs["radii"], absgrad, last_size)

        def do_refine(operand):
            params, alive, dstate, opt_states = operand
            params, alive, dstate, info = refine(
                densify_cfg,
                params,
                alive,
                dstate,
                k_refine,
                state.step,
                last_size,
                num_train_data,
            )
            mask = info["moment_zero_mask"]
            new_opt = {}
            for name in GAUSSIAN_GROUPS:
                st = zero_moment_rows(opt_states[name], mask, params[name])
                if name == "opacities":
                    st = jax.tree.map(
                        lambda leaf: (
                            jnp.where(info["reset_opacity_moments"], jnp.zeros_like(leaf), leaf)
                            if hasattr(leaf, "shape") and leaf.shape == params["opacities"].shape
                            else leaf
                        ),
                        st,
                    )
                new_opt[name] = st
            opt_states = dict(opt_states)
            opt_states.update(new_opt)
            return params, alive, dstate, opt_states

        should_refine = (
            (state.step >= densify_cfg.refine_start)
            & (state.step % densify_cfg.refine_every == 0)
        )
        new_params, new_alive, dstate, opt_states = jax.lax.cond(
            should_refine,
            do_refine,
            lambda op: op,
            (new_params, state.alive, dstate, opt_states),
        )

        # Cheap poisoned-state detector (one fused isfinite+all pass over the
        # params): a NaN state renders as pure background with a FINITE loss
        # (NaN projections cull to radii 0), so loss finiteness alone cannot
        # catch it — the round-2 collapse trained 500+ steps that way.
        finite = jnp.asarray(True)
        for v in new_params.values():
            finite &= jnp.all(jnp.isfinite(v))
        for leaf in jax.tree.leaves(new_deform):
            finite &= jnp.all(jnp.isfinite(leaf))
        metrics = {
            "params_finite": finite,
            "loss": total,
            "main_loss": losses["main_loss"],
            "l1": losses["l1"],
            "ssim": losses["ssim"],
            "psnr": psnr(outputs["rgb"], batch["image"][..., :3]),
            "gaussian_count": jnp.sum(new_alive),
            "num_isects": outputs["num_isects"],
        }
        for extra_key in ("flow_2d", "flow_3d"):
            if extra_key in losses:
                metrics[extra_key] = losses[extra_key]
        new_state = state.replace(
            params=new_params,
            alive=new_alive,
            deform_vars=new_deform,
            opt_states=opt_states,
            densify=dstate,
            step=state.step + 1,
            key=key,
            camera_opt=new_groups.get("camera_opt", state.camera_opt),
            bilagrid=new_groups.get("bilateral_grid", state.bilagrid),
        )
        return new_state, metrics

    # jit=False returns the raw body for embedding in a lax.scan chunk
    # (Trainer scan_chunk mode): one device dispatch per chunk instead of one
    # per step — through the tunneled TPU backend the per-call round trip
    # dominates small-scene training otherwise.
    if not jit:
        return step_fn
    return jax.jit(step_fn, static_argnames=("sh_degree_now",))
