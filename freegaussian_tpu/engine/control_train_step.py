"""Stage-2 (freegaussian-control) jitted train step.

Optimizes the Gaussian groups + control MLP (the reference drops the `deform`
group and all densification callbacks for stage 2,
freegaussian_control_model.py:211-218)."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..data.cameras import Camera
from ..models.control_model import control_forward
from ..models.splat_model import SplatConfig, loss_fn, psnr
from .optimizers import apply_group_updates
from .train_step import GAUSSIAN_GROUPS, TrainState


def make_control_train_step(
    splat_cfg: SplatConfig,
    optimizers: Dict[str, Any],
    control_apply,
    deform_apply,
    gaussian_mask: jax.Array,
    init_time,
    *,
    train_gaussians: bool = True,
    jit: bool = True,
):
    init_time = jnp.asarray(init_time)

    def step_fn(
        state: TrainState,
        camera: Camera,
        batch: Dict[str, jax.Array],
        sh_degree_now: int,
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        key, k_bg = jax.random.split(state.key)

        def compute_loss(params, control_vars):
            outputs = control_forward(
                splat_cfg,
                params,
                state.alive,
                gaussian_mask,
                camera,
                control_apply,
                control_vars,
                deform_apply=deform_apply,
                deform_vars=state.deform_vars,
                init_time=init_time,
                sh_degree_now=sh_degree_now,
                train=True,
                bg_rng=k_bg,
            )
            losses = loss_fn(splat_cfg, outputs, batch, params, state.alive)
            total = losses["main_loss"] + losses["scale_reg"]
            return total, (outputs, losses)

        grad_fn = jax.value_and_grad(compute_loss, argnums=(0, 1), has_aux=True)
        (total, (outputs, losses)), (g_params, g_control) = grad_fn(
            state.params, state.control_vars
        )
        g_params = {
            k: jnp.where(state.alive.reshape((-1,) + (1,) * (v.ndim - 1)), v, 0.0)
            for k, v in g_params.items()
        }

        params_by_group = {}
        grads_by_group = {}
        if train_gaussians:
            params_by_group.update({k: state.params[k] for k in GAUSSIAN_GROUPS})
            grads_by_group.update({k: g_params[k] for k in GAUSSIAN_GROUPS})
        params_by_group["control"] = state.control_vars
        grads_by_group["control"] = g_control

        new_groups, new_opt_states = apply_group_updates(
            optimizers, state.opt_states, params_by_group, grads_by_group
        )
        new_params = (
            {k: new_groups[k] for k in GAUSSIAN_GROUPS}
            if train_gaussians
            else state.params
        )
        opt_states = dict(state.opt_states)
        opt_states.update(new_opt_states)

        # same poisoned-state detector as the stage-1 step (train_step.py):
        # NaN params render as background with a FINITE loss
        finite = jnp.asarray(True)
        for v in new_params.values():
            finite &= jnp.all(jnp.isfinite(v))
        for leaf in jax.tree.leaves(new_groups["control"]):
            finite &= jnp.all(jnp.isfinite(leaf))
        metrics = {
            "params_finite": finite,
            "loss": total,
            "main_loss": losses["main_loss"],
            "psnr": psnr(outputs["rgb"], batch["image"][..., :3]),
            "gaussian_count": jnp.sum(state.alive),
            # feeds the shared trainer's isect-capacity self-tuning
            "num_isects": outputs["num_isects"],
        }
        new_state = state.replace(
            params=new_params,
            control_vars=new_groups["control"],
            opt_states=opt_states,
            step=state.step + 1,
            key=key,
        )
        return new_state, metrics

    if not jit:
        return step_fn
    return jax.jit(step_fn, static_argnames=("sh_degree_now",))
