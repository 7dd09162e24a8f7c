"""Per-group Adam optimizers with the reference's exact learning rates and
schedules (freegaussian_config.py:48-90), built on optax.

Groups: means, features_dc, features_rest, opacities, scales, quats,
camera_opt, deform, control. `spatial_lr_scale` multiplies the means /
deform / control rates (scripts/parse_config.py:41-57 semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..ops.math import exponential_decay_schedule

ADAM_EPS = 1e-15


@dataclasses.dataclass(frozen=True)
class OptimizersConfig:
    max_steps: int = 30000
    spatial_lr_scale: float = 1.0
    means_lr: float = 1.6e-4
    means_lr_final: float = 1.6e-6
    features_dc_lr: float = 2.5e-3
    features_rest_lr: float = 2.5e-3 / 20
    opacities_lr: float = 0.05
    scales_lr: float = 5e-3
    quats_lr: float = 1e-3
    camera_opt_lr: float = 1e-4
    camera_opt_lr_final: float = 5e-7
    camera_opt_warmup: int = 1000
    deform_lr: float = 1.6e-4
    deform_lr_final: float = 1.6e-6
    control_lr: float = 1.6e-4
    control_lr_final: float = 1.6e-6
    bilateral_grid_lr: float = 5e-3
    bilateral_grid_lr_final: float = 1e-4
    control_max_steps: int = 15000


def _adam(lr) -> optax.GradientTransformation:
    return optax.adam(lr, b1=0.9, b2=0.999, eps=ADAM_EPS)


def make_optimizers(cfg: OptimizersConfig) -> Dict[str, optax.GradientTransformation]:
    """Per-group transforms. LR factors 5x on means/deform/control mirror the
    reference config's `1.6e-4 * 5` with spatial_lr_scale folded in."""
    s = cfg.spatial_lr_scale
    return {
        "means": _adam(
            exponential_decay_schedule(
                cfg.means_lr * 5 * s, cfg.means_lr_final * 5 * s, cfg.max_steps
            )
        ),
        "features_dc": _adam(cfg.features_dc_lr),
        "features_rest": _adam(cfg.features_rest_lr),
        "opacities": _adam(cfg.opacities_lr),
        "scales": _adam(cfg.scales_lr),
        "quats": _adam(cfg.quats_lr),
        "camera_opt": _adam(
            exponential_decay_schedule(
                cfg.camera_opt_lr,
                cfg.camera_opt_lr_final,
                cfg.max_steps,
                warmup_steps=cfg.camera_opt_warmup,
                lr_pre_warmup=1e-12,
            )
        ),
        "deform": _adam(
            exponential_decay_schedule(
                cfg.deform_lr * 5 * s, cfg.deform_lr_final * s, cfg.max_steps
            )
        ),
        "control": _adam(
            exponential_decay_schedule(
                cfg.control_lr * 5 * s, cfg.control_lr_final * s, cfg.control_max_steps
            )
        ),
        # nerfstudio splatfacto's bilateral-grid group (enabled alongside
        # use_bilateral_grid; the reference config has no explicit entry)
        "bilateral_grid": _adam(
            exponential_decay_schedule(
                cfg.bilateral_grid_lr, cfg.bilateral_grid_lr_final, cfg.max_steps
            )
        ),
    }


def init_opt_states(
    optimizers: Dict[str, optax.GradientTransformation], params_by_group: Dict[str, Any]
) -> Dict[str, Any]:
    return {
        name: optimizers[name].init(params_by_group[name])
        for name in params_by_group
        if name in optimizers
    }


def apply_group_updates(
    optimizers: Dict[str, optax.GradientTransformation],
    opt_states: Dict[str, Any],
    params_by_group: Dict[str, Any],
    grads_by_group: Dict[str, Any],
):
    """Apply per-group Adam updates. Returns (new_params, new_states)."""
    new_params = {}
    new_states = {}
    for name, p in params_by_group.items():
        g = grads_by_group[name]
        updates, new_state = optimizers[name].update(g, opt_states[name], p)
        new_params[name] = optax.apply_updates(p, updates)
        new_states[name] = new_state
    return new_params, new_states
