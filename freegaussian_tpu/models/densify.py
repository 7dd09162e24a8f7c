"""Adaptive density control (densify / split / duplicate / cull) on
padded-capacity arrays, fully jittable.

Semantics match the reference engine (freegaussian_model.py:369-571):
  - per-step stats: accumulate absgrad norms, visibility counts, max 2D radius
  - every `refine_every` steps after `refine_start`:
      split  (screen-large or world-large & high-grad): 2 samples drawn from
             the Gaussian itself, scales / 1.6, source culled
      dup    (small & high-grad): copy
      cull   (low opacity; post-warmup also world-huge / screen-huge)
      opacity reset every reset_alpha_every * refine_every steps with Adam
             moment reset
  - optimizer-state surgery: the reference slices/zero-appends Adam moment
    rows; with fixed capacity this becomes zeroing moment rows of (re)used
    slots.

The dynamic reallocation of the reference is replaced by free-slot
allocation: dead slots are enumerated with a stable argsort and new Gaussians
are scattered into them (drop on overflow). This keeps every shape static so
the whole train step, including refinement, compiles once.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from ..ops.math import quat_to_rotmat
from .gaussians import GaussianParams


@dataclasses.dataclass(frozen=True)
class DensifyConfig:
    """(mirrors FreeGaussianModelConfig, freegaussian_model.py:56-99)"""

    refine_start: int = 500
    refine_every: int = 100
    reset_alpha_every: int = 30
    stop_split_at: int = 15000
    stop_screen_size_at: int = 4000
    densify_grad_thresh: float = 0.0008
    densify_size_thresh: float = 0.01
    n_split_samples: int = 2
    cull_alpha_thresh: float = 0.1
    cull_scale_thresh: float = 0.5
    cull_screen_size: float = 0.15
    split_screen_size: float = 0.05
    continue_cull_post_densification: bool = True


@flax.struct.dataclass
class DensifyState:
    xys_grad_norm: jax.Array  # (N,)
    vis_counts: jax.Array  # (N,)
    max_2dsize: jax.Array  # (N,)

    @classmethod
    def create(cls, capacity: int) -> "DensifyState":
        return cls(
            xys_grad_norm=jnp.zeros(capacity),
            vis_counts=jnp.ones(capacity),
            max_2dsize=jnp.zeros(capacity),
        )


def update_stats(
    state: DensifyState,
    radii: jax.Array,
    absgrad: jax.Array,
    last_size: Tuple[int, int],
) -> DensifyState:
    """Accumulate per-step densification statistics.

    (ref: freegaussian_model.py:369-392 after_train_iter)
    """
    visible = radii > 0
    grads = jnp.linalg.norm(absgrad, axis=-1)
    max_hw = float(max(last_size))
    return state.replace(
        vis_counts=state.vis_counts + visible,
        xys_grad_norm=state.xys_grad_norm + jnp.where(visible, grads, 0.0),
        max_2dsize=jnp.where(
            visible,
            jnp.maximum(state.max_2dsize, radii.astype(jnp.float32) / max_hw),
            state.max_2dsize,
        ),
    )


def _free_slots(alive: jax.Array) -> jax.Array:
    """Indices of dead slots, in stable index order."""
    return jnp.argsort(alive.astype(jnp.int32), stable=True)


def _scatter_new(
    params: GaussianParams,
    alive: jax.Array,
    new_vals: GaussianParams,
    valid: jax.Array,
    free_idx: jax.Array,
    offset: jax.Array,
    num_free: jax.Array,
) -> Tuple[GaussianParams, jax.Array, jax.Array]:
    """Scatter `new_vals[i]` (where valid[i]) into the next free slots.

    Returns (params, alive, n_allocated). Overflow beyond the free-slot pool
    is dropped (scatter mode='drop'). `num_free` is the free-slot count of the
    alive mask that built `free_idx` — it must NOT be re-derived from the
    updated mask across chained calls (pos indexes the original free list)."""
    capacity = alive.shape[0]
    rank = jnp.cumsum(valid) - 1  # position among valid candidates
    pos = offset + rank
    can_place = valid & (pos < num_free)
    target = jnp.where(can_place, free_idx[jnp.clip(pos, 0, capacity - 1)], capacity)
    out = {}
    for name, arr in params.items():
        out[name] = arr.at[target].set(new_vals[name], mode="drop")
    alive = alive.at[target].set(True, mode="drop")
    return out, alive, jnp.sum(can_place)


def refine(
    cfg: DensifyConfig,
    params: GaussianParams,
    alive: jax.Array,
    state: DensifyState,
    key: jax.Array,
    step: jax.Array,
    last_size: Tuple[int, int],
    num_train_data: int,
) -> Tuple[GaussianParams, jax.Array, DensifyState, Dict[str, jax.Array]]:
    """One refinement pass (call when step % refine_every == 0, step >=
    refine_start). Returns (params, alive, reset stats, surgery info).

    surgery info: {"moment_zero_mask": (N,) bool rows whose Adam moments must
    be zeroed, "reset_opacity_moments": () bool}.
    """
    capacity = alive.shape[0]
    max_hw = float(max(last_size))
    reset_interval = cfg.reset_alpha_every * cfg.refine_every

    do_densify = (step < cfg.stop_split_at) & (
        (step % reset_interval) > (num_train_data + cfg.refine_every)
    )
    scale_max = jnp.max(jnp.exp(params["scales"]), axis=-1)

    # --- densification candidates -----------------------------------------
    avg_grad = state.xys_grad_norm / state.vis_counts * 0.5 * max_hw
    high_grads = avg_grad > cfg.densify_grad_thresh
    splits = (scale_max > cfg.densify_size_thresh) & high_grads
    splits = jnp.where(
        step < cfg.stop_screen_size_at,
        splits | (state.max_2dsize > cfg.split_screen_size),
        splits,
    )
    splits &= alive & do_densify
    dups = (scale_max <= cfg.densify_size_thresh) & high_grads & alive & do_densify

    # Split samples: x = mean + R(quat) @ (exp(scale) * eps), scales / 1.6.
    # (ref: freegaussian_model.py:524-560)
    from ..ops.math import safe_norm

    quats_n = params["quats"] / safe_norm(params["quats"], axis=-1, keepdims=True)
    rots = quat_to_rotmat(quats_n)
    scale_lin = jnp.exp(params["scales"])
    k1, k2 = jax.random.split(key)
    size_fac = 1.6

    def split_sample(k):
        eps = jax.random.normal(k, params["means"].shape)
        offs = jnp.einsum("nij,nj->ni", rots, scale_lin * eps)
        return {
            "means": params["means"] + offs,
            "scales": jnp.log(jnp.clip(scale_lin / size_fac, 1e-12, None)),
            "quats": params["quats"],
            "features_dc": params["features_dc"],
            "features_rest": params["features_rest"],
            "opacities": params["opacities"],
        }

    dup_vals = params  # plain copies

    # --- culling ----------------------------------------------------------
    # (ref: freegaussian_model.py:493-522)
    culls = (jax.nn.sigmoid(params["opacities"][..., 0]) < cfg.cull_alpha_thresh)
    post_warmup = step > cfg.refine_every * cfg.reset_alpha_every
    toobig_world = scale_max > cfg.cull_scale_thresh
    toobig_screen = (state.max_2dsize > cfg.cull_screen_size) & (
        step < cfg.stop_screen_size_at
    )
    culls = culls | (post_warmup & (toobig_world | toobig_screen))
    # split sources are removed after their samples are placed
    culls = culls | splits
    do_cull = do_densify | (
        (step >= cfg.stop_split_at) & cfg.continue_cull_post_densification
    )
    culls = culls & alive & do_cull

    new_alive = alive & ~culls
    moment_zero = culls  # removed rows lose their state

    # Shrink split sources' scales in place before they are culled is moot
    # (they are culled), but keep reference parity for the copied samples
    # above (already /1.6).

    # The reference culls AFTER appending, so freshly added Gaussians that
    # already meet the cull criteria are removed immediately
    # (freegaussian_model.py:465 cull over the concatenated array). Apply the
    # same criteria to candidate validity instead.
    low_opacity = jax.nn.sigmoid(params["opacities"][..., 0]) < cfg.cull_alpha_thresh
    split_world_big = post_warmup & (scale_max / size_fac > cfg.cull_scale_thresh)
    dup_world_big = post_warmup & toobig_world
    splits_valid = splits & ~(low_opacity | split_world_big)
    dups_valid = dups & ~(low_opacity | dup_world_big)

    free_idx = _free_slots(new_alive)
    num_free = jnp.sum(~new_alive)
    params_out = params
    n_alloc = jnp.asarray(0)
    for sample_vals, valid in (
        (split_sample(k1), splits_valid),
        (split_sample(k2), splits_valid),
        (dup_vals, dups_valid),
    ):
        params_out, new_alive, placed = _scatter_new(
            params_out, new_alive, sample_vals, valid, free_idx, n_alloc, num_free
        )
        n_alloc = n_alloc + placed

    # New slots need zeroed Adam moments. Their slot indices are the first
    # n_alloc entries of free_idx.
    slot_rank = jnp.argsort(free_idx)  # inverse permutation: slot -> rank
    moment_zero = moment_zero | (slot_rank < n_alloc)

    # --- opacity reset ----------------------------------------------------
    # (ref: freegaussian_model.py:475-487)
    do_reset = (step < cfg.stop_split_at) & (
        (step % reset_interval) == cfg.refine_every
    )
    reset_logit = jnp.log(
        2 * cfg.cull_alpha_thresh / (1 - 2 * cfg.cull_alpha_thresh)
    )
    params_out = dict(params_out)
    params_out["opacities"] = jnp.where(
        do_reset,
        jnp.minimum(params_out["opacities"], reset_logit),
        params_out["opacities"],
    )

    info = {
        "moment_zero_mask": moment_zero,
        "reset_opacity_moments": do_reset,
        "num_culled": jnp.sum(culls),
        "num_split": jnp.sum(splits),
        "num_dup": jnp.sum(dups),
        "num_alive": jnp.sum(new_alive),
    }
    return params_out, new_alive, DensifyState.create(capacity), info


def zero_moment_rows(opt_state, mask: jax.Array, param_template: jax.Array):
    """Zero Adam moment rows selected by `mask` inside an optax state pytree.

    Applies to every leaf whose shape matches the parameter's shape (mu, nu).
    """

    def fix(leaf):
        if hasattr(leaf, "shape") and leaf.shape == param_template.shape:
            expand = mask.reshape(mask.shape + (1,) * (leaf.ndim - 1))
            return jnp.where(expand, jnp.zeros_like(leaf), leaf)
        return leaf

    return jax.tree.map(fix, opt_state)
