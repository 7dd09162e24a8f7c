"""Flow-derivative ops: lifting rendered 2D Gaussians through interflow, and
rendered-2D-flow supervision.

The reference defines `query_3d_gaussian_flow` / `query_3d_gaussian_flow_grid`
(freegaussian_model.py:662-751) but never wires them into a loss; the paper's
flow-derivative supervision must be reconstructed (SURVEY §7 hard part (d)).
Two complementary losses are provided:

1. `query_3d_gaussian_flow`: advect projected Gaussian centers through the
   interflow field, sample depth at the advected point, backproject through
   K^-1 and the previous camera to canonical 3D — a per-Gaussian 3D target
   that supervises the deformation field at the paired frame's time.
   NOTE the reference's unwired version contains an H/W axis swap
   (`_, w, h, _ = Z0.shape`, :677) and transforms camera-space points by
   inverse(c2w) (:689) — this implementation uses the dimensionally correct
   form (camera -> world via c2w).

2. `render_flow_channels`: per-Gaussian screen-space motion
   (means2d(t) - means2d(t0)) composited through the tile rasterizer like
   color — a rendered 2D flow image that is differentiable w.r.t. Gaussian
   means / covariances and both camera poses (the BASELINE "flow-derivative
   kernel"). Supervised directly against interflow.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .math import bilinear_interp


def query_3d_gaussian_flow(
    means2d: jax.Array,  # (N, 2) projected centers in the current camera
    Z0: jax.Array,  # (H, W, 1) depth map of the paired (previous) camera
    interflow: jax.Array,  # (H, W, 2) object-motion flow current -> paired
    c2w_prev: jax.Array,  # (3|4, 4) paired camera OpenCV c2w (camera -> world)
    K: jax.Array,  # (3, 3)
    *,
    valid: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Lift Gaussian centers through interflow to 3D points in world space.

    Returns {"p_world": (N, 3), "valid": (N,)} with zeros for off-screen
    Gaussians (matching the reference's zero-fill, :692-694).
    """
    h, w = Z0.shape[:2]
    x, y = means2d[:, 0], means2d[:, 1]
    inb = (x >= 0) & (x < w) & (y >= 0) & (y < h)
    if valid is not None:
        inb &= valid
    xs = jnp.where(inb, x, 0.0)
    ys = jnp.where(inb, y, 0.0)

    flow = bilinear_interp(interflow[None], xs[None], ys[None])[0]  # (N, 2)
    x2 = xs + flow[:, 0]
    y2 = ys + flow[:, 1]
    Z = bilinear_interp(Z0[None], x2[None], y2[None])[0, :, 0]  # (N,)

    Kinv = jnp.linalg.inv(K)
    pix_h = jnp.stack([x2, y2, jnp.ones_like(x2)], axis=-1)  # (N, 3)
    p_cam = (pix_h @ Kinv.T) * Z[:, None]  # (N, 3) in paired-camera coords

    R = c2w_prev[:3, :3]
    t = c2w_prev[:3, 3]
    p_world = p_cam @ R.T + t

    p_world = jnp.where(inb[:, None], p_world, 0.0)
    return {"p_world": p_world, "valid": inb}


def query_3d_gaussian_flow_grid(
    means2d: jax.Array,
    Z0: jax.Array,
    interflow: jax.Array,
    c2w_prev: jax.Array,
    K: jax.Array,
    *,
    grid_size: int = 16,
    step: int = 8,
    valid: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Patch variant: lift a step-spaced grid of points around each center
    (ref: freegaussian_model.py:698-751). Returns {"p_world": (N, P, 3)}."""
    h, w = Z0.shape[:2]
    offs = jnp.arange(step, grid_size // 2 + 1, step, dtype=means2d.dtype)
    offs = jnp.concatenate([-offs, offs])
    gy, gx = jnp.meshgrid(offs, offs, indexing="ij")
    gx = jnp.concatenate([gx.reshape(-1), jnp.zeros(1, means2d.dtype)])
    gy = jnp.concatenate([gy.reshape(-1), jnp.zeros(1, means2d.dtype)])

    def one(ox, oy):
        shifted = means2d + jnp.stack([ox, oy])
        shifted = jnp.clip(shifted, 0.0, jnp.asarray([w - 1.0, h - 1.0]))
        return query_3d_gaussian_flow(
            shifted, Z0, interflow, c2w_prev, K, valid=valid
        )["p_world"]

    p = jax.vmap(one)(gx, gy)  # (P, N, 3)
    base = query_3d_gaussian_flow(means2d, Z0, interflow, c2w_prev, K, valid=valid)
    return {"p_world": jnp.moveaxis(p, 0, 1), "valid": base["valid"]}


def flow_supervision_loss(
    means_deformed_prev: jax.Array,  # (N, 3) deform-field output at paired time
    lifted: Dict[str, jax.Array],
    radii: jax.Array,
    *,
    alive: Optional[jax.Array] = None,
) -> jax.Array:
    """L1 between the deformation field's prediction at the paired time and
    the interflow-lifted 3D targets, over visible Gaussians."""
    mask = lifted["valid"] & (radii > 0)
    if alive is not None:
        mask &= alive
    diff = jnp.abs(means_deformed_prev - jax.lax.stop_gradient(lifted["p_world"]))
    per_g = jnp.sum(diff, axis=-1)
    denom = jnp.clip(jnp.sum(mask), 1, None)
    return jnp.sum(jnp.where(mask, per_g, 0.0)) / denom


def rendered_flow_loss(
    rendered_flow: jax.Array,  # (H, W, 2) composited screen-space motion
    interflow: jax.Array,  # (H, W, 2) target
    alpha: jax.Array,  # (H, W, 1)
) -> jax.Array:
    """Masked L1 on the rendered 2D flow; interflow points current->paired
    while the rendered motion is paired->current, so the target is negated."""
    w = jax.lax.stop_gradient(alpha)
    return jnp.sum(w * jnp.abs(rendered_flow - (-interflow))) / jnp.clip(
        jnp.sum(w) * 2.0, 1.0, None
    )
