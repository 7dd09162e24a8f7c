"""Bilateral guided grid for per-image ISP/appearance correction.

JAX port of the technique the reference enables with `use_bilateral_grid`
(freegaussian_model.py:122-125, :879-882: nerfstudio's BilateralGrid from
"Bilateral Guided Radiance Field Processing"): each training image owns a
(X, Y, W) grid of 3x4 affine color transforms; the rendered image is sliced
through the grid at (x/W, y/H, luminance) with trilinear interpolation and
transformed per pixel. Total-variation regularization over the grids
(`tv_loss`, freegaussian_model.py:989)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LUMA = jnp.asarray([0.299, 0.587, 0.114])


def init_bilateral_grids(num_images: int, grid_x: int = 16, grid_y: int = 16, grid_w: int = 8) -> jax.Array:
    """(num_images, grid_w, grid_y, grid_x, 12): identity affine transforms."""
    eye = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1).reshape(12)
    return jnp.broadcast_to(
        eye, (num_images, grid_w, grid_y, grid_x, 12)
    ).astype(jnp.float32)


def slice_bilateral_grid(grids: jax.Array, image_idx, rgb: jax.Array) -> jax.Array:
    """Apply image_idx's grid to an (H, W, 3) rendered image."""
    grid = grids[image_idx]  # (W, Y, X, 12)
    gw, gy, gx, _ = grid.shape
    h, w = rgb.shape[:2]

    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    u = (xs + 0.5) / w * (gx - 1)
    v = (ys + 0.5) / h * (gy - 1)
    guide = jnp.clip(jnp.einsum("hwc,c->hw", rgb, _LUMA), 0.0, 1.0) * (gw - 1)

    def floor_frac(a, size):
        a0 = jnp.clip(jnp.floor(a), 0, size - 1).astype(jnp.int32)
        a1 = jnp.minimum(a0 + 1, size - 1)
        return a0, a1, a - a0

    u0, u1, fu = floor_frac(u, gx)
    v0, v1, fv = floor_frac(v, gy)
    g0, g1, fg = floor_frac(guide, gw)

    def g(a, b, c):
        return grid[c, b, a]  # (H, W, 12)

    def lerp(x, y, t):
        return x + (y - x) * t[..., None]

    c00 = lerp(g(u0, v0, g0), g(u1, v0, g0), fu)
    c10 = lerp(g(u0, v1, g0), g(u1, v1, g0), fu)
    c01 = lerp(g(u0, v0, g1), g(u1, v0, g1), fu)
    c11 = lerp(g(u0, v1, g1), g(u1, v1, g1), fu)
    c0 = lerp(c00, c10, fv)
    c1 = lerp(c01, c11, fv)
    affine = lerp(c0, c1, fg).reshape(h, w, 3, 4)

    rgb_h = jnp.concatenate([rgb, jnp.ones_like(rgb[..., :1])], axis=-1)
    return jnp.einsum("hwij,hwj->hwi", affine, rgb_h)


def total_variation_loss(grids: jax.Array) -> jax.Array:
    """Mean squared difference between neighboring grid cells on all 3 axes."""
    tv = 0.0
    for axis in (1, 2, 3):
        d = jnp.diff(grids, axis=axis)
        tv = tv + jnp.mean(d * d)
    return tv
