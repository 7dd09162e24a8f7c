"""Reference (oracle) rasterizer: pure-jnp, differentiable by autodiff.

Slow but obviously correct replacement for gsplat's `rasterize_to_pixels`
CUDA kernels, mirroring their exact compositing semantics
(reference call contract: freegaussian_model.py:847-868):

  - per-pixel front-to-back alpha compositing in tile-local depth order
  - alpha = min(0.999, opacity * exp(-sigma)), sigma from the conic
  - skip if sigma < 0 or alpha < 1/255
  - terminate the pixel when the *next* transmittance would drop <= 1e-4
    (the terminating Gaussian itself is not composited)
  - a Gaussian only contributes to pixels of tiles its 3-sigma bbox overlaps
    (tile binning), even where exp(-sigma) is non-negligible

This module is the numerical oracle the Pallas kernels are tested against,
and is itself fast enough for the CPU-runnable tiny-scene configs. It is
fully vectorized: the compositing order is expressed as a cumulative product
over the depth-sorted Gaussian axis, which XLA turns into a parallel scan.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

ALPHA_THRESHOLD = 1.0 / 255.0
TRANSMITTANCE_EPS = 1e-4
MAX_ALPHA = 0.999


def depth_sort_order(depths: jax.Array, radii: jax.Array) -> jax.Array:
    """Depth-ascending order with culled Gaussians (radii==0) pushed to the end."""
    key = jnp.where(radii > 0, depths, jnp.inf)
    return jnp.argsort(key)


def tile_bounds(
    means2d: jax.Array, radii: jax.Array, tile_size: int, tiles_w: int, tiles_h: int
):
    """Inclusive-exclusive tile ranges each Gaussian overlaps (gsplat isect_tiles)."""
    r = radii.astype(means2d.dtype)
    tmin_x = jnp.clip(jnp.floor((means2d[..., 0] - r) / tile_size), 0, tiles_w).astype(jnp.int32)
    tmax_x = jnp.clip(jnp.ceil((means2d[..., 0] + r) / tile_size), 0, tiles_w).astype(jnp.int32)
    tmin_y = jnp.clip(jnp.floor((means2d[..., 1] - r) / tile_size), 0, tiles_h).astype(jnp.int32)
    tmax_y = jnp.clip(jnp.ceil((means2d[..., 1] + r) / tile_size), 0, tiles_h).astype(jnp.int32)
    return tmin_x, tmax_x, tmin_y, tmax_y


@partial(jax.jit, static_argnames=("width", "height", "tile_size", "pixel_chunk"))
def rasterize_pixels_reference(
    means2d: jax.Array,  # (N, 2)
    conics: jax.Array,  # (N, 3)
    colors: jax.Array,  # (N, C)
    opacities: jax.Array,  # (N,)
    depths: jax.Array,  # (N,) sort key (camera z)
    radii: jax.Array,  # (N,) int32; 0 == culled
    width: int,
    height: int,
    tile_size: int = 16,
    pixel_chunk: int = 4096,
):
    """Returns (render (H, W, C), alpha (H, W, 1), final_T (H, W))."""
    n = means2d.shape[0]
    c = colors.shape[-1]
    tiles_w = -(-width // tile_size)
    tiles_h = -(-height // tile_size)

    order = depth_sort_order(depths, radii)
    means2d_s = means2d[order]
    conics_s = conics[order]
    colors_s = colors[order]
    opac_s = opacities[order]
    radii_s = radii[order]

    tminx, tmaxx, tminy, tmaxy = tile_bounds(means2d_s, radii_s, tile_size, tiles_w, tiles_h)
    valid = radii_s > 0

    # Pixel-center coordinates, flattened.
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=means2d.dtype),
        jnp.arange(width, dtype=means2d.dtype),
        indexing="ij",
    )
    px = (xs + 0.5).reshape(-1)
    py = (ys + 0.5).reshape(-1)
    tile_x = (xs.reshape(-1) // tile_size).astype(jnp.int32)
    tile_y = (ys.reshape(-1) // tile_size).astype(jnp.int32)

    def render_chunk(args):
        px_c, py_c, tx_c, ty_c = args  # (P,)
        dx = means2d_s[None, :, 0] - px_c[:, None]  # (P, N)
        dy = means2d_s[None, :, 1] - py_c[:, None]
        a = conics_s[None, :, 0]
        b = conics_s[None, :, 1]
        cc = conics_s[None, :, 2]
        sigma = 0.5 * (a * dx * dx + cc * dy * dy) + b * dx * dy
        alpha = jnp.minimum(MAX_ALPHA, opac_s[None, :] * jnp.exp(-sigma))

        in_tile = (
            (tx_c[:, None] >= tminx[None, :])
            & (tx_c[:, None] < tmaxx[None, :])
            & (ty_c[:, None] >= tminy[None, :])
            & (ty_c[:, None] < tmaxy[None, :])
        )
        vis = in_tile & valid[None, :] & (sigma >= 0) & (alpha >= ALPHA_THRESHOLD)
        alpha_eff = jnp.where(vis, alpha, 0.0)

        one_minus = 1.0 - alpha_eff
        incl_T = jnp.cumprod(one_minus, axis=-1)  # T after compositing n
        excl_T = incl_T / one_minus  # T before compositing n (alpha<=0.999 => safe)
        # Early termination: the first Gaussian whose inclusion would push T
        # below the threshold terminates the pixel and is itself skipped.
        terminated = jax.lax.cummax((incl_T <= TRANSMITTANCE_EPS).astype(jnp.int32), axis=1) > 0
        w = jnp.where(vis & ~terminated, alpha_eff * excl_T, 0.0)  # (P, N)

        # HIGHEST precision: on TPU a default-precision matmul truncates the
        # f32 inputs to bf16 on the MXU — this is the ORACLE, it must stay
        # f32-accurate on every backend.
        render = jnp.matmul(
            w, colors_s, precision=jax.lax.Precision.HIGHEST
        )  # (P, C)
        alpha_out = jnp.sum(w, axis=-1)  # (P,)
        return render, alpha_out

    total = height * width
    pad = (-total) % pixel_chunk
    px_p = jnp.pad(px, (0, pad))
    py_p = jnp.pad(py, (0, pad))
    tx_p = jnp.pad(tile_x, (0, pad))
    ty_p = jnp.pad(tile_y, (0, pad))
    n_chunks = (total + pad) // pixel_chunk
    reshape = lambda v: v.reshape(n_chunks, pixel_chunk)
    render, alpha = jax.lax.map(
        render_chunk, (reshape(px_p), reshape(py_p), reshape(tx_p), reshape(ty_p))
    )
    render = render.reshape(-1, c)[:total].reshape(height, width, c)
    alpha = alpha.reshape(-1)[:total].reshape(height, width, 1)
    return render, alpha, (1.0 - alpha[..., 0])
