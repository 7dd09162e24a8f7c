"""Tile binning: expand Gaussians into (tile, depth)-sorted intersections.

TPU-native replacement for gsplat's `isect_tiles` + `isect_offset_encode`
CUDA kernels (CUB radix sort). All shapes are static (capacity-padded) so the
whole pipeline traces once under jit:

  1. per-Gaussian overlapped-tile counts from the 3-sigma screen bbox
  2. exclusive cumsum -> per-Gaussian slot offsets
  3. slot -> Gaussian inversion via searchsorted over the capacity range
     (the XLA-friendly equivalent of a variable-length repeat)
  4. two-key lexicographic `lax.sort` on (tile_id, depth)
  5. per-tile offset table via searchsorted

Overflowing the static capacity drops the deepest intersections of the
largest Gaussians (reported via `num_isects` so callers can grow capacity).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .rasterize_ref import tile_bounds


class Intersections(NamedTuple):
    gauss_ids: jax.Array  # (I_CAP,) int32 Gaussian index per intersection; N for padding
    tile_ids: jax.Array  # (I_CAP,) int32 tile index (row-major); num_tiles for padding
    tile_offsets: jax.Array  # (num_tiles + 1,) int32 range of each tile in the sorted arrays
    num_isects: jax.Array  # () int32 true intersection count (pre-capacity-clamp)
    num_tiles: int
    tiles_w: int
    tiles_h: int


def build_intersections(
    means2d: jax.Array,
    radii: jax.Array,
    depths: jax.Array,
    width: int,
    height: int,
    tile_size: int,
    capacity: int,
) -> Intersections:
    n = means2d.shape[0]
    tiles_w = -(-width // tile_size)
    tiles_h = -(-height // tile_size)
    num_tiles = tiles_w * tiles_h

    tminx, tmaxx, tminy, tmaxy = tile_bounds(means2d, radii, tile_size, tiles_w, tiles_h)
    dx = tmaxx - tminx
    dy = tmaxy - tminy
    counts = jnp.where(radii > 0, dx * dy, 0)  # (N,)
    total = jnp.sum(counts)

    offsets = jnp.cumsum(counts) - counts  # exclusive cumsum (N,)

    # Slot -> Gaussian: for slot i, the owning Gaussian is the last g with
    # offsets[g] <= i. searchsorted on the monotone offsets array.
    slots = jnp.arange(capacity, dtype=jnp.int32)
    gid = jnp.clip(
        jnp.searchsorted(offsets, slots, side="right") - 1, 0, n - 1
    ).astype(jnp.int32)
    local = slots - offsets[gid]  # index within the Gaussian's tile range
    slot_valid = slots < jnp.minimum(total, capacity)

    gdx = dx[gid]
    tile_x = tminx[gid] + jnp.where(gdx > 0, local % jnp.maximum(gdx, 1), 0)
    tile_y = tminy[gid] + jnp.where(gdx > 0, local // jnp.maximum(gdx, 1), 0)
    tile_id = (tile_y * tiles_w + tile_x).astype(jnp.int32)

    tile_id = jnp.where(slot_valid, tile_id, num_tiles)
    gid = jnp.where(slot_valid, gid, n)
    depth_key = jnp.where(slot_valid, depths[jnp.clip(gid, 0, n - 1)], jnp.inf)

    tile_sorted, _, gid_sorted = jax.lax.sort(
        (tile_id, depth_key.astype(jnp.float32), gid), num_keys=2
    )

    tile_offsets = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    return Intersections(
        gauss_ids=gid_sorted,
        tile_ids=tile_sorted,
        tile_offsets=tile_offsets,
        num_isects=total.astype(jnp.int32),
        num_tiles=num_tiles,
        tiles_w=tiles_w,
        tiles_h=tiles_h,
    )
