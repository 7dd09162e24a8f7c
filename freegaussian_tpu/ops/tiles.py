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

# bbox-tile budget for the pre-expansion ellipse cull (lane-aligned)
PRECULL_T_MAX = 32

# Single-key binning sort: pack (tile_id, depth) into ONE int32 key —
# tile_id (11 bits) << 20 | positive-f32 depth bits >> 11 (bit order of
# positive floats is monotone). Cuts the lexicographic 2-key sort's operand
# count (3 arrays, 2 keys -> 2 arrays, 1 key). NOT depth-exact: gaussians in
# the same tile whose depths agree in the top 20 bits (~4 ulp at any
# magnitude... i.e. within 2^-12 relative) composite in expansion order
# instead of true depth order — an ulp-class image change on real scenes,
# but a CONTRACT change vs the oracle. Default ON since r3: +1% step on
# the honest bench and parity-suite clean at the 2^-12 tie granularity
# (docs/NOTES_ROUND3.md); set False to restore oracle-exact tie order.
# The num_tiles < 2^11 guard below falls back to the exact 2-key sort
# automatically on images with more than 2047 tiles.
SINGLE_KEY_SORT = True

# Slot -> Gaussian inversion implementation (the expansion's variable-length
# repeat). "scatter": scatter each Gaussian's index at its first slot +
# cummax fill (XLA scatter costs ~7 ns/write — 0.72 ms at the bench point).
# "sort": gid[s] = searchsorted(offsets, s, side="right") - 1 via the
# sort-based merge (one (N + capacity) co-sort; the slot queries are already
# sorted, so the merge is linear work) — equivalent for empty Gaussians
# because the owner of slot s is exactly the LAST g with offsets[g] <= s.
# A/B knob for hardware.
SLOT_INVERT = "scatter"


class Intersections(NamedTuple):
    gauss_ids: jax.Array  # (I_CAP,) int32 Gaussian index per intersection; N for padding
    tile_ids: jax.Array  # (I_CAP,) int32 tile index (row-major); num_tiles for padding
    tile_offsets: jax.Array  # (num_tiles + 1,) int32 range of each tile in the sorted arrays
    num_isects: jax.Array  # () int32 true intersection count (pre-capacity-clamp)
    counts: jax.Array  # (N,) int32 KEPT slots per Gaussian (post ellipse-cull)
    offsets: jax.Array  # (N,) int32 exclusive cumsum of counts — the group
    # boundaries of the sorted-by-gid gradient reduction (_gather_rows)
    num_tiles: int
    tiles_w: int
    tiles_h: int


def _ellipse_tile_cull(
    rows: jax.Array, tile_x: jax.Array, tile_y: jax.Array, tile_size: int
) -> jax.Array:
    """Per-slot form of `_ellipse_cull_test` over gathered packed rows."""
    return _ellipse_cull_test(
        rows[:, 5], rows[:, 6], rows[:, 7], rows[:, 8], rows[:, 9],
        rows[:, 10], tile_x, tile_y, tile_size,
    )


def _ellipse_cull_test(
    ca, cb, cd, qmax, mx, my, tile_x, tile_y, tile_size: int
) -> jax.Array:
    """True where the Gaussian's threshold ellipse cannot touch the tile:
    ``min over the tile's pixel-center rect of q(p)`` (with
    ``q = a dx^2 + 2b dx dy + c dy^2``, the kernels' ``2 * sigma``) exceeds
    ``qmax = 2 ln(op / ALPHA_THRESHOLD)``. The continuous minimum lower-bounds
    every pixel-center value, and a safety margin covers f32 rounding between
    this bound and the kernels' own sigma arithmetic, so culled pairs are
    exactly the ones the kernels would skip at EVERY pixel.

    All arguments broadcast; the rect min is at the mean's metric projection:
    interior if the mean is inside, else the best of the four edges (each a
    1D quadratic clamped to [0, 1])."""
    ts = float(tile_size)
    x0 = tile_x.astype(jnp.float32) * ts + 0.5
    x1 = x0 + (ts - 1.0)
    y0 = tile_y.astype(jnp.float32) * ts + 0.5
    y1 = y0 + (ts - 1.0)

    inside = (mx >= x0) & (mx <= x1) & (my >= y0) & (my <= y1)

    def edge_min(ex, ey, vx, vy):
        dx0 = ex - mx
        dy0 = ey - my
        q0 = ca * dx0 * dx0 + 2.0 * cb * dx0 * dy0 + cd * dy0 * dy0
        g = ca * dx0 * vx + cb * (dx0 * vy + dy0 * vx) + cd * dy0 * vy
        h = ca * vx * vx + 2.0 * cb * vx * vy + cd * vy * vy
        s = jnp.clip(-g / jnp.maximum(h, 1e-12), 0.0, 1.0)
        # magnitude of the near-cancelling terms: the f32 error of the sum
        # scales with this, not with qmax (needle conics at bbox corners
        # reach q0 ~ qmax * aspect^2 with a tiny true minimum)
        mag = q0 + 2.0 * jnp.abs(s * g) + s * s * h
        return q0 + 2.0 * s * g + s * s * h, mag

    w = x1 - x0
    zero = jnp.zeros_like(w)
    q_b, m_b = edge_min(x0, y0, w, zero)
    q_t, m_t = edge_min(x0, y1, w, zero)
    q_l, m_l = edge_min(x0, y0, zero, w)
    q_r, m_r = edge_min(x1, y0, zero, w)
    min_q = jnp.minimum(jnp.minimum(q_b, q_t), jnp.minimum(q_l, q_r))
    min_q = jnp.where(inside, 0.0, min_q)
    mag = jnp.maximum(jnp.maximum(m_b, m_t), jnp.maximum(m_l, m_r))

    # only cull for genuinely PSD conics (the kernels' sigma>=0 skip handles
    # degenerate ones); margin: absolute + relative-to-qmax + the
    # cancellation term (~30 f32 ops -> ~1e-5 relative on `mag`)
    psd = (ca > 0) & (ca * cd - cb * cb > 0)
    margin = 1e-3 + 1e-4 * qmax + 1e-5 * mag
    return psd & (min_q > qmax + margin)


def build_intersections(
    means2d: jax.Array,
    radii: jax.Array,
    depths: jax.Array,
    width: int,
    height: int,
    tile_size: int,
    capacity: int,
    conics: jax.Array | None = None,
    opacities: jax.Array | None = None,
    precull: bool = True,
) -> Intersections:
    """`conics` (N, 3) + `opacities` (N,) enable the EXACT per-(Gaussian,
    tile) ellipse cull: a tile none of whose pixel centers can reach
    ``alpha >= ALPHA_THRESHOLD`` contributes exactly zero to forward and
    backward (the pixel kernels skip such pairs), so dropping its slot is
    exact up to f32 summation-order ulps (slot removal regroups the kernels'
    chunked reductions). At the bench scene the bbox keeps ~2.7x more tiles
    than the ellipse touches (docs/NOTES_ROUND2.md census).

    With `precull` (default), Gaussians whose bbox fits PRECULL_T_MAX tiles
    are culled BEFORE slot assignment (dense bbox-grid test + kept-first
    table), so culled pairs never occupy expansion slots: `num_isects`
    counts kept pairs and overflow only drops real work. Bigger bboxes use
    the rectangle expansion with the post-cull."""
    n = means2d.shape[0]
    tiles_w = -(-width // tile_size)
    tiles_h = -(-height // tile_size)
    num_tiles = tiles_w * tiles_h

    tminx, tmaxx, tminy, tmaxy = tile_bounds(means2d, radii, tile_size, tiles_w, tiles_h)
    dx = tmaxx - tminx
    dy = tmaxy - tminy
    # Explicit depth <= 0 cull (gsplat semantics: z < near never rasterizes,
    # gsplat isect_tiles sorts only z > 0 survivors). Projection already
    # zeroes radii for z <= near_plane (projection.py), so this is normally
    # redundant — but callers may hand in externally-produced radii/depths,
    # and the single-key sort below bitcasts depth to int32, where a negative
    # float would break key monotonicity. Culling here (not clamping at the
    # key) keeps counts/offsets consistent for the gradient reduction.
    counts = jnp.where((radii > 0) & (depths > 0), dx * dy, 0)  # (N,) kept bbox tiles

    tile_tab = None
    small = None
    if conics is not None:
        from .rasterize_ref import ALPHA_THRESHOLD

        op = jax.lax.stop_gradient(opacities)
        con = jax.lax.stop_gradient(conics)
        # kernel skip: alpha = op * exp(-q/2) < T  <=>  q > 2 ln(op / T)
        qmax = 2.0 * jnp.log(jnp.maximum(op, 1e-30) / ALPHA_THRESHOLD)
        m2d = jax.lax.stop_gradient(means2d)

        if precull:
            # PRE-expansion cull for Gaussians whose bbox fits T_MAX tiles:
            # evaluate the ellipse test densely over the bbox grid, compact
            # the kept tile ids to the front of a per-Gaussian table (stable
            # lane sort), and count only kept tiles. Culled pairs then never
            # OCCUPY expansion slots, so `num_isects` (and hence the
            # caller's capacity sizing / overflow behavior) reflects real
            # work — at the bench scene this is -63% of slots
            # (docs/NOTES_ROUND2.md census). Bigger bboxes fall back to the
            # rectangle expansion + post-cull below.
            T = PRECULL_T_MAX
            jj = jnp.arange(T, dtype=jnp.int32)[None, :]
            dxm = jnp.maximum(dx, 1)[:, None]
            txg = tminx[:, None] + jj % dxm
            tyg = tminy[:, None] + jj // dxm
            small = counts <= T  # (N,)
            validj = jj < counts[:, None]
            cull = _ellipse_cull_test(
                con[:, 0:1], con[:, 1:2], con[:, 2:3], qmax[:, None],
                m2d[:, 0:1], m2d[:, 1:2], txg, tyg, tile_size,
            )
            keepj = validj & ~cull
            counts = jnp.where(
                small, jnp.sum(keepj.astype(jnp.int32), axis=1), counts
            )
            # kept-first stable compaction of the linear tile ids
            tile_lin = (tyg * tiles_w + txg).astype(jnp.int32)
            key = jnp.where(keepj, jj, T + jj)
            _, tile_tab = jax.lax.sort((key, tile_lin), num_keys=1, dimension=1)

    total = jnp.sum(counts)

    offsets = jnp.cumsum(counts) - counts  # exclusive cumsum (N,)

    # Slot -> Gaussian inversion (see SLOT_INVERT). The scatter form avoids
    # random-access gathers (the slow path on TPU): scatter each Gaussian's
    # index at its first slot, then a cummax fills the runs. Gaussians with
    # count == 0 share an offset with their successor; dropping them keeps
    # the scatter unique.
    slots = jnp.arange(capacity, dtype=jnp.int32)
    if SLOT_INVERT == "sort":
        gid = jnp.clip(
            jnp.searchsorted(
                offsets.astype(jnp.int32), slots, side="right", method="sort"
            ).astype(jnp.int32)
            - 1,
            0,
            n - 1,
        )
    else:
        g_idx = jnp.arange(n, dtype=jnp.int32)
        first_slot = jnp.where(counts > 0, offsets, capacity)
        mark = jnp.full((capacity,), -1, jnp.int32).at[first_slot].max(
            g_idx, mode="drop"
        )
        gid = jnp.clip(jax.lax.cummax(mark, axis=0), 0, n - 1)
    slot_valid = slots < jnp.minimum(total, capacity)

    # One packed row-gather instead of per-attribute scalar gathers.
    cols = [
        offsets.astype(jnp.float32),
        tminx.astype(jnp.float32),
        tminy.astype(jnp.float32),
        jnp.maximum(dx, 1).astype(jnp.float32),
        depths.astype(jnp.float32),
    ]
    if conics is not None:
        cols += [con[:, 0], con[:, 1], con[:, 2], qmax, m2d[:, 0], m2d[:, 1]]
    per_g = jnp.stack(cols, axis=-1)
    if tile_tab is not None:
        per_g = jnp.concatenate(
            [per_g, small[:, None].astype(jnp.float32), tile_tab.astype(jnp.float32)],
            axis=1,
        )
    # (N, 5|11|12+T) — tile coords / offsets / table ids are < 2^24, f32-exact
    rows = per_g[gid]  # (capacity, ...)
    # Column extraction bridge: slicing 1-D columns out of the (cap, D)
    # row-major gather output forces a (8,128)-tile -> T(1024) physical
    # re-layout PER COLUMN (~0.17 ms each on v5e — fusion.949 in
    # docs/NOTES_ROUND4.md). ONE (cap, D) -> (D, cap) transpose instead:
    # row slices of the transposed array are contiguous 1-D. (Computing the
    # expansion as (cap, 1) 2-D column math avoids the bridge entirely but
    # runs at 1/128 VPU lane utilization — measured -2.1M px/s, reverted.)
    rows_t = rows[:, :5].T  # (5, capacity)
    local = slots - rows_t[0].astype(jnp.int32)
    gdx = rows_t[3].astype(jnp.int32)
    tile_x = rows_t[1].astype(jnp.int32) + local % gdx
    tile_y = rows_t[2].astype(jnp.int32) + local // gdx
    tile_id = (tile_y * tiles_w + tile_x).astype(jnp.int32)

    if conics is not None:
        if tile_tab is not None:
            # small-bbox slots read their (pre-culled) tile from the table;
            # their counts are already exact, no post-adjustment needed
            small_row = rows[:, 11] > 0.5
            loc = jnp.clip(local, 0, PRECULL_T_MAX - 1)[:, None]
            tab_tile = jnp.take_along_axis(
                rows[:, 12 : 12 + PRECULL_T_MAX], loc, axis=1
            )[:, 0].astype(jnp.int32)
            tile_id = jnp.where(small_row, tab_tile, tile_id)
            pruned = (~small_row) & _ellipse_tile_cull(
                rows, tile_x, tile_y, tile_size
            )
        else:
            pruned = _ellipse_tile_cull(rows, tile_x, tile_y, tile_size)
        tile_id = jnp.where(pruned, num_tiles, tile_id)
        gid = jnp.where(pruned, n, gid)
        # The per-Gaussian gradient reduction (rasterize_pallas._gather_rows)
        # groups sorted-by-gid cotangent rows and diffs at boundaries from
        # `offsets`/`counts`. POST-culled slots (big-bbox fallback) fall out
        # of their group (gid -> n, zero pad row), so the boundaries must
        # shrink accordingly. Pruned flags are in EXPANSION order here —
        # each Gaussian's slots are contiguous — so per-Gaussian prune
        # counts are one cumsum plus one boundary gather.
        pr = (pruned & slot_valid).astype(jnp.int32)
        cs = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(pr)])
        bounds = jnp.clip(
            jnp.concatenate([offsets, offsets[-1:] + counts[-1:]]), 0, capacity
        )
        vals = cs[bounds]  # (N + 1,)
        counts = counts - (vals[1:] - vals[:-1])
        offsets = jnp.cumsum(counts) - counts

    tile_id = jnp.where(slot_valid, tile_id, num_tiles)
    gid = jnp.where(slot_valid, gid, n)
    depth_key = jnp.where(
        slot_valid & (tile_id < num_tiles), rows_t[4], jnp.inf
    )

    if SINGLE_KEY_SORT and num_tiles < (1 << 11):
        # positive-f32 bit patterns sort like the floats; keep 20 bits.
        # Depth positivity invariant: the explicit depths > 0 cull at the
        # counts stage above (plus projection zeroing radii for
        # z <= near_plane) guarantees no valid slot reaches here with
        # depth <= 0 (invalid slots carry +inf). The max(., 0) is pure
        # bit-safety, not a semantic clamp (ADVICE r3 / VERDICT r4 #7;
        # regression: tests/test_tiles.py negative-depth cull test).
        dbits = jax.lax.bitcast_convert_type(
            jnp.maximum(depth_key.astype(jnp.float32), 0.0), jnp.int32
        )
        dq = jax.lax.shift_right_logical(
            jnp.minimum(dbits, (1 << 31) - 1), 11
        )
        # max key = num_tiles<<20 | (2^20-1) <= 2047*2^20 + 2^20-1 = INT32_MAX
        key = tile_id * (1 << 20) + jnp.minimum(dq, (1 << 20) - 1)
        key_sorted, gid_sorted = jax.lax.sort((key, gid), num_keys=1)
        tile_sorted = jax.lax.shift_right_logical(key_sorted, 20)
    else:
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
        counts=counts.astype(jnp.int32),
        offsets=offsets.astype(jnp.int32),
        num_tiles=num_tiles,
        tiles_w=tiles_w,
        tiles_h=tiles_h,
    )


class SegmentedIntersections(NamedTuple):
    """Segment tables over the PLAIN tile-sorted intersection array (v3).

    A segment is (tile, K-chunk-of-the-sorted-array); per-tile ranges need not
    be chunk-aligned — a boundary chunk is visited by the segments of every
    tile it spans (they are consecutive in the grid, so input/output blocks
    for that chunk stay VMEM-resident between them; the backward's first
    toucher writes the block, later touchers accumulate). This removes the
    aligned layout's scatter and its T*K padding slots entirely.
    """

    gauss_ids: jax.Array  # (capacity,) sorted by (tile, depth); N = padding
    tile_offsets: jax.Array  # (num_tiles + 1,) per-tile ranges in the sorted array
    seg_tile: jax.Array  # (S,) tile per segment; num_tiles = dummy
    seg_first: jax.Array  # (S,) 1 if first segment of its tile (init outputs)
    seg_live: jax.Array  # (S,) 1 if the segment covers real slots
    seg_chunk: jax.Array  # (S,) chunk index into the sorted array
    seg_lo: jax.Array  # (S,) first slot of this tile within the chunk
    seg_hi: jax.Array  # (S,) one-past-last slot of this tile within the chunk
    seg_chunk_first: jax.Array  # (S,) 1 if first segment touching its chunk
    num_isects: jax.Array
    counts: jax.Array  # (N,) per-Gaussian intersection counts (pre-clamp)
    offsets: jax.Array  # (N,) expansion-order exclusive cumsum of counts
    num_segments: jax.Array
    num_tiles: int
    tiles_w: int
    tiles_h: int
    num_seg_cap: int


def build_intersections_segments(
    means2d: jax.Array,
    radii: jax.Array,
    depths: jax.Array,
    width: int,
    height: int,
    tile_size: int,
    capacity: int,
    chunk: int,
    conics: jax.Array | None = None,
    opacities: jax.Array | None = None,
    precull: bool = True,
) -> SegmentedIntersections:
    base = build_intersections(
        means2d, radii, depths, width, height, tile_size, capacity,
        conics=conics, opacities=opacities, precull=precull,
    )
    num_tiles = base.num_tiles
    s_cap = segment_capacity_for(capacity, num_tiles, chunk)

    starts = base.tile_offsets[:-1]  # (T,)
    ends = base.tile_offsets[1:]
    counts = ends - starts
    c0 = starts // chunk
    c1 = -(-ends // chunk)  # exclusive chunk end
    nseg = jnp.where(counts > 0, c1 - c0, 1)  # empty tiles: 1 init-only segment
    seg_off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(nseg)]
    ).astype(jnp.int32)
    num_segments = seg_off[-1]

    s = jnp.arange(s_cap, dtype=jnp.int32)
    seg_tile = jnp.clip(
        jnp.searchsorted(seg_off, s, side="right") - 1, 0, num_tiles - 1
    ).astype(jnp.int32)
    within = s - seg_off[seg_tile]
    in_use = s < num_segments
    has_data = counts[seg_tile] > 0
    live = in_use & has_data
    raw_chunk = c0[seg_tile] + within
    # Dead segments (empty tiles, tail padding) must NOT open a fresh output
    # window in the backward kernel: Mosaic flushes output buffers on window
    # change without tracking writes, so a never-written window would smear
    # stale VMEM over that chunk's gradients on real TPU. Repeat the previous
    # live segment's chunk instead (chunks are monotone non-decreasing across
    # live segments, so the window either stays put or advances to a chunk the
    # first-toucher flag will fully write). Leading dead segments fall back to
    # chunk 0, which the first live segment always first-touches.
    chunk_idx = jnp.maximum(
        jax.lax.cummax(jnp.where(live, raw_chunk, -1), axis=0), 0
    ).astype(jnp.int32)
    lo = jnp.maximum(starts[seg_tile], raw_chunk * chunk)
    hi = jnp.minimum(ends[seg_tile], (raw_chunk + 1) * chunk)
    # First toucher of a chunk = the tile containing the chunk's first slot.
    chunk_first = live & (starts[seg_tile] <= raw_chunk * chunk)

    return SegmentedIntersections(
        gauss_ids=base.gauss_ids,
        tile_offsets=base.tile_offsets,
        seg_tile=jnp.where(in_use, seg_tile, num_tiles).astype(jnp.int32),
        seg_first=jnp.where(in_use, (within == 0), False).astype(jnp.int32),
        seg_live=live.astype(jnp.int32),
        seg_chunk=chunk_idx,
        seg_lo=jnp.where(live, lo, 0).astype(jnp.int32),
        seg_hi=jnp.where(live, hi, 0).astype(jnp.int32),
        seg_chunk_first=chunk_first.astype(jnp.int32),
        num_isects=base.num_isects,
        counts=base.counts,
        offsets=base.offsets,
        num_segments=num_segments,
        num_tiles=num_tiles,
        tiles_w=base.tiles_w,
        tiles_h=base.tiles_h,
        num_seg_cap=s_cap,
    )


class AlignedIntersections(NamedTuple):
    """Chunk-aligned per-tile layout + segment tables for the Pallas kernels.

    Every tile's intersection run starts at a chunk (K) boundary and is padded
    to a chunk multiple (empty tiles own one all-padding chunk), so a segment
    = (tile, chunk) never spans tiles. The segment tables drive the kernels'
    scalar-prefetched BlockSpec index maps: Mosaic pipelines the chunk DMAs
    across the flat segment grid automatically.
    """

    gauss_ids: jax.Array  # (I_AL,) int32; N = padding
    seg_tile: jax.Array  # (S,) int32 tile of each segment; num_tiles = dummy
    seg_first: jax.Array  # (S,) int32 1 if first segment of its tile
    seg_chunk: jax.Array  # (S,) int32 aligned chunk index of the segment
    seg_live: jax.Array  # (S,) int32 1 if the segment's chunk holds real data
    num_isects: jax.Array  # () true intersection count
    num_segments: jax.Array  # () segments in use (incl. empty-tile dummies)
    num_tiles: int
    tiles_w: int
    tiles_h: int
    aligned_capacity: int
    num_seg_cap: int


def aligned_capacity_for(capacity: int, num_tiles: int, chunk: int) -> int:
    """Worst-case aligned slots: every nonempty tile pads < chunk (empty
    tiles own no data chunk), plus one reserved dustbin chunk."""
    return capacity + num_tiles * chunk + chunk


def segment_capacity_for(capacity: int, num_tiles: int, chunk: int) -> int:
    return num_tiles + capacity // chunk + 1


def build_intersections_aligned(
    means2d: jax.Array,
    radii: jax.Array,
    depths: jax.Array,
    width: int,
    height: int,
    tile_size: int,
    capacity: int,
    chunk: int,
) -> AlignedIntersections:
    base = build_intersections(
        means2d, radii, depths, width, height, tile_size, capacity
    )
    num_tiles = base.num_tiles
    n = means2d.shape[0]
    i_al = aligned_capacity_for(capacity, num_tiles, chunk)
    s_cap = segment_capacity_for(capacity, num_tiles, chunk)

    counts = base.tile_offsets[1:] - base.tile_offsets[:-1]  # (T,)
    data_chunks = -(-counts // chunk)  # ceil; 0 for empty tiles (no data)
    padded = data_chunks * chunk
    aligned_off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded)]
    ).astype(jnp.int32)  # (T+1,) data positions
    # Every tile gets >= 1 segment (empty tiles need their output zeroed by a
    # seg_first init; their chunk points at the dustbin and is marked dead).
    chunks_per_tile = jnp.maximum(data_chunks, 1)
    seg_off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(chunks_per_tile)]
    ).astype(jnp.int32)  # (T+1,) segment positions
    num_segments = seg_off[-1]

    # Scatter sorted intersections to aligned positions. One packed (T, 2)
    # row-gather covers both per-tile lookups.
    slots = jnp.arange(capacity, dtype=jnp.int32)
    ti = jnp.clip(base.tile_ids, 0, num_tiles - 1)
    per_tile = jnp.stack(
        [aligned_off[:-1].astype(jnp.float32), base.tile_offsets[:-1].astype(jnp.float32)],
        axis=-1,
    )  # (T, 2)
    tr = per_tile[ti]
    newpos = tr[:, 0].astype(jnp.int32) + (slots - tr[:, 1].astype(jnp.int32))
    ok = base.tile_ids < num_tiles
    newpos = jnp.where(ok, newpos, i_al)  # drop padding
    gids_al = jnp.full((i_al,), n, jnp.int32).at[newpos].set(
        base.gauss_ids, mode="drop"
    )

    # Segment tables.
    s = jnp.arange(s_cap, dtype=jnp.int32)
    seg_tile = jnp.clip(
        jnp.searchsorted(seg_off, s, side="right") - 1, 0, num_tiles - 1
    ).astype(jnp.int32)
    within = s - seg_off[seg_tile]
    in_use = s < num_segments
    dustbin_chunk = i_al // chunk - 1
    has_data = counts[seg_tile] > 0
    seg_live = (in_use & has_data).astype(jnp.int32)
    seg_chunk = jnp.where(
        in_use & has_data, aligned_off[seg_tile] // chunk + within, dustbin_chunk
    ).astype(jnp.int32)
    seg_first = jnp.where(in_use, (within == 0), False).astype(jnp.int32)
    seg_tile = jnp.where(in_use, seg_tile, num_tiles).astype(jnp.int32)

    return AlignedIntersections(
        gauss_ids=gids_al,
        seg_tile=seg_tile,
        seg_first=seg_first,
        seg_chunk=seg_chunk,
        seg_live=seg_live,
        num_isects=base.num_isects,
        num_segments=num_segments,
        num_tiles=num_tiles,
        tiles_w=base.tiles_w,
        tiles_h=base.tiles_h,
        aligned_capacity=i_al,
        num_seg_cap=s_cap,
    )
