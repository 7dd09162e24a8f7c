"""Pallas TPU tile rasterizer: fused forward + analytic backward with absgrad.

TPU-native replacement for gsplat's `rasterize_to_pixels` fwd/bwd CUDA kernels
(reference call sites freegaussian_model.py:847-868, absgrad consumption at
:369-392). Architecture (v2, segment-pipelined):

  - Tile binning (ops/tiles.py) produces a chunk-aligned, depth-sorted
    per-intersection layout: each 16x16 tile's run starts at a K boundary, so
    a segment = (tile, chunk-of-K-intersections) never spans tiles.
  - The kernels run a FLAT GRID over segments. Scalar-prefetched tables
    (seg_tile / seg_first / seg_chunk) drive the BlockSpec index maps: the
    packed-chunk input block follows seg_chunk, the per-tile output block
    follows seg_tile. Consecutive segments of one tile revisit the same
    output block (it stays resident in VMEM), and Mosaic's pipeline
    double-buffers the chunk DMAs across segments — no manual DMA, no
    while_loop, no exposed latency per tile.
  - Within a segment, alphas for all (pixel, Gaussian) pairs form a (P, K)
    VPU block; sequential front-to-back compositing becomes a prefix product
    along K; colors accumulate with a (C,K)x(P,K)^T MXU contraction.
    Transmittance/termination state lives in VMEM scratch, which persists
    across the sequential grid (reset at seg_first).
  - The backward re-walks segments front-to-back using the suffix-sum
    identity  dL/da_k = T_k b_k - (R_total - S_{<=k}) / (1 - a_k),  writing
    per-intersection gradients to the aligned layout (each chunk belongs to
    exactly one segment — no races, no read-modify-write). The reduction to
    per-Gaussian grads is a deterministic segment-sum (no atomics, unlike
    CUDA). The AbsGS `absgrad` statistic is the per-tile |grad| accumulated
    the same way, returned as the cotangent of a zero-valued `sink` input.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterize_ref import ALPHA_THRESHOLD, MAX_ALPHA, TRANSMITTANCE_EPS
from .tiles import build_intersections_segments


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# -----------------------------------------------------------------------------
# Packed-row gather with a sort-based segment-sum backward.
#
# The autodiff transpose of the per-intersection row gather is an XLA
# scatter-add into (N, D) — measured ~9 ms at 2^19 rows on v5e (the round-1
# bottleneck, docs/NOTES_ROUND1.md). This custom VJP instead groups the
# cotangent rows by Gaussian id with one int sort + one row gather, reduces
# each contiguous group with cumsum + boundary differences (offsets/counts
# come free from the binning stage), and costs ~6.3 ms — deterministic, no
# atomics, no scatter.
# -----------------------------------------------------------------------------


@jax.custom_vjp
def _gather_rows(per_gauss, gids, offsets, counts):
    """per_gauss: (N + 1, D) with zero padding row; gids: (cap,) int32 with
    padding id N; offsets/counts: (N,) expansion-order layout from binning."""
    return per_gauss[gids]


def _gather_rows_fwd(per_gauss, gids, offsets, counts):
    return per_gauss[gids], (gids, offsets, counts, per_gauss.shape[0] - 1)


def _reduce_rows_by_gid(d_rows, gids, offsets, counts):
    """Deterministic per-Gaussian segment reduction of per-intersection
    cotangent rows: sort rows by gid, f32 prefix sum, diff at the N+1 group
    boundaries. Returns (N + 1, D) f32 (zero padding row last).

    Rows past the kept total (padding gid == N) sort to the END, and every
    boundary below is <= the kept total, so the prefix sums the boundary
    diffs READ never include them — garbage there (inf/NaN bit patterns in
    never-written tail chunks; see EO_ZERO_WRITE) cannot leak. The old
    explicit zeroing select cost ~0.39 ms as an unfused (cap, D) pass.
    Exclusive prefix S: group sums are adjacent differences of S at the
    N+1 group boundaries — ONE (N+1)-row gather instead of two N-row
    gathers (row gathers cost ~12 ns each on TPU). Empty groups diff to 0
    automatically; overflow clamps to the kept range. `d_rows` may be bf16
    (BWD_ROWS_BF16): the reorder gather moves half the bytes and the cumsum
    upcasts to f32, so accumulation precision is unchanged."""
    cap, d = d_rows.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (cap,), 0)
    gs, order = jax.lax.sort((gids, iota), num_keys=1)
    grouped = d_rows[order]
    cs = jnp.cumsum(grouped.astype(jnp.float32), axis=0)
    bounds = jnp.clip(
        jnp.concatenate([offsets, offsets[-1:] + counts[-1:]]), 0, cap
    )
    # vals[i] = S_excl(bounds[i]) = cs[bounds[i] - 1], with bounds == 0 -> 0:
    # a select on the (N+1, D) gather OUTPUT replaces the (cap+1, D)
    # zero-row concatenate (a full pad copy, ~0.39 ms at the bench point).
    vals = jnp.where(
        (bounds > 0)[:, None], cs[jnp.maximum(bounds - 1, 0)], 0.0
    )  # (N + 1, D)
    g = vals[1:] - vals[:-1]
    return jnp.concatenate([g, jnp.zeros((1, d), g.dtype)], axis=0)


def _gather_rows_bwd(res, d_rows):
    gids, offsets, counts, n = res
    g_full = _reduce_rows_by_gid(d_rows, gids, offsets, counts)
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return g_full, f0(gids), f0(offsets), f0(counts)


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@dataclasses.dataclass(frozen=True)
class _Cfg:
    width: int
    height: int
    tile_size: int
    channels: int
    chunk: int
    tiles_w: int
    tiles_h: int
    interpret: bool


# gsplat's rasterization CONTRACT quantizes each Gaussian's radius bbox to
# 16-pixel tiles (reference isect_tiles; oracle tile_bounds default): pixels
# outside that bbox get ZERO contribution even where alpha would clear the
# threshold (at op ~ 1 the threshold ellipse reaches ~3.33 sigma, past the
# 3-sigma radii). The KERNEL tile size is a pure performance knob (32 wins
# on v5e, see SplatConfig.tile_size); when it differs from this contract
# granularity, _alphas applies the 16-granularity bbox gate in-kernel so
# results stay oracle-exact at any kernel tile size.
CONTRACT_TILE = 16

# Packed-row memory order for the pixel kernels' per-intersection data.
# False (legacy): `packed` is (D, cap) row-major — the custom calls force a
# {1,0} layout on it, so XLA must PHYSICALLY transpose the (cap, D) gather
# output before the forward kernel and the (D, cap) gradient after the
# backward kernel (~1.2 ms of copy/transpose fusions at the bench point:
# copy.389 + multiply_add_fusion.226 in docs/NOTES_ROUND3.md). True: the
# kernels take/store (cap, D) blocks directly — (chunk, D) block loads are
# contiguous, and the (K, D)<->(D, K) flip happens INSIDE the kernel on a
# VMEM-resident (128, 16) tile per grid step (a handful of VPU shuffles,
# amortised against the 256-pixel compositing math). Default True since r5:
# 18.48 -> 18.74M px/s alone, and it composes with BWD_ROWS_BF16 (19.14M
# together, docs/NOTES_ROUND5.md ladder).
PACKED_ROW_MAJOR = True

# Backward cotangent rows in bf16 (VERDICT r4 #1b): the backward kernel
# STORES its per-intersection gradient rows (D, cap) as bf16 — halving the
# kernel's output DMA, the legacy-order transpose, and the reduction's
# reorder gather — and the per-Gaussian segment reduction upcasts to f32 at
# the cumsum, so accumulation precision is unchanged. Costs ONE bf16
# rounding per intersection row (plus per-chunk boundary accumulates);
# gradients already carry the termination-flip budget, and Adam normalizes
# magnitudes. Requires the merged pixel-stage VJP (_rasterize_rows), whose
# internal cotangents are free of the custom_vjp dtype contract.
# Measured +0.5M px/s (19.14M with PACKED_ROW_MAJOR) but the on-chip
# parity suite FAILS at it (means2d bad 44/6000, conics 116/9000 vs 0-3 on
# the f32 path — bf16 rounding of per-intersection cotangents is a class
# beyond the termination-flip budget), so the default stays False: the
# BASELINE contract is gsplat-class f32 gradients. Knob retained for
# deployments that trade grad parity for throughput.
BWD_ROWS_BF16 = False

# Backward walk order. "fwd" (legacy): re-walk segments front-to-back with
# the suffix identity r_after = R_total - S_{<=k}; the large-total
# subtraction cancels catastrophically when r_after is small, which is what
# pins the backward scans at HIGHEST precision (r2ab6,
# docs/NOTES_ROUND2.md). "rev" (gsplat-style): walk segments back-to-front,
# reconstructing transmittance from the forward's saved T_final and
# accumulating the suffix sums DIRECTLY — every intermediate is error-
# relative-to-itself, so the scans run at the cheap split2 precision (1/3
# of HIGHEST's MXU passes) without amplification. MXU scans only.
# Default "rev" since r3: 13.85M vs 12.83M px/s on the honest bench, parity
# suite PASS on chip, and oracle-gradient error on dense scenes is a CLASS
# BETTER than fwd (conic rel 5e-3 vs 3.4e-2) — the cancellation is gone.
BWD_WALK = "rev"

# Scan precision for the reverse-walk backward's suffix scans (safe at
# split2 by construction — see BWD_WALK). None -> SCAN_PRECISION.
SCAN_PRECISION_REV = "split2"

# Prefix-scan implementation inside the kernels: "mxu" = one triangular
# matmul (HIGHEST precision) per scan; "roll" = log-step roll/select ladder
# on the VPU (~21 passes for K=128). Which wins depends on the chunk size —
# small matmuls pay MXU pipeline latency — so it is switchable for hardware
# A/B runs (scripts/tpu_checks.py profile).
SCAN_IMPL = "mxu"

# MXU precision for the triangular scan matmuls only (the color/gradient
# contractions stay HIGHEST — they set output pixels directly). HIGHEST is
# a 6-pass bf16 decomposition; Mosaic rejects Precision.HIGH inside kernels
# (NotImplementedError), so the cheap option is "split2": x = hi + lo with
# bf16 hi/lo and TWO default-precision dots against the EXACT 0/1 scan
# matrix — reconstructs x to ~16-17 mantissa bits (~1e-5 rel on the
# [-6.9, 0] log-transmittance range) at 1/3 of HIGHEST's MXU passes.
# Switchable for hardware A/B + on-chip parity (tpu_checks xinterp).
SCAN_PRECISION = jax.lax.Precision.HIGHEST  # or the string "split2"

# FORWARD-only scan precision override (None -> SCAN_PRECISION). The r2ab6
# numerics verdict (docs/NOTES_ROUND2.md) applies to the BACKWARD: its
# suffix difference r_total - s_cum - s_incl cancels large terms, so split2's
# ~2^-17 scan error amplified ~100x there. The forward has no such
# cancellation — its weights are w = a * excl_T (products of O(1) factors) —
# so split2 (1/3 of HIGHEST's MXU passes) costs only ~1e-5-relative image
# noise. Default "split2" since r3: +1% step on the honest bench, parity
# suite clean at 3e-4 forward tolerance (docs/NOTES_ROUND3.md); set None to
# restore HIGHEST forward scans.
SCAN_PRECISION_FWD = "split2"


def _scan_dot(x: jax.Array, m: jax.Array, prec=None) -> jax.Array:
    """x @ m for the (K, K) 0/1 prefix matrices, at `prec` (default
    SCAN_PRECISION)."""
    dims = (((1,), (0,)), ((), ()))
    if prec is None:
        prec = SCAN_PRECISION
    if prec == "split2":
        # Mosaic rejects bf16 dot operands ("Bad lhs type") — keep f32
        # operands whose VALUES are bf16-representable, so DEFAULT
        # precision's internal bf16 truncation is lossless on hi and the
        # 0/1 matrix, and loses only lo's sub-2^-17 tail.
        hi = x.astype(jnp.bfloat16).astype(jnp.float32)
        lo = x - hi
        return jax.lax.dot_general(
            hi, m, dims, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ) + jax.lax.dot_general(
            lo, m, dims, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
    return jax.lax.dot_general(
        x, m, dims, preferred_element_type=jnp.float32, precision=prec
    )

# MXU precision for the DATA-by-DATA color contractions (forward pixel
# accumulation cols@w^T, backward dcols = g_color@w). HIGHEST = 6 bf16
# passes. "split2" decomposes BOTH operands (x = xh + xl, y = yh + yl) and
# keeps the three significant cross terms (xl@yl < 2^-32 relative) = 3
# DEFAULT passes at ~2^-16 relative error — inside the parity suite's
# forward-image tolerance. A/B knob for hardware.
COLOR_PRECISION = "highest"


def _data_dot(x: jax.Array, y: jax.Array, dims) -> jax.Array:
    """dot_general(x, y) over `dims` at COLOR_PRECISION (see above)."""
    dims_full = (dims, ((), ()))
    if COLOR_PRECISION == "split2":
        xh = x.astype(jnp.bfloat16).astype(jnp.float32)
        yh = y.astype(jnp.bfloat16).astype(jnp.float32)
        xl = x - xh
        yl = y - yh

        def d(a, b):
            return jax.lax.dot_general(
                a, b, dims_full, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )

        return d(xh, yh) + d(xh, yl) + d(xl, yh)
    return jax.lax.dot_general(
        x, y, dims_full, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


# Segment-level early-out when every pixel of a tile has terminated. Saves
# the whole kernel body on deep sorted runs (real scenes after densification),
# and is numerically exact (CPU parity tests cover it) — but wrapping the
# kernel body in the data-dependent predicate blew Mosaic's remote compile
# from ~10 min to >45 min on the axon toolchain, so it ships OFF until the
# compile cost is fixed. Flip to True to A/B on hardware.
EARLY_OUT = False

# TABLE-driven backward early-out (the shippable form of the same win): the
# forward emits per-pixel live-slot counts (transmittance is monotone, so the
# count IS the pixel's termination cutoff); the backward's scalar-prefetched
# segment tables are then recomputed in XLA so segments past every pixel's
# cutoff are marked dead — the ordinary `seg_live` gate skips them, which
# Mosaic compiles fine (no data-dependent predicate inside the kernel).
# Chunks no live segment touches are zeroed after the kernel (their true
# gradients are zero by construction). Exact; parity-tested on CPU.
# Measured +4% step on the bench scene (op=0.1 diffuse cloud: pixels rarely
# terminate, so the max-over-pixels cutoff stays deep); opaque trained
# scenes are the real payoff.
BWD_EARLY_OUT = True

# With BWD_EARLY_OUT, chunks none of whose segments survive the early-out
# used to be zeroed OUTSIDE the kernel (_mask_unvisited_chunks): the kernel
# never wrote their output windows, so on hardware they held HBM garbage.
# That mask was a full (D, n_chunks, K) select + layout copy — ~0.65 ms at
# the bench point (fusion.978 + copy.143, docs/NOTES_ROUND4.md). With
# EO_ZERO_WRITE the kernel instead keeps every ORIGINALLY-live segment on
# its own chunk (no cummax repeat) and the first toucher of a chunk whose
# compute is early-outed WRITES ZEROS explicitly — the true gradient of
# every post-termination slot. Sorted-array tail chunks (beyond the last
# tile's range) still hold garbage, but their slots carry the padding
# Gaussian id, which sorts-to-the-end in the _gather_rows_bwd gid sort while
# every boundary read is clamped to the kept total — so garbage rows are
# never reduced into any real Gaussian's gradient (invariant proven by
# tests/test_rasterize_pallas.py::test_gather_rows_bwd_immune_to_tail_garbage;
# same invariant as the BWD_EARLY_OUT=False path).
EO_ZERO_WRITE = True

# Early-out granularity: the tile's P pixels split into EO_PARTS row bands,
# each with its own termination cutoff (forward: an SMEM alive scalar per
# band; backward: a per-band live flag bit from the forward's livecnt). The
# cutoff is a MAX over the band's pixels, so finer bands skip more of the
# sorted run when termination depth varies across the tile — one deep pixel
# only pins its own band. EO_PARTS=2 is the r2-r3 "halves" layout
# (bit-identical) and stays the DEFAULT: 4 measured 17.77M vs 18.75M px/s
# on the r4 bench — quartering the (512, K) bodies into (256, K) quadruples
# the per-segment branch/setup cost faster than the finer cutoffs skip
# work. Flag bits:
# 0 = first-of-tile, 1 = live (post-EO), 2 = chunk-first,
# 3..3+EO_PARTS-1 = per-band live, 3+EO_PARTS = originally-live
# (EO_ZERO_WRITE).
EO_PARTS = 2

# Forward segment early-out via an SMEM scalar: the all-pixels-terminated
# predicate is REDUCED AT THE END of the previous segment's body and stored
# to SMEM scratch; the next segment branches on the stored scalar — the same
# cheap scalar-branch structure as the prefetched flags, avoiding the
# in-predicate vector reduce that blew the Mosaic compile (EARLY_OUT above).
# Exact: a skipped segment has live == 0 for every pixel, so color/alpha/
# livecnt would all accumulate zero. Measured on v5e: compile 106 s (no
# Mosaic blowup, unlike EARLY_OUT), parity clean, +5.7% step at the
# trained-like bench point (bwd table EO adds +8.4% there).
FWD_EARLY_OUT = True

# Exact per-(Gaussian, tile) ellipse cull in the binning (tiles.py
# _ellipse_tile_cull): drops bbox corner tiles the threshold ellipse cannot
# touch — the kernels skip alpha < ALPHA_THRESHOLD at every pixel of such
# tiles, so culled pairs contribute exactly zero (removal regroups chunked
# reductions: ulp-class diffs). DEFAULT OFF: the r2ab7/r2ab8 on-chip
# factorial (docs/NOTES_ROUND2.md, 2026-08-18) showed that at a trained-like
# operating point (tight ~4.6px Gaussians, bbox ~= ellipse) the cull prunes
# little while its binning overhead (per-slot edge tests, wider packed rows,
# boundary rebase) costs 3-12 ms/step: off 11.2M px/s vs post-cull 7.7M vs
# precull 5.3M at equal capacity. Enable for dim/anisotropic-heavy scenes
# (e.g. right after opacity resets or under heavy densification) where the
# ellipse keeps far fewer tiles than the bbox.
ELLIPSE_CULL = False
# Pre-expansion form of the cull (tiles.py dense bbox-grid test): culled
# pairs never occupy expansion slots, so num_isects counts kept pairs and
# capacity can be sized to real work. Off = post-expansion cull only
# (capacity must fit bbox totals, but no dense tests / kept-tile tables).
PRECULL = True


def _prefix_matrix(k: int) -> jax.Array:
    """(K, K) matrix M with M[i, j] = 1 for i <= j: x @ M = inclusive cumsum."""
    i = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (i <= j).astype(jnp.float32)


def _prefix_matrix_excl(k: int) -> jax.Array:
    """(K, K) strict matrix M with M[i, j] = 1 for i < j: x @ M = EXCLUSIVE
    cumsum (lane 0 gets 0)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (i < j).astype(jnp.float32)


def _cumsum_lanes_roll(x: jax.Array) -> jax.Array:
    p, k = x.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (p, k), 1)
    shift = 1
    while shift < k:
        rolled = pltpu.roll(x, shift, axis=1)
        x = x + jnp.where(lane >= shift, rolled, 0.0)
        shift *= 2
    return x


def _cumprod_lanes_roll(x: jax.Array) -> jax.Array:
    p, k = x.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (p, k), 1)
    shift = 1
    while shift < k:
        rolled = pltpu.roll(x, shift, axis=1)
        x = x * jnp.where(lane >= shift, rolled, 1.0)
        shift *= 2
    return x


def _cumsum_lanes(x: jax.Array, prec=None) -> jax.Array:
    """Inclusive prefix sum along axis 1."""
    if SCAN_IMPL == "roll":
        return _cumsum_lanes_roll(x)
    k = x.shape[1]
    return _scan_dot(x, _prefix_matrix(k), prec)


def _cumprod_lanes(x: jax.Array) -> jax.Array:
    """Inclusive prefix product along axis 1. MXU path: exp(cumsum(log x));
    inputs are transmittance factors in [1 - MAX_ALPHA, 1], so the log stays
    finite (the same identity the kernels already use for T_new)."""
    if SCAN_IMPL == "roll":
        return _cumprod_lanes_roll(x)
    return jnp.exp(_cumsum_lanes(jnp.log(x)))


def _suffix_matrix(k: int, excl: bool) -> jax.Array:
    """(K, K) matrix M with M[i, j] = 1 for i >= j (inclusive suffix) or
    i > j (exclusive): x @ M = suffix sum along lanes."""
    i = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return ((i > j) if excl else (i >= j)).astype(jnp.float32)


def _sumsuffix_lanes(x: jax.Array, excl: bool, prec=None) -> jax.Array:
    """Suffix sum along axis 1 (sum over j >= k, or j > k when `excl`).
    MXU triangular matmul only — the reverse-walk backward is mxu-scan-only
    (SCAN_IMPL="roll" has no reverse ladder; _run_bwd asserts)."""
    k = x.shape[1]
    return _scan_dot(x, _suffix_matrix(k, excl), prec)


def _transmittance(one_minus: jax.Array, T: jax.Array, alive: jax.Array, prec=None):
    """Shared compositing state math for both kernels on a (P, K) block.

    Uses an EXCLUSIVE prefix product (strict triangular matmul on the MXU)
    so excl_T needs no (P, K) divide, and returns log(one_minus) so T_new
    can reuse it instead of paying a second transcendental pass.
    one_minus >= 1 - MAX_ALPHA > 0 always, so the log stays finite.

    Returns (excl_T, incl_T, live, log_om)."""
    log_om = jnp.log(one_minus)
    if SCAN_IMPL == "roll":
        incl = _cumprod_lanes_roll(one_minus)
        lane = jax.lax.broadcasted_iota(jnp.int32, incl.shape, 1)
        excl = jnp.where(lane == 0, 1.0, pltpu.roll(incl, 1, axis=1))
    else:
        k = one_minus.shape[1]
        excl = jnp.exp(_scan_dot(log_om, _prefix_matrix_excl(k), prec))
    excl_T = T * excl
    incl_T = excl_T * one_minus
    live = (incl_T > TRANSMITTANCE_EPS).astype(jnp.float32) * alive
    return excl_T, incl_T, live, log_om


def _t_new(T: jax.Array, live: jax.Array, log_om: jax.Array) -> jax.Array:
    return T * jnp.exp(
        jnp.sum(jnp.where(live > 0, log_om, 0.0), axis=1, keepdims=True)
    )


def _pixel_coords(cfg: _Cfg, tile, row_offset: int = 0, n_rows: int | None = None):
    ts = cfg.tile_size
    P = n_rows if n_rows is not None else ts * ts
    tile_x = tile % cfg.tiles_w
    tile_y = tile // cfg.tiles_w
    pix = row_offset + jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (tile_x * ts + pix % ts).astype(jnp.float32) + 0.5
    py = (tile_y * ts + pix // ts).astype(jnp.float32) + 0.5
    return px, py


def _load_data(data_ref):
    """Load the per-intersection chunk as (D, K) regardless of memory order
    (PACKED_ROW_MAJOR stores (K, D) blocks; the flip is a VMEM-tile
    transpose, not an HBM pass)."""
    d = data_ref[...]
    return d.T if PACKED_ROW_MAJOR else d


def _alphas(cfg: _Cfg, data, px, py):
    """Shared alpha math for a (D, K) chunk against (P, 1) pixel coords."""
    C = cfg.channels
    gx = data[0:1, :]
    gy = data[1:2, :]
    ca = data[2:3, :]
    cb = data[3:4, :]
    cc = data[4:5, :]
    op = data[5:6, :]
    cols = data[8 : 8 + C, :]  # (C, K) — 8-aligned rows
    dx = gx - px  # (P, K)
    dy = gy - py
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    evis = jnp.exp(-sigma)
    raw_alpha = op * evis
    alpha = jnp.minimum(MAX_ALPHA, raw_alpha)
    # Padding slots carry all-zero rows: sigma == 0, alpha == 0 -> invisible.
    vis = (sigma >= 0) & (alpha >= ALPHA_THRESHOLD)
    if cfg.tile_size != CONTRACT_TILE:
        # gsplat CONTRACT bbox gate: a Gaussian contributes only to pixels
        # whose CONTRACT_TILE-granularity tile lies inside its radius bbox
        # (tiles.py tile_bounds / reference isect_tiles). Binning at a
        # coarser kernel tile supersets that region (coarser floor/ceil
        # covers more), so gating here restores the tile-16 contract EXACTLY
        # while the kernels run at the faster tile size. Same f32 arithmetic
        # as tile_bounds: coords < 2^24 make /16, floor, ceil exact.
        g = float(CONTRACT_TILE)
        rad = data[8 + C : 9 + C, :]  # (1, K) radii (0 = culled)
        tx = jnp.floor((px - 0.5) / g)  # (P, 1) pixel's contract-tile coords
        ty = jnp.floor((py - 0.5) / g)
        xm = jnp.floor((gx - rad) / g)  # (1, K) bbox in contract tiles
        xM = jnp.ceil((gx + rad) / g)
        ym = jnp.floor((gy - rad) / g)
        yM = jnp.ceil((gy + rad) / g)
        vis = vis & (tx >= xm) & (tx < xM) & (ty >= ym) & (ty < yM)
    a_eff = jnp.where(vis, alpha, 0.0)
    return dict(
        dx=dx, dy=dy, ca=ca, cb=cb, cc=cc, op=op, cols=cols, gx=gx, gy=gy,
        sigma=sigma, evis=evis, raw_alpha=raw_alpha, alpha=alpha,
        vis=vis, a_eff=a_eff,
    )


# -----------------------------------------------------------------------------
# Forward kernel
# -----------------------------------------------------------------------------


def _fwd_kernel(cfg: _Cfg, tile_ref, flags_ref, chunk_ref, lo_ref, hi_ref, data_ref, color_ref, alpha_ref, livecnt_ref, *rest):
    """state scratch: (P, 2) = [T, alive]; persists across the segment grid.

    flags bit0 = first segment of tile (init outputs), bit1 = live (has real
    slots). Boundary chunks are shared between consecutive tiles' segments;
    [lo, hi) masks this tile's slots within the chunk.

    livecnt: per-pixel count of this tile's slots still live — transmittance
    is monotone, so the count is exactly the pixel's termination cutoff in
    the tile's sorted run; the backward uses max-over-pixels to skip
    post-termination segments (BWD_EARLY_OUT)."""
    P = cfg.tile_size * cfg.tile_size
    K = cfg.chunk
    s = pl.program_id(0)
    flags = flags_ref[s]
    if BWD_WALK == "rev":
        tfin_ref, *scratch = rest  # extra output: per-pixel final T
    else:
        tfin_ref, scratch = None, rest
    state = scratch[0]
    if FWD_EARLY_OUT:
        alive_smem = scratch[1]

    @pl.when(flags & 1 == 1)
    def _():
        color_ref[0] = jnp.zeros_like(color_ref[0])
        alpha_ref[0] = jnp.zeros_like(alpha_ref[0])
        livecnt_ref[0] = jnp.zeros_like(livecnt_ref[0])
        if tfin_ref is not None:
            tfin_ref[0] = jnp.ones_like(tfin_ref[0])
        state[...] = jnp.ones((P, 2), jnp.float32)
        if FWD_EARLY_OUT:
            for h in range(EO_PARTS):
                alive_smem[h] = 1

    live_bit = (flags >> 1) & 1 == 1

    def half_body(h, rows, n_rows):
        """Composite one 128-row half of the tile (pixel rows [8h, 8h+8))."""
        px, py = _pixel_coords(cfg, tile_ref[s], row_offset=h * n_rows, n_rows=n_rows)
        v = _alphas(cfg, _load_data(data_ref), px, py)
        slot = chunk_ref[s] * K + jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
        in_range = (slot >= lo_ref[s]) & (slot < hi_ref[s])
        a_eff = jnp.where(in_range, v["a_eff"], 0.0)
        T = state[rows, 0:1]
        alive = state[rows, 1:2]

        one_minus = 1.0 - a_eff
        excl_T, incl_T, live, log_om = _transmittance(
            one_minus, T, alive, SCAN_PRECISION_FWD
        )
        w = a_eff * excl_T * live  # (n_rows, K)

        # COLOR_PRECISION (default HIGHEST): plain-DEFAULT bf16 truncation
        # breaks gradient parity with the f32 oracle on real hardware.
        color_ref[0, :, rows] += _data_dot(v["cols"], w, ((1,), (1,)))
        alpha_ref[0, rows] += jnp.sum(w, axis=1, keepdims=True)
        livecnt_ref[0, rows] += jnp.sum(
            jnp.where(in_range, live, 0.0), axis=1, keepdims=True
        )

        # Mosaic has no reduce_prod; reuse log(one_minus) from _transmittance.
        T_new = _t_new(T, live, log_om)
        alive_new = alive * (incl_T[:, -1:] > TRANSMITTANCE_EPS).astype(jnp.float32)
        state[rows] = jnp.concatenate([T_new, alive_new], axis=1)
        if tfin_ref is not None:
            # running final-T snapshot: the reverse-walk backward seeds its
            # transmittance reconstruction from the last written value
            tfin_ref[0, rows] = T_new
        if FWD_EARLY_OUT:
            alive_smem[h] = (jnp.max(alive_new) > 0.0).astype(jnp.int32)

    # Segment-level early out, per EO_PARTS row band: once every pixel of a
    # band has terminated, its alpha/compositing body is skipped. The
    # predicate is the SMEM scalar STORED at the end of the previous
    # segment's body — the same cheap scalar-branch class as the prefetched
    # flags (the legacy EARLY_OUT's in-predicate vector reduce is what blew
    # the Mosaic compile). Finer bands shrink the max-over-pixels pessimism
    # of a single whole-tile cutoff.
    if FWD_EARLY_OUT:
        part = P // EO_PARTS
        for h in range(EO_PARTS):
            rows = slice(h * part, (h + 1) * part)

            @pl.when(live_bit & (alive_smem[h] == 1))
            def _(h=h, rows=rows):
                half_body(h, rows, part)

    else:
        if EARLY_OUT:
            any_alive = jnp.max(state[:, 1]) > 0.0
        else:
            any_alive = True

        @pl.when(live_bit & any_alive)
        def _():
            half_body(0, slice(0, P), P)


# -----------------------------------------------------------------------------
# Backward kernel
# -----------------------------------------------------------------------------


def _bwd_kernel(
    cfg: _Cfg,
    tile_ref,
    flags_ref,
    chunk_ref,
    lo_ref,
    hi_ref,
    data_ref,
    gcolor_ref,
    galpha_ref,
    rtotal_ref,
    dout_ref,
    state,
    dbuf,
):
    """state scratch: (P, 3) = [T, alive, S_cum]; dbuf: (2, d_rows, K) VMEM
    per-half gradient contributions.

    flags bit0 = first-of-tile, bit1 = live, bit2 = first toucher of this
    chunk (writes the out block; later touchers of a shared boundary chunk
    accumulate — they are consecutive, so the block stays VMEM-resident),
    bits 3..3+EO_PARTS-1 = the tile's pixel row bands that still have
    un-terminated pixels for this segment (table-driven early-out from the
    forward's per-pixel live counts; without BWD_EARLY_OUT all mirror
    bit1), bit 3+EO_PARTS = the segment was live BEFORE the early-out
    (EO_ZERO_WRITE: an originally-live first toucher whose compute is
    early-outed writes
    ZEROS — the exact gradient of post-termination slots). A dead band's
    dbuf slice is zero-filled so the combined write stays exact."""
    P = cfg.tile_size * cfg.tile_size
    s = pl.program_id(0)
    flags = flags_ref[s]

    @pl.when(flags & 1 == 1)
    def _():
        init = jnp.concatenate(
            [jnp.ones((P, 2), jnp.float32), jnp.zeros((P, 1), jnp.float32)], axis=1
        )
        state[...] = init

    live_bit = (flags >> 1) & 1 == 1
    part = P // EO_PARTS
    for h in range(EO_PARTS):
        rows = slice(h * part, (h + 1) * part)
        part_live = (flags >> (3 + h)) & 1 == 1

        @pl.when(live_bit & part_live)
        def _(h=h, rows=rows):
            dbuf[h] = _bwd_half_body(
                cfg, tile_ref, chunk_ref, lo_ref, hi_ref, data_ref,
                gcolor_ref, galpha_ref, rtotal_ref, state, s, rows,
                h * part, part,
            )

        @pl.when(live_bit & jnp.logical_not(part_live))
        def _(h=h):
            dbuf[h] = jnp.zeros(dbuf.shape[1:], dbuf.dtype)

    @pl.when(live_bit)
    def _():
        d_sum = sum(dbuf[h] for h in range(EO_PARTS))
        # AbsGS rows 6-7 = |tile-level signed means2d row sums| (rows 0-1)
        d_chunk = jnp.concatenate(
            [d_sum[0:6], jnp.abs(d_sum[0:2]), d_sum[8:]], axis=0
        )

        if PACKED_ROW_MAJOR:
            d_chunk = d_chunk.T  # (K, D) store order; flip is VMEM-resident

        _store_dchunk(flags, dout_ref, d_chunk)

    _eo_zero_write(flags, live_bit, dout_ref)


def _store_dchunk(flags, dout_ref, d_chunk):
    """First toucher (bit2) writes the chunk's gradient block; later
    touchers accumulate. With BWD_ROWS_BF16 the output block is bf16: the
    accumulate upcasts the resident block to f32 for the add and rounds
    once at the store (the f32 math stays VMEM-local)."""

    @pl.when((flags >> 2) & 1 == 1)
    def _():
        dout_ref[...] = d_chunk.astype(dout_ref.dtype)

    @pl.when((flags >> 2) & 1 == 0)
    def _():
        dout_ref[...] = (
            dout_ref[...].astype(d_chunk.dtype) + d_chunk
        ).astype(dout_ref.dtype)


def _eo_zero_write(flags, live_bit, dout_ref):
    """EO_ZERO_WRITE epilogue (shared by both walks): an originally-live
    (bit 3+EO_PARTS) first-toucher (bit2) whose compute was early-outed (not bit1)
    writes zeros — the exact gradient of every post-termination slot — so
    no chunk a tile covers is ever left unwritten (see EO_ZERO_WRITE)."""
    if not (BWD_EARLY_OUT and EO_ZERO_WRITE):
        return

    zero_write = (
        jnp.logical_not(live_bit)
        & ((flags >> (3 + EO_PARTS)) & 1 == 1)
        & ((flags >> 2) & 1 == 1)
    )

    @pl.when(zero_write)
    def _():
        dout_ref[...] = jnp.zeros(dout_ref.shape, dout_ref.dtype)


def _bwd_half_body(
    cfg, tile_ref, chunk_ref, lo_ref, hi_ref, data_ref,
    gcolor_ref, galpha_ref, rtotal_ref, state, s, rows, row_offset, n_rows,
):
    C = cfg.channels
    K = cfg.chunk
    px, py = _pixel_coords(cfg, tile_ref[s], row_offset=row_offset, n_rows=n_rows)
    v = _alphas(cfg, _load_data(data_ref), px, py)
    slot = chunk_ref[s] * K + jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    in_range = (slot >= lo_ref[s]) & (slot < hi_ref[s])
    vis = v["vis"] & in_range
    a_eff = jnp.where(in_range, v["a_eff"], 0.0)
    T = state[rows, 0:1]
    alive = state[rows, 1:2]
    s_cum = state[rows, 2:3]
    g_color = gcolor_ref[0, :, rows]  # (C, n_rows)
    g_alpha = galpha_ref[0, rows]  # (n_rows, 1)
    r_total = rtotal_ref[0, rows]  # (n_rows, 1)

    one_minus = 1.0 - a_eff
    # Liveness must replay the FORWARD's live set exactly, so this scan runs
    # at SCAN_PRECISION_FWD (the forward's precision): with the non-default
    # BWD_WALK="fwd" combo a HIGHEST recompute here could flip
    # threshold-edge slots into a different live set than the forward saw
    # (ADVICE r3). The cancellation-sensitive wb suffix below stays at
    # SCAN_PRECISION (HIGHEST) — only liveness needs forward parity.
    excl_T, incl_T, live, log_om = _transmittance(
        one_minus, T, alive, SCAN_PRECISION_FWD
    )
    comp = jnp.where(vis, live, 0.0)
    w = a_eff * excl_T * comp

    # b_k = (c_k . g_color) + g_alpha per (pixel, gaussian)
    # b[p, k] = sum_c g_color[c, p] * cols[c, k] + g_alpha[p]: the contraction
    # dim is only C (3-6 channels), so C broadcast-fmas on the VPU are exact
    # f32 AND cheaper than a 3/128-utilized skinny MXU matmul at HIGHEST.
    C_dim = g_color.shape[0]
    b = g_alpha
    for ci in range(C_dim):
        b = b + g_color[ci : ci + 1, :].T * v["cols"][ci : ci + 1, :]
    wb = w * b
    s_incl = _cumsum_lanes(wb)
    r_after = r_total - (s_cum + s_incl)

    da = (excl_T * b - r_after / one_minus) * comp

    T_new = _t_new(T, live, log_om)
    alive_new = alive * (incl_T[:, -1:] > TRANSMITTANCE_EPS).astype(jnp.float32)
    s_cum_new = s_cum + jnp.sum(wb, axis=1, keepdims=True)
    state[rows] = jnp.concatenate([T_new, alive_new, s_cum_new], axis=1)

    return _grad_rows(cfg, tile_ref, data_ref, s, v, da, w, g_color, row_offset, n_rows)


def _grad_rows(cfg, tile_ref, data_ref, s, v, da, w, g_color, row_offset, n_rows):
    """Assemble the (d_rows, K) per-intersection gradient block from the
    per-(pixel, gaussian) alpha cotangent `da` and weights `w` — shared by
    both backward walks."""
    C = cfg.channels
    K = cfg.chunk
    uncapped = (v["raw_alpha"] <= MAX_ALPHA).astype(jnp.float32)
    dsigma = -v["alpha"] * da * uncapped
    ca, cb, cc = v["ca"], v["cb"], v["cc"]

    # Per-Gaussian row gradients via PIXEL MOMENTS: dx = gx - px is separable,
    # so every row sum  sum_p dsigma * poly(dx, dy)  is a lane-wise combination
    # of the six moments  sum_p [1, px, py, px^2, px py, py^2] * dsigma.
    # dop rides M0 exactly: dop = evis * da * uncapped = -dsigma / op.
    # Tile-LOCAL coordinates keep the binomial expansions conditioned (the
    # terms stay O(dx) instead of O(global pixel coordinate)). VPU form: five
    # broadcast-products + six sublane reductions — measured on v5e the
    # "obvious" (8, P) @ (P, K) HIGHEST moment matmul is a 6%-M-utilization
    # skinny matmul (~1536 MXU cycles vs ~576 VPU) and LOST 1.1M pixels/s.
    ts = cfg.tile_size
    tile = tile_ref[s]
    gxl = v["gx"] - (tile % cfg.tiles_w * ts).astype(jnp.float32)  # (1, K)
    gyl = v["gy"] - (tile // cfg.tiles_w * ts).astype(jnp.float32)
    pix = row_offset + jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0)
    pxl = (pix % ts).astype(jnp.float32) + 0.5  # (n_rows, 1) tile-local
    pyl = (pix // ts).astype(jnp.float32) + 0.5
    sd = lambda x: jnp.sum(x, axis=0, keepdims=True)  # (n_rows, K) -> (1, K)
    m0 = sd(dsigma)
    dsx = pxl * dsigma
    dsy = pyl * dsigma
    mx = sd(dsx)
    my = sd(dsy)
    mxx = sd(pxl * dsx)
    mxy = sd(pyl * dsx)
    myy = sd(pyl * dsy)
    sx = gxl * m0 - mx  # sum_p dsigma * dx
    sy = gyl * m0 - my
    sxx = gxl * gxl * m0 - 2.0 * gxl * mx + mxx
    sxy = gxl * gyl * m0 - gxl * my - gyl * mx + mxy
    syy = gyl * gyl * m0 - 2.0 * gyl * my + myy
    row_dmx = ca * sx + cb * sy
    row_dmy = cb * sx + cc * sy
    op = v["op"]
    rows_small = jnp.concatenate(
        [
            row_dmx,
            row_dmy,
            0.5 * sxx,
            sxy,
            0.5 * syy,
            jnp.where(op > 0, -m0 / jnp.where(op > 0, op, 1.0), 0.0),
        ],
        axis=0,
    )  # (6, K)
    dcols = _data_dot(g_color, w, ((1,), (0,)))  # (C, K)

    # Row layout mirrors the packed input. The absgrad rows 6-7 are |sum_p
    # dmx| over the WHOLE tile — not half-decomposable (|a|+|b| != |a+b|) —
    # so halves return zeros there and the combine epilogue takes the abs of
    # the summed signed rows 0-1.
    d_rows = data_ref.shape[1] if PACKED_ROW_MAJOR else data_ref.shape[0]
    tail = jnp.zeros((d_rows - 8 - C, K), jnp.float32)
    zeros2 = jnp.zeros((2, K), jnp.float32)
    return jnp.concatenate([rows_small, zeros2, dcols, tail], axis=0)


def _bwd_kernel_rev(
    cfg: _Cfg,
    tile_ref,
    flags_ref,
    chunk_ref,
    lo_ref,
    hi_ref,
    tstart_ref,
    data_ref,
    gcolor_ref,
    galpha_ref,
    tfin_ref,
    livecnt_ref,
    dout_ref,
    state,
    dbuf,
):
    """Reverse-walk backward (BWD_WALK="rev"): segments arrive in REVERSED
    order (tables flipped by _rasterize_tiles_bwd). state: (P, 2) =
    [T_after, r_after] — transmittance at the END of the not-yet-processed
    prefix, and the suffix sum of w*b over already-processed (deeper)
    slots. Seeded per tile from the forward's saved T_final; liveness is
    rank < livecnt (transmittance is monotone, so the forward's live-slot
    count IS the termination cutoff). Every intermediate is a direct
    product/sum — no large-total cancellation — so the scans run at the
    cheap split2 precision (see BWD_WALK).

    Flag bits match _bwd_kernel: 0 = first (reverse) segment of tile,
    1 = live, 2 = first (reverse) toucher of this chunk,
    3..3+EO_PARTS-1 = bands live, 3+EO_PARTS = originally live."""
    P = cfg.tile_size * cfg.tile_size
    s = pl.program_id(0)
    flags = flags_ref[s]

    @pl.when(flags & 1 == 1)
    def _():
        state[...] = jnp.concatenate(
            [tfin_ref[0], jnp.zeros((P, 1), jnp.float32)], axis=1
        )

    live_bit = (flags >> 1) & 1 == 1
    part = P // EO_PARTS
    for h in range(EO_PARTS):
        rows = slice(h * part, (h + 1) * part)
        part_live = (flags >> (3 + h)) & 1 == 1

        @pl.when(live_bit & part_live)
        def _(h=h, rows=rows):
            dbuf[h] = _bwd_half_body_rev(
                cfg, tile_ref, chunk_ref, lo_ref, hi_ref, tstart_ref,
                data_ref, gcolor_ref, galpha_ref, livecnt_ref, state, s,
                rows, h * part, part,
            )

        @pl.when(live_bit & jnp.logical_not(part_live))
        def _(h=h):
            dbuf[h] = jnp.zeros(dbuf.shape[1:], dbuf.dtype)

    @pl.when(live_bit)
    def _():
        d_sum = sum(dbuf[h] for h in range(EO_PARTS))
        d_chunk = jnp.concatenate(
            [d_sum[0:6], jnp.abs(d_sum[0:2]), d_sum[8:]], axis=0
        )

        if PACKED_ROW_MAJOR:
            d_chunk = d_chunk.T

        _store_dchunk(flags, dout_ref, d_chunk)

    _eo_zero_write(flags, live_bit, dout_ref)


def _bwd_half_body_rev(
    cfg, tile_ref, chunk_ref, lo_ref, hi_ref, tstart_ref,
    data_ref, gcolor_ref, galpha_ref, livecnt_ref, state, s, rows,
    row_offset, n_rows,
):
    K = cfg.chunk
    px, py = _pixel_coords(cfg, tile_ref[s], row_offset=row_offset, n_rows=n_rows)
    v = _alphas(cfg, _load_data(data_ref), px, py)
    slot = chunk_ref[s] * K + jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    in_range = (slot >= lo_ref[s]) & (slot < hi_ref[s])
    vis = v["vis"] & in_range
    a_eff = jnp.where(in_range, v["a_eff"], 0.0)
    T_after = state[rows, 0:1]
    r_after_carry = state[rows, 1:2]
    g_color = gcolor_ref[0, :, rows]  # (C, n_rows)
    g_alpha = galpha_ref[0, rows]  # (n_rows, 1)
    livecnt = livecnt_ref[0, rows]  # (n_rows, 1)

    # rank of each slot within the tile's sorted run; the forward's
    # per-pixel live count is exactly the termination cutoff (live is
    # monotone in rank), so live = rank < livecnt reproduces the forward's
    # live set without forward transmittance.
    rank = (slot - tstart_ref[tile_ref[s]]).astype(jnp.float32)  # (1, K)
    live = (rank < livecnt).astype(jnp.float32)  # (n_rows, K)
    al = a_eff * live
    one_minus = 1.0 - al
    log_om = jnp.log(one_minus)

    # T before slot k (forward sense) = T_after_chunk / prod_{j>=k}(1-al_j):
    # suffix-INCLUSIVE log sum, then one exp. Live transmittances stay above
    # TRANSMITTANCE_EPS * (1 - MAX_ALPHA), so the reconstruction divides by
    # factors bounded away from 0 — no cancellation anywhere.
    sl = _sumsuffix_lanes(log_om, excl=False, prec=SCAN_PRECISION_REV)
    excl_T = T_after * jnp.exp(-sl)
    comp = jnp.where(vis, live, 0.0)
    w = al * excl_T  # al already carries the live gate; vis is inside a_eff

    C_dim = g_color.shape[0]
    b = g_alpha
    for ci in range(C_dim):
        b = b + g_color[ci : ci + 1, :].T * v["cols"][ci : ci + 1, :]
    wb = w * b
    # suffix of DEEPER contributions: exclusive suffix within the chunk plus
    # the carried sum of all previously processed (deeper) chunks
    r_after = r_after_carry + _sumsuffix_lanes(wb, excl=True, prec=SCAN_PRECISION_REV)

    da = (excl_T * b - r_after / one_minus) * comp

    T_begin = T_after * jnp.exp(-jnp.sum(log_om, axis=1, keepdims=True))
    r_new = r_after_carry + jnp.sum(wb, axis=1, keepdims=True)
    state[rows] = jnp.concatenate([T_begin, r_new], axis=1)

    return _grad_rows(cfg, tile_ref, data_ref, s, v, da, w, g_color, row_offset, n_rows)


# -----------------------------------------------------------------------------
# pallas_call wrappers
# -----------------------------------------------------------------------------


def _data_spec(cfg: _Cfg, packed):
    """BlockSpec for the per-intersection data chunk in either memory order."""
    K = cfg.chunk
    if PACKED_ROW_MAJOR:
        D = packed.shape[1]
        return pl.BlockSpec((K, D), lambda s, st, sf, sc, sl, sh, *r: (sc[s], 0))
    D = packed.shape[0]
    return pl.BlockSpec((D, K), lambda s, st, sf, sc, sl, sh, *r: (0, sc[s]))


def _run_fwd(cfg: _Cfg, packed, seg_tile, seg_flags, seg_chunk, seg_lo, seg_hi, num_seg_cap):
    P = cfg.tile_size * cfg.tile_size
    num_tiles = cfg.tiles_w * cfg.tiles_h
    rev = BWD_WALK == "rev"
    # Outputs are EXACTLY (num_tiles, ...): no dustbin row. Dead segments
    # (seg_tile == num_tiles) clamp onto the LAST tile's window — in sorted
    # order they all come after that tile's real segments, so the window
    # never changes and Mosaic's end-of-grid flush rewrites the tile's own
    # (already correct) VMEM. This removes the (T+1)->(T) output slices and
    # the ~0.9 ms of pad fusions their cotangents cost in the backward
    # (pad.1158/.1159, docs/NOTES_ROUND3.md slice-inside-vjp post-mortem).
    tmax = num_tiles - 1
    tile_block = pl.BlockSpec(
        (1, P, 1), lambda s, st, sf, sc, sl, sh, *r: (jnp.minimum(st[s], tmax), 0, 0)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(num_seg_cap,),
        in_specs=[
            _data_spec(cfg, packed),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, cfg.channels, P),
                lambda s, st, sf, sc, sl, sh, *r: (jnp.minimum(st[s], tmax), 0, 0),
            ),
            tile_block,
            tile_block,
        ] + ([tile_block] if rev else []),
        scratch_shapes=[pltpu.VMEM((P, 2), jnp.float32)]
        + ([pltpu.SMEM((EO_PARTS,), jnp.int32)] if FWD_EARLY_OUT else []),
    )
    tile_shape = jax.ShapeDtypeStruct((num_tiles, P, 1), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, cfg.channels, P), jnp.float32),
            tile_shape,
            tile_shape,
        ] + ([tile_shape] if rev else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=cfg.interpret,
    )(seg_tile, seg_flags, seg_chunk, seg_lo, seg_hi, packed)
    color, alpha, livecnt = outs[:3]
    t_final = outs[3] if rev else None
    return color, alpha, livecnt, t_final


def _run_bwd(
    cfg: _Cfg, packed, seg_tile, seg_flags, seg_chunk, seg_lo, seg_hi, num_seg_cap,
    g_color, g_alpha, r_total,
):
    P = cfg.tile_size * cfg.tile_size
    D = packed.shape[1] if PACKED_ROW_MAJOR else packed.shape[0]
    K = cfg.chunk
    tmax = cfg.tiles_w * cfg.tiles_h - 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(num_seg_cap,),
        in_specs=[
            _data_spec(cfg, packed),
            pl.BlockSpec(
                (1, cfg.channels, P),
                lambda s, st, sf, sc, sl, sh, *r: (jnp.minimum(st[s], tmax), 0, 0),
            ),
            pl.BlockSpec(
                (1, P, 1),
                lambda s, st, sf, sc, sl, sh, *r: (jnp.minimum(st[s], tmax), 0, 0),
            ),
            pl.BlockSpec(
                (1, P, 1),
                lambda s, st, sf, sc, sl, sh, *r: (jnp.minimum(st[s], tmax), 0, 0),
            ),
        ],
        out_specs=_data_spec(cfg, packed),
        scratch_shapes=[
            pltpu.VMEM((P, 3), jnp.float32),
            pltpu.VMEM((EO_PARTS, D, K), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, cfg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            packed.shape,
            jnp.bfloat16 if BWD_ROWS_BF16 else jnp.float32,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=cfg.interpret,
    )(seg_tile, seg_flags, seg_chunk, seg_lo, seg_hi, packed, g_color, g_alpha, r_total)


def _run_bwd_rev(
    cfg: _Cfg, packed, seg_tile, seg_flags, seg_chunk, seg_lo, seg_hi,
    tile_starts, num_seg_cap, g_color, g_alpha, t_final, livecnt,
):
    """Reverse-walk variant: the seg_* tables must already be REVERSED;
    tile_starts rides as a 6th scalar-prefetch so the kernel can compute
    each slot's rank within its tile's sorted run."""
    assert SCAN_IMPL == "mxu", "BWD_WALK='rev' requires MXU scans"
    P = cfg.tile_size * cfg.tile_size
    D = packed.shape[1] if PACKED_ROW_MAJOR else packed.shape[0]
    K = cfg.chunk
    tmax = cfg.tiles_w * cfg.tiles_h - 1
    tile_block = pl.BlockSpec(
        (1, P, 1), lambda s, st, sf, sc, sl, sh, ts_: (jnp.minimum(st[s], tmax), 0, 0)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(num_seg_cap,),
        in_specs=[
            _data_spec(cfg, packed),
            pl.BlockSpec(
                (1, cfg.channels, P),
                lambda s, st, sf, sc, sl, sh, ts_: (jnp.minimum(st[s], tmax), 0, 0),
            ),
            tile_block,  # g_alpha
            tile_block,  # t_final
            tile_block,  # livecnt
        ],
        out_specs=_data_spec(cfg, packed),
        scratch_shapes=[
            pltpu.VMEM((P, 2), jnp.float32),
            pltpu.VMEM((EO_PARTS, D, K), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel_rev, cfg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            packed.shape,
            jnp.bfloat16 if BWD_ROWS_BF16 else jnp.float32,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=cfg.interpret,
    )(
        seg_tile, seg_flags, seg_chunk, seg_lo, seg_hi, tile_starts,
        packed, g_color, g_alpha, t_final, livecnt,
    )


# -----------------------------------------------------------------------------
# custom_vjp over the tile-blocked pixel stage
# -----------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _rasterize_tiles(cfg, num_seg_cap, packed, seg_tile, seg_flags, seg_chunk, seg_lo, seg_hi, tile_starts):
    color, alpha, _, _ = _run_fwd(cfg, packed, seg_tile, seg_flags, seg_chunk, seg_lo, seg_hi, num_seg_cap)
    return color, alpha


def _rasterize_tiles_fwd(cfg, num_seg_cap, packed, seg_tile, seg_flags, seg_chunk, seg_lo, seg_hi, tile_starts):
    color, alpha, livecnt, t_final = _run_fwd(cfg, packed, seg_tile, seg_flags, seg_chunk, seg_lo, seg_hi, num_seg_cap)
    res = (packed, seg_tile, seg_flags, seg_chunk, seg_lo, seg_hi, tile_starts, color, alpha, livecnt, t_final)
    return (color, alpha), res


def _bwd_tables_early_out(cfg, seg_tile, seg_flags, seg_chunk, seg_lo, tile_starts, livecnt):
    """Recompute the backward's segment tables so segments past every pixel's
    termination cutoff are dead (BWD_EARLY_OUT). The forward's livecnt gives
    per-tile needed depth nl = max over pixels of the live-slot count; a
    segment whose slot range starts at/after tile_start + nl has zero
    gradient for every slot and is skipped by the ordinary seg_live gate.
    Returns (flags_bwd, chunk_bwd, visited) with visited the per-chunk
    touched-by-a-live-segment mask (untouched chunk outputs are zeroed by
    the caller — their true gradients are identically zero)."""
    P = livecnt.shape[1]
    part = P // EO_PARTS
    # per-band termination cutoffs: nl[t, h] = max live count over band h
    nl = jnp.max(
        livecnt[:, :, 0].reshape(-1, EO_PARTS, part), axis=2
    ).astype(jnp.int32)  # (T, EO_PARTS)
    live0 = (seg_flags >> 1) & 1 == 1
    start = tile_starts[seg_tile]
    live_parts = [
        live0 & (seg_lo < start + nl[:, h][seg_tile]) for h in range(EO_PARTS)
    ]
    live = live_parts[0]
    for lp in live_parts[1:]:
        live = live | lp
    part_bits = sum(
        (1 << (3 + h)) * live_parts[h].astype(jnp.int32)
        for h in range(EO_PARTS)
    )
    if EO_ZERO_WRITE:
        # Originally-live segments KEEP their own chunk and the binning's
        # first-toucher bit; early-outed first touchers write zeros in the
        # kernel (bit 3+EO_PARTS marks original liveness), so every covered
        # chunk is written and no outside mask pass is needed.
        flags_bwd = (
            (seg_flags & (1 + 4))
            + 2 * live.astype(jnp.int32)
            + part_bits
            + (1 << (3 + EO_PARTS)) * live0.astype(jnp.int32)
        )
        return flags_bwd, seg_chunk, None
    # Newly-dead segments must not open an unwritten output window (Mosaic
    # flushes on window change without tracking writes): repeat the previous
    # live segment's chunk, as tiles.py does for originally-dead segments.
    live_chunk = jax.lax.cummax(jnp.where(live, seg_chunk, -1), axis=0)
    chunk_bwd = jnp.maximum(live_chunk, 0).astype(jnp.int32)
    # First LIVE toucher of each chunk writes; later consecutive live
    # touchers accumulate. Chunks are monotone non-decreasing over live
    # segments, so "differs from the previous live segment's chunk" is exact.
    prev_live_chunk = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), live_chunk[:-1]]
    )
    chunk_first = live & (seg_chunk != prev_live_chunk)
    flags_bwd = (
        (seg_flags & 1)
        + 2 * live.astype(jnp.int32)
        + 4 * chunk_first.astype(jnp.int32)
        + part_bits
    )
    return flags_bwd, chunk_bwd, live


def _mask_unvisited_chunks(d_packed: jax.Array, visited: jax.Array, chunk: int) -> jax.Array:
    """Zero the gradient rows of chunks no live backward segment touched.

    Those chunks' true gradients are identically zero (every slot lies past
    every pixel's termination cutoff), but the kernel never WRITES their
    output windows, so on real TPU they hold whatever garbage was in the HBM
    buffer — including ±inf/NaN bit patterns (interpret mode leaves zeros,
    which is why CPU parity tests cannot see this). The mask MUST therefore
    be a select: a multiply turns inf*0 into NaN and poisons the whole
    per-Gaussian reduction — the root cause of the step-1451 training
    collapse (docs/NOTES_ROUND2.md)."""
    zero = jnp.zeros((), d_packed.dtype)
    if PACKED_ROW_MAJOR:
        cap, d_rows = d_packed.shape
        n_chunks = cap // chunk
        return jnp.where(
            (visited > 0)[:, None, None],
            d_packed.reshape(n_chunks, chunk, d_rows),
            zero,
        ).reshape(cap, d_rows)
    d_rows, cap = d_packed.shape
    n_chunks = cap // chunk
    return jnp.where(
        (visited > 0)[None, :, None],
        d_packed.reshape(d_rows, n_chunks, chunk),
        zero,
    ).reshape(d_rows, cap)


def _reverse_tables(seg_tile, flags_bwd, chunk_bwd, seg_lo, seg_hi, n_chunks):
    """Flip the segment tables for the reverse walk and rebuild the
    order-dependent flag bits. Chunk/slot POSITIONS are absolute (the out
    BlockSpec indexes by chunk id), so only the walk order flips:

      bit0 (init): first segment of the tile IN REVERSE = last in forward.
      bit2 (chunk writer): first LIVE toucher of each chunk in reverse; a
        dead segment repeats the nearest already-visited live chunk so it
        never opens an unwritten output window (Mosaic flushes on window
        change without tracking writes). In reverse order live chunks are
        monotone non-increasing, so `cummin` carries the most recent one.
    """
    S = seg_tile.shape[0]
    tile_r = seg_tile[::-1]
    flags_r = flags_bwd[::-1]
    chunk_r = chunk_bwd[::-1]
    # Chunk ownership (who opens/writes output windows) follows ORIGINAL
    # liveness under EO_ZERO_WRITE (bit5): early-outed owners write zeros
    # instead of repeating a neighbor's chunk. Without it, bit1 (the
    # post-early-out live set) is the owner set, as before.
    if BWD_EARLY_OUT and EO_ZERO_WRITE:
        live_r = (flags_r >> (3 + EO_PARTS)) & 1 == 1
    else:
        live_r = (flags_r >> 1) & 1 == 1
    first_r = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), tile_r[1:] != tile_r[:-1]]
    )
    big = jnp.int32(n_chunks)
    carried = jax.lax.cummin(jnp.where(live_r, chunk_r, big), axis=0)
    chunk_safe = jnp.where(carried == big, 0, carried).astype(jnp.int32)
    prev = jnp.concatenate([jnp.full((1,), big, jnp.int32), carried[:-1]])
    chunk_first = live_r & (chunk_r != prev)
    flags_rev = (
        first_r.astype(jnp.int32)
        + (flags_r & 2)  # live bit
        + 4 * chunk_first.astype(jnp.int32)
        + (flags_r & (((1 << (EO_PARTS + 1)) - 1) << 3))  # band + orig-live bits
    )
    return tile_r, flags_rev, chunk_safe, seg_lo[::-1], seg_hi[::-1]


def _pixel_bwd_dpacked(
    cfg, num_seg_cap, packed, seg_tile, seg_flags, seg_chunk, seg_lo, seg_hi,
    tile_starts, color, alpha, livecnt, t_final, g_color, g_alpha,
):
    """Run the backward pixel kernel; returns d_packed in the packed memory
    order (bf16 when BWD_ROWS_BF16)."""
    live0 = (seg_flags >> 1) & 1
    # without table EO, every band-live bit mirrors the segment live bit
    flags_bwd = seg_flags + sum((1 << (3 + h)) * live0 for h in range(EO_PARTS))
    chunk_bwd = seg_chunk
    visited = None
    n_chunks = (
        packed.shape[0] if PACKED_ROW_MAJOR else packed.shape[1]
    ) // cfg.chunk
    if BWD_EARLY_OUT:
        flags_bwd, chunk_bwd, live = _bwd_tables_early_out(
            cfg, seg_tile, seg_flags, seg_chunk, seg_lo, tile_starts, livecnt
        )
        if not EO_ZERO_WRITE:
            visited = (
                jnp.zeros((n_chunks,), jnp.float32)
                .at[jnp.where(live, chunk_bwd, n_chunks)]
                .max(1.0, mode="drop")
            )
    # d_all rows 6:8 carry the per-intersection |d means2d| (absgrad): the
    # outer `_gather_rows` VJP segment-sums ALL rows per Gaussian, and the
    # packed-layout concat routes rows 6:8 to `means2d_sink`'s cotangent —
    # the absgrad reduction rides the one sort-based reduction for free
    # (a separate jax.ops.segment_sum here cost ~1.5 ms of scatter).
    if BWD_WALK == "rev":
        tile_r, flags_r, chunk_r, lo_r, hi_r = _reverse_tables(
            seg_tile, flags_bwd, chunk_bwd, seg_lo, seg_hi, n_chunks
        )
        d_packed = _run_bwd_rev(
            cfg, packed, tile_r, flags_r, chunk_r, lo_r, hi_r, tile_starts,
            num_seg_cap, g_color, g_alpha, t_final, livecnt,
        )
    else:
        r_total = (
            jnp.einsum(
                "tcp,tcp->tp", color, g_color, precision=jax.lax.Precision.HIGHEST
            )[..., None]
            + alpha * g_alpha
        )
        d_packed = _run_bwd(
            cfg, packed, seg_tile, flags_bwd, chunk_bwd, seg_lo, seg_hi, num_seg_cap,
            g_color, g_alpha, r_total,
        )
    if visited is not None:
        d_packed = _mask_unvisited_chunks(d_packed, visited, cfg.chunk)
    return d_packed


def _rasterize_tiles_bwd(cfg, num_seg_cap, res, cots):
    packed, seg_tile, seg_flags, seg_chunk, seg_lo, seg_hi, tile_starts, color, alpha, livecnt, t_final = res
    g_color, g_alpha = cots
    d_packed = _pixel_bwd_dpacked(
        cfg, num_seg_cap, packed, seg_tile, seg_flags, seg_chunk, seg_lo,
        seg_hi, tile_starts, color, alpha, livecnt, t_final, g_color, g_alpha,
    ).astype(packed.dtype)  # custom_vjp dtype contract (standalone users)
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return (
        d_packed, f0(seg_tile), f0(seg_flags), f0(seg_chunk), f0(seg_lo),
        f0(seg_hi), f0(tile_starts),
    )


_rasterize_tiles.defvjp(_rasterize_tiles_fwd, _rasterize_tiles_bwd)


# Merged pixel-stage VJP: row gather + pixel kernels in ONE custom_vjp so
# the backward's per-intersection cotangents never cross a custom_vjp dtype
# boundary (which would force f32) — the kernel's d_packed flows straight
# into the sort-based per-Gaussian reduction, in bf16 when BWD_ROWS_BF16.


def _pack_gathered(per_gauss, gids):
    packed = per_gauss[gids]  # (capacity, D)
    return packed if PACKED_ROW_MAJOR else packed.T


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _rasterize_rows(
    cfg, num_seg_cap, per_gauss, gids, offsets, counts,
    seg_tile, seg_flags, seg_chunk, seg_lo, seg_hi, tile_starts,
):
    packed = _pack_gathered(per_gauss, gids)
    color, alpha, _, _ = _run_fwd(
        cfg, packed, seg_tile, seg_flags, seg_chunk, seg_lo, seg_hi, num_seg_cap
    )
    return color, alpha


def _rasterize_rows_fwdfn(
    cfg, num_seg_cap, per_gauss, gids, offsets, counts,
    seg_tile, seg_flags, seg_chunk, seg_lo, seg_hi, tile_starts,
):
    packed = _pack_gathered(per_gauss, gids)
    color, alpha, livecnt, t_final = _run_fwd(
        cfg, packed, seg_tile, seg_flags, seg_chunk, seg_lo, seg_hi, num_seg_cap
    )
    res = (
        packed, gids, offsets, counts, seg_tile, seg_flags, seg_chunk,
        seg_lo, seg_hi, tile_starts, color, alpha, livecnt, t_final,
    )
    return (color, alpha), res


def _rasterize_rows_bwdfn(cfg, num_seg_cap, res, cots):
    (
        packed, gids, offsets, counts, seg_tile, seg_flags, seg_chunk,
        seg_lo, seg_hi, tile_starts, color, alpha, livecnt, t_final,
    ) = res
    g_color, g_alpha = cots
    d_packed = _pixel_bwd_dpacked(
        cfg, num_seg_cap, packed, seg_tile, seg_flags, seg_chunk, seg_lo,
        seg_hi, tile_starts, color, alpha, livecnt, t_final, g_color, g_alpha,
    )
    d_rows = d_packed if PACKED_ROW_MAJOR else d_packed.T  # (capacity, D)
    g_full = _reduce_rows_by_gid(d_rows, gids, offsets, counts)
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return (
        g_full, f0(gids), f0(offsets), f0(counts), f0(seg_tile),
        f0(seg_flags), f0(seg_chunk), f0(seg_lo), f0(seg_hi), f0(tile_starts),
    )


_rasterize_rows.defvjp(_rasterize_rows_fwdfn, _rasterize_rows_bwdfn)


# -----------------------------------------------------------------------------
# Public entry
# -----------------------------------------------------------------------------


def rasterize_pixels_pallas(
    means2d: jax.Array,
    conics: jax.Array,
    colors: jax.Array,
    opacities: jax.Array,
    depths: jax.Array,
    radii: jax.Array,
    width: int,
    height: int,
    *,
    tile_size: int = 16,
    chunk: int = 128,
    capacity: int | None = None,
    means2d_sink: jax.Array | None = None,
    interpret: bool | None = None,
):
    """Tile-rasterize pre-projected Gaussians. Returns (render (H,W,C), alpha (H,W,1)).

    `means2d_sink`: optional (N, 2) zero array; its gradient under jax.grad is
    the AbsGS absgrad statistic (per-tile |d means2d| accumulated).
    """
    n, C = colors.shape[0], colors.shape[-1]
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu",)
    if capacity is None:
        capacity = _round_up(max(4 * n, 1024), chunk)
    else:
        capacity = _round_up(capacity, chunk)

    # Binning outputs are integer-valued (ids/offsets): no gradient path.
    isect = build_intersections_segments(
        jax.lax.stop_gradient(means2d),
        radii,
        jax.lax.stop_gradient(depths),
        width,
        height,
        tile_size,
        capacity,
        chunk,
        conics=conics if ELLIPSE_CULL else None,
        opacities=opacities if ELLIPSE_CULL else None,
        precull=PRECULL,
    )
    tiles_w, tiles_h = isect.tiles_w, isect.tiles_h
    num_tiles = isect.num_tiles
    cfg = _Cfg(
        width=width,
        height=height,
        tile_size=tile_size,
        channels=C,
        chunk=chunk,
        tiles_w=tiles_w,
        tiles_h=tiles_h,
        interpret=bool(interpret),
    )

    # Gather per-intersection packed rows; index n is the zero padding row.
    # Pad columns keep color rows at sublane 8 and round the row count to a
    # multiple of 8 (Mosaic slice-alignment requirement). Columns 6:8 hold
    # `means2d_sink` (zeros by contract, so the forward is unchanged): the
    # bwd kernel writes the per-intersection |d means2d| into rows 6:8, and
    # the `_gather_rows` VJP + this concat's transpose deliver the absgrad
    # as the sink's cotangent with no extra reduction.
    gate = tile_size != CONTRACT_TILE
    d_rows = _round_up(8 + C + (1 if gate else 0), 8)
    if means2d_sink is None:
        means2d_sink = jnp.zeros((n, 2), jnp.float32)
    gate_cols = (
        # contract-bbox gate (see _alphas): radii ride the first pad column;
        # stop_gradient keeps the bbox a non-differentiable cut, exactly as
        # the binning's tile_bounds (and gsplat's isect_tiles) treat radii
        [jax.lax.stop_gradient(radii).astype(means2d.dtype)[:, None]]
        if gate
        else []
    )
    per_gauss = jnp.concatenate(
        [
            means2d,
            conics,
            opacities[:, None],
            means2d_sink.astype(means2d.dtype),
            colors,
            *gate_cols,
            jnp.zeros((n, d_rows - 8 - C - len(gate_cols)), means2d.dtype),
        ],
        axis=-1,
    )  # (N, d_rows)
    per_gauss = jnp.concatenate(
        [per_gauss, jnp.zeros((1, per_gauss.shape[1]), per_gauss.dtype)], axis=0
    )
    seg_flags = (
        isect.seg_first + 2 * isect.seg_live + 4 * isect.seg_chunk_first
    ).astype(jnp.int32)
    # Merged gather + pixel kernels (one custom_vjp): the backward's
    # per-intersection cotangents flow kernel -> sort-based per-Gaussian
    # reduction without a dtype boundary (bf16 when BWD_ROWS_BF16).
    color_tiles, alpha_tiles = _rasterize_rows(
        cfg,
        isect.num_seg_cap,
        per_gauss,
        isect.gauss_ids,
        isect.offsets,
        isect.counts,
        isect.seg_tile,
        seg_flags,
        isect.seg_chunk,
        isect.seg_lo,
        isect.seg_hi,
        isect.tile_offsets,
    )
    # (T, C, P) -> (H, W, C)
    ts = tile_size
    render = (
        color_tiles.reshape(tiles_h, tiles_w, C, ts, ts)
        .transpose(0, 3, 1, 4, 2)
        .reshape(tiles_h * ts, tiles_w * ts, C)[:height, :width]
    )
    alpha = (
        alpha_tiles.reshape(tiles_h, tiles_w, ts, ts)
        .transpose(0, 2, 1, 3)
        .reshape(tiles_h * ts, tiles_w * ts)[:height, :width, None]
    )
    return render, alpha, isect.num_isects
