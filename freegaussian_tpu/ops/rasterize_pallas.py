"""Pallas TPU tile rasterizer: fused forward + analytic backward with absgrad.

TPU-native replacement for gsplat's `rasterize_to_pixels` fwd/bwd CUDA kernels
(reference call sites freegaussian_model.py:847-868, absgrad consumption at
:369-392). Architecture:

  - Tile binning (ops/tiles.py) produces depth-sorted per-intersection arrays
    plus a per-tile offset table — all static-capacity, computed in XLA.
  - The forward kernel runs one grid step per 16x16 tile. It walks the tile's
    intersection range in K-sized chunks double-buffered HBM->VMEM, computes
    alphas for all (pixel, Gaussian) pairs of the chunk as a (P, K) VPU block,
    turns sequential front-to-back compositing into a prefix-product along the
    chunk axis, and accumulates colors with a (C,K)x(P,K)^T MXU contraction.
    Early termination exits the chunk loop when every pixel's transmittance
    is exhausted.
  - The backward kernel re-walks the chunks front-to-back, reconstructing
    transmittance and using the suffix-sum identity
        dL/da_k = T_k * b_k - (R_total - S_{<=k}) / (1 - a_k)
    to get per-intersection gradients without storing per-pixel state. Grads
    are written per intersection (each intersection belongs to exactly one
    tile, so the reduction back to Gaussians is a deterministic segment-sum —
    no atomics, unlike the CUDA kernel). The AbsGS `absgrad` statistic is the
    per-tile |grad| accumulated the same way and returned as the cotangent of
    an explicit zero-valued `sink` input.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterize_ref import ALPHA_THRESHOLD, MAX_ALPHA, TRANSMITTANCE_EPS
from .tiles import build_intersections


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class _Cfg:
    width: int
    height: int
    tile_size: int
    channels: int
    chunk: int
    tiles_w: int
    tiles_h: int
    capacity: int
    interpret: bool


def _cumprod_lanes(x: jax.Array) -> jax.Array:
    """Inclusive prefix product along axis 1 via log-step doubling.

    Avoids relying on Mosaic support for jnp.cumprod; exact multiplication in
    tree order (same class of fp error as XLA's associative scan).
    """
    p, k = x.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (p, k), 1)
    shift = 1
    while shift < k:
        rolled = pltpu.roll(x, shift, axis=1)
        x = x * jnp.where(lane >= shift, rolled, 1.0)
        shift *= 2
    return x


# -----------------------------------------------------------------------------
# Forward kernel
# -----------------------------------------------------------------------------


def _fwd_kernel(cfg: _Cfg, offsets_ref, packed_hbm, color_ref, alpha_ref, buf, sem):
    ts = cfg.tile_size
    P = ts * ts
    K = cfg.chunk
    C = cfg.channels
    t = pl.program_id(0)
    start = offsets_ref[t]
    end = offsets_ref[t + 1]
    c0 = start // K
    c1 = pl.cdiv(end, K)

    tile_x = t % cfg.tiles_w
    tile_y = t // cfg.tiles_w
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (tile_x * ts + pix % ts).astype(jnp.float32) + 0.5
    py = (tile_y * ts + pix // ts).astype(jnp.float32) + 0.5

    color_ref[0] = jnp.zeros((C, P), jnp.float32)
    alpha_ref[0] = jnp.zeros((P, 1), jnp.float32)

    def dma(slot, c):
        return pltpu.make_async_copy(
            packed_hbm.at[:, pl.ds(c * K, K)], buf.at[slot], sem.at[slot]
        )

    @pl.when(c0 < c1)
    def _():
        dma(0, c0).start()

    def cond(state):
        c, T, alive = state
        return (c < c1) & (jnp.max(alive) > 0)

    def body(state):
        c, T, alive = state
        slot = (c - c0) % 2

        @pl.when(c + 1 < c1)
        def _():
            dma((c + 1 - c0) % 2, c + 1).start()

        dma(slot, c).wait()
        data = buf[slot]  # (D, K)
        gx = data[0:1, :]
        gy = data[1:2, :]
        ca = data[2:3, :]
        cb = data[3:4, :]
        cc = data[4:5, :]
        op = data[5:6, :]
        cols = data[8 : 8 + C, :]  # (C, K) — color rows are 8-aligned

        slot_idx = c * K + jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
        in_range = (slot_idx >= start) & (slot_idx < end)

        dx = gx - px  # (P, K)
        dy = gy - py
        sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
        alpha = jnp.minimum(MAX_ALPHA, op * jnp.exp(-sigma))
        vis = in_range & (sigma >= 0) & (alpha >= ALPHA_THRESHOLD)
        a_eff = jnp.where(vis, alpha, 0.0)

        one_minus = 1.0 - a_eff
        incl = _cumprod_lanes(one_minus)  # (P, K)
        incl_T = T * incl
        excl_T = incl_T / one_minus
        live = (incl_T > TRANSMITTANCE_EPS).astype(jnp.float32) * alive
        w = a_eff * excl_T * live  # (P, K)

        color_ref[0] += jax.lax.dot_general(
            cols, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        alpha_ref[0] += jnp.sum(w, axis=1, keepdims=True)

        # Mosaic has no reduce_prod; one_minus >= 1 - MAX_ALPHA so log is safe.
        T = T * jnp.exp(
            jnp.sum(jnp.log(jnp.where(live > 0, one_minus, 1.0)), axis=1, keepdims=True)
        )
        alive = alive * (incl_T[:, -1:] > TRANSMITTANCE_EPS).astype(jnp.float32)
        return c + 1, T, alive

    T0 = jnp.ones((P, 1), jnp.float32)
    alive0 = jnp.ones((P, 1), jnp.float32)
    jax.lax.while_loop(cond, body, (c0, T0, alive0))


# -----------------------------------------------------------------------------
# Backward kernel
# -----------------------------------------------------------------------------


def _bwd_kernel(
    cfg: _Cfg,
    offsets_ref,
    packed_hbm,
    gcolor_ref,
    galpha_ref,
    rtotal_ref,
    dpacked_hbm,
    buf,
    sem,
    outbuf,
    outsem,
    rmwbuf,
    rmwsem,
):
    ts = cfg.tile_size
    P = ts * ts
    K = cfg.chunk
    C = cfg.channels
    t = pl.program_id(0)
    start = offsets_ref[t]
    end = offsets_ref[t + 1]
    c0 = start // K
    c1 = pl.cdiv(end, K)

    tile_x = t % cfg.tiles_w
    tile_y = t // cfg.tiles_w
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (tile_x * ts + pix % ts).astype(jnp.float32) + 0.5
    py = (tile_y * ts + pix // ts).astype(jnp.float32) + 0.5

    g_color = gcolor_ref[0]  # (C, P)
    g_alpha = galpha_ref[0]  # (P, 1)
    r_total = rtotal_ref[0]  # (P, 1)

    def dma_in(slot, c):
        return pltpu.make_async_copy(
            packed_hbm.at[:, pl.ds(c * K, K)], buf.at[slot], sem.at[slot]
        )

    @pl.when(c0 < c1)
    def _():
        dma_in(0, c0).start()

    def body(state):
        c, T, alive, s_cum = state
        slot = (c - c0) % 2

        @pl.when(c + 1 < c1)
        def _():
            dma_in((c + 1 - c0) % 2, c + 1).start()

        dma_in(slot, c).wait()
        data = buf[slot]
        gx = data[0:1, :]
        gy = data[1:2, :]
        ca = data[2:3, :]
        cb = data[3:4, :]
        cc = data[4:5, :]
        op = data[5:6, :]
        cols = data[8 : 8 + C, :]  # (C, K) — color rows are 8-aligned

        slot_idx = c * K + jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
        in_range = (slot_idx >= start) & (slot_idx < end)

        dx = gx - px
        dy = gy - py
        sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
        evis = jnp.exp(-sigma)
        raw_alpha = op * evis
        alpha = jnp.minimum(MAX_ALPHA, raw_alpha)
        vis = in_range & (sigma >= 0) & (alpha >= ALPHA_THRESHOLD)
        a_eff = jnp.where(vis, alpha, 0.0)

        one_minus = 1.0 - a_eff
        incl = _cumprod_lanes(one_minus)
        incl_T = T * incl
        excl_T = incl_T / one_minus
        live = (incl_T > TRANSMITTANCE_EPS).astype(jnp.float32) * alive
        comp = jnp.where(vis, live, 0.0)  # composited mask (P, K)
        w = a_eff * excl_T * comp

        # b_k = (c_k . g_color) + g_alpha per (pixel, gaussian)
        b = (
            jax.lax.dot_general(
                g_color, cols, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (P, K): contraction over C of (C,P)^T x (C,K)
            + g_alpha
        )

        wb = w * b
        s_incl = _cumsum_lanes(wb)  # inclusive prefix sum (P, K)
        r_after = r_total - (s_cum + s_incl)  # sum_{j>k} w_j b_j

        da = (excl_T * b - r_after / one_minus) * comp
        uncapped = (raw_alpha <= MAX_ALPHA).astype(jnp.float32)
        dsigma = -alpha * da * uncapped
        dmx = dsigma * (ca * dx + cb * dy)
        dmy = dsigma * (cb * dx + cc * dy)
        dca = 0.5 * dx * dx * dsigma
        dcb = dx * dy * dsigma
        dcc = 0.5 * dy * dy * dsigma
        dop = evis * da * uncapped

        # Sum over pixels -> per-intersection rows (1, K)
        row_dmx = jnp.sum(dmx, axis=0, keepdims=True)
        row_dmy = jnp.sum(dmy, axis=0, keepdims=True)
        rows_small = jnp.concatenate(
            [
                row_dmx,
                row_dmy,
                jnp.sum(dca, axis=0, keepdims=True),
                jnp.sum(dcb, axis=0, keepdims=True),
                jnp.sum(dcc, axis=0, keepdims=True),
                jnp.sum(dop, axis=0, keepdims=True),
            ],
            axis=0,
        )  # (6, K)
        dcols = jax.lax.dot_general(
            g_color, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (C, K)
        # Row layout mirrors the packed input (Mosaic requires 8-aligned
        # sublane slices, so rows are padded to a multiple of 8); the absgrad
        # rows live in the otherwise-unused pad rows 6-7, whose cotangent is
        # dropped by the outer gather transpose.
        d_rows = outbuf.shape[0]
        tail = jnp.zeros((d_rows - 8 - C, K), jnp.float32)
        d_chunk = jnp.concatenate(
            [rows_small, jnp.abs(row_dmx), jnp.abs(row_dmy), dcols, tail], axis=0
        )  # (d_rows, K)

        # Write out with the chunk-ownership protocol: the tile containing
        # slot c*K owns the chunk (full write); later tiles sharing the
        # boundary chunk read-modify-write. Grid execution is sequential
        # ("arbitrary" dimension semantics), so ordering is guaranteed.
        owner = start <= c * K

        @pl.when(owner)
        def _():
            outbuf[...] = d_chunk
            out_dma = pltpu.make_async_copy(
                outbuf, dpacked_hbm.at[:, pl.ds(c * K, K)], outsem
            )
            out_dma.start()
            out_dma.wait()

        @pl.when(jnp.logical_not(owner))
        def _():
            read_dma = pltpu.make_async_copy(
                dpacked_hbm.at[:, pl.ds(c * K, K)], rmwbuf, rmwsem
            )
            read_dma.start()
            read_dma.wait()
            outbuf[...] = rmwbuf[...] + d_chunk
            out_dma = pltpu.make_async_copy(
                outbuf, dpacked_hbm.at[:, pl.ds(c * K, K)], outsem
            )
            out_dma.start()
            out_dma.wait()

        # Mosaic has no reduce_prod; one_minus >= 1 - MAX_ALPHA so log is safe.
        T = T * jnp.exp(
            jnp.sum(jnp.log(jnp.where(live > 0, one_minus, 1.0)), axis=1, keepdims=True)
        )
        alive = alive * (incl_T[:, -1:] > TRANSMITTANCE_EPS).astype(jnp.float32)
        s_cum = s_cum + jnp.sum(wb, axis=1, keepdims=True)
        return c + 1, T, alive, s_cum

    def cond(state):
        c, T, alive, s_cum = state
        return c < c1  # no early exit: owned chunks must be written (zeros ok)

    T0 = jnp.ones((P, 1), jnp.float32)
    alive0 = jnp.ones((P, 1), jnp.float32)
    s0 = jnp.zeros((P, 1), jnp.float32)
    jax.lax.while_loop(cond, body, (c0, T0, alive0, s0))


def _cumsum_lanes(x: jax.Array) -> jax.Array:
    """Inclusive prefix sum along axis 1 via log-step doubling."""
    p, k = x.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (p, k), 1)
    shift = 1
    while shift < k:
        rolled = pltpu.roll(x, shift, axis=1)
        x = x + jnp.where(lane >= shift, rolled, 0.0)
        shift *= 2
    return x


# -----------------------------------------------------------------------------
# custom_vjp wrapper over the tile-blocked pixel stage
# -----------------------------------------------------------------------------


def _run_fwd(cfg: _Cfg, packed, tile_offsets):
    P = cfg.tile_size * cfg.tile_size
    num_tiles = cfg.tiles_w * cfg.tiles_h
    D_in = packed.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, cfg.channels, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, P, 1), lambda t, *_: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, D_in, cfg.chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, cfg.channels, P), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, P, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=cfg.interpret,
    )(tile_offsets, packed)


def _run_bwd(cfg: _Cfg, packed, tile_offsets, g_color, g_alpha, r_total):
    P = cfg.tile_size * cfg.tile_size
    num_tiles = cfg.tiles_w * cfg.tiles_h
    D_in = packed.shape[0]
    D_out = D_in
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, cfg.channels, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, P, 1), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, P, 1), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, D_in, cfg.chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((D_out, cfg.chunk), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((D_out, cfg.chunk), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, cfg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D_out, cfg.capacity), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        interpret=cfg.interpret,
    )(tile_offsets, packed, g_color, g_alpha, r_total)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _rasterize_tiles(cfg: _Cfg, packed, tile_offsets, gids, sink):
    color, alpha = _run_fwd(cfg, packed, tile_offsets)
    return color, alpha


def _rasterize_tiles_fwd(cfg, packed, tile_offsets, gids, sink):
    color, alpha = _run_fwd(cfg, packed, tile_offsets)
    return (color, alpha), (packed, tile_offsets, gids, color, alpha, sink.shape[0])


def _rasterize_tiles_bwd(cfg, res, cots):
    packed, tile_offsets, gids, color, alpha, n = res
    g_color, g_alpha = cots
    r_total = (
        jnp.einsum("tcp,tcp->tp", color, g_color)[..., None] + alpha * g_alpha
    )
    d_all = _run_bwd(cfg, packed, tile_offsets, g_color, g_alpha, r_total)
    d_packed = d_all
    d_abs = d_all[6:8]  # absgrad rows live in the pad rows (dropped upstream)
    # Deterministic segment-sum of per-tile |grad| rows -> per-Gaussian absgrad.
    d_sink = jax.ops.segment_sum(d_abs.T, gids, num_segments=n + 1)[:n]
    zero_offsets = np.zeros(tile_offsets.shape, dtype=jax.dtypes.float0)
    zero_gids = np.zeros(gids.shape, dtype=jax.dtypes.float0)
    return d_packed, zero_offsets, zero_gids, d_sink


_rasterize_tiles.defvjp(_rasterize_tiles_fwd, _rasterize_tiles_bwd)


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
        interpret = jax.devices()[0].platform != "tpu"
    if capacity is None:
        capacity = _round_up(max(4 * n, 1024), chunk)
    else:
        capacity = _round_up(capacity, chunk)

    # Binning outputs are integer-valued (ids/offsets): no gradient path.
    isect = build_intersections(
        jax.lax.stop_gradient(means2d),
        radii,
        jax.lax.stop_gradient(depths),
        width,
        height,
        tile_size,
        capacity,
    )
    tiles_w, tiles_h = isect.tiles_w, isect.tiles_h
    cfg = _Cfg(
        width=width,
        height=height,
        tile_size=tile_size,
        channels=C,
        chunk=chunk,
        tiles_w=tiles_w,
        tiles_h=tiles_h,
        capacity=capacity,
        interpret=bool(interpret),
    )

    # Gather per-intersection packed rows; index n is the zero padding row.
    # Pad columns keep color rows at sublane 8 and round the total row count
    # to a multiple of 8 (Mosaic slice-alignment requirement).
    d_rows = _round_up(8 + C, 8)
    per_gauss = jnp.concatenate(
        [
            means2d,
            conics,
            opacities[:, None],
            jnp.zeros((n, 2), means2d.dtype),
            colors,
            jnp.zeros((n, d_rows - 8 - C), means2d.dtype),
        ],
        axis=-1,
    )  # (N, d_rows)
    per_gauss = jnp.concatenate(
        [per_gauss, jnp.zeros((1, per_gauss.shape[1]), per_gauss.dtype)], axis=0
    )
    packed = per_gauss[isect.gauss_ids].T  # (D, I) — differentiable gather

    if means2d_sink is None:
        means2d_sink = jnp.zeros((n, 2), jnp.float32)

    color_tiles, alpha_tiles = _rasterize_tiles(
        cfg, packed, isect.tile_offsets, isect.gauss_ids, means2d_sink
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
    return render, alpha
