"""Public rasterization API: project -> SH -> tile rasterize.

Mirrors the surface of `gsplat.rasterization(...)` that the reference
exercises (freegaussian_model.py:847-868, freegaussian_control_model.py:158-179,
preprocess/knn_gaussian.py:93-113):

  render, alpha, info = rasterization(
      means, quats, scales, opacities, colors, viewmats, Ks, width, height,
      tile_size=16, near_plane=0.01, far_plane=1e10,
      render_mode in {"RGB", "RGB+ED", "ED"}, sh_degree, absgrad,
      rasterize_mode in {"classic", "antialiased"})

with info = {means2d, radii, depths, gaussian_ids (packed consumers)}.

TPU-first design notes:
  - Everything is functional and jit-friendly: no dynamic shapes. Culling is a
    radii==0 mask, not an array resize, so padded-capacity Gaussian sets
    (densification) trace once.
  - `absgrad` is exposed through an explicit `means2d_sink` input: the custom
    backward of the tile rasterizer returns the per-tile |grad| accumulation as
    the cotangent of that input, so one jax.grad call yields both the signed
    gradients and the AbsGS densification statistic.
  - backend="reference" is the pure-jnp oracle; backend="pallas" is the fused
    tile kernel (ops/rasterize_pallas.py); "auto" picks pallas on TPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import project_gaussians
from .rasterize_ref import ALPHA_THRESHOLD, rasterize_pixels_reference
from .sh import eval_sh_colors


def tighten_radii(radii: jax.Array, opacities: jax.Array) -> jax.Array:
    """Opacity-aware screen radius — EXACT intersection pruning.

    The pixel kernels zero any (pixel, Gaussian) pair with
    ``alpha = op * exp(-sigma) < ALPHA_THRESHOLD`` (the `vis` test in both
    `rasterize_ref` and `rasterize_pallas`, mirroring gsplat's skip). Along
    any screen direction ``sigma >= d^2 / (2 * v1max)`` where v1max is the
    larger eigenvalue of the blurred 2D covariance and the projection's
    radius is ``ceil(3 * sqrt(v1max))``. So every pixel farther than
    ``sqrt(2 * ln(op / thresh)) * sqrt(v1max)`` from the center composites to
    exactly zero, forward AND backward — and the binning radius can shrink to
    ``radius * sqrt(2 * ln(op / thresh)) / 3`` without changing one output
    bit. gsplat's fixed 3-sigma bbox is exact only at op >= e^4.5/255 ~ 0.353;
    below that (freshly densified / opacity-reset Gaussians live at 0.1-0.2)
    the excess bbox is pure binning/sort/kernel overhead. The result stays
    FRACTIONAL (tile_bounds consumes float radii) — ceiling back to ints
    would erase the win for the common 3-6 px Gaussians. The projection's
    int radius upper-bounds 3*sqrt(v1max), so the product upper-bounds the
    true threshold radius. Only the pixel-stage binning sees the tight
    radius; `info.radii` keeps the gsplat value (densification's
    max-2D-radius stat parity).
    """
    op = jax.lax.stop_gradient(opacities)
    s2 = 2.0 * jnp.log(jnp.maximum(op, 1e-30) / ALPHA_THRESHOLD)
    factor = jnp.minimum(jnp.sqrt(jnp.maximum(s2, 0.0)) * (1.0 / 3.0), 1.0)
    r = radii.astype(jnp.float32) * factor
    return jnp.where(op > ALPHA_THRESHOLD, r, 0.0)


class RasterizeInfo(NamedTuple):
    means2d: jax.Array  # (N, 2) projected centers (+ sink for absgrad)
    radii: jax.Array  # (N,) int32
    depths: jax.Array  # (N,)
    conics: jax.Array  # (N, 3)
    compensations: jax.Array  # (N,)
    num_isects: jax.Array  # () tile intersections this frame (capacity monitor)
    # packed=True extras (gsplat packed-mode contract, consumed by clustering
    # tools — ref preprocess/knn_gaussian.py:93-113). Capacity-padded arrays;
    # slots >= num_isects carry gaussian_ids == N (the padding id).
    gaussian_ids: jax.Array | None = None  # (I_CAP,) int32
    isect_means2d: jax.Array | None = None  # (I_CAP, 2) per-intersection centers
    isect_depths: jax.Array | None = None  # (I_CAP,)
    tile_ids: jax.Array | None = None  # (I_CAP,) int32 row-major tile index


# Debug capture callback for the pixel-stage operands (set by debugging
# harnesses; None in production).
_pixel_stage_capture = None


def _resolve_backend(backend: str) -> str:
    if backend != "auto":
        return backend
    platform = jax.devices()[0].platform
    return "pallas" if platform == "tpu" else "reference"


def rasterization(
    means: jax.Array,  # (N, 3)
    quats: jax.Array,  # (N, 4) wxyz
    scales: jax.Array,  # (N, 3) linear-space
    opacities: jax.Array,  # (N,) post-sigmoid
    colors: jax.Array,  # (N, C) precomputed or (N, K, 3) SH coefficients
    viewmats: jax.Array,  # (1, 4, 4) or (4, 4) world-to-camera
    Ks: jax.Array,  # (1, 3, 3) or (3, 3)
    width: int,
    height: int,
    *,
    tile_size: int = 16,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    render_mode: str = "RGB",
    sh_degree: int | None = None,
    absgrad: bool = False,
    rasterize_mode: str = "classic",
    radius_clip: float = 0.0,
    alive: jax.Array | None = None,
    means2d_sink: jax.Array | None = None,
    extra_channels: jax.Array | None = None,
    backend: str = "auto",
    chunk: int = 128,
    isect_capacity: int | None = None,
    tight_radius: bool = True,
    packed: bool = False,
    gather_axis: str | None = None,
    tile_origin_y: jax.Array | int = 0,
    proj_height: int | None = None,
):
    """Render N Gaussians through one camera.

    Returns (render (1, H, W, C_out), alpha (1, H, W, 1), info: RasterizeInfo).
    For "RGB+ED" the last channel is expected depth (accumulated depth
    normalized by alpha); for "ED" the single channel is expected depth.
    """
    if rasterize_mode not in ("classic", "antialiased"):
        raise ValueError(f"Unknown rasterize_mode: {rasterize_mode}")
    if render_mode not in ("RGB", "RGB+ED", "ED"):
        raise ValueError(f"Unknown render_mode: {render_mode}")
    backend = _resolve_backend(backend)

    viewmat = viewmats.reshape(-1, 4, 4)[0]
    K = Ks.reshape(-1, 3, 3)[0]

    # `tile_origin_y`/`proj_height`: render a horizontal band [origin, origin
    # + height) of a `proj_height`-tall full frame (the tile-sharded
    # rasterizer, parallel/sharding.py). Projection (EWA frustum clamps,
    # screen culling) always runs against the FULL frame so per-Gaussian
    # attributes are bit-identical to the single-chip path; only the pixel
    # stage sees band coordinates.
    proj = project_gaussians(
        means,
        quats,
        scales,
        viewmat,
        K,
        width,
        proj_height if proj_height is not None else height,
        near_plane=near_plane,
        far_plane=far_plane,
        radius_clip=radius_clip,
        calc_compensations=(rasterize_mode == "antialiased"),
        alive=alive,
    )

    means2d = proj.means2d
    sink_for_pixels = None
    if means2d_sink is not None:
        if backend == "pallas":
            # True AbsGS semantics (ref gsplat absgrad=True, consumed at
            # freegaussian_model.py:377): the fused backward accumulates the
            # per-tile |d means2d| into this input's cotangent.
            sink_for_pixels = means2d_sink
        else:
            # Oracle backend: plain autodiff can only deliver the signed
            # screen grad, so the sink rides means2d (|signed| <= absgrad;
            # CPU-only approximation, the TPU path above is exact AbsGS).
            means2d = means2d + means2d_sink

    if sh_degree is not None:
        camtoworld_pos = -viewmat[:3, :3].T @ viewmat[:3, 3]
        dirs = means - camtoworld_pos
        rgb = eval_sh_colors(colors, dirs, sh_degree)
        rgb = jnp.clip(rgb + 0.5, 0.0, None)
    else:
        rgb = colors
    if rgb.ndim == 3:  # (N, K, 3) with sh_degree None should not happen
        rgb = rgb[:, 0, :]

    opac = opacities
    if rasterize_mode == "antialiased":
        opac = opac * proj.compensations

    if render_mode == "RGB":
        channels = rgb
    elif render_mode == "RGB+ED":
        channels = jnp.concatenate([rgb, proj.depths[:, None]], axis=-1)
    else:  # ED
        channels = proj.depths[:, None]
    if extra_channels is not None:
        # Extra per-Gaussian channels (e.g. screen-space flow) composited like
        # color; inserted before the depth channel so ED normalization below
        # still addresses the last channel.
        if render_mode in ("RGB+ED", "ED"):
            channels = jnp.concatenate(
                [channels[..., :-1], extra_channels, channels[..., -1:]], axis=-1
            )
        else:
            channels = jnp.concatenate([channels, extra_channels], axis=-1)

    depths_full = proj.depths
    radii_full = proj.radii
    compensations_full = proj.compensations
    if gather_axis is not None:
        # Primitive-sharded -> tile-sharded reshard (SURVEY §2.3): the
        # per-Gaussian stage above ran on this chip's Gaussian shard; gather
        # the render attributes over the mesh axis so the pixel stage sees the
        # full set. The transpose of all_gather is psum_scatter, so backward
        # automatically reduces per-Gaussian gradients back to their shard.
        def g(a):
            return jax.lax.all_gather(a, gather_axis, axis=0, tiled=True)

        means2d = g(means2d)
        channels = g(channels)
        opac = g(opac)
        depths_full = g(depths_full)
        radii_full = g(radii_full)
        compensations_full = g(compensations_full)
        conics = g(proj.conics)
        if sink_for_pixels is not None:
            # transpose = psum_scatter: each chip's absgrad rows reduce back
            # to the owning Gaussian shard.
            sink_for_pixels = g(sink_for_pixels)
    else:
        conics = proj.conics

    # Band shift for the pixel stage (no-op for full-frame rendering). The
    # info/means2d output stays in FULL-frame coordinates.
    if isinstance(tile_origin_y, (int, float)) and tile_origin_y == 0:
        means2d_px = means2d
    else:
        means2d_px = means2d - jnp.stack(
            [jnp.zeros((), means2d.dtype), jnp.asarray(tile_origin_y, means2d.dtype)]
        )

    # Exact opacity-aware radius for the pixel stage only (see tighten_radii);
    # both backends receive the SAME tight radii, so backend parity holds by
    # construction, and the outputs are bit-identical to the 3-sigma radius.
    radii_pixel = tighten_radii(radii_full, opac) if tight_radius else radii_full

    if _pixel_stage_capture is not None:
        # Debug hook: hand the exact pixel-stage operands (post projection /
        # SH / band shift / radius tightening) to a capture callback, so
        # kernel issues seen only inside full training graphs can be replayed
        # in a self-contained harness (see docs/NOTES_ROUND2.md).
        _pixel_stage_capture(
            dict(
                means2d_px=means2d_px, conics=conics, channels=channels,
                opacities=opac, depths=depths_full, radii_pixel=radii_pixel,
                width=width, height=height, tile_size=tile_size,
            )
        )

    if backend == "reference":
        render, alpha, _ = rasterize_pixels_reference(
            means2d_px,
            conics,
            channels,
            opac,
            depths_full,
            radii_pixel,
            width,
            height,
            tile_size=tile_size,
        )
        from .rasterize_ref import tile_bounds

        tiles_w = -(-width // tile_size)
        tiles_h = -(-height // tile_size)
        tnx, tmx, tny, tmy = tile_bounds(
            jax.lax.stop_gradient(means2d_px), radii_pixel, tile_size, tiles_w, tiles_h
        )
        num_isects = jnp.sum(
            jnp.where(radii_pixel > 0, (tmx - tnx) * (tmy - tny), 0)
        ).astype(jnp.int32)
    elif backend == "pallas":
        from .rasterize_pallas import rasterize_pixels_pallas

        render, alpha, num_isects = rasterize_pixels_pallas(
            means2d_px,
            conics,
            channels,
            opac,
            depths_full,
            radii_pixel,
            width,
            height,
            tile_size=tile_size,
            chunk=chunk,
            capacity=isect_capacity,
            means2d_sink=sink_for_pixels,
        )
    else:
        raise ValueError(f"Unknown backend: {backend}")

    if render_mode in ("RGB+ED", "ED"):
        # Expected depth: normalize the accumulated depth channel by alpha.
        depth = render[..., -1:] / jnp.clip(alpha, 1e-10, None)
        render = jnp.concatenate([render[..., :-1], depth], axis=-1)

    packed_info = {}
    if packed:
        # Per-intersection arrays in (tile, depth)-sorted order, straight from
        # the binning stage (SURVEY §2.2 packed mode). The gathers route
        # through the differentiable means2d/depths, so downstream losses on
        # per-intersection quantities backpropagate.
        from .tiles import build_intersections

        n = means.shape[0]
        cap = isect_capacity
        if cap is None:
            cap = max(4 * n, 1024)
        cap = ((cap + chunk - 1) // chunk) * chunk
        isect = build_intersections(
            jax.lax.stop_gradient(means2d_px),
            radii_full,
            jax.lax.stop_gradient(depths_full),
            width,
            height,
            tile_size,
            cap,
        )
        means2d_pad = jnp.concatenate([means2d, jnp.zeros((1, 2))], axis=0)
        depths_pad = jnp.concatenate([depths_full, jnp.zeros((1,))], axis=0)
        packed_info = dict(
            gaussian_ids=isect.gauss_ids,
            isect_means2d=means2d_pad[isect.gauss_ids],
            isect_depths=depths_pad[isect.gauss_ids],
            tile_ids=isect.tile_ids,
        )
        num_isects = isect.num_isects

    info = RasterizeInfo(
        means2d=means2d,
        radii=radii_full,
        depths=depths_full,
        conics=conics,
        compensations=compensations_full,
        num_isects=num_isects,
        **packed_info,
    )
    return render[None], alpha[None], info
