"""SSIM loss, matching pytorch_msssim.SSIM(data_range=1.0, size_average=True)
as used by the reference loss (freegaussian_model.py:211, :966).

Gaussian window 11x11 (sigma 1.5), separable depthwise convolution with valid
padding, K1=0.01, K2=0.03. Implemented with lax.conv_general_dilated using
feature_group_count for the depthwise conv — XLA maps it onto the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _gaussian_window(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    return g.astype(np.float32)


def _blur_axis(img: jax.Array, win: jax.Array, axis: int) -> jax.Array:
    """Valid 1-D correlation along `axis` as shifted multiply-adds.

    An 11-tap stencil is cheaper AND exact-f32 on TPU this way: a
    conv_general_dilated runs on the MXU, where default precision truncates
    f32 inputs to bf16 and HIGHEST costs 6x passes (measured 4.7 ms fwd+bwd
    for the SSIM stack at 640x480); eleven fused VPU fma passes cost a
    fraction of that with full f32 accuracy."""
    k = win.shape[0]
    length = img.shape[axis] - k + 1
    out = None
    for i in range(k):
        piece = jax.lax.slice_in_dim(img, i, i + length, axis=axis) * win[i]
        out = piece if out is None else out + piece
    return out


def _depthwise_blur(img: jax.Array, win: jax.Array) -> jax.Array:
    """Separable gaussian filter. img: (B, C, H, W), valid padding."""
    return _blur_axis(_blur_axis(img, win, 2), win, 3)


def ssim_map(
    img1: jax.Array,
    img2: jax.Array,
    *,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Per-window SSIM map (valid windows only): (B, C, H - w + 1, W - w + 1).

    Exposed separately so the row-band-sharded loss can halo-exchange band
    boundaries, compute the map per band, and aggregate sum/count across
    chips — giving EXACTLY the single-chip SSIM (parallel/sharding.py)."""
    if img1.ndim == 3:  # (H, W, C) -> (1, C, H, W)
        img1 = img1.transpose(2, 0, 1)[None]
        img2 = img2.transpose(2, 0, 1)[None]
    # Clamp the window to the image; keep it odd. With the full image this is
    # exactly pytorch_msssim.
    max_win = min(img1.shape[2], img1.shape[3])
    if win_size > max_win:
        win_size = max_win if max_win % 2 == 1 else max_win - 1
    win = jnp.asarray(_gaussian_window(win_size, win_sigma))

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu1 = _depthwise_blur(img1, win)
    mu2 = _depthwise_blur(img2, win)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _depthwise_blur(img1 * img1, win) - mu1_sq
    sigma2_sq = _depthwise_blur(img2 * img2, win) - mu2_sq
    sigma12 = _depthwise_blur(img1 * img2, win) - mu1_mu2

    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    return ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map


def ssim(
    img1: jax.Array,
    img2: jax.Array,
    *,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Structural similarity between (H, W, C) or (B, C, H, W) images."""
    return jnp.mean(
        ssim_map(
            img1,
            img2,
            data_range=data_range,
            win_size=win_size,
            win_sigma=win_sigma,
            k1=k1,
            k2=k2,
        )
    )
