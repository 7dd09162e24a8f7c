"""Core math ops: quaternions, SE(3)/SO(3) exponential maps, positional
embedding, viewmat conventions, bilinear interpolation, image resize.

Behavior parity with the reference torch implementations
(reference: freegaussian/utils.py) but written as pure-jnp functions that
vmap/jit cleanly on TPU.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

# -----------------------------------------------------------------------------
# Homogeneous coordinates
# -----------------------------------------------------------------------------


def to_homogeneous(v: jax.Array) -> jax.Array:
    """Append a trailing 1 to the last axis. (ref: utils.py:59-68)"""
    return jnp.concatenate([v, jnp.ones_like(v[..., :1])], axis=-1)


def from_homogeneous(v: jax.Array) -> jax.Array:
    """Divide out the homogeneous coordinate. (ref: utils.py:71-80)"""
    return v[..., :3] / v[..., -1:]


# -----------------------------------------------------------------------------
# Quaternions (wxyz convention, matching gsplat / splatfacto)
# -----------------------------------------------------------------------------


def safe_norm(x: jax.Array, axis=-1, keepdims=False, eps: float = 1e-24) -> jax.Array:
    """L2 norm with a finite gradient at 0 (jnp.linalg.norm NaNs there, which
    poisons grads of dead padded Gaussians through 0 * NaN)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


def quat_to_rotmat(quat: jax.Array) -> jax.Array:
    """Convert (..., 4) wxyz quaternions to (..., 3, 3) rotation matrices.

    Normalizes first. (ref: utils.py:280-301 `build_rotation`)
    """
    quat = quat / safe_norm(quat, axis=-1, keepdims=True)
    w, x, y, z = jnp.moveaxis(quat, -1, 0)
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    rows = jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def random_quat(key: jax.Array, n: int) -> jax.Array:
    """Uniform random unit quaternions, (n, 4) wxyz. (ref: utils.py:214-229)"""
    ku, kv, kw = jax.random.split(key, 3)
    u = jax.random.uniform(ku, (n,))
    v = jax.random.uniform(kv, (n,))
    w = jax.random.uniform(kw, (n,))
    return jnp.stack(
        [
            jnp.sqrt(1 - u) * jnp.sin(2 * math.pi * v),
            jnp.sqrt(1 - u) * jnp.cos(2 * math.pi * v),
            jnp.sqrt(u) * jnp.sin(2 * math.pi * w),
            jnp.sqrt(u) * jnp.cos(2 * math.pi * w),
        ],
        axis=-1,
    )


def scaling_rotation(scales: jax.Array, quats: jax.Array) -> jax.Array:
    """R @ diag(scales): the Gaussian covariance factor L with Sigma = L L^T.

    (ref: utils.py:304-313 `build_scaling_rotation`)
    """
    R = quat_to_rotmat(quats)
    return R * scales[..., None, :]


def quats_to_covar(scales: jax.Array, quats: jax.Array) -> jax.Array:
    """3D covariance Sigma = R S S^T R^T from linear-space scales + quats."""
    L = scaling_rotation(scales, quats)
    return L @ jnp.swapaxes(L, -1, -2)


# -----------------------------------------------------------------------------
# SO(3)/SE(3) exponential maps (Rodrigues), batched
# -----------------------------------------------------------------------------


def skew(w: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) cross-product matrices. (ref: utils.py:83-97)"""
    zeros = jnp.zeros_like(w[..., 0])
    rows = jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )
    return rows


def exp_so3(w: jax.Array, theta: jax.Array) -> jax.Array:
    """Rodrigues' formula: unit axis (..., 3) + angle (..., 1) -> (..., 3, 3).

    (ref: utils.py:117-134)
    """
    W = skew(w)
    W_sqr = W @ W
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + s * W + (1.0 - c) * W_sqr


def exp_se3(S: jax.Array, theta: jax.Array) -> jax.Array:
    """SE(3) exponential: screw axis (..., 6) + magnitude (..., 1) -> (..., 4, 4).

    Modern Robotics Eqn 3.88. (ref: utils.py:137-159)
    """
    w, v = S[..., :3], S[..., 3:]
    W = skew(w)
    R = exp_so3(w, theta)
    W_sqr = W @ W
    th = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=S.dtype), W.shape)
    G = th * eye + (1.0 - jnp.cos(th)) * W + (th - jnp.sin(th)) * W_sqr
    p = (G @ v[..., None])  # (..., 3, 1)
    Rp = jnp.concatenate([R, p], axis=-1)  # (..., 3, 4)
    bottom = jnp.zeros_like(Rp[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([Rp, bottom], axis=-2)


# -----------------------------------------------------------------------------
# NeRF positional embedding
# -----------------------------------------------------------------------------


def positional_embed(x: jax.Array, num_freqs: int, include_input: bool = True) -> jax.Array:
    """NeRF positional encoding with log-sampled frequencies 2^0 .. 2^(L-1).

    Output dim: d * (1 + 2 * num_freqs) when include_input.
    Band order matches the reference Embedder (ref: utils.py:8-56):
    [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...].

    TPU note: the transcendentals run on a flattened 1-D view — elementwise
    ops on (N, 3)/(N, 1) arrays pad the trailing dim to 128 lanes and waste
    up to 128x VPU throughput.
    """
    d = x.shape[-1]
    lead = x.shape[:-1]
    freqs = jnp.asarray([2.0**i for i in range(num_freqs)], x.dtype)
    # (..., L, d) phase grid -> ONE sin pass + ONE cos pass; interleaving
    # via stack+reshape keeps the reference band order [x, s0, c0, s1, c1,
    # ...] with 3 ops instead of a 2L+1-piece concatenate (the concat alone
    # cost ~0.19 ms at N=100k on v5e, plus 2L small transcendental fusions).
    ang = x[..., None, :] * freqs[:, None]
    sc = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-2)  # (..., L, 2, d)
    sc = sc.reshape(*lead, 2 * num_freqs * d)
    if include_input:
        return jnp.concatenate([x, sc], axis=-1)
    return sc


def embed_dim(input_dim: int, num_freqs: int, include_input: bool = True) -> int:
    return input_dim * ((1 if include_input else 0) + 2 * num_freqs)


# -----------------------------------------------------------------------------
# Camera conventions
# -----------------------------------------------------------------------------


def get_viewmat(c2w: jax.Array) -> jax.Array:
    """OpenGL camera-to-world (..., 3|4, 4) -> gsplat/OpenCV world-to-camera (..., 4, 4).

    Flips the y and z camera axes, then analytically inverts.
    (ref: utils.py:162-179)
    """
    R = c2w[..., :3, :3]
    T = c2w[..., :3, 3:4]
    flip = jnp.asarray([1.0, -1.0, -1.0], dtype=c2w.dtype)
    R = R * flip[None, :]  # scale columns y, z by -1
    R_inv = jnp.swapaxes(R, -1, -2)
    T_inv = -(R_inv @ T)
    top = jnp.concatenate([R_inv, T_inv], axis=-1)  # (..., 3, 4)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def opengl_to_opencv_c2w(c2w: jax.Array, keep_original_world_coordinate: bool = False) -> jax.Array:
    """Convert an OpenGL-convention c2w into OpenCV convention, optionally also
    undoing nerfstudio's world-axis permutation.

    (ref: preprocess/epipolar_flow.py:217-229 `opengl2cv`)
    """
    out = c2w
    if out.shape[-2] == 3:
        bottom = jnp.zeros_like(out[..., :1, :]).at[..., 0, 3].set(1.0)
        out = jnp.concatenate([out, bottom], axis=-2)
    if not keep_original_world_coordinate:
        out = out.at[..., 2, :].multiply(-1.0)
        out = out[..., jnp.asarray([0, 2, 1, 3]), :]
    out = out.at[..., 0:3, 1:3].multiply(-1.0)
    if c2w.shape[-2] == 3:
        out = out[..., :3, :]
    return out


# -----------------------------------------------------------------------------
# Color <-> SH DC coefficient
# -----------------------------------------------------------------------------

_SH_C0 = 0.28209479177387814


def rgb_to_sh(rgb: jax.Array) -> jax.Array:
    """RGB in [0,1] -> 0th SH coefficient. (ref: utils.py:232-237)"""
    return (rgb - 0.5) / _SH_C0


def sh_to_rgb(sh: jax.Array) -> jax.Array:
    """0th SH coefficient -> RGB in [0,1]. (ref: utils.py:240-245)"""
    return sh * _SH_C0 + 0.5


def num_sh_bases(degree: int) -> int:
    return (degree + 1) ** 2


# -----------------------------------------------------------------------------
# Image ops
# -----------------------------------------------------------------------------


def resize_image(image: jax.Array, d: int) -> jax.Array:
    """Area-downsample an (H, W, C) image by an integer factor d.

    Equivalent to opencv INTER_AREA for integer factors; the reference uses a
    d x d box-filter conv (ref: utils.py:248-261). Implemented as a reshape
    mean, which XLA fuses into a single reduction.
    """
    if d == 1:
        return image
    h, w, c = image.shape
    image = image.astype(jnp.float32)
    return image[: (h // d) * d, : (w // d) * d].reshape(h // d, d, w // d, d, c).mean(axis=(1, 3))


def bilinear_interp(image: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Bilinear interpolation on a batch of images.

    image: (B, H, W, C); x, y: (B, N) pixel coords. Returns (B, N, C).

    NOTE: the reference's floor/ceil corner convention (utils.py:316-343)
    returns 0 at exactly-integer coordinates (x0 == x1 makes all four weights
    vanish) — a quirk NOT replicated here (SURVEY §7); this is the standard
    formulation, which agrees with the reference at non-integer coords.
    """
    B, h, w, _ = image.shape
    x = jnp.clip(x, 0, w - 1)
    y = jnp.clip(y, 0, h - 1)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)

    def gather(img, yy, xx):  # img (H, W, C), yy/xx (N,)
        return img[yy, xx]

    Ia = jax.vmap(gather)(image, y0, x0)
    Ib = jax.vmap(gather)(image, y1, x0)
    Ic = jax.vmap(gather)(image, y0, x1)
    Id = jax.vmap(gather)(image, y1, x1)

    wa = (1 - fx) * (1 - fy)
    wb = (1 - fx) * fy
    wc = fx * (1 - fy)
    wd = fx * fy
    return (
        wa[..., None] * Ia + wb[..., None] * Ib + wc[..., None] * Ic + wd[..., None] * Id
    )


# -----------------------------------------------------------------------------
# LR schedules
# -----------------------------------------------------------------------------


def exponential_decay_schedule(
    lr_init: float,
    lr_final: float,
    max_steps: int,
    warmup_steps: int = 0,
    lr_pre_warmup: float = 1e-8,
):
    """nerfstudio ExponentialDecaySchedulerConfig semantics: cosine-eased warmup
    from lr_pre_warmup to lr_init over warmup_steps, then log-linear decay to
    lr_final at max_steps. (ref behavior: freegaussian_config.py:48-90)
    """

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_steps > 0:
            frac = jnp.clip(step / warmup_steps, 0.0, 1.0)
            warm = lr_pre_warmup + (lr_init - lr_pre_warmup) * jnp.sin(
                0.5 * jnp.pi * frac
            )
        else:
            warm = jnp.asarray(lr_init, jnp.float32)
        t = jnp.clip((step - warmup_steps) / max(max_steps - warmup_steps, 1), 0.0, 1.0)
        decayed = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
        return jnp.where(step < warmup_steps, warm, decayed)

    return schedule
