"""Spherical-harmonics color evaluation (degree <= 4) for Gaussian splats.

TPU-native replacement for gsplat's `spherical_harmonics` CUDA kernel
(exercised by the reference at freegaussian_model.py:847-868 via
`sh_degree=...`). Pure jnp: the per-Gaussian basis evaluation is a small
elementwise expression plus one (N, K) x (N, K, 3) contraction which XLA fuses
and vectorizes on the VPU; autodiff provides exact gradients to both the SH
coefficients and the view directions, matching the CUDA kernel's analytic
backward.

Basis constants follow the standard real-SH convention used by gsplat and the
original INRIA 3DGS rasterizer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Hardcoded real SH constants (same values as gsplat / 3DGS reference).
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
_C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def num_sh_bases(degree: int) -> int:
    return (degree + 1) ** 2


def sh_basis(dirs: jax.Array, degree: int) -> jax.Array:
    """Evaluate the real SH basis at unit directions.

    dirs: (..., 3) unit vectors. Returns (..., K) with K = (degree+1)^2.
    """
    if degree < 0 or degree > 4:
        raise ValueError(f"sh degree must be in [0, 4], got {degree}")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    out = [_C0 * one]
    if degree >= 1:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if degree >= 3:
        out += [
            _C3[0] * y * (3.0 * xx - yy),
            _C3[1] * xy * z,
            _C3[2] * y * (4.0 * zz - xx - yy),
            _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            _C3[4] * x * (4.0 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3.0 * yy),
        ]
    if degree >= 4:
        out += [
            _C4[0] * xy * (xx - yy),
            _C4[1] * yz * (3.0 * xx - yy),
            _C4[2] * xy * (7.0 * zz - 1.0),
            _C4[3] * yz * (7.0 * zz - 3.0),
            _C4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
            _C4[5] * xz * (7.0 * zz - 3.0),
            _C4[6] * (xx - yy) * (7.0 * zz - 1.0),
            _C4[7] * xz * (xx - 3.0 * yy),
            _C4[8] * ((xx - 3.0 * yy) * xx - (yy - 3.0 * xx) * yy),
        ]
    return jnp.stack(out, axis=-1)


def eval_sh_colors(
    sh_coeffs: jax.Array,
    dirs: jax.Array,
    degree: int,
    *,
    normalize_dirs: bool = True,
) -> jax.Array:
    """Evaluate SH color along view directions.

    sh_coeffs: (..., K_total, 3) with K_total >= (degree+1)^2. Coefficients
        above the active degree are ignored (gsplat degree scheduling).
    dirs: (..., 3) view directions (Gaussian center - camera origin).
    Returns raw colors (..., 3); callers apply the `+0.5, clamp_min(0)` shift
    that gsplat applies after SH evaluation.
    """
    if normalize_dirs:
        dirs = dirs / jnp.sqrt(jnp.sum(dirs * dirs, axis=-1, keepdims=True) + 1e-24)
    k = num_sh_bases(degree)
    if sh_coeffs.ndim == 3 and dirs.ndim == 2:
        # Channelized contraction over (N,) arrays: the (N, K) x (N, K, 3)
        # einsum pads its 3-wide trailing dim to 128 lanes on TPU.
        basis = sh_basis(dirs, degree)  # (N, K)
        outs = []
        for c in range(sh_coeffs.shape[-1]):
            acc = basis[:, 0] * sh_coeffs[:, 0, c]
            for j in range(1, k):
                acc = acc + basis[:, j] * sh_coeffs[:, j, c]
            outs.append(acc)
        return jnp.stack(outs, axis=-1)
    basis = sh_basis(dirs, degree)  # (..., K)
    return jnp.einsum("...k,...kc->...c", basis, sh_coeffs[..., :k, :])
