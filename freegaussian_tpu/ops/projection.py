"""EWA projection of 3D Gaussians to screen space.

TPU-native replacement for gsplat's `fully_fused_projection` CUDA kernel
(contract pinned by the reference call site freegaussian_model.py:847-868:
packed=False, near=0.01, far=1e10, rasterize_mode in {classic, antialiased}).

Written as a fully vectorized jnp expression over the N Gaussians: XLA maps the
3x3 matrix algebra onto the VPU and fuses the whole chain; autodiff yields the
analytic backward through the EWA Jacobian to means/quats/scales/viewmat,
which is what the CUDA kernel hand-codes.

Math (gsplat math supplement, arXiv 2312.02121):
  mean_c   = R mean + t                      (world -> camera)
  Sigma_c  = R Sigma R^T
  J        = perspective Jacobian with frustum-clamped tx, ty
  Sigma_2d = J Sigma_c J^T (+ eps2d * I low-pass in classic mode)
  conic    = Sigma_2d^{-1};  radius = 3 sqrt(lambda_max)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# quats handled channelized below (see _project_gaussians_f32)


class ProjectionResult(NamedTuple):
    means2d: jax.Array  # (N, 2) pixel coords
    depths: jax.Array  # (N,) camera-space z
    conics: jax.Array  # (N, 3) upper-triangular inverse 2D covariance (a, b, c)
    radii: jax.Array  # (N,) int32 screen radius, 0 for culled
    compensations: jax.Array  # (N,) antialiasing opacity compensation
    cov2d: jax.Array  # (N, 3) blurred 2D covariance (xx, xy, yy)
    means_cam: jax.Array  # (N, 3) camera-space means


def project_gaussians(
    means: jax.Array,  # (N, 3) world-space centers
    quats: jax.Array,  # (N, 4) wxyz (need not be normalized)
    scales: jax.Array,  # (N, 3) linear-space scales
    viewmat: jax.Array,  # (4, 4) world-to-camera (OpenCV convention)
    K: jax.Array,  # (3, 3) intrinsics
    width: int,
    height: int,
    *,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    eps2d: float = 0.3,
    radius_clip: float = 0.0,
    calc_compensations: bool = False,
    alive: jax.Array | None = None,  # (N,) bool mask for padded capacity
) -> ProjectionResult:
    """Project N 3D Gaussians into one camera. Culled Gaussians get radii == 0."""
    with jax.default_matmul_precision("float32"):
        return _project_gaussians_f32(
            means, quats, scales, viewmat, K, width, height,
            near_plane=near_plane, far_plane=far_plane, eps2d=eps2d,
            radius_clip=radius_clip, calc_compensations=calc_compensations,
            alive=alive,
        )


def _project_gaussians_f32(
    means, quats, scales, viewmat, K, width, height,
    *, near_plane, far_plane, eps2d, radius_clip, calc_compensations, alive,
) -> ProjectionResult:
    dtype = means.dtype
    R = viewmat[:3, :3]
    t = viewmat[:3, 3]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    p_cam = means @ R.T + t  # (N, 3)
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    # Replace out-of-frustum depths with a safe value BEFORE the projective
    # math: otherwise z ~ 0 overflows cov2d to inf and the masked `where`
    # backward produces 0 * inf = NaN for culled/dead (padded) Gaussians.
    valid_z = (z > near_plane) & (z < far_plane)
    if alive is not None:
        valid_z &= alive
    z_safe = jnp.where(valid_z, z, 1.0)
    x = jnp.where(valid_z, x, 0.0)
    y = jnp.where(valid_z, y, 0.0)
    rz = 1.0 / z_safe

    # Frustum-clamped tangent-plane point for the EWA Jacobian.
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy
    lim_x_pos = (width - cx) / fx + 0.3 * tan_fovx
    lim_x_neg = cx / fx + 0.3 * tan_fovx
    lim_y_pos = (height - cy) / fy + 0.3 * tan_fovy
    lim_y_neg = cy / fy + 0.3 * tan_fovy
    tx = z_safe * jnp.clip(x * rz, -lim_x_neg, lim_x_pos)
    ty = z_safe * jnp.clip(y * rz, -lim_y_neg, lim_y_pos)

    # Channelized EWA: cov2d = (J R_cam R_q S) (J R_cam R_q S)^T computed as
    # (N,)-wide channel chains — (N, 3, 3) intermediates would pad their
    # 3-wide trailing dims to 128 lanes and waste ~40x VPU throughput.
    qn = quats / jnp.sqrt(jnp.sum(quats * quats, axis=-1) + 1e-24)[..., None]
    qw, qx, qy, qz = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
    rq = (
        (1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)),
        (2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qw * qx)),
        (2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx * qx + qy * qy)),
    )
    # A = R_cam @ R_q, rows 0..2, channelized (camera R entries are scalars)
    A = tuple(
        tuple(
            R[i, 0] * rq[0][k] + R[i, 1] * rq[1][k] + R[i, 2] * rq[2][k]
            for k in range(3)
        )
        for i in range(3)
    )
    # B = J @ A (2 x 3), with J = [[fx rz, 0, -fx tx rz^2], [0, fy rz, -fy ty rz^2]]
    j02 = -fx * tx * rz * rz
    j12 = -fy * ty * rz * rz
    b0 = tuple(fx * rz * A[0][k] + j02 * A[2][k] for k in range(3))
    b1 = tuple(fy * rz * A[1][k] + j12 * A[2][k] for k in range(3))
    s0, s1, s2 = scales[:, 0], scales[:, 1], scales[:, 2]
    ss = (s0 * s0, s1 * s1, s2 * s2)
    cxx = sum(b0[k] * b0[k] * ss[k] for k in range(3))
    cxy = sum(b0[k] * b1[k] * ss[k] for k in range(3))
    cyy = sum(b1[k] * b1[k] * ss[k] for k in range(3))

    det_orig = cxx * cyy - cxy * cxy
    cxx_b = cxx + eps2d
    cyy_b = cyy + eps2d
    det_blur = cxx_b * cyy_b - cxy * cxy

    if calc_compensations:
        compensations = jnp.sqrt(jnp.maximum(det_orig / jnp.maximum(det_blur, 1e-32), 0.0))
    else:
        compensations = jnp.ones_like(det_blur)

    det_safe = jnp.where(det_blur <= 0, 1.0, det_blur)
    inv_det = 1.0 / det_safe
    conics = jnp.stack([cyy_b * inv_det, -cxy * inv_det, cxx_b * inv_det], axis=-1)

    means2d = jnp.stack([fx * x * rz + cx, fy * y * rz + cy], axis=-1)

    # Screen radius from the larger eigenvalue of the blurred 2D covariance.
    b = 0.5 * (cxx_b + cyy_b)
    v1 = b + jnp.sqrt(jnp.maximum(b * b - det_blur, 0.01))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(v1))

    valid = valid_z
    valid &= det_blur > 0
    valid &= radius_f > radius_clip
    # Cull Gaussians whose extent misses the screen entirely.
    valid &= (means2d[..., 0] + radius_f > 0) & (means2d[..., 0] - radius_f < width)
    valid &= (means2d[..., 1] + radius_f > 0) & (means2d[..., 1] - radius_f < height)
    if alive is not None:
        valid &= alive

    radii = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)
    # Zero conics/compensations for culled Gaussians so downstream masked math
    # stays finite under jit.
    conics = jnp.where(valid[..., None], conics, jnp.zeros_like(conics))
    compensations = jnp.where(valid, compensations, jnp.zeros_like(compensations))
    depths = z.astype(dtype)
    return ProjectionResult(
        means2d=means2d,
        depths=depths,
        conics=conics,
        radii=radii,
        compensations=compensations,
        cov2d=jnp.stack([cxx_b, cxy, cyy_b], axis=-1),
        means_cam=p_cam,
    )
