"""Camera-pose optimizer (SO3xR3), the nerfstudio CameraOptimizer equivalent.

The reference configures it off by default
(freegaussian_model.py:120 CameraOptimizerConfig(mode="off")) but keeps an
optimizer group for it (freegaussian_config.py:76-81). Per-camera 6-vector
tangent adjustments, applied as a left-multiplied SE(3) exp to the OpenGL c2w.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..data.cameras import Camera
from ..ops.math import exp_so3, safe_norm


def init_camera_opt(num_cameras: int) -> jax.Array:
    """(num_cameras, 6) zero tangent vectors (identity adjustment)."""
    return jnp.zeros((num_cameras, 6))


def apply_camera_opt(
    adjustments: jax.Array, camera: Camera, cam_idx: jax.Array
) -> Camera:
    """Apply the cam_idx-th SO3xR3 adjustment to the camera's c2w."""
    v = adjustments[cam_idx]
    phi, t = v[:3], v[3:]
    theta = safe_norm(phi, keepdims=True)
    axis = phi / theta
    R = exp_so3(axis[None], theta[None])[0]
    c2w = camera.c2w
    R_new = R @ c2w[:3, :3]
    t_new = R @ c2w[:3, 3] + t
    new_c2w = jnp.concatenate([R_new, t_new[:, None]], axis=-1)
    return camera.replace(c2w=new_c2w)


def camera_opt_reg_loss(
    adjustments: jax.Array,
    *,
    trans_l2_penalty: float = 1e-2,
    rot_l2_penalty: float = 1e-3,
) -> jax.Array:
    """nerfstudio's pose-adjustment L2 regularization."""
    rot = adjustments[..., :3]
    trans = adjustments[..., 3:]
    return trans_l2_penalty * jnp.sum(trans**2) + rot_l2_penalty * jnp.sum(rot**2)
