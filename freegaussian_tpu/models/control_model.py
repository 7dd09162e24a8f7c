"""Stage-2 FreeGaussian control model.

Functional equivalent of FreeGaussianControlModel
(freegaussian_control_model.py:23-218): the stage-1 Gaussians + deform field
are frozen; a control MLP maps (position, 3-vector control state) to
per-Gaussian deltas for the Gaussians selected by the cluster mask.

  - control state (train): per-attribute mean displacement of the deform
    field between the init camera's time and the current time (:128-138)
  - control state (eval): externally injected attribute vectors (the GUI
    slider path, freegaussian_controller.py; here a plain (M, 3) array)
  - per-point state: mask @ d_avg / mask.sum (:140)
  - deltas applied additively: means += d, scales = exp(s) + d, quats =
    normalize(q) + d, only on masked Gaussians (:141-155)

TPU-native divergence: the reference gathers `means[mask.any(-1)]` (dynamic
shape). Here the control MLP runs over the full padded set and deltas are
masked — shapes stay static, and the MLP cost is amortized by the MXU.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..data.cameras import Camera
from ..ops.math import safe_norm
from ..ops.rasterize import rasterization
from .fields import apply_se3_deform
from .gaussians import GaussianParams, colors_from_features
from .splat_model import SplatConfig, background_color


def control_state_from_deform(
    deform_apply,
    deform_vars,
    means: jax.Array,  # (N, 3) canonical means (full padded set)
    gaussian_mask: jax.Array,  # (N, M) bool cluster membership
    time0: jax.Array,
    time1: jax.Array,
    *,
    alive: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-attribute mean displacement (M, 3) of the deform field between
    time0 and time1 over each cluster (ref :128-138). Computed under
    stop_gradient like the reference's no_grad block."""
    n = means.shape[0]
    sel = gaussian_mask.any(-1)
    if alive is not None:
        sel &= alive
        gaussian_mask = gaussian_mask & alive[:, None]

    def deformed(t):
        d_xyz, _, _ = deform_apply(deform_vars, means, jnp.reshape(t, (1, 1)))
        return apply_se3_deform(means, d_xyz)

    p0 = deformed(time0)
    p1 = deformed(time1)
    disp = p1 - p0  # (N, 3)
    m = gaussian_mask.astype(means.dtype)  # (N, M)
    num = jnp.einsum("nm,nc->mc", m, disp)
    den = jnp.clip(jnp.sum(m, axis=0), 1.0, None)[:, None]
    return jax.lax.stop_gradient(num / den)  # (M, 3)


def blend_control_values(
    gaussian_mask: jax.Array, d_avg: jax.Array
) -> jax.Array:
    """Per-point control value = mask @ d_avg / mask.sum(-1) (ref :140).
    Points in no cluster get zeros."""
    m = gaussian_mask.astype(d_avg.dtype)
    num = m @ d_avg  # (N, 3)
    den = jnp.clip(jnp.sum(m, axis=-1, keepdims=True), 1.0, None)
    return num / den


def control_forward(
    cfg: SplatConfig,
    params: GaussianParams,
    alive: jax.Array,
    gaussian_mask: jax.Array,  # (N, M) bool
    camera: Camera,
    control_apply,
    control_vars: Any,
    *,
    deform_apply=None,
    deform_vars: Any = None,
    init_time: Optional[jax.Array] = None,
    atrb_values: Optional[jax.Array] = None,  # (M, 3) eval-mode control state
    sh_degree_now: int = 3,
    train: bool = True,
    bg_rng: Optional[jax.Array] = None,
    means2d_sink: Optional[jax.Array] = None,
    render_mode: Optional[str] = None,
) -> Dict[str, jax.Array]:
    """Stage-2 forward. Either `atrb_values` (eval / GUI path) or
    (deform_apply, deform_vars, init_time) (train path) must be provided."""
    means = params["means"]
    sel = (gaussian_mask.any(-1) & alive)[:, None].astype(means.dtype)

    if atrb_values is None:
        d_avg = control_state_from_deform(
            deform_apply, deform_vars, means, gaussian_mask,
            init_time, camera.time, alive=alive,
        )
    else:
        d_avg = jnp.asarray(atrb_values)

    value = blend_control_values(gaussian_mask & alive[:, None], d_avg)
    d_xyz, d_rot, d_scale = control_apply(control_vars, means, value)

    new_means = means + sel * d_xyz
    scales_lin = jnp.exp(params["scales"]) + sel * d_scale
    quats_n = params["quats"] / safe_norm(params["quats"], axis=-1, keepdims=True)
    new_quats = quats_n + sel * d_rot
    opacities = jax.nn.sigmoid(params["opacities"][..., 0])
    sh_coeffs = colors_from_features(params)

    if render_mode is None:
        render_mode = "RGB+ED" if not train else "RGB"

    render, alpha, info = rasterization(
        new_means,
        new_quats,
        scales_lin,
        opacities,
        sh_coeffs,
        camera.viewmat[None],
        camera.K[None],
        camera.width,
        camera.height,
        tile_size=cfg.tile_size,
        near_plane=cfg.near_plane,
        far_plane=cfg.far_plane,
        render_mode=render_mode,
        sh_degree=sh_degree_now,
        rasterize_mode=cfg.rasterize_mode,
        alive=alive,
        means2d_sink=means2d_sink,
        backend=cfg.backend,
        chunk=cfg.chunk,
        isect_capacity=(
            cfg.isect_capacity
            if cfg.isect_capacity is not None
            else cfg.isect_capacity_factor * params["means"].shape[0]
        ),
        tight_radius=cfg.tight_radius,
    )
    bg = background_color(cfg, bg_rng, train)
    rgb = jnp.clip(render[0, ..., :3] + (1.0 - alpha[0]) * bg, 0.0, 1.0)
    out = {
        "rgb": rgb,
        "accumulation": alpha[0],
        "background": bg,
        "radii": info.radii,
        "means2d": info.means2d,
        "num_isects": info.num_isects,
        "control_state": d_avg,
    }
    if render_mode == "RGB+ED":
        depth = render[0, ..., 3:4]
        depth = jnp.where(alpha[0] > 0, depth, jax.lax.stop_gradient(jnp.max(depth)))
        out["depth"] = depth
    return out


class Controller:
    """GUI-free controller: holds M attribute 3-vectors (the reference binds
    these to viser ViewerVec3 sliders scaled by 0.1,
    freegaussian_controller.py:15-39)."""

    def __init__(self, num_attributes: int, scale: float = 0.1):
        self.num_attributes = num_attributes
        self.scale = scale
        self._values = jnp.zeros((num_attributes, 3))

    def set_vector3(self, index: int, value) -> None:
        self._values = self._values.at[index].set(jnp.asarray(value))

    def get_atrb_vals(self) -> jax.Array:
        return self._values * self.scale
