"""Offline depth / color rendering of a trained model over dataset cameras.

Equivalent of preprocess/render_depth.py (expected-depth `.npy` divided by the
dataparser scale, used as training depth) and preprocess/render_color.py.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.cameras import Camera
from ..models.fields import apply_se3_deform
from ..models.gaussians import GaussianParams
from ..models.splat_model import SplatConfig, forward


def render_depth_maps(
    cfg: SplatConfig,
    params: GaussianParams,
    alive: jax.Array,
    cameras: Iterable[Camera],
    out_dir: Path,
    *,
    dataparser_scale: float = 1.0,
    deform_apply=None,
    deform_vars=None,
    names: Optional[Iterable[str]] = None,
) -> int:
    """Render expected depth per camera, divide by the dataparser scale
    (ref: preprocess/render_depth.py:32-183) and save `.npy` files."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    count = 0
    names = list(names) if names is not None else None

    # jit once; re-traces per resolution (eager dispatch over the tunneled
    # chip costs a host round trip per op — see Trainer._eval_render)
    @jax.jit
    def _render(params, alive, deform_vars, cam):
        return forward(
            cfg, params, alive, cam,
            deform_variables=deform_vars, deform_apply=deform_apply,
            sh_degree_now=0, warmed_up=jnp.asarray(deform_vars is not None),
            train=False, render_mode="RGB+ED",
        )["depth"][..., 0]

    for i, cam in enumerate(cameras):
        depth = np.asarray(_render(params, alive, deform_vars, cam)) / dataparser_scale
        name = names[i] if names else f"{i:05d}"
        np.save(out_dir / f"{name}.npy", depth)
        count += 1
    return count


def render_color_images(
    cfg: SplatConfig,
    params: GaussianParams,
    alive: jax.Array,
    cameras: Iterable[Camera],
    out_dir: Path,
    *,
    sh_degree: int = 3,
    deform_apply=None,
    deform_vars=None,
    names: Optional[Iterable[str]] = None,
) -> int:
    """Render RGB per camera and save PNGs (ref: preprocess/render_color.py)."""
    import imageio.v2 as imageio

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    count = 0
    names = list(names) if names is not None else None

    @jax.jit
    def _render(params, alive, deform_vars, cam):
        return forward(
            cfg, params, alive, cam,
            deform_variables=deform_vars, deform_apply=deform_apply,
            sh_degree_now=sh_degree, warmed_up=jnp.asarray(deform_vars is not None),
            train=False, render_mode="RGB",
        )["rgb"]

    for i, cam in enumerate(cameras):
        rgb = np.clip(np.asarray(_render(params, alive, deform_vars, cam)) * 255, 0, 255).astype(np.uint8)
        name = names[i] if names else f"{i:05d}"
        imageio.imwrite(out_dir / f"{name}.png", rgb)
        count += 1
    return count
