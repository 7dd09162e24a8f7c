"""Gaussian parameter set with padded capacity.

The reference stores Gaussians as dynamically-sized torch Parameters and
reallocates on every densify/cull (freegaussian_model.py:404-571). On TPU,
dynamic shapes force recompilation, so this framework's single biggest
architectural divergence is: parameters live in fixed-capacity (N_max) arrays
plus an `alive` mask, and densification becomes masked scatter ops that trace
once (see models/densify.py).

Param-group names mirror the reference optimizer groups
(freegaussian_config.py:48-90): means, scales, quats, features_dc,
features_rest, opacities.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.math import num_sh_bases, random_quat, rgb_to_sh

GaussianParams = Dict[str, jax.Array]


def _knn_mean_dist(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Mean distance to the k nearest neighbors (host-side, init-time only).

    (ref: freegaussian_model.py:158-162, 293-311 k_nearest_sklearn)
    """
    from sklearn.neighbors import NearestNeighbors

    n = points.shape[0]
    k = min(k, n - 1)
    if k < 1:
        return np.full(n, 0.1, np.float32)
    nn_model = NearestNeighbors(n_neighbors=k + 1, algorithm="auto").fit(points)
    distances, _ = nn_model.kneighbors(points)
    return distances[:, 1:].mean(axis=-1).astype(np.float32)


def init_gaussians(
    key: jax.Array,
    capacity: int,
    *,
    seed_points: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    num_random: int = 50000,
    random_scale: float = 10.0,
    sh_degree: int = 3,
    init_opacity: float = 0.1,
) -> Tuple[GaussianParams, jax.Array]:
    """Build the padded parameter dict and alive mask.

    seed_points: optional (xyz (N,3), rgb (N,3) in [0,255]) from SfM/PLY.
    Matches reference init semantics (freegaussian_model.py:151-196): scales =
    log(mean 3-NN distance), random unit quats, logit(0.1) opacities, SH DC
    from seed RGB else uniform random, higher SH zero.
    """
    k_means, k_quat, k_feat = jax.random.split(key, 3)
    if seed_points is not None:
        xyz = np.asarray(seed_points[0], dtype=np.float32)
        n = xyz.shape[0]
    else:
        n = num_random
        xyz = np.asarray(
            (jax.random.uniform(k_means, (n, 3)) - 0.5) * random_scale, dtype=np.float32
        )
    if n > capacity:
        raise ValueError(f"capacity {capacity} < initial gaussians {n}")

    dim_sh = num_sh_bases(sh_degree)
    avg_dist = _knn_mean_dist(xyz, 3)
    scales = np.log(np.clip(avg_dist, 1e-7, None))[:, None].repeat(3, axis=1)

    quats = np.asarray(random_quat(k_quat, n))
    if seed_points is not None and seed_points[1] is not None and len(seed_points[1]):
        features_dc = np.asarray(rgb_to_sh(np.asarray(seed_points[1], np.float32) / 255.0))
    else:
        features_dc = np.asarray(jax.random.uniform(k_feat, (n, 3)))
    # Stored FLAT as (N, (K-1)*3), coefficient-major — a 2D array gives XLA
    # layout assignment no 3-minor dim to argue about (a Pallas custom-call
    # in the step graph made it flip f32[N,15,3] between {0,1,2} and {2,0,1}
    # tilings, ~1.2 ms per transposing copy; docs/NOTES_ROUND2.md).
    features_rest = np.zeros((n, (dim_sh - 1) * 3), np.float32)
    opacities = np.full((n, 1), math.log(init_opacity / (1 - init_opacity)), np.float32)

    def pad(x):
        padding = [(0, capacity - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.asarray(np.pad(x, padding))

    params: GaussianParams = {
        "means": pad(xyz),
        "scales": pad(scales),
        "quats": pad(quats),
        "features_dc": pad(features_dc),
        "features_rest": pad(features_rest),
        "opacities": pad(opacities),
    }
    alive = jnp.arange(capacity) < n
    return params, alive


def num_alive(alive: jax.Array) -> jax.Array:
    return jnp.sum(alive.astype(jnp.int32))


def colors_from_features(params: GaussianParams) -> jax.Array:
    """(N_max, K, 3) SH coefficient stack (dc + rest).

    `features_rest` is stored flat (N, (K-1)*3); the reshape back to
    (N, K-1, 3) is layout-free under the default row-major tiling."""
    rest = params["features_rest"]
    rest = rest.reshape(rest.shape[0], rest.shape[1] // 3, 3)
    return jnp.concatenate([params["features_dc"][:, None, :], rest], axis=1)


def resize_to_capacity(params: GaussianParams, alive: jax.Array, capacity: int):
    """Re-pad a parameter dict to a new capacity (checkpoint cross-loading:
    the reference resizes gauss_params to the checkpoint's N at load time,
    freegaussian_model.py:278-291)."""
    n = params["means"].shape[0]
    if capacity == n:
        return params, alive
    if capacity < n:
        return (
            {k: v[:capacity] for k, v in params.items()},
            alive[:capacity],
        )
    out = {}
    for k, v in params.items():
        padding = [(0, capacity - n)] + [(0, 0)] * (v.ndim - 1)
        out[k] = jnp.pad(v, padding)
    alive = jnp.pad(alive, (0, capacity - n))
    return out, alive
