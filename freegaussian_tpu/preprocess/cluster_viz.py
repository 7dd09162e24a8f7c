"""Cluster visualization: export per-attribute colored Gaussian point clouds.

Replaces preprocess/o3d_color_splat.py (open3d is unavailable here) with a
PLY export: each Gaussian colored by its cluster assignment, viewable in any
point-cloud tool."""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..data.ply import write_ply_points

# Distinct colors for up to 10 attributes; unassigned Gaussians are gray.
_PALETTE = np.array(
    [
        [230, 25, 75], [60, 180, 75], [255, 225, 25], [0, 130, 200],
        [245, 130, 48], [145, 30, 180], [70, 240, 240], [240, 50, 230],
        [210, 245, 60], [250, 190, 190],
    ],
    dtype=np.uint8,
)


def export_cluster_ply(
    path: Path,
    means: np.ndarray,  # (N, 3)
    gaussian_mask: np.ndarray,  # (N, M) bool
    alive: np.ndarray,  # (N,) bool
) -> None:
    means = np.asarray(means)[np.asarray(alive)]
    mask = np.asarray(gaussian_mask)[np.asarray(alive)]
    colors = np.full((means.shape[0], 3), 128, np.uint8)
    for m in range(mask.shape[1]):
        colors[mask[:, m]] = _PALETTE[m % len(_PALETTE)]
    write_ply_points(path, means.astype(np.float32), colors)
