"""Gaussian clustering: vote per-frame articulation masks onto Gaussians.

TPU-native equivalent of preprocess/knn_gaussian.py:26-184:
  for each key frame:
    - optionally deform Gaussians to the frame's time (--dynamic)
    - render expected depth ("ED" mode) and project Gaussian centers
    - keep Gaussians whose projected center is in-bounds AND depth-consistent:
        -0.1 * d < d_pixel - d_gaussian < 1.0 * d        (ref :116-124)
    - vote: gaussian_masks[id, attr] |= atrb_mask[y, x]  (ref :127-132)
  save gaussian_mask_NxM.npy

The reference's packed rasterization + gaussian_ids is replaced by the
per-Gaussian projection (radii > 0 as the visibility set), which is the same
information without the intersection-sparse layout (each Gaussian's center
pixel votes once either way). Tools that do need the intersection-sparse
contract can use `ops.rasterize.rasterization(packed=True)`, which exposes
the reference's gaussian_ids / per-intersection means2d / depths.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.cameras import Camera
from ..models.fields import apply_se3_deform
from ..models.gaussians import GaussianParams
from ..ops.rasterize import rasterization


def vote_gaussian_masks_one_frame(
    params: GaussianParams,
    alive: jax.Array,
    camera: Camera,
    atrb_mask: jax.Array,  # (H, W, M) bool
    *,
    deform_apply=None,
    deform_vars=None,
    backend: str = "auto",
    depth_low: float = -0.1,
    depth_high: float = 1.0,
    min_alpha: float = 0.0,
) -> jax.Array:
    """Returns (N, M) bool votes for one key frame.

    `min_alpha`: additionally require the Gaussian's center pixel to have
    accumulated alpha above this value. The depth-consistency test divides
    by alpha (expected depth = accum / alpha), so at near-transparent
    pixels (part silhouette edges, background grazings) d_pix is
    ill-conditioned and votes there flip with backend-level ulps. 0.0 =
    reference behavior (no gate, knn_gaussian.py:116-124)."""
    means = params["means"]
    scales = jnp.exp(params["scales"])
    quats = params["quats"]
    if deform_apply is not None and deform_vars is not None:
        d_xyz, _, _ = deform_apply(deform_vars, means, camera.time.reshape(1, 1))
        means = apply_se3_deform(means, d_xyz)

    render, alpha_img, info = rasterization(
        means,
        quats,
        scales,
        jax.nn.sigmoid(params["opacities"][..., 0]),
        params["features_dc"],  # colors unused in ED mode
        camera.viewmat[None],
        camera.K[None],
        camera.width,
        camera.height,
        render_mode="ED",
        sh_degree=None,
        alive=alive,
        backend=backend,
    )
    depth_img = render[0, ..., 0]  # (H, W) expected depth

    h, w = camera.height, camera.width
    xy = info.means2d
    xi = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, h - 1)
    in_bounds = (
        (xy[:, 0] >= 0) & (xy[:, 0] < w) & (xy[:, 1] >= 0) & (xy[:, 1] < h)
    )
    visible = (info.radii > 0) & in_bounds & alive

    d_pix = depth_img[yi, xi]
    d_gauss = info.depths
    diff = d_pix - d_gauss
    consistent = (diff > depth_low * d_gauss) & (diff < depth_high * d_gauss)
    keep = visible & consistent
    if min_alpha > 0.0:
        keep &= alpha_img[0, yi, xi, 0] > min_alpha

    votes = atrb_mask[yi, xi]  # (N, M)
    return votes & keep[:, None]


def cluster_gaussians(
    params: GaussianParams,
    alive: jax.Array,
    key_frames: Dict[int, jax.Array],  # frame idx -> (H, W, M+1) bool mask
    cameras: Dict[int, Camera],
    *,
    deform_apply=None,
    deform_vars=None,
    dynamic: bool = False,
    backend: str = "auto",
    mask_valids: Optional[Dict[int, np.ndarray]] = None,
    drop_background: bool = True,
    exclusive: bool = False,
    depth_low: float = -0.1,
    depth_high: float = 1.0,
    min_vote_frac: float = 0.0,
    min_alpha: float = 0.0,
) -> jax.Array:
    """Accumulate votes over all key frames -> gaussian_mask (N, M).

    Annotation masks carry the attributes at channels [0, M) and the
    BACKGROUND at the last channel (ref load_*_annotations builds
    (H, W, M+1) with `mask_labels[..., -1]` = background); the vote uses
    only the attribute channels, gated per frame by `mask_valids`
    (knn_gaussian.py:128: ``atrb_masks[..., :-1] & mask_valids[..., :-1]``).
    Pass drop_background=False for masks that carry no background channel.

    `exclusive=False` (default) reproduces the reference's boolean
    `|=` voting (knn_gaussian.py:127-132), which lets a Gaussian belong to
    SEVERAL attributes when its projected center crosses different part
    masks over the key frames. Those shared rows are a measured control
    cross-talk channel: on the round-5 3-part scene, 7% of voted rows were
    shared and removing them collapsed the worst leakage term 8.5x
    (docs/QUALITY_R5_3PART.md ablation). `exclusive=True` keeps the same
    per-frame votes but assigns each Gaussian only its MOST-voted attribute
    (vote-count argmax) — strictly a relabeling of the reference's vote
    evidence, no new information used.

    `min_vote_frac`: require the winning attribute to collect votes in at
    least this fraction of the key frames. A STATIC (body) Gaussian gets
    grazed by a swinging part for a handful of frames — the part sweeps
    through its neighborhood and its depth briefly sits inside the
    consistency window — while true part members vote in most frames they
    are visible. 0.0 = reference behavior (any single frame's vote
    suffices)."""
    n = params["means"].shape[0]
    counts = None
    for idx, atrb in key_frames.items():
        atrb = jnp.asarray(atrb)
        if drop_background:
            atrb = atrb[..., :-1]
        if mask_valids is not None and idx in mask_valids:
            valid = np.asarray(mask_valids[idx]).reshape(-1)
            if valid.shape[0] <= 1:
                # blender annotations carry a single whole-frame flag
                # (conerf load path, valids = zeros(1)/ones(1))
                if not bool(valid.all()):
                    continue
            else:
                if drop_background:
                    valid = valid[:-1]
                if valid.shape[0] == atrb.shape[-1]:
                    atrb = atrb & jnp.asarray(valid)[None, None, :]
        votes = vote_gaussian_masks_one_frame(
            params,
            alive,
            cameras[idx],
            atrb,
            deform_apply=deform_apply if dynamic else None,
            deform_vars=deform_vars if dynamic else None,
            backend=backend,
            depth_low=depth_low,
            depth_high=depth_high,
            min_alpha=min_alpha,
        ).astype(jnp.int32)
        counts = votes if counts is None else (counts + votes)
    if counts is None:
        return jnp.zeros((n, 0), bool)
    min_votes = max(int(np.ceil(min_vote_frac * len(key_frames))), 1)
    if exclusive:
        winner = jnp.argmax(counts, axis=-1)
        m = counts.shape[1]
        return (
            jax.nn.one_hot(winner, m, dtype=jnp.int32).astype(bool)
            & (jnp.max(counts, axis=-1, keepdims=True) >= min_votes)
        )
    return counts >= min_votes  # min_votes=1 == the reference's boolean OR


def save_gaussian_mask(path: Path, mask: jax.Array, alive: jax.Array) -> None:
    """Write gaussian_mask_NxM.npy with only live rows (reference layout:
    one row per checkpoint Gaussian, preprocess/knn_gaussian.py:162-165)."""
    mask_np = np.asarray(mask)
    alive_np = np.asarray(alive)
    np.save(path, mask_np[alive_np])


def load_gaussian_mask(path: Path, capacity: int, alive: jax.Array) -> jax.Array:
    """Load gaussian_mask_NxM.npy (live rows) back into padded capacity."""
    live = np.load(path)
    alive_np = np.asarray(alive)
    out = np.zeros((capacity, live.shape[1]), bool)
    out[np.where(alive_np)[0][: live.shape[0]]] = live
    return jnp.asarray(out)
