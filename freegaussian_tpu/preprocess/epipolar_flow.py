"""Epipolar interflow generation: separate camera-ego-motion-induced flow
(sceneflow) from object motion.

Two forms, matching the reference preprocess:

1. Velocity-Jacobian form (preprocess/epipolar_flow.py:233-321):
   per-pixel 2x3 Jacobians A(x, y) (translational, depth-weighted) and
   B(x, y) (rotational) of projected flow w.r.t. the camera twist (v, omega):
       sceneflow = A v / Z + B omega
       interflow = opticalflow + sceneflow
   with omega = euler(R1^-1 R2), v = t2 - t1 of the OpenCV-converted c2w
   pair, and infinite-depth pixels zeroed.

2. Exact backprojection form (preprocess/epipolar_flow_bp.py:258-298):
   backproject pixels through depth with camera0, reproject into camera1:
       sceneflow = uv' - uv;  interflow = opticalflow - sceneflow

Optical flow itself remains an external plug-in (the reference runs RAFT/GMA
via mmflow); precomputed flow `.npy` files are accepted, matching
epipolar_flow.py:369-372.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.cameras import Camera
from ..ops.math import opengl_to_opencv_c2w


def _to4x4(m: jax.Array) -> jax.Array:
    if m.shape[-2] == 4:
        return m
    bottom = jnp.zeros_like(m[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([m, bottom], axis=-2)


def _euler_xyz_from_matrix(R: jax.Array) -> jax.Array:
    """Intrinsic xyz Euler angles of a rotation matrix (scipy 'xyz' order)."""
    sy = -R[2, 0]
    sy = jnp.clip(sy, -1.0, 1.0)
    y = jnp.arcsin(sy)
    x = jnp.arctan2(R[2, 1], R[2, 2])
    z = jnp.arctan2(R[1, 0], R[0, 0])
    return jnp.stack([x, y, z])


def pixel_jacobians(camera: Camera):
    """A (H, W, 2, 3) translational and B (H, W, 2, 3) rotational Jacobians of
    projected pixel motion w.r.t. camera twist (ref: epipolar_flow.py:274-305)."""
    h, w = camera.height, camera.width
    fx, fy, cx, cy = camera.fx, camera.fy, camera.cx, camera.cy
    ys, xs = jnp.meshgrid(jnp.arange(h) + 0.5, jnp.arange(w) + 0.5, indexing="ij")
    x = xs.astype(jnp.float32)
    y = ys.astype(jnp.float32)
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    A = jnp.stack(
        [one * fx, zero, cx - x, zero, one * fy, cy - y], axis=-1
    ).reshape(h, w, 2, 3)
    B = jnp.stack(
        [
            -(x - cx) * (y - cy) / fy,
            fx + (x - cx) ** 2 / fx,
            -(y - cy) * fx / fy,
            -fy - (y - cy) ** 2 / fy,
            (x - cx) * (y - cy) / fx,
            (x - cx) * fy / fx,
        ],
        axis=-1,
    ).reshape(h, w, 2, 3)
    return A, B


def diff_2d_epipolar_flow(
    Z: jax.Array,  # (H, W, 1) current-frame depth
    camera0: Camera,
    camera1: Camera,
    opticalflow: jax.Array,  # (H, W, 2)
) -> Dict[str, jax.Array]:
    """Velocity-Jacobian interflow (ref: epipolar_flow.py:233-321)."""
    c2w0 = opengl_to_opencv_c2w(_to4x4(camera0.c2w))
    c2w1 = opengl_to_opencv_c2w(_to4x4(camera1.c2w))
    R1 = c2w0[:3, :3]
    R2 = c2w1[:3, :3]
    R_rel = R1.T @ R2
    omega = _euler_xyz_from_matrix(R_rel)
    veloc = c2w1[:3, 3] - c2w0[:3, 3]

    A, B = pixel_jacobians(camera0)
    sceneflow = (A @ veloc) / Z + (B @ omega)
    interflow = opticalflow + sceneflow

    inf_mask = jnp.isinf(Z[..., 0]) | (Z[..., 0] <= 0)
    sceneflow = jnp.where(inf_mask[..., None], 0.0, sceneflow)
    interflow = jnp.where(inf_mask[..., None], 0.0, interflow)
    return {"sceneflow": sceneflow, "interflow": interflow}


def diff_2d_epipolar_flow_backproject(
    Z0: jax.Array,  # (H, W, 1) depth of frame 0
    camera0: Camera,
    camera1: Camera,
    opticalflow: jax.Array,  # (H, W, 2) frame0 -> frame1
) -> Dict[str, jax.Array]:
    """Exact backprojection interflow (ref: epipolar_flow_bp.py:258-298):
    sceneflow = reproject(backproject(uv, Z0, cam0), cam1) - uv."""
    h, w = Z0.shape[:2]
    c2w0 = _to4x4(opengl_to_opencv_c2w(_to4x4(camera0.c2w)))
    c2w1 = _to4x4(opengl_to_opencv_c2w(_to4x4(camera1.c2w)))
    K0, K1 = camera0.K, camera1.K

    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32) + 0.5,
        jnp.arange(w, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    pix = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)  # (H, W, 3)
    rays = pix @ jnp.linalg.inv(K0).T
    p_cam0 = rays * Z0
    p_world = p_cam0 @ c2w0[:3, :3].T + c2w0[:3, 3]

    w2c1 = jnp.linalg.inv(c2w1)
    p_cam1 = p_world @ w2c1[:3, :3].T + w2c1[:3, 3]
    uv1 = (p_cam1 @ K1.T)
    uv1 = uv1[..., :2] / jnp.clip(uv1[..., 2:3], 1e-8, None)

    sceneflow = uv1 - pix[..., :2]
    interflow = opticalflow - sceneflow
    inf_mask = jnp.isinf(Z0[..., 0]) | (Z0[..., 0] <= 0)
    return {
        "sceneflow": jnp.where(inf_mask[..., None], 0.0, sceneflow),
        "interflow": jnp.where(inf_mask[..., None], 0.0, interflow),
    }


def generate_interflow_dataset(
    data_dir: Path,
    *,
    interval: int = 2,
    form: str = "velocity",
    flow_dir: Optional[str] = None,
    out_dir: Optional[str] = None,
    split: str = "train",
    dataparser: str = "synthetic",
) -> int:
    """Batch driver: compute interflow for every frame pair (i-interval, i)
    and write interflow_n{interval}/*.npy (synthetic) or flow_n{interval}/
    (real captures — the directory their parser reads from)
    (ref: epipolar_flow.py:324-420; real-scene flow_n{k} at
    freegaussian_dataparser.py:816). Requires precomputed optical flow
    (`opticalflow/*.npy`) or zero flow for static-camera captures; real
    captures need depth/{stem}.npy renders (preprocess/render_offline.py)."""
    from ..data.dataparsers import parse_real, parse_synthetic

    data_dir = Path(data_dir)
    if dataparser == "synthetic":
        parsed = parse_synthetic(
            data_dir, split, interval=interval, load_flow=False, load_mask=False,
            train_split_fraction=1.0,
        )
        default_out = f"interflow_n{interval}"
    elif dataparser == "real":
        parsed = parse_real(
            data_dir, split, interval=interval, load_flow=False, load_mask=False,
            train_split_fraction=1.0,
        )
        default_out = f"flow_n{interval}"
    else:
        raise ValueError(f"interflow supports synthetic|real, got {dataparser}")
    out = data_dir / (out_dir or default_out)
    out.mkdir(exist_ok=True, parents=True)
    flow_src = data_dir / (flow_dir or "opticalflow")

    count = 0
    for i in range(len(parsed)):
        if parsed.depth_filenames is not None:
            depth_path = Path(parsed.depth_filenames[i])
        else:
            depth_path = data_dir / "depth" / (
                Path(parsed.image_filenames[i]).stem + ".npy"
            )
        if not depth_path.exists():
            raise FileNotFoundError(
                f"missing depth render {depth_path}; run the depth "
                "preprocess (render_offline) first"
            )
        depth = np.load(depth_path).astype(np.float32)
        if depth.ndim == 2:
            depth = depth[..., None]
        stem = Path(parsed.image_filenames[i]).stem
        flow_path = flow_src / f"{stem}.npy"
        if flow_path.exists():
            oflow = np.load(flow_path).astype(np.float32)
        else:
            oflow = np.zeros((parsed.height, parsed.width, 2), np.float32)

        def cam(idx, c2w_arr):
            return Camera(
                c2w=jnp.asarray(c2w_arr),
                fx=jnp.asarray(parsed.fx[idx]),
                fy=jnp.asarray(parsed.fy[idx]),
                cx=jnp.asarray(parsed.cx[idx]),
                cy=jnp.asarray(parsed.cy[idx]),
                time=jnp.asarray(parsed.times[idx]),
                width=parsed.width,
                height=parsed.height,
            )

        cam1 = cam(i, parsed.c2w[i])
        cam0 = cam(i, parsed.c2w0[i])
        fn = (
            diff_2d_epipolar_flow
            if form == "velocity"
            else diff_2d_epipolar_flow_backproject
        )
        result = fn(jnp.asarray(depth), cam0, cam1, jnp.asarray(oflow))
        np.save(out / f"{stem}.npy", np.asarray(result["interflow"]))
        count += 1
    return count
