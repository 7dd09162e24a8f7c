"""Full-image datamanager: host-side cache of undistorted images, flows, and
articulation masks, batched into device arrays.

Behavior parity with FreeGaussianImageDatamanager
(freegaussian_datamanager.py:28-323):
  - caches all images up front (thread pool), undistorting image + mask +
    depth + flow jointly; flow endpoints undistorted via cv2.undistortPoints
  - flow `.npy` loader with resize (nearest), values scaled with the image
  - `next_train(step)` returns one (camera, batch) — full-image training
  - fixed-order eval loader

Multi-host design: each host loads only its shard of the frame list
(`shard_index` / `num_shards`), which is the data-axis sharding of the
pod-scale layout (SURVEY §2.3)."""

from __future__ import annotations

import concurrent.futures
import dataclasses
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from .cameras import Camera
from .dataparsers import ParsedDataset


def load_flow_npy(
    filepath: Path, height: int, width: int, scale_factor: float = 1.0
) -> np.ndarray:
    """(ref: freegaussian_datamanager.py:211-236 get_flow_image_from_path)"""
    import cv2

    flow = np.load(filepath) * scale_factor
    if flow.shape[:2] != (height, width):
        flow = cv2.resize(flow, (width, height), interpolation=cv2.INTER_NEAREST)
    return flow.astype(np.float32)


def undistort_frame(
    K: np.ndarray,
    distortion: np.ndarray,
    image: np.ndarray,
    mask: Optional[np.ndarray] = None,
    depth: Optional[np.ndarray] = None,
    flow: Optional[np.ndarray] = None,
    atrb_mask: Optional[np.ndarray] = None,
):
    """Joint undistortion of image/mask/depth/flow/articulation-masks with
    ROI crop — every per-pixel array a frame carries must stay aligned with
    its undistorted image (ref: freegaussian_datamanager.py:239-323
    _undistort_image_flow).

    Flow endpoints p0 and p0+flow are undistorted separately and re-diffed.
    `atrb_mask` (H, W, M+1) bool is undistorted channel-wise."""
    import cv2

    K = K.copy().astype(np.float64)
    d = distortion
    assert d[3] == 0, "4th Brown parameter unsupported (k1,k2,k3,p1,p2 only)"
    dist_cv = np.array([d[0], d[1], d[4], d[5], d[2], d[3], 0, 0])
    K[0, 2] -= 0.5
    K[1, 2] -= 0.5
    if np.any(dist_cv):
        newK, roi = cv2.getOptimalNewCameraMatrix(
            K, dist_cv, (image.shape[1], image.shape[0]), 0
        )
        image = cv2.undistort(image, K, dist_cv, None, newK)
    else:
        newK = K
        roi = (0, 0, image.shape[1], image.shape[0])
    x, y, w, h = roi
    image = image[y : y + h, x : x + w]
    newK = np.array(newK)
    newK[0, 2] -= x
    newK[1, 2] -= y
    if depth is not None:
        if np.any(dist_cv):
            # NEAREST remap (ADVICE r3): bilinear undistort blends depth
            # across discontinuities, inventing values on neither side of an
            # edge — the 3D flow lift then backprojects to phantom points.
            # (The reference only ROI-crops depth and never remaps,
            # freegaussian_datamanager.py:239-323; remapping at all is a
            # deliberate alignment improvement, NEAREST keeps it edge-exact.)
            mx, my = cv2.initUndistortRectifyMap(
                K, dist_cv, None, newK,
                (depth.shape[1], depth.shape[0]), cv2.CV_32FC1,
            )
            depth = cv2.remap(
                depth.astype(np.float32), mx, my, cv2.INTER_NEAREST
            )
        depth = depth[y : y + h, x : x + w]
    if mask is not None:
        # Divergence note (ADVICE r3): the reference treats ANY nonzero mask
        # value as foreground; the >127 threshold after a bilinear undistort
        # re-binarizes at the half-intensity level, shrinking boundaries by
        # up to half a pixel. Kept: the half-level cut is the unbiased
        # rounding of an interpolated indicator.
        m8 = np.squeeze(mask).astype(np.uint8) * 255
        if np.any(dist_cv):
            m8 = cv2.undistort(m8, K, dist_cv, None, newK)
        mask = (m8[y : y + h, x : x + w] > 127)
    if atrb_mask is not None:
        chans = []
        for c in range(atrb_mask.shape[-1]):
            m8 = atrb_mask[..., c].astype(np.uint8) * 255
            if np.any(dist_cv):
                m8 = cv2.undistort(m8, K, dist_cv, None, newK)
            chans.append(m8[y : y + h, x : x + w] > 127)
        atrb_mask = np.stack(chans, axis=-1)
    if flow is not None:
        if np.any(dist_cv):
            H, W = flow.shape[:2]
            yg, xg = np.mgrid[0:H, 0:W]
            pts = np.stack([xg, yg], axis=-1).reshape(-1, 2).astype(np.float64)
            pts_end = pts + flow.reshape(-1, 2)
            und = cv2.undistortPoints(pts[:, None], K, dist_cv, P=newK).reshape(-1, 2)
            und_end = cv2.undistortPoints(pts_end[:, None], K, dist_cv, P=newK).reshape(-1, 2)
            flow = (und_end - und).reshape(H, W, 2).astype(np.float32)
        flow = flow[y : y + h, x : x + w]
    newK[0, 2] += 0.5
    newK[1, 2] += 0.5
    return newK.astype(np.float32), image, mask, depth, flow, atrb_mask


@dataclasses.dataclass
class CachedFrame:
    image: np.ndarray  # (H, W, 3) float32 in [0, 1] or uint8
    camera: Camera
    camera0: Camera
    flow: Optional[np.ndarray] = None
    depth0: Optional[np.ndarray] = None  # paired-frame depth for the 3D lift
    mask: Optional[np.ndarray] = None
    atrb_mask: Optional[np.ndarray] = None
    mask_valid: Optional[np.ndarray] = None


class FullImageDatamanager:
    """Loads every frame of a ParsedDataset into host memory (per-host shard),
    returning jnp-convertible batches."""

    def __init__(
        self,
        parsed: ParsedDataset,
        *,
        cache_uint8: bool = True,
        max_workers: int = 2,
        shard_index: int = 0,
        num_shards: int = 1,
        seed: int = 0,
        cache_device: bool = True,
    ):
        """`cache_device`: keep converted batches resident on the device after
        first use (the reference's optional GPU image cache,
        freegaussian_datamanager.py:132-144) — otherwise every step pays a
        host->device transfer, which is real latency on remote-attached TPUs."""
        self.parsed = parsed
        self.cache_uint8 = cache_uint8
        self.cache_device = cache_device
        indices = list(range(shard_index, len(parsed), num_shards))
        self.indices = indices
        self.rng = np.random.default_rng(seed)
        self._epoch_order: List[int] = []
        self._device_cache: Dict[int, Tuple[Camera, Dict[str, np.ndarray]]] = {}
        with concurrent.futures.ThreadPoolExecutor(max_workers=max_workers) as pool:
            self.frames: List[CachedFrame] = list(pool.map(self._load_frame, indices))

    # ------------------------------------------------------------------
    def _load_frame(self, i: int) -> CachedFrame:
        import imageio.v2 as imageio

        p = self.parsed
        image = imageio.imread(p.image_filenames[i])
        if image.ndim == 2:
            image = np.stack([image] * 3, axis=-1)

        flow = None
        if p.flow_filenames is not None and Path(p.flow_filenames[i]).exists():
            flow = load_flow_npy(p.flow_filenames[i], image.shape[0], image.shape[1])

        depth0 = None
        if p.depth0_filenames is not None and Path(p.depth0_filenames[i]).exists():
            depth0 = np.load(p.depth0_filenames[i]).astype(np.float32)
            if depth0.ndim == 2:
                depth0 = depth0[..., None]

        # Foreground loss mask (nerfstudio `mask_path` convention): the loss
        # blacks out both gt and pred where mask == 0
        # (ref: freegaussian_model.py:948-957).
        mask = None
        if p.mask_filenames is not None:
            mp = p.mask_filenames[i]
            if mp is not None and Path(mp).exists():
                mp = Path(mp)
                if mp.suffix == ".npy":
                    mask = np.load(mp)
                else:
                    m = imageio.imread(mp)
                    mask = (m[..., 0] if m.ndim == 3 else m) > 127
                mask = np.squeeze(np.asarray(mask)).astype(bool)

        atrb_mask = p.atrb_masks[i] if p.atrb_masks is not None else None
        mask_valid = p.mask_valids[i] if p.mask_valids is not None else None

        K = np.array(
            [[p.fx[i], 0, p.cx[i]], [0, p.fy[i], p.cy[i]], [0, 0, 1]], np.float32
        )
        if p.distortion is not None and np.any(p.distortion[i]):
            K, image, mask, depth0, flow, atrb_mask = undistort_frame(
                K, p.distortion[i], image, mask=mask, depth=depth0, flow=flow,
                atrb_mask=atrb_mask,
            )
            if depth0 is not None and depth0.ndim == 2:
                depth0 = depth0[..., None]
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

        if not self.cache_uint8 and image.dtype == np.uint8:
            image = image.astype(np.float32) / 255.0

        import jax.numpy as jnp

        def make_cam(c2w, t):
            return Camera(
                c2w=jnp.asarray(c2w),
                fx=jnp.asarray(fx, jnp.float32),
                fy=jnp.asarray(fy, jnp.float32),
                cx=jnp.asarray(cx, jnp.float32),
                cy=jnp.asarray(cy, jnp.float32),
                time=jnp.asarray(t, jnp.float32),
                width=int(image.shape[1]),
                height=int(image.shape[0]),
            )

        # camera0 shares the frame's intrinsics but carries the PAIRED frame's
        # own time (`times0` = time of full-capture frame idx-interval); with
        # interval != 1 or a split, times[i-1] is the WRONG pairing for the
        # flow losses (ref: freegaussian_dataparser.py:489-512; VERDICT r2 #2).
        t0 = p.times0[i] if p.times0 is not None else p.times[max(i - 1, 0)]
        cam = make_cam(p.c2w[i], p.times[i])
        cam0 = make_cam(p.c2w0[i], t0)
        return CachedFrame(
            image=image,
            camera=cam,
            camera0=cam0,
            flow=flow,
            depth0=depth0,
            mask=mask,
            atrb_mask=atrb_mask,
            mask_valid=mask_valid,
        )

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.frames)

    def next_train(self, step: int) -> Tuple[Camera, Dict[str, np.ndarray]]:
        """Random-without-replacement epoch ordering (nerfstudio
        FullImageDatamanager semantics)."""
        _, cam, batch = self.next_train_indexed(step)
        return cam, batch

    def next_train_indexed(
        self, step: int
    ) -> Tuple[int, Camera, Dict[str, np.ndarray]]:
        """Like `next_train` but also returns the frame index, so the trainer
        can fetch the paired `camera0` for flow supervision and address
        per-camera optimizer state."""
        idx = self.draw_indices(1)[0]
        cam, batch = self.get_batch(idx)
        return idx, cam, batch

    def draw_indices(self, n: int) -> List[int]:
        """Draw the next n frame indices of the epoch permutation — the SAME
        sequence the per-step loop consumes, so the scan-chunked trainer
        (Trainer scan_chunk) trains on identical frame orders."""
        out = []
        for _ in range(n):
            if not self._epoch_order:
                self._epoch_order = list(self.rng.permutation(len(self.frames)))
            out.append(int(self._epoch_order.pop()))
        return out

    def camera0(self, idx: int) -> Camera:
        """Paired (previous) frame's camera for the flow-derivative path."""
        return self.frames[idx].camera0

    def get_batch(self, idx: int) -> Tuple[Camera, Dict[str, np.ndarray]]:
        import jax.numpy as jnp

        if self.cache_device and idx in self._device_cache:
            cam, batch = self._device_cache[idx]
            return cam, dict(batch)

        f = self.frames[idx]
        image = f.image
        if image.dtype == np.uint8:
            image = image.astype(np.float32) / 255.0
        batch: Dict[str, np.ndarray] = {"image": jnp.asarray(image)}
        if f.mask is not None:
            batch["mask"] = jnp.asarray(
                f.mask.astype(np.float32).reshape(f.mask.shape[0], f.mask.shape[1], 1)
            )
        if f.flow is not None:
            batch["flow"] = jnp.asarray(f.flow)
        if f.depth0 is not None:
            batch["depth0"] = jnp.asarray(f.depth0)
        if f.atrb_mask is not None:
            batch["atrb_mask"] = jnp.asarray(f.atrb_mask)
            batch["mask_valid"] = jnp.asarray(f.mask_valid)
        if self.cache_device:
            # device_put happened via jnp.asarray; keep the device arrays so
            # later epochs skip the host->device copy entirely
            self._device_cache[idx] = (f.camera, dict(batch))
        return f.camera, batch

    def eval_frames(self):
        for i in range(len(self.frames)):
            yield self.get_batch(i)
