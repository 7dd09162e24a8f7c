"""Preprocess toolchain tests: epipolar interflow math (both forms),
clustering votes, offline renders."""

import importlib.util
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from freegaussian_tpu.data.cameras import Camera
from freegaussian_tpu.preprocess.epipolar_flow import (
    diff_2d_epipolar_flow,
    diff_2d_epipolar_flow_backproject,
    generate_interflow_dataset,
)
from freegaussian_tpu.preprocess.clustering import (
    cluster_gaussians,
    load_gaussian_mask,
    save_gaussian_mask,
)

spec = importlib.util.spec_from_file_location("t", "tests/test_train_e2e.py")
t = importlib.util.module_from_spec(spec)
spec.loader.exec_module(t)


def make_cam(c2w34, fx=50.0, w=32, h=24, time=0.0):
    return Camera(
        c2w=jnp.asarray(c2w34, jnp.float32),
        fx=jnp.asarray(fx), fy=jnp.asarray(fx),
        cx=jnp.asarray(w / 2.0), cy=jnp.asarray(h / 2.0),
        time=jnp.asarray(time), width=w, height=h,
    )


def test_static_camera_interflow_equals_opticalflow():
    """No camera motion: sceneflow = 0, interflow = opticalflow (both forms)."""
    c2w = np.eye(4, dtype=np.float32)[:3]
    cam = make_cam(c2w)
    Z = jnp.full((24, 32, 1), 2.0)
    oflow = jnp.asarray(np.random.default_rng(0).normal(size=(24, 32, 2)).astype(np.float32))
    out_v = diff_2d_epipolar_flow(Z, cam, cam, oflow)
    np.testing.assert_allclose(np.asarray(out_v["sceneflow"]), 0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_v["interflow"]), np.asarray(oflow), atol=1e-4)
    out_b = diff_2d_epipolar_flow_backproject(Z, cam, cam, oflow)
    np.testing.assert_allclose(np.asarray(out_b["sceneflow"]), 0, atol=1e-3)


def test_backproject_form_translation():
    """Pure x-translation of an OpenGL camera: reprojected pixels shift by
    fx * dx / Z; the backprojection form must reproduce that exactly."""
    c2w0 = np.eye(4, dtype=np.float32)[:3]
    c2w1 = np.eye(4, dtype=np.float32)[:3]
    c2w1[0, 3] = 0.1  # move right in world
    cam0 = make_cam(c2w0)
    cam1 = make_cam(c2w1)
    Z = jnp.full((24, 32, 1), 2.0)
    oflow = jnp.zeros((24, 32, 2))
    out = diff_2d_epipolar_flow_backproject(Z, cam0, cam1, oflow)
    sf = np.asarray(out["sceneflow"])
    # OpenGL camera looks down -z; a point straight ahead is at (0,0,-2)
    # world. Camera moves +x => point moves -x in cam frame => pixel shifts
    # by -fx*dx/Z = -50*0.1/2 = -2.5 px.
    np.testing.assert_allclose(sf[..., 0], -2.5, atol=1e-3)
    np.testing.assert_allclose(sf[..., 1], 0.0, atol=1e-3)


def test_velocity_form_approximates_backprojection_small_motion():
    """For small camera motion the velocity-Jacobian form approximates the
    exact backprojection sceneflow."""
    from scipy.spatial.transform import Rotation

    c2w0 = np.eye(4, dtype=np.float32)[:3]
    c2w1 = np.eye(4, dtype=np.float32)
    c2w1[:3, :3] = Rotation.from_rotvec([0.0, 0.01, 0.0]).as_matrix()
    c2w1[0, 3] = 0.02
    cam0 = make_cam(c2w0)
    cam1 = make_cam(c2w1[:3])
    Z = jnp.full((24, 32, 1), 2.0)
    oflow = jnp.zeros((24, 32, 2))
    sf_v = np.asarray(diff_2d_epipolar_flow(Z, cam0, cam1, oflow)["sceneflow"])
    sf_b = np.asarray(
        diff_2d_epipolar_flow_backproject(Z, cam0, cam1, oflow)["sceneflow"]
    )
    # interflow sign conventions differ (+/- sceneflow); compare magnitudes
    err = np.abs(np.abs(sf_v) - np.abs(sf_b)).max()
    assert err < 0.2, f"velocity form deviates too much: {err}"


def test_generate_interflow_dataset(tmp_path):
    import importlib.util as iu

    dspec = iu.spec_from_file_location("td", "tests/test_data.py")
    td = iu.module_from_spec(dspec)
    dspec.loader.exec_module(td)
    td.make_synthetic_dataset(tmp_path)
    n = generate_interflow_dataset(tmp_path, interval=2, out_dir="interflow_test")
    assert n == 6
    files = sorted((tmp_path / "interflow_test").glob("*.npy"))
    assert len(files) == 6
    flow = np.load(files[0])
    assert flow.shape == (24, 32, 2)
    assert np.isfinite(flow).all()


def test_cluster_gaussians_votes(tmp_path):
    """Gaussians on the left/right halves of the screen get the matching
    attribute labels; occluded Gaussians are filtered by depth consistency."""
    cfg = t.make_cameras(n=1, width=32, height=32)[0]
    capacity = 8
    means = np.zeros((capacity, 3), np.float32)
    means[0] = [-0.5, 0.0, 0.0]   # projects left
    means[1] = [0.5, 0.0, 0.0]    # projects right
    means[2] = [-0.5, 0.0, 2.0]   # in front of cam? (camera at z=4 looking -z)
    params = {
        "means": jnp.asarray(means),
        "scales": jnp.full((capacity, 3), np.log(0.05)),
        "quats": jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (capacity, 1)),
        "features_dc": jnp.zeros((capacity, 3)),
        "features_rest": jnp.zeros((capacity, 45)),
        "opacities": jnp.full((capacity, 1), 4.0),
    }
    alive = jnp.asarray(np.arange(capacity) < 3)
    # reference annotation layout: attributes at [0, M), BACKGROUND last
    # (load_*_annotations builds (H, W, M+1); knn_gaussian votes [..., :-1])
    atrb = np.zeros((32, 32, 3), bool)
    atrb[:, :16, 0] = True
    atrb[:, 16:, 1] = True
    atrb[..., 2] = ~(atrb[..., 0] | atrb[..., 1])
    from freegaussian_tpu.models.splat_model import SplatConfig

    mask = cluster_gaussians(
        params, alive, {0: jnp.asarray(atrb)}, {0: cfg}, backend="reference"
    )
    m = np.asarray(mask)
    assert m.shape == (capacity, 2)  # background channel dropped
    assert m[0, 0] and not m[0, 1]  # left gaussian -> attr 0
    assert m[1, 1] and not m[1, 0]  # right gaussian -> attr 1
    assert not m[3:].any()  # dead slots have no votes

    # roundtrip save/load
    save_gaussian_mask(tmp_path / "gm.npy", mask, alive)
    loaded = load_gaussian_mask(tmp_path / "gm.npy", capacity, alive)
    np.testing.assert_array_equal(np.asarray(loaded), m)

    # exclusive (vote-count argmax) assignment: a Gaussian voted into both
    # attributes over two frames keeps only its most-voted one; singly-voted
    # rows are unchanged vs the reference's boolean OR
    atrb2 = np.zeros((32, 32, 3), bool)
    atrb2[:, :, 1] = True  # frame 2: EVERYTHING labeled attr 1
    atrb2[..., 2] = False
    frames = {0: jnp.asarray(atrb), 1: jnp.asarray(atrb2)}
    cams = {0: cfg, 1: cfg}
    m_or = np.asarray(cluster_gaussians(
        params, alive, frames, cams, backend="reference"
    ))
    m_ex = np.asarray(cluster_gaussians(
        params, alive, frames, cams, backend="reference", exclusive=True
    ))
    assert m_or[0].all()  # OR voting: left gaussian shared across attrs
    assert m_ex.sum(-1).max() <= 1  # exclusive: one attribute per row
    # right gaussian voted attr 1 in both frames -> stays attr 1
    assert m_ex[1, 1] and not m_ex[1, 0]
    # every OR-voted row is still voted (relabeled, never dropped)
    np.testing.assert_array_equal(m_ex.any(-1), m_or.any(-1))


def test_render_offline(tmp_path):
    from freegaussian_tpu.models.splat_model import SplatConfig
    from freegaussian_tpu.preprocess.render_offline import (
        render_color_images,
        render_depth_maps,
    )

    cfg = SplatConfig(backend="reference", background_color="black")
    cams = t.make_cameras(n=2, width=32, height=24)
    gt = t.make_gt_scene(jax.random.PRNGKey(0), n=20)
    alive = jnp.ones(20, bool)
    n1 = render_depth_maps(cfg, gt, alive, cams, tmp_path / "depth", dataparser_scale=2.0)
    n2 = render_color_images(cfg, gt, alive, cams, tmp_path / "rgb", sh_degree=0)
    assert n1 == 2 and n2 == 2
    d = np.load(tmp_path / "depth/00000.npy")
    assert d.shape == (24, 32)
    assert np.isfinite(d).all()
