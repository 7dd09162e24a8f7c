"""Flow-derivative path tests: 3D lifting geometry, rendered-flow channels,
and flow-supervised training."""

import jax
import jax.numpy as jnp
import numpy as np

from freegaussian_tpu.data.cameras import Camera
from freegaussian_tpu.ops.flow import (
    flow_supervision_loss,
    query_3d_gaussian_flow,
    rendered_flow_loss,
)


def test_query_3d_flow_zero_flow_backprojects_depth():
    """Zero interflow, identity camera: lifted point = K^-1 [x,y,1] * Z."""
    K = jnp.array([[50.0, 0, 16], [0, 50.0, 12], [0, 0, 1]])
    c2w = jnp.eye(4)[:3]  # OpenCV identity: camera at origin looking +z
    H, W = 24, 32
    Z0 = jnp.full((H, W, 1), 2.0)
    interflow = jnp.zeros((H, W, 2))
    means2d = jnp.array([[16.0, 12.0], [20.0, 8.0], [100.0, 5.0]])  # last off-screen
    out = query_3d_gaussian_flow(means2d, Z0, interflow, c2w, K)
    assert bool(out["valid"][0]) and bool(out["valid"][1]) and not bool(out["valid"][2])
    # principal point at depth 2 -> (0, 0, 2)
    np.testing.assert_allclose(out["p_world"][0], [0, 0, 2.0], atol=1e-5)
    # pixel (20, 8): x_cam = (20-16)/50*2, y_cam = (8-12)/50*2
    np.testing.assert_allclose(out["p_world"][1], [0.16, -0.16, 2.0], atol=1e-5)
    np.testing.assert_allclose(out["p_world"][2], [0, 0, 0], atol=1e-6)


def test_query_3d_flow_advects_through_flow():
    K = jnp.array([[50.0, 0, 16], [0, 50.0, 12], [0, 0, 1]])
    c2w = jnp.eye(4)[:3]
    H, W = 24, 32
    Z0 = jnp.full((H, W, 1), 4.0)
    interflow = jnp.full((H, W, 2), 2.0)  # advect +2px in x and y
    means2d = jnp.array([[16.0, 12.0]])
    out = query_3d_gaussian_flow(means2d, Z0, interflow, c2w, K)
    # advected pixel (18, 14) at depth 4: ((18-16)/50*4, (14-12)/50*4, 4)
    np.testing.assert_allclose(out["p_world"][0], [0.16, 0.16, 4.0], atol=1e-5)


def test_query_3d_flow_camera_transform():
    """Non-identity c2w: result transformed into world space."""
    from scipy.spatial.transform import Rotation

    R = Rotation.from_rotvec([0.2, -0.1, 0.3]).as_matrix().astype(np.float32)
    t = np.array([1.0, -2.0, 0.5], np.float32)
    c2w = jnp.asarray(np.concatenate([R, t[:, None]], axis=1))
    K = jnp.array([[50.0, 0, 16], [0, 50.0, 12], [0, 0, 1]])
    Z0 = jnp.full((24, 32, 1), 3.0)
    out = query_3d_gaussian_flow(
        jnp.array([[16.0, 12.0]]), Z0, jnp.zeros((24, 32, 2)), c2w, K
    )
    expected = R @ np.array([0, 0, 3.0]) + t
    np.testing.assert_allclose(out["p_world"][0], expected, atol=1e-5)


def test_rendered_flow_channels_match_projection_delta():
    """A single Gaussian moving in screen space: the rendered flow at its
    center must equal the per-Gaussian projected motion."""
    from freegaussian_tpu.models.fields import DeformField
    from freegaussian_tpu.models.splat_model import SplatConfig, forward
    from freegaussian_tpu.models.gaussians import init_gaussians

    cfg = SplatConfig(
        warm_up=0, backend="reference", background_color="black", is_blender=True,
        flow_loss_weight=1.0,
    )
    params, alive = init_gaussians(
        jax.random.PRNGKey(0), 16,
        seed_points=(np.array([[0.0, 0.0, 0.0]], np.float32), np.array([[200.0, 100.0, 50.0]])),
        sh_degree=3,
    )
    params["scales"] = jnp.full_like(params["scales"], jnp.log(0.2))
    params["opacities"] = jnp.full_like(params["opacities"], 3.0)

    def make_cam(t):
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = 3.0  # camera at z=3 looking -z (OpenGL) => sees origin
        return Camera(
            c2w=jnp.asarray(c2w[:3]), fx=jnp.asarray(40.0), fy=jnp.asarray(40.0),
            cx=jnp.asarray(16.0), cy=jnp.asarray(12.0), time=jnp.asarray(t),
            width=32, height=24,
        )

    cam1, cam0 = make_cam(1.0), make_cam(0.0)
    deform = DeformField(is_blender=True)
    dvars = deform.init(jax.random.PRNGKey(1), jnp.zeros((1, 3)), jnp.zeros((1, 1)))

    out = forward(
        cfg, params, alive, cam1,
        deform_variables=dvars, deform_apply=deform.apply,
        sh_degree_now=0, warmed_up=jnp.asarray(True), train=True,
        bg_rng=jax.random.PRNGKey(2), camera0=cam0, render_flow=True,
    )
    assert "flow" in out and out["flow"].shape == (24, 32, 2)
    assert "means_prev" in out
    # flow = alpha-weighted per-gaussian motion; with one gaussian, at center:
    # flow_px = alpha * (m2d_t - m2d_t0). Untrained deform is near-identity so
    # motion is small but well-defined and finite.
    assert np.isfinite(np.asarray(out["flow"])).all()


def test_flow_losses_train():
    """Training with flow losses produces finite decreasing totals."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("t", "tests/test_train_e2e.py")
    t = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(t)
    from freegaussian_tpu.engine.optimizers import OptimizersConfig
    from freegaussian_tpu.engine.train_step import make_train_step
    from freegaussian_tpu.models.densify import DensifyConfig
    from freegaussian_tpu.models.splat_model import SplatConfig

    cfg = SplatConfig(
        warm_up=0, sh_degree=3, backend="reference", background_color="black",
        flow_loss_weight=0.1, flow_3d_loss_weight=0.1,
    )
    cams = t.make_cameras(n=2, width=32, height=32)
    gt = t.make_gt_scene(jax.random.PRNGKey(7), n=30)
    images = [t.render_gt(gt, c, cfg) for c in cams]
    rng = np.random.default_rng(0)
    state, optimizers, deform = t._make_state(
        jax.random.PRNGKey(0), 64,
        (rng.normal(scale=0.5, size=(30, 3)).astype(np.float32),
         rng.uniform(0, 255, (30, 3)).astype(np.float32)),
        OptimizersConfig(max_steps=200),
    )
    step_fn = make_train_step(cfg, DensifyConfig(refine_start=10**9), optimizers,
                              deform.apply, num_train_data=2)
    batch = {
        "image": images[1],
        "flow": jnp.zeros((32, 32, 2)),
        "depth0": jnp.full((32, 32, 1), 4.0),
    }
    vals = []
    for i in range(20):
        state, m = step_fn(state, cams[1], batch, 0, camera0=cams[0])
        vals.append(float(m["loss"]))
        assert "flow_2d" in m and "flow_3d" in m
    assert np.all(np.isfinite(vals))
    assert vals[-1] < vals[0]


def test_flow_loss_helpers():
    lifted = {
        "p_world": jnp.ones((5, 3)),
        "valid": jnp.array([True, True, False, True, True]),
    }
    means_prev = jnp.zeros((5, 3))
    radii = jnp.array([1, 0, 1, 1, 1], jnp.int32)
    loss = flow_supervision_loss(means_prev, lifted, radii)
    # valid & visible: indices 0, 3, 4 -> |1|*3 per point
    np.testing.assert_allclose(float(loss), 3.0, atol=1e-6)

    rf = rendered_flow_loss(jnp.ones((4, 4, 2)), -jnp.ones((4, 4, 2)), jnp.ones((4, 4, 1)))
    np.testing.assert_allclose(float(rf), 0.0, atol=1e-6)


def test_flow_px_ref_resolution_invariance():
    """flow_px_ref normalizes the 2D flow loss's effective weight by
    resolution: at max(H, W) == flow_px_ref the total is IDENTICAL to the
    legacy pixel-unit path, and at 2x the resolution the flow term's
    contribution to the total halves (round-5 regression: the pixel-unit
    loss at 640px was 5x the 128px-tuned balance and destabilized training).
    """
    import importlib.util

    spec = importlib.util.spec_from_file_location("t", "tests/test_train_e2e.py")
    t = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(t)
    import dataclasses as dc

    from freegaussian_tpu.engine.optimizers import OptimizersConfig
    from freegaussian_tpu.engine.train_step import make_train_step
    from freegaussian_tpu.models.densify import DensifyConfig
    from freegaussian_tpu.models.splat_model import SplatConfig

    def total_for(cfg, width, height):
        cams = t.make_cameras(n=2, width=width, height=height)
        gt = t.make_gt_scene(jax.random.PRNGKey(7), n=30)
        images = [t.render_gt(gt, c, cfg) for c in cams]
        rng = np.random.default_rng(0)
        state, optimizers, deform = t._make_state(
            jax.random.PRNGKey(0), 64,
            (rng.normal(scale=0.5, size=(30, 3)).astype(np.float32),
             rng.uniform(0, 255, (30, 3)).astype(np.float32)),
            OptimizersConfig(max_steps=200),
        )
        step_fn = make_train_step(
            cfg, DensifyConfig(refine_start=10**9), optimizers,
            deform.apply, num_train_data=2,
        )
        batch = {
            "image": images[1],
            # constant nonzero target so the flow term is O(1), not O(eps)
            "flow": jnp.full((height, width, 2), 3.0),
            "depth0": jnp.full((height, width, 1), 4.0),
        }
        _, m = step_fn(state, cams[1], batch, 0, camera0=cams[0])
        return float(m["loss"]), float(m["flow_2d"]), float(m["main_loss"])

    base = SplatConfig(
        warm_up=0, sh_degree=3, backend="reference", background_color="black",
        flow_loss_weight=0.1, flow_3d_loss_weight=0.0,
    )
    # parity at the reference size: px_ref == max(H, W) is a no-op
    tot_legacy, fl_legacy, _ = total_for(base, 32, 32)
    tot_ref, fl_ref, _ = total_for(dc.replace(base, flow_px_ref=32.0), 32, 32)
    np.testing.assert_allclose(tot_ref, tot_legacy, rtol=1e-6)
    np.testing.assert_allclose(fl_ref, fl_legacy, rtol=1e-6)

    # at 2x resolution the flow CONTRIBUTION (total - main - scale_reg)
    # carries the 0.5 normalizer vs the legacy path on the same frames
    tot64_legacy, fl64, main64 = total_for(base, 64, 64)
    tot64_ref, fl64_r, main64_r = total_for(dc.replace(base, flow_px_ref=32.0), 64, 64)
    np.testing.assert_allclose(fl64_r, fl64, rtol=1e-6)  # raw metric unchanged
    contrib_legacy = tot64_legacy - main64
    contrib_ref = tot64_ref - main64_r
    np.testing.assert_allclose(contrib_ref, 0.5 * contrib_legacy, rtol=1e-4)


def test_deform_head_init_scale_identity():
    """head_init_scale=1e-4 makes the warm-up flip identity-scale: the
    untrained deform displaces points by O(1e-5) world units and the
    additive d_scale/d_rot heads output O(1e-5), vs ~0.12 at the
    reference's torch-default head init (the 640px footprint-shock
    regression; see DeformField.head_init_scale)."""
    from freegaussian_tpu.models.splat_model import (
        SplatConfig, apply_se3_deform, make_deform_field,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (500, 3))
    t = jnp.full((1, 1), 0.37)

    f = make_deform_field(SplatConfig(deform_head_init_scale=1e-4))
    v = f.init(jax.random.PRNGKey(1), x, t)
    d_xyz, rot, sc = f.apply(v, x, t)
    assert float(jnp.abs(apply_se3_deform(x, d_xyz) - x).max()) < 1e-3
    assert float(jnp.abs(sc).max()) < 1e-3
    assert float(jnp.abs(rot).max()) < 1e-3

    # reference-faithful default: heads keep torch-default magnitude
    f0 = make_deform_field(SplatConfig())
    v0 = f0.init(jax.random.PRNGKey(1), x, t)
    _, _, sc0 = f0.apply(v0, x, t)
    assert float(jnp.abs(sc0).max()) > 1e-2
