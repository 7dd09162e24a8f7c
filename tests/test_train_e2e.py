"""End-to-end tiny-scene training: the jitted train step must reduce loss /
raise PSNR on a synthetic scene, exercise densification bookkeeping, and the
deform field must learn a simple motion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freegaussian_tpu.data.cameras import Camera
from freegaussian_tpu.engine.optimizers import OptimizersConfig, init_opt_states, make_optimizers
from freegaussian_tpu.engine.train_step import GAUSSIAN_GROUPS, TrainState, make_train_step
from freegaussian_tpu.models.densify import DensifyConfig, DensifyState
from freegaussian_tpu.models.fields import DeformField
from freegaussian_tpu.models.gaussians import init_gaussians
from freegaussian_tpu.models.splat_model import SplatConfig, forward, psnr


def make_cameras(n=4, width=48, height=48, radius=4.0):
    cams = []
    for i in range(n):
        angle = 2 * np.pi * i / max(n, 1) * 0.1
        # simple look-at-origin OpenGL cameras on a circle
        eye = np.array([radius * np.sin(angle), 0.0, radius * np.cos(angle)])
        forward_v = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(forward_v, up)
        right /= np.linalg.norm(right)
        true_up = np.cross(right, forward_v)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0] = right
        c2w[:3, 1] = true_up
        c2w[:3, 2] = -forward_v  # OpenGL: camera looks down -z
        c2w[:3, 3] = eye
        cams.append(
            Camera(
                c2w=jnp.asarray(c2w[:3]),
                fx=jnp.asarray(60.0),
                fy=jnp.asarray(60.0),
                cx=jnp.asarray(width / 2.0),
                cy=jnp.asarray(height / 2.0),
                time=jnp.asarray(i / max(n - 1, 1)),
                width=width,
                height=height,
            )
        )
    return cams


def make_gt_scene(key, n=60):
    """Random ground-truth Gaussians near the origin."""
    keys = jax.random.split(key, 5)
    means = jax.random.normal(keys[0], (n, 3)) * 0.6
    quats = jax.random.normal(keys[1], (n, 4))
    scales = jnp.log(jax.random.uniform(keys[2], (n, 3), minval=0.05, maxval=0.2))
    dc = jax.random.uniform(keys[3], (n, 3), minval=-1.5, maxval=1.5)
    opac = jax.random.uniform(keys[4], (n, 1), minval=1.0, maxval=3.0)
    return {
        "means": means,
        "scales": scales,
        "quats": quats,
        "features_dc": dc,
        "features_rest": jnp.zeros((n, 45)),
        "opacities": opac,
    }


def render_gt(params, camera, cfg):
    out = forward(
        cfg,
        params,
        jnp.ones(params["means"].shape[0], bool),
        camera,
        sh_degree_now=0,
        train=False,
        render_mode="RGB",
    )
    return out["rgb"]


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = SplatConfig(
        warm_up=10_000_000,  # static phase
        sh_degree=3,
        backend="reference",
        background_color="black",
    )
    cams = make_cameras(n=3)
    gt_params = make_gt_scene(jax.random.PRNGKey(7))
    images = [render_gt(gt_params, c, cfg) for c in cams]
    return cfg, cams, images


def _make_state(key, capacity, seed_pts, opt_cfg):
    params, alive = init_gaussians(
        jax.random.PRNGKey(3),
        capacity,
        seed_points=seed_pts,
        sh_degree=3,
    )
    deform = DeformField(is_blender=True)
    dvars = deform.init(jax.random.PRNGKey(4), jnp.zeros((1, 3)), jnp.zeros((1, 1)))
    optimizers = make_optimizers(opt_cfg)
    params_by_group = {k: params[k] for k in GAUSSIAN_GROUPS}
    params_by_group["deform"] = dvars
    opt_states = init_opt_states(optimizers, params_by_group)
    state = TrainState(
        params=params,
        alive=alive,
        deform_vars=dvars,
        control_vars=None,
        opt_states=opt_states,
        densify=DensifyState.create(capacity),
        step=jnp.asarray(0),
        key=jax.random.PRNGKey(5),
    )
    return state, optimizers, deform


@pytest.mark.slow
def test_static_scene_training_improves_psnr(tiny_setup):
    cfg, cams, images = tiny_setup
    rng = np.random.default_rng(0)
    # seed points: noisy versions of random points in the volume
    seed_xyz = rng.normal(scale=0.7, size=(80, 3)).astype(np.float32)
    seed_rgb = rng.uniform(50, 200, size=(80, 3)).astype(np.float32)

    opt_cfg = OptimizersConfig(max_steps=300)
    state, optimizers, deform = _make_state(jax.random.PRNGKey(0), 256, (seed_xyz, seed_rgb), opt_cfg)

    dcfg = DensifyConfig(refine_start=40, refine_every=20, reset_alpha_every=1000,
                         stop_screen_size_at=0, stop_split_at=10_000)
    step_fn = make_train_step(cfg, dcfg, optimizers, deform.apply, num_train_data=3)

    def current_psnr(state):
        vals = []
        for cam, img in zip(cams, images):
            out = forward(cfg, state.params, state.alive, cam,
                          sh_degree_now=0, train=False, render_mode="RGB")
            vals.append(float(psnr(out["rgb"], img)))
        return np.mean(vals)

    p0 = current_psnr(state)
    n_steps = 120
    losses = []
    for i in range(n_steps):
        idx = i % len(cams)
        state, metrics = step_fn(state, cams[idx], {"image": images[idx]}, 0)
        losses.append(float(metrics["loss"]))
    p1 = current_psnr(state)
    assert np.isfinite(p1)
    assert p1 > p0 + 1.0, f"PSNR did not improve: {p0:.2f} -> {p1:.2f}"
    assert np.mean(losses[-10:]) < 0.8 * np.mean(losses[:3]), (
        f"loss did not drop: {np.mean(losses[:3]):.4f} -> {np.mean(losses[-10:]):.4f}"
    )
    # densification ran without shape blowups
    assert int(metrics["gaussian_count"]) <= 256
    assert int(metrics["gaussian_count"]) > 0


def test_densification_changes_population(tiny_setup):
    cfg, cams, images = tiny_setup
    rng = np.random.default_rng(1)
    seed_xyz = rng.normal(scale=0.7, size=(40, 3)).astype(np.float32)
    seed_rgb = rng.uniform(50, 200, size=(40, 3)).astype(np.float32)
    opt_cfg = OptimizersConfig(max_steps=300)
    state, optimizers, deform = _make_state(jax.random.PRNGKey(1), 128, (seed_xyz, seed_rgb), opt_cfg)
    dcfg = DensifyConfig(refine_start=5, refine_every=5, reset_alpha_every=10_000,
                         stop_screen_size_at=0, stop_split_at=10_000,
                         densify_grad_thresh=1e-6)  # force densification
    step_fn = make_train_step(cfg, dcfg, optimizers, deform.apply, num_train_data=1)
    counts = []
    for i in range(12):
        state, metrics = step_fn(state, cams[0], {"image": images[0]}, 0)
        counts.append(int(metrics["gaussian_count"]))
    assert counts[-1] != counts[0], f"population never changed: {counts}"
    assert max(counts) <= 128


@pytest.mark.slow
def test_deform_field_learns_motion():
    """Two frames with a translated Gaussian blob; the deform field must
    reduce photometric error at both times."""
    cfg = SplatConfig(
        warm_up=0, sh_degree=0, backend="reference", background_color="black",
        is_blender=True,
    )
    cams = make_cameras(n=2, width=32, height=32)
    n = 20
    keys = jax.random.split(jax.random.PRNGKey(11), 4)
    base = {
        "means": jax.random.normal(keys[0], (n, 3)) * 0.4,
        "scales": jnp.log(jnp.full((n, 3), 0.15)),
        "quats": jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
        "features_dc": jax.random.uniform(keys[1], (n, 3), minval=-1, maxval=1.5),
        "features_rest": jnp.zeros((n, 0)),
        "opacities": jnp.full((n, 1), 2.0),
    }
    shift = jnp.array([0.4, 0.0, 0.0])
    images = []
    for i, cam in enumerate(cams):
        p = dict(base)
        p["means"] = base["means"] + i * shift
        p15 = dict(p)
        p15["features_rest"] = jnp.zeros((n, 45))
        images.append(render_gt(p15, cam, cfg))

    params, alive = init_gaussians(
        jax.random.PRNGKey(3), 64,
        seed_points=(np.asarray(base["means"]), None), sh_degree=3,
    )
    deform = DeformField(is_blender=True)
    dvars = deform.init(jax.random.PRNGKey(4), jnp.zeros((1, 3)), jnp.zeros((1, 1)))
    optimizers = make_optimizers(OptimizersConfig(max_steps=400))
    params_by_group = {k: params[k] for k in GAUSSIAN_GROUPS}
    params_by_group["deform"] = dvars
    opt_states = init_opt_states(optimizers, params_by_group)
    state = TrainState(
        params=params, alive=alive, deform_vars=dvars, control_vars=None,
        opt_states=opt_states, densify=DensifyState.create(64),
        step=jnp.asarray(0), key=jax.random.PRNGKey(5),
    )
    dcfg = DensifyConfig(refine_start=10**9)
    step_fn = make_train_step(cfg, dcfg, optimizers, deform.apply, num_train_data=2)
    losses = []
    for i in range(100):
        idx = i % 2
        state, metrics = step_fn(state, cams[idx], {"image": images[idx]}, 0)
        losses.append(float(metrics["main_loss"]))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.7, (
        f"deform training failed: {np.mean(losses[:10]):.4f} -> {np.mean(losses[-10:]):.4f}"
    )
