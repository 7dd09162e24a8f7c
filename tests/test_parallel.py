"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the sharded
train step must run, reduce gradients, and (with tile=1) match the
single-device step's loss."""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freegaussian_tpu.engine.optimizers import (
    OptimizersConfig,
    init_opt_states,
    make_optimizers,
)
from freegaussian_tpu.engine.train_step import GAUSSIAN_GROUPS, TrainState
from freegaussian_tpu.models.densify import DensifyConfig, DensifyState
from freegaussian_tpu.models.fields import DeformField
from freegaussian_tpu.models.gaussians import init_gaussians
from freegaussian_tpu.models.splat_model import SplatConfig
from freegaussian_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    replicate_state,
    stack_cameras,
)

spec = importlib.util.spec_from_file_location("t", "tests/test_train_e2e.py")
t = importlib.util.module_from_spec(spec)
spec.loader.exec_module(t)


def _setup(capacity=64, n_cams=4, width=32, height=32):
    cfg = SplatConfig(warm_up=0, sh_degree=3, backend="reference", background_color="black")
    cams = t.make_cameras(n=n_cams, width=width, height=height)
    gt = t.make_gt_scene(jax.random.PRNGKey(7), n=30)
    images = [t.render_gt(gt, c, cfg) for c in cams]
    rng = np.random.default_rng(0)
    state, optimizers, deform = t._make_state(
        jax.random.PRNGKey(0), capacity,
        (rng.normal(scale=0.5, size=(30, 3)).astype(np.float32),
         rng.uniform(0, 255, (30, 3)).astype(np.float32)),
        OptimizersConfig(max_steps=100),
    )
    return cfg, cams, images, state, optimizers, deform


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_parallel_step_runs_dp_tile():
    cfg, cams, images, state, optimizers, deform = _setup()
    mesh = make_mesh(data=2, tile=4)
    step_fn = make_parallel_train_step(
        cfg, DensifyConfig(refine_start=10**9), optimizers, deform.apply,
        num_train_data=4, mesh=mesh, image_hw=(32, 32),
    )
    state = replicate_state(state, mesh)
    cam_batch = stack_cameras(cams[:2])
    img_batch = jnp.stack([images[0], images[1]])
    for i in range(3):
        state, metrics = step_fn(state, cam_batch, img_batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 3
    # params updated identically everywhere (replicated out-spec)
    assert np.isfinite(np.asarray(state.params["means"])).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_parallel_dp_only_matches_loss_scale():
    """data=2 tile=1: the psum'ed loss equals the mean of per-camera losses
    computed separately."""
    cfg, cams, images, state, optimizers, deform = _setup()
    mesh = make_mesh(data=2, tile=1)
    step_fn = make_parallel_train_step(
        cfg, DensifyConfig(refine_start=10**9), optimizers, deform.apply,
        num_train_data=4, mesh=mesh, image_hw=(32, 32), with_refine=False,
    )
    state_r = replicate_state(state, mesh)
    cam_batch = stack_cameras(cams[:2])
    img_batch = jnp.stack([images[0], images[1]])
    _, metrics = step_fn(state_r, cam_batch, img_batch)

    # single-device reference losses
    from freegaussian_tpu.models.splat_model import forward, loss_fn

    losses = []
    for cam, img in zip(cams[:2], images[:2]):
        # replicate the bg rng the parallel step uses
        _, k_bg, _ = jax.random.split(state.key, 3)
        out = forward(
            cfg, state.params, state.alive, cam,
            deform_variables=state.deform_vars, deform_apply=deform.apply,
            sh_degree_now=cfg.sh_degree, warmed_up=jnp.asarray(True),
            train=True, bg_rng=k_bg,
        )
        losses.append(float(loss_fn(cfg, out, {"image": img}, state.params, state.alive)["main_loss"]))
    np.testing.assert_allclose(float(metrics["loss"]), np.mean(losses), rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_parallel_with_refine_keeps_static_shapes():
    cfg, cams, images, state, optimizers, deform = _setup()
    mesh = make_mesh(data=4, tile=2)
    step_fn = make_parallel_train_step(
        cfg,
        DensifyConfig(refine_start=1, refine_every=2, densify_grad_thresh=1e-6,
                      stop_screen_size_at=0, reset_alpha_every=10**6),
        optimizers, deform.apply, num_train_data=4, mesh=mesh, image_hw=(32, 32),
    )
    state = replicate_state(state, mesh)
    cam_batch = stack_cameras(cams[:4])
    img_batch = jnp.stack(images[:4])
    counts = []
    for i in range(6):
        state, metrics = step_fn(state, cam_batch, img_batch)
        counts.append(int(metrics["gaussian_count"]))
    assert max(counts) <= 64
    assert np.isfinite(float(metrics["loss"]))
