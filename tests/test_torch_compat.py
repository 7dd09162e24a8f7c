"""Reference-checkpoint import: build the reference's torch modules verbatim
(from the formulas in SURVEY §2), save a checkpoint, import it, and require
the flax fields to reproduce the torch forward pass exactly."""

import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F


# -- minimal torch re-implementations of the reference field MLPs -------------
def get_embedder(multires, i=1):
    freqs = 2.0 ** torch.linspace(0.0, multires - 1, steps=multires)

    def embed(x):
        outs = [x]
        for f in freqs:
            outs.append(torch.sin(x * f))
            outs.append(torch.cos(x * f))
        return torch.cat(outs, -1)

    return embed, i * (1 + 2 * multires)


class TorchDeform(nn.Module):
    """Mirrors FreeGaussianDeformableModel (freegaussian_model.py:1054-1114)."""

    def __init__(self, D=8, W=256, multires=10, is_blender=True):
        super().__init__()
        self.skips = [D // 2]
        self.embed_time_fn, time_ch = get_embedder(6 if is_blender else 10, 1)
        self.embed_fn, xyz_ch = get_embedder(multires, 3)
        self.is_blender = is_blender
        if is_blender:
            self.timenet = nn.Sequential(
                nn.Linear(time_ch, 256), nn.ReLU(), nn.Linear(256, 30)
            )
            in_ch = xyz_ch + 30
        else:
            in_ch = xyz_ch + time_ch
        self.linear = nn.ModuleList(
            [nn.Linear(in_ch, W)]
            + [
                nn.Linear(W, W) if i not in self.skips else nn.Linear(W + in_ch, W)
                for i in range(D - 1)
            ]
        )
        self.branch_w = nn.Linear(W, 3)
        self.branch_v = nn.Linear(W, 3)
        self.gaussian_rotation = nn.Linear(W, 4)
        self.gaussian_scaling = nn.Linear(W, 3)

    def forward(self, x, t):
        t_emb = self.embed_time_fn(t)
        if self.is_blender:
            t_emb = self.timenet(t_emb)
        x_emb = self.embed_fn(x)
        h = torch.cat([x_emb, t_emb], -1)
        for i, l in enumerate(self.linear):
            h = F.relu(l(h))
            if i in self.skips:
                h = torch.cat([x_emb, t_emb, h], -1)
        return self.branch_w(h), self.branch_v(h), self.gaussian_rotation(h), self.gaussian_scaling(h)


class TorchControl(nn.Module):
    """Mirrors FreeGaussianControllableModel (freegaussian_model.py:1117-1145)."""

    def __init__(self, D=8, W=256, multires=10):
        super().__init__()
        self.skips = [D // 2]
        self.value_embed_fn, vch = get_embedder(multires, 3)
        self.xyz_embed_fn, xch = get_embedder(multires, 3)
        in_ch = vch + xch
        self.linear = nn.ModuleList(
            [nn.Linear(in_ch, W)]
            + [
                nn.Linear(W, W) if i not in self.skips else nn.Linear(W + in_ch, W)
                for i in range(D - 1)
            ]
        )
        self.d_xyz = nn.Linear(W, 3)
        self.d_rot = nn.Linear(W, 4)
        self.d_scale = nn.Linear(W, 3)

    def forward(self, x, value):
        h = torch.cat([self.xyz_embed_fn(x), self.value_embed_fn(value)], -1)
        x_emb = torch.cat([self.xyz_embed_fn(x), self.value_embed_fn(value)], -1)
        for i, l in enumerate(self.linear):
            h = F.relu(l(h))
            if i in self.skips:
                h = torch.cat([x_emb, h], -1)
        return self.d_xyz(h), self.d_rot(h), self.d_scale(h)


def _fake_checkpoint(tmp_path, n=50) -> Path:
    torch.manual_seed(0)
    deform = TorchDeform()
    control = TorchControl()
    state = {}
    gp = {
        "means": torch.randn(n, 3),
        "scales": torch.randn(n, 3) * 0.1 - 3,
        "quats": torch.randn(n, 4),
        "features_dc": torch.randn(n, 3),
        "features_rest": torch.randn(n, 15, 3) * 0.01,
        "opacities": torch.randn(n, 1),
    }
    for k, v in gp.items():
        state[f"_model.gauss_params.{k}"] = v
    for k, v in deform.state_dict().items():
        state[f"_model.deform.{k}"] = v
    for k, v in control.state_dict().items():
        state[f"_model.control.{k}"] = v
    path = tmp_path / "step-000029999.ckpt"
    torch.save({"pipeline": state, "step": 29999}, path)
    return path, deform, control, gp


def test_import_reference_checkpoint_deform_parity(tmp_path):
    from freegaussian_tpu.models.fields import DeformField
    from freegaussian_tpu.models.torch_compat import load_reference_checkpoint

    path, torch_deform, _, gp = _fake_checkpoint(tmp_path)
    loaded = load_reference_checkpoint(path, capacity=64)
    assert loaded["step"] == 29999
    assert int(np.asarray(loaded["alive"]).sum()) == 50
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["means"][:50]), gp["means"].numpy(), atol=1e-6
    )

    # forward parity: torch trunk/head outputs vs flax on identical inputs
    x = np.random.default_rng(0).normal(size=(20, 3)).astype(np.float32)
    t = np.random.default_rng(1).uniform(size=(20, 1)).astype(np.float32)
    with torch.no_grad():
        tw, tv, trot, tscale = torch_deform(torch.from_numpy(x), torch.from_numpy(t))

    deform = DeformField(is_blender=True)
    d_xyz, rot, scale = deform.apply(loaded["deform_vars"], jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(rot), trot.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(scale), tscale.numpy(), atol=1e-5)
    # d_xyz is the screw transform of the torch (w, v) heads: rebuild the
    # reference's exp_se3 matrix torch-side and compare APPLIED points
    from freegaussian_tpu.models.fields import apply_se3_deform
    from freegaussian_tpu.ops.math import exp_se3

    theta = torch.norm(tw, dim=-1, keepdim=True)
    w_n = tw / theta + 1e-5
    v_n = tv / theta + 1e-5
    screw = torch.cat([w_n, v_n], -1).numpy()
    mats = jnp.asarray(np.asarray(exp_se3(jnp.asarray(screw), jnp.asarray(theta.numpy()))))
    ours = np.asarray(apply_se3_deform(jnp.asarray(x), d_xyz))
    homog = np.concatenate([x, np.ones((x.shape[0], 1), np.float32)], -1)
    expected = np.einsum("nij,nj->ni", np.asarray(mats), homog)[:, :3]
    np.testing.assert_allclose(ours, expected, atol=1e-4)


def test_import_reference_checkpoint_control_parity(tmp_path):
    from freegaussian_tpu.models.fields import ControlField
    from freegaussian_tpu.models.torch_compat import load_reference_checkpoint

    path, _, torch_control, _ = _fake_checkpoint(tmp_path)
    loaded = load_reference_checkpoint(path, capacity=64)
    assert "control_vars" in loaded

    x = np.random.default_rng(2).normal(size=(15, 3)).astype(np.float32)
    v = np.random.default_rng(3).normal(scale=0.1, size=(15, 3)).astype(np.float32)
    with torch.no_grad():
        td, tr, ts = torch_control(torch.from_numpy(x), torch.from_numpy(v))
    control = ControlField()
    d_xyz, d_rot, d_scale = control.apply(
        loaded["control_vars"], jnp.asarray(x), jnp.asarray(v)
    )
    np.testing.assert_allclose(np.asarray(d_xyz), td.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_rot), tr.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_scale), ts.numpy(), atol=1e-5)


def test_ddp_prefix_stripping(tmp_path):
    from freegaussian_tpu.models.torch_compat import _strip_prefixes

    state = {
        "module._model.module.gauss_params.means": torch.zeros(3, 3),
        "module._model.module.deform.branch_w.weight": torch.zeros(3, 256),
    }
    out = _strip_prefixes(state)
    assert "gauss_params.means" in out
    assert "deform.branch_w.weight" in out


def test_export_roundtrip():
    """export_reference_checkpoint -> load_reference_checkpoint recovers the
    same live Gaussians and field weights."""
    import tempfile
    from pathlib import Path

    import jax
    import jax.numpy as jnp
    import numpy as np

    from freegaussian_tpu.models.fields import ControlField, DeformField
    from freegaussian_tpu.models.gaussians import init_gaussians
    from freegaussian_tpu.models.torch_compat import (
        export_reference_checkpoint,
        load_reference_checkpoint,
    )

    params, alive = init_gaussians(jax.random.PRNGKey(0), 64, num_random=40)
    deform = DeformField(is_blender=True)
    dvars = deform.init(jax.random.PRNGKey(1), jnp.zeros((1, 3)), jnp.zeros((1, 1)))
    control = ControlField()
    cvars = control.init(jax.random.PRNGKey(2), jnp.zeros((1, 3)), jnp.zeros((1, 3)))

    with tempfile.TemporaryDirectory() as td:
        p = Path(td) / "step-000000007.ckpt"
        export_reference_checkpoint(
            p, params, alive, deform_vars=dvars, control_vars=cvars, step=7
        )
        back = load_reference_checkpoint(p, capacity=64)
        assert back["step"] == 7
        n = int(np.asarray(alive).sum())
        np.testing.assert_allclose(
            np.asarray(back["params"]["means"])[:n],
            np.asarray(params["means"])[np.asarray(alive)],
            rtol=1e-6,
        )
        a = jax.tree.leaves(back["deform_vars"])
        b = jax.tree.leaves(dvars)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)
        c = jax.tree.leaves(back["control_vars"])
        d = jax.tree.leaves(cvars)
        for x, y in zip(c, d):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)
