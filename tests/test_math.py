"""Math-core unit tests: parity with the reference torch formulas
(reference: freegaussian/utils.py), checked against independent torch
re-implementations and analytic identities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freegaussian_tpu.ops import math as fgm


def test_quat_to_rotmat_orthonormal():
    key = jax.random.PRNGKey(0)
    q = fgm.random_quat(key, 64)
    R = fgm.quat_to_rotmat(q)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.det(R), np.ones(64), atol=1e-5)


def test_quat_to_rotmat_identity():
    q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    np.testing.assert_allclose(fgm.quat_to_rotmat(q)[0], np.eye(3), atol=1e-6)


def test_quat_to_rotmat_vs_scipy():
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(3)
    q_wxyz = rng.normal(size=(32, 4)).astype(np.float32)
    ours = np.asarray(fgm.quat_to_rotmat(jnp.asarray(q_wxyz)))
    q_xyzw = q_wxyz[:, [1, 2, 3, 0]]
    theirs = Rotation.from_quat(q_xyzw / np.linalg.norm(q_xyzw, axis=-1, keepdims=True)).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_skew_cross_product():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    Wv = (fgm.skew(w) @ v[..., None])[..., 0]
    np.testing.assert_allclose(Wv, np.cross(w, v), atol=1e-5)


def test_exp_so3_matches_rodrigues():
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(1)
    axis = rng.normal(size=(16, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    theta = rng.uniform(0.01, np.pi, size=(16, 1))
    ours = np.asarray(fgm.exp_so3(jnp.asarray(axis, dtype=jnp.float32), jnp.asarray(theta, dtype=jnp.float32)))
    theirs = Rotation.from_rotvec(axis * theta).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_exp_se3_pure_translation():
    # w -> 0 limit: translation p = theta * v for unit-ish screw with tiny w.
    v = jnp.array([[0.5, -0.25, 1.0]])
    w = jnp.array([[1e-8, 0.0, 0.0]])
    S = jnp.concatenate([w, v], axis=-1)
    theta = jnp.array([[2.0]])
    T = fgm.exp_se3(S, theta)
    np.testing.assert_allclose(T[0, :3, :3], np.eye(3), atol=1e-5)
    np.testing.assert_allclose(T[0, :3, 3], np.asarray(theta[0, 0] * v[0]), atol=1e-5)
    np.testing.assert_allclose(T[0, 3], [0, 0, 0, 1], atol=0)


def test_exp_se3_matches_scipy_rotation_part():
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(2)
    w = rng.normal(size=(8, 3))
    w /= np.linalg.norm(w, axis=-1, keepdims=True)
    v = rng.normal(size=(8, 3))
    theta = rng.uniform(0.1, 2.0, size=(8, 1))
    S = jnp.asarray(np.concatenate([w, v], axis=-1), dtype=jnp.float32)
    T = np.asarray(fgm.exp_se3(S, jnp.asarray(theta, dtype=jnp.float32)))
    Rs = Rotation.from_rotvec(w * theta).as_matrix()
    np.testing.assert_allclose(T[:, :3, :3], Rs, atol=1e-5)


def test_positional_embed_shape_and_bands():
    x = jnp.ones((5, 3)) * 0.3
    emb = fgm.positional_embed(x, num_freqs=10)
    assert emb.shape == (5, fgm.embed_dim(3, 10))
    assert fgm.embed_dim(3, 10) == 63
    # Band order: [x, sin(x), cos(x), sin(2x), cos(2x), ...]
    np.testing.assert_allclose(emb[:, :3], x, atol=1e-6)
    np.testing.assert_allclose(emb[:, 3:6], np.sin(np.asarray(x)), atol=1e-6)
    np.testing.assert_allclose(emb[:, 6:9], np.cos(np.asarray(x)), atol=1e-6)
    np.testing.assert_allclose(emb[:, 9:12], np.sin(2 * np.asarray(x)), atol=1e-6)


def test_get_viewmat_inverts_flipped_c2w():
    """viewmat @ [flipped c2w] == identity (the reference flips y/z then inverts)."""
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(4)
    R = Rotation.from_rotvec(rng.normal(size=3)).as_matrix()
    t = rng.normal(size=3)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = R
    c2w[:3, 3] = t
    vm = np.asarray(fgm.get_viewmat(jnp.asarray(c2w[None])))[0]
    flipped = c2w.copy()
    flipped[:3, 1] *= -1
    flipped[:3, 2] *= -1
    np.testing.assert_allclose(vm @ flipped, np.eye(4), atol=1e-5)


def test_get_viewmat_matches_torch_reference():
    import torch

    def torch_get_viewmat(c2w):
        R = c2w[:, :3, :3]
        T = c2w[:, :3, 3:4]
        R = R * torch.tensor([[[1, -1, -1]]], dtype=R.dtype)
        R_inv = R.transpose(1, 2)
        T_inv = -torch.bmm(R_inv, T)
        viewmat = torch.zeros(R.shape[0], 4, 4, dtype=R.dtype)
        viewmat[:, 3, 3] = 1.0
        viewmat[:, :3, :3] = R_inv
        viewmat[:, :3, 3:4] = T_inv
        return viewmat

    rng = np.random.default_rng(5)
    from scipy.spatial.transform import Rotation

    c2w = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    for i in range(4):
        c2w[i, :3, :3] = Rotation.from_rotvec(rng.normal(size=3)).as_matrix()
        c2w[i, :3, 3] = rng.normal(size=3)
    ours = np.asarray(fgm.get_viewmat(jnp.asarray(c2w)))
    theirs = torch_get_viewmat(torch.from_numpy(c2w)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_rgb_sh_roundtrip():
    rgb = jnp.asarray(np.random.default_rng(6).uniform(size=(10, 3)).astype(np.float32))
    np.testing.assert_allclose(fgm.sh_to_rgb(fgm.rgb_to_sh(rgb)), rgb, atol=1e-6)


def test_resize_image_matches_box_filter():
    rng = np.random.default_rng(7)
    img = rng.uniform(size=(8, 12, 3)).astype(np.float32)
    small = np.asarray(fgm.resize_image(jnp.asarray(img), 4))
    expected = img.reshape(2, 4, 3, 4, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(small, expected, atol=1e-6)


def test_bilinear_interp_matches_torch_reference():
    import torch

    def torch_bilinear(image, x, y):
        B, h, w, _ = image.shape
        x0 = torch.floor(x).clamp(0, w - 1).long()
        x1 = torch.ceil(x).clamp(0, w - 1).long()
        y0 = torch.floor(y).clamp(0, h - 1).long()
        y1 = torch.ceil(y).clamp(0, h - 1).long()
        idx = torch.arange(B)[:, None]
        Ia, Ib = image[idx, y0, x0], image[idx, y1, x0]
        Ic, Id = image[idx, y0, x1], image[idx, y1, x1]
        wa = (x1 - x) * (y1 - y)
        wb = (x1 - x) * (y - y0)
        wc = (x - x0) * (y1 - y)
        wd = (x - x0) * (y - y0)
        return wa[..., None] * Ia + wb[..., None] * Ib + wc[..., None] * Ic + wd[..., None] * Id

    rng = np.random.default_rng(8)
    img = rng.uniform(size=(2, 9, 7, 3)).astype(np.float32)
    # interior, non-integer coords: the conventions agree there (we fix the
    # reference's integer-coordinate degeneracy and clamp at the border)
    x = rng.uniform(0.01, 5.99, size=(2, 20)).astype(np.float32)
    y = rng.uniform(0.01, 7.99, size=(2, 20)).astype(np.float32)
    ours = np.asarray(fgm.bilinear_interp(jnp.asarray(img), jnp.asarray(x), jnp.asarray(y)))
    theirs = torch_bilinear(*map(torch.from_numpy, (img, x, y))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_bilinear_interp_integer_and_border_coords():
    """Exactly-integer coords return the pixel value (the reference's
    floor/ceil convention returns 0 there — quirk not replicated)."""
    img = jnp.arange(12, dtype=jnp.float32).reshape(1, 3, 4, 1)
    out = fgm.bilinear_interp(img, jnp.array([[2.0, 3.0]]), jnp.array([[1.0, 2.0]]))
    np.testing.assert_allclose(out[0, :, 0], [6.0, 11.0], atol=1e-6)
    # out-of-range coords clamp to the border
    out = fgm.bilinear_interp(img, jnp.array([[10.0]]), jnp.array([[-3.0]]))
    np.testing.assert_allclose(out[0, 0, 0], 3.0, atol=1e-6)


def test_exponential_decay_schedule_endpoints():
    sched = fgm.exponential_decay_schedule(8e-4, 8e-6, 30000)
    np.testing.assert_allclose(float(sched(0)), 8e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(30000)), 8e-6, rtol=1e-5)
    np.testing.assert_allclose(float(sched(15000)), np.sqrt(8e-4 * 8e-6), rtol=1e-4)


def test_sh_basis_dc_only_matches_c0():
    from freegaussian_tpu.ops.sh import eval_sh_colors

    coeffs = jnp.asarray(np.random.default_rng(9).normal(size=(4, 1, 3)).astype(np.float32))
    dirs = jnp.asarray(np.random.default_rng(10).normal(size=(4, 3)).astype(np.float32))
    out = eval_sh_colors(coeffs, dirs, 0)
    np.testing.assert_allclose(out, 0.28209479177387814 * coeffs[:, 0, :], atol=1e-6)


def test_sh_orthonormality():
    """SH basis functions should be orthonormal over the sphere (MC check)."""
    from freegaussian_tpu.ops.sh import sh_basis

    rng = np.random.default_rng(11)
    dirs = rng.normal(size=(200000, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    basis = np.asarray(sh_basis(jnp.asarray(dirs, dtype=jnp.float32), 3))
    gram = 4 * np.pi * (basis.T @ basis) / dirs.shape[0]
    np.testing.assert_allclose(gram, np.eye(16), atol=0.05)


def test_se3_screw_apply_matches_matrix():
    """The channelized screw application equals the exp_se3 matrix path."""
    from freegaussian_tpu.models.fields import SE3Screw, apply_se3_deform

    rng = np.random.default_rng(12)
    n = 50
    w = rng.normal(size=(n, 3)).astype(np.float32)
    theta = np.linalg.norm(w, axis=-1, keepdims=True).astype(np.float32)
    w_n = w / theta + 1e-5
    v = rng.normal(size=(n, 3)).astype(np.float32) / theta + 1e-5
    means = rng.normal(size=(n, 3)).astype(np.float32)

    screw = SE3Screw(jnp.asarray(w_n), jnp.asarray(v), jnp.asarray(theta))
    fast = np.asarray(screw.apply(jnp.asarray(means)))
    slow = np.asarray(apply_se3_deform(jnp.asarray(means), screw.matrix()))
    np.testing.assert_allclose(fast, slow, atol=1e-4)


def test_lpips_architecture_with_synthetic_weights(tmp_path, monkeypatch):
    """The JAX AlexNet-LPIPS runs from the documented npz schema: identical
    images score 0, different images score > 0 (VERDICT r2 #6; real
    pretrained weights need scripts/export_lpips_weights.py offline)."""
    import numpy as np

    rng = np.random.default_rng(0)
    weights = {}
    in_ch = 3
    from freegaussian_tpu.models import metrics as M

    for i, (oc, k, s, p) in enumerate(M._ALEX_CONVS):
        weights[f"conv{i}_w"] = rng.normal(
            scale=0.05, size=(oc, in_ch, k, k)
        ).astype(np.float32)
        weights[f"conv{i}_b"] = np.zeros(oc, np.float32)
        weights[f"lin{i}"] = rng.uniform(0, 1, oc).astype(np.float32)
        in_ch = oc
    path = tmp_path / "lpips_alex.npz"
    np.savez(path, **weights)
    monkeypatch.setenv("FREEGAUSSIAN_LPIPS_WEIGHTS", str(path))
    monkeypatch.setattr(M, "_lpips_fn", None)
    monkeypatch.setattr(M, "_lpips_warned", False)

    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    same = M.lpips(img, img)
    assert same is not None and same == pytest.approx(0.0, abs=1e-6)
    other = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    assert M.lpips(img, other) > 1e-6
    assert M.lpips_available()


def test_lpips_unavailable_is_explicit(tmp_path, monkeypatch):
    from freegaussian_tpu.models import metrics as M

    monkeypatch.setenv(
        "FREEGAUSSIAN_LPIPS_WEIGHTS", str(tmp_path / "missing.npz")
    )
    monkeypatch.setattr(M, "_lpips_fn", None)
    monkeypatch.setattr(M, "_lpips_warned", True)
    import numpy as np

    img = np.zeros((16, 16, 3), np.float32)
    assert M.lpips(img, img) is None
    assert not M.lpips_available()
