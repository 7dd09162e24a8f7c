"""EWA projection tests: analytic cases + an independent torch re-derivation
of the gsplat projection math (arXiv 2312.02121), used as oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from freegaussian_tpu.ops.projection import project_gaussians


def make_camera(width=64, height=48, fx=60.0, fy=60.0):
    K = jnp.array([[fx, 0, width / 2], [0, fy, height / 2], [0, 0, 1]], dtype=jnp.float32)
    viewmat = jnp.eye(4, dtype=jnp.float32)
    return viewmat, K


def test_center_gaussian_projects_to_principal_point():
    viewmat, K = make_camera()
    means = jnp.array([[0.0, 0.0, 2.0]])
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    scales = jnp.array([[0.1, 0.1, 0.1]])
    out = project_gaussians(means, quats, scales, viewmat, K, 64, 48)
    np.testing.assert_allclose(out.means2d[0], [32.0, 24.0], atol=1e-5)
    np.testing.assert_allclose(out.depths[0], 2.0, atol=1e-6)
    assert int(out.radii[0]) > 0


def test_isotropic_cov2d_analytic():
    """Isotropic Gaussian at center: cov2d = (fx*s/z)^2 I + eps2d I."""
    viewmat, K = make_camera(fx=100.0, fy=100.0)
    s, z = 0.2, 4.0
    out = project_gaussians(
        jnp.array([[0.0, 0.0, z]]),
        jnp.array([[1.0, 0.0, 0.0, 0.0]]),
        jnp.array([[s, s, s]]),
        viewmat,
        K,
        64,
        48,
    )
    expected = (100.0 * s / z) ** 2 + 0.3
    np.testing.assert_allclose(out.cov2d[0, 0], expected, rtol=1e-5)
    np.testing.assert_allclose(out.cov2d[0, 2], expected, rtol=1e-5)
    np.testing.assert_allclose(out.cov2d[0, 1], 0.0, atol=1e-5)
    # conic is the inverse
    np.testing.assert_allclose(out.conics[0, 0], 1.0 / expected, rtol=1e-5)
    # radius = ceil(3 * sqrt(lambda_max))
    assert int(out.radii[0]) == int(np.ceil(3 * np.sqrt(expected)))


def test_culling_behind_and_offscreen():
    viewmat, K = make_camera()
    means = jnp.array(
        [
            [0.0, 0.0, -2.0],  # behind camera
            [0.0, 0.0, 0.005],  # in front of near plane
            [100.0, 0.0, 2.0],  # far off-screen
            [0.0, 0.0, 2.0],  # visible
        ]
    )
    quats = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (4, 1))
    scales = jnp.full((4, 3), 0.05)
    out = project_gaussians(means, quats, scales, viewmat, K, 64, 48)
    assert list(np.asarray(out.radii) > 0) == [False, False, False, True]


def test_alive_mask_culls():
    viewmat, K = make_camera()
    means = jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (3, 1))
    quats = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (3, 1))
    scales = jnp.full((3, 3), 0.05)
    alive = jnp.array([True, False, True])
    out = project_gaussians(means, quats, scales, viewmat, K, 64, 48, alive=alive)
    assert list(np.asarray(out.radii) > 0) == [True, False, True]


def _torch_project_oracle(means, quats, scales, viewmat, K, width, height, eps2d=0.3):
    """Independent torch re-derivation of the gsplat projection math."""
    import torch

    means = torch.from_numpy(means)
    quats = torch.from_numpy(quats)
    scales = torch.from_numpy(scales)
    viewmat_t = torch.from_numpy(viewmat)
    R, t = viewmat_t[:3, :3], viewmat_t[:3, 3]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    q = quats / quats.norm(dim=-1, keepdim=True)
    w, x, y, z = q.unbind(-1)
    Rq = torch.stack(
        [
            1 - 2 * (y**2 + z**2), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x**2 + z**2), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x**2 + y**2),
        ],
        dim=-1,
    ).reshape(-1, 3, 3)
    M = Rq * scales[:, None, :]
    covar = M @ M.transpose(1, 2)
    covar_c = R @ covar @ R.T

    p = means @ R.T + t
    xs, ys, zs = p.unbind(-1)
    tan_fovx, tan_fovy = 0.5 * width / fx, 0.5 * height / fy
    lim_xp = (width - cx) / fx + 0.3 * tan_fovx
    lim_xn = cx / fx + 0.3 * tan_fovx
    lim_yp = (height - cy) / fy + 0.3 * tan_fovy
    lim_yn = cy / fy + 0.3 * tan_fovy
    tx = zs * torch.clamp(xs / zs, min=-lim_xn, max=lim_xp)
    ty = zs * torch.clamp(ys / zs, min=-lim_yn, max=lim_yp)
    O = torch.zeros_like(zs)
    J = torch.stack(
        [fx / zs, O, -fx * tx / zs**2, O, fy / zs, -fy * ty / zs**2], dim=-1
    ).reshape(-1, 2, 3)
    cov2d = J @ covar_c @ J.transpose(1, 2)
    cov2d = cov2d + eps2d * torch.eye(2)
    means2d = torch.stack([fx * xs / zs + cx, fy * ys / zs + cy], dim=-1)
    det = cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] ** 2
    conic = torch.stack(
        [cov2d[:, 1, 1] / det, -cov2d[:, 0, 1] / det, cov2d[:, 0, 0] / det], dim=-1
    )
    b = 0.5 * (cov2d[:, 0, 0] + cov2d[:, 1, 1])
    v1 = b + torch.sqrt(torch.clamp(b * b - det, min=0.01))
    radius = torch.ceil(3 * torch.sqrt(v1))
    return means2d.numpy(), conic.numpy(), radius.numpy(), zs.numpy()


def test_projection_matches_torch_oracle():
    rng = np.random.default_rng(0)
    n = 200
    means = rng.normal(scale=1.0, size=(n, 3)).astype(np.float32)
    means[:, 2] += 4.0
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = rng.uniform(0.02, 0.3, size=(n, 3)).astype(np.float32)
    from scipy.spatial.transform import Rotation

    viewmat = np.eye(4, dtype=np.float32)
    viewmat[:3, :3] = Rotation.from_rotvec([0.1, -0.2, 0.05]).as_matrix()
    viewmat[:3, 3] = [0.1, -0.1, 0.3]
    K = np.array([[80.0, 0, 32], [0, 80.0, 24], [0, 0, 1]], dtype=np.float32)

    out = project_gaussians(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(viewmat), jnp.asarray(K), 64, 48,
    )
    m2d_t, conic_t, radius_t, z_t = _torch_project_oracle(
        means, quats, scales, viewmat, K, 64, 48
    )
    vis = np.asarray(out.radii) > 0
    assert vis.sum() > 50
    np.testing.assert_allclose(np.asarray(out.means2d)[vis], m2d_t[vis], atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.conics)[vis], conic_t[vis], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.depths)[vis], z_t[vis], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.radii)[vis], radius_t[vis], atol=1)


def test_projection_gradients_finite_difference():
    viewmat, K = make_camera()
    means = jnp.array([[0.3, -0.2, 3.0], [-0.5, 0.1, 2.5]])
    quats = jnp.array([[0.9, 0.1, 0.2, -0.1], [1.0, 0.0, 0.0, 0.0]])
    scales = jnp.array([[0.1, 0.2, 0.15], [0.05, 0.05, 0.3]])

    def f(m, q, s):
        out = project_gaussians(m, q, s, viewmat, K, 64, 48)
        return jnp.sum(out.means2d) + jnp.sum(out.conics) + jnp.sum(out.depths)

    grads = jax.grad(f, argnums=(0, 1, 2))(means, quats, scales)
    eps = 1e-3
    for argnum, arg in enumerate((means, quats, scales)):
        g_fd = np.zeros_like(np.asarray(arg))
        flat = np.asarray(arg).copy()
        it = np.nditer(flat, flags=["multi_index"])
        args = [means, quats, scales]
        for _ in it:
            idx = it.multi_index
            for sgn in (+1, -1):
                pert = flat.copy()
                pert[idx] += sgn * eps
                args_p = list(args)
                args_p[argnum] = jnp.asarray(pert)
                g_fd[idx] += sgn * float(f(*args_p)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(grads[argnum]), g_fd, rtol=2e-2, atol=2e-2)


def test_antialiased_compensation():
    """Antialiased mode (gsplat rasterize_mode="antialiased", ref
    freegaussian_model.py:856-865): compensation = sqrt(det(cov2d) /
    det(cov2d + eps2d I)), and rasterization applies it multiplicatively to
    the opacities. Checked against a direct numpy evaluation from the
    returned blurred covariance, and end-to-end against classic mode with
    pre-compensated opacities."""
    import numpy as np

    from freegaussian_tpu.ops.projection import project_gaussians
    from freegaussian_tpu.ops.rasterize import rasterization

    rng = np.random.default_rng(17)
    n = 120
    means = jnp.asarray(rng.normal(scale=0.5, size=(n, 3)), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    scales = jnp.asarray(np.exp(rng.normal(size=(n, 3)) - 3.0), jnp.float32)
    ops = jnp.asarray(rng.uniform(0.2, 0.9, size=(n,)), jnp.float32)
    colors = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    viewmat = jnp.eye(4).at[2, 3].set(4.0)
    K = jnp.asarray([[70.0, 0, 32], [0, 70.0, 32], [0, 0, 1]])

    proj = project_gaussians(
        means, quats, scales, viewmat, K, 64, 64, calc_compensations=True
    )
    cxx_b, cxy, cyy_b = (np.asarray(proj.cov2d[:, i]) for i in range(3))
    det_blur = cxx_b * cyy_b - cxy * cxy
    det_orig = (cxx_b - 0.3) * (cyy_b - 0.3) - cxy * cxy
    expect = np.sqrt(np.maximum(det_orig / np.maximum(det_blur, 1e-32), 0.0))
    valid = np.asarray(proj.radii) > 0
    np.testing.assert_allclose(
        np.asarray(proj.compensations)[valid], expect[valid], rtol=1e-5
    )
    assert np.all(np.asarray(proj.compensations)[valid] <= 1.0 + 1e-6)
    assert np.any(np.asarray(proj.compensations)[valid] < 0.999)

    r_aa, a_aa, info = rasterization(
        means, quats, scales, ops, colors, viewmat[None], K[None], 64, 64,
        rasterize_mode="antialiased", backend="reference",
    )
    r_cl, a_cl, _ = rasterization(
        means, quats, scales, ops * proj.compensations, colors,
        viewmat[None], K[None], 64, 64,
        rasterize_mode="classic", backend="reference",
    )
    np.testing.assert_allclose(np.asarray(r_aa), np.asarray(r_cl), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a_aa), np.asarray(a_cl), atol=1e-6)
