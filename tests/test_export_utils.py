"""Splat PLY export/import roundtrip + profiling utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from freegaussian_tpu.data.splat_export import export_splat_ply, import_splat_ply
from freegaussian_tpu.models.gaussians import init_gaussians
from freegaussian_tpu.utils import profile_section, profiler_summary, time_function


def test_splat_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    params, alive = init_gaussians(
        jax.random.PRNGKey(0), 64,
        seed_points=(rng.normal(size=(40, 3)).astype(np.float32),
                     rng.uniform(0, 255, (40, 3)).astype(np.float32)),
        sh_degree=3,
    )
    n = export_splat_ply(tmp_path / "model.ply", params, alive)
    assert n == 40
    loaded, n2 = import_splat_ply(tmp_path / "model.ply")
    assert n2 == 40
    alive_np = np.asarray(alive)
    for k in ("means", "scales", "quats", "features_dc", "opacities"):
        np.testing.assert_allclose(
            loaded[k], np.asarray(params[k])[alive_np], atol=1e-6, err_msg=k
        )
    np.testing.assert_allclose(
        loaded["features_rest"], np.asarray(params["features_rest"])[alive_np], atol=1e-6
    )


def test_profiler_utils():
    @time_function
    def work():
        return sum(range(1000))

    work()
    work()
    with profile_section("manual"):
        pass
    s = profiler_summary(reset=True)
    assert "work" in s and "manual" in s
