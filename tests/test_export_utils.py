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


def test_splat_ply_viewer_contract(tmp_path):
    """Pin the binary layout docs/viewer/index.html parses: all-float props,
    stride = header property count, data exactly n*stride floats after the
    end_header newline — and document that the data offset is NOT 4-byte
    aligned (the viewer must slice the buffer, not alias it)."""
    import re

    params, alive = init_gaussians(
        jax.random.PRNGKey(0), 32, num_random=20, sh_degree=3
    )
    path = tmp_path / "v.ply"
    n = export_splat_ply(path, params, alive)
    raw = path.read_bytes()
    head = raw[:4096].decode("latin-1")
    end = head.index("end_header")
    offset = head.index("\n", end) + 1
    props = re.findall(r"property float (\S+)", head)
    assert re.search(r"element vertex (\d+)", head).group(1) == str(n)
    # INRIA field layout the viewer's column lookup requires
    for name in ("x", "f_dc_0", "opacity", "scale_0", "rot_0"):
        assert name in props
    assert (len(raw) - offset) == n * len(props) * 4
    # the viewer's alignment workaround exists because of this:
    assert offset % 4 != 0
    data = np.frombuffer(raw, dtype="<f4", offset=offset).reshape(n, len(props))
    np.testing.assert_allclose(
        data[:, :3], np.asarray(params["means"])[np.asarray(alive)], atol=1e-6
    )


def test_splat_ply_group_column(tmp_path):
    """gaussian_mask export: the trailing `atrb` property carries 1 + first
    attribute index (0 = static) and round-trips by name — ecosystem viewers
    that read properties by name ignore it; docs/viewer builds control
    sliders from it."""
    import numpy as np

    from freegaussian_tpu.data.splat_export import export_splat_ply

    rng = np.random.default_rng(0)
    n = 50
    params = {
        "means": rng.normal(size=(n, 3)).astype(np.float32),
        "scales": rng.normal(size=(n, 3)).astype(np.float32),
        "quats": rng.normal(size=(n, 4)).astype(np.float32),
        "features_dc": rng.normal(size=(n, 3)).astype(np.float32),
        "features_rest": np.zeros((n, 45), np.float32),
        "opacities": rng.normal(size=(n, 1)).astype(np.float32),
    }
    gm = np.zeros((n, 2), bool)
    gm[5:10, 0] = True
    gm[20:30, 1] = True
    gm[7, 1] = True  # overlapping vote: FIRST attribute wins
    alive = np.ones(n, bool)
    alive[40:] = False
    path = tmp_path / "g.ply"
    m = export_splat_ply(path, params, alive, gaussian_mask=gm)
    assert m == 40
    raw = path.read_bytes()
    header, body = raw.split(b"end_header\n", 1)
    props = [
        l.split()[-1].decode() for l in header.splitlines()
        if l.startswith(b"property")
    ]
    assert props[-1] == "atrb"
    arr = np.frombuffer(body, "<f4").reshape(m, len(props))
    atrb = arr[:, props.index("atrb")]
    want = np.where(gm[:40].any(-1), gm[:40].argmax(-1) + 1, 0)
    np.testing.assert_array_equal(atrb, want.astype(np.float32))
