"""Viewer tests: orbit camera geometry, JPEG render path, HTTP round trip."""

import pytest
import http.client
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from freegaussian_tpu.viewer.server import ViewerServer, orbit_camera, render_orbit_view


def test_orbit_camera_looks_at_origin():
    cam = orbit_camera(0.7, 0.3, 5.0, width=64, height=48)
    c2w = np.asarray(cam.c2w)
    eye = c2w[:3, 3]
    np.testing.assert_allclose(np.linalg.norm(eye), 5.0, atol=1e-5)
    # OpenGL forward is -z column; it must point from eye to origin
    fwd = -c2w[:3, 2]
    np.testing.assert_allclose(fwd, -eye / np.linalg.norm(eye), atol=1e-5)


def _toy_render(cam, atrb):
    shade = 0.5 if atrb is None else float(np.clip(np.abs(atrb).sum(), 0, 1))
    return np.full((cam.height, cam.width, 3), shade, np.float32)


def test_render_orbit_view_jpeg():
    data = render_orbit_view(_toy_render, 0.0, 0.0, 4.0, width=64, height=48)
    assert data[:2] == b"\xff\xd8"  # JPEG magic


def test_http_roundtrip():
    server = ViewerServer(_toy_render, num_attributes=2, width=32, height=24, port=7311)
    server.start_background()
    time.sleep(0.3)
    try:
        conn = http.client.HTTPConnection("localhost", 7311, timeout=5)
        conn.request("GET", "/info")
        info = json.loads(conn.getresponse().read())
        assert info["num_attributes"] == 2
        conn.request("GET", "/render?th=0.3&ph=0.1&r=4&t=0.5&atrb=1,0,0,0,0,0")
        resp = conn.getresponse()
        body = resp.read()
        assert resp.status == 200 and body[:2] == b"\xff\xd8"
        conn.request("GET", "/")
        page = conn.getresponse().read()
        assert b"freegaussian-tpu" in page
    finally:
        server.shutdown()


@pytest.mark.slow
def test_viewer_with_real_model():
    """Drive the viewer render path through the actual control model."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("t", "tests/test_train_e2e.py")
    t = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(t)
    from freegaussian_tpu.models.control_model import control_forward
    from freegaussian_tpu.models.fields import ControlField
    from freegaussian_tpu.models.gaussians import init_gaussians
    from freegaussian_tpu.models.splat_model import SplatConfig

    cfg = SplatConfig(backend="reference", background_color="black")
    rng = np.random.default_rng(0)
    params, alive = init_gaussians(
        jax.random.PRNGKey(0), 32,
        seed_points=(rng.normal(scale=0.4, size=(16, 3)).astype(np.float32),
                     rng.uniform(0, 255, (16, 3)).astype(np.float32)),
        sh_degree=3,
    )
    control = ControlField()
    cvars = control.init(jax.random.PRNGKey(1), jnp.zeros((1, 3)), jnp.zeros((1, 3)))
    mask = jnp.asarray(np.arange(32)[:, None] < 8)

    def render_fn(cam, atrb):
        out = control_forward(
            cfg, params, alive, mask, cam, control.apply, cvars,
            atrb_values=jnp.zeros((1, 3)) if atrb is None else jnp.asarray(atrb),
            sh_degree_now=0, train=False, render_mode="RGB",
        )
        return out["rgb"]

    jpeg = render_orbit_view(render_fn, 0.2, 0.1, 4.0, width=48, height=36,
                             atrb_values=np.zeros((1, 3), np.float32))
    assert jpeg[:2] == b"\xff\xd8"
