"""Pallas tile-rasterizer parity tests vs the jnp oracle (interpret mode on CPU):
forward image, analytic backward gradients, and the absgrad statistic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freegaussian_tpu.ops.rasterize_pallas import rasterize_pixels_pallas
from freegaussian_tpu.ops.rasterize_ref import (
    depth_sort_order,
    rasterize_pixels_reference,
    tile_bounds,
)


def make_scene(n=80, width=48, height=32, seed=0, opac_scale=0.9, channels=3):
    keys = jax.random.split(jax.random.PRNGKey(seed), 6)
    means2d = jax.random.uniform(keys[0], (n, 2)) * jnp.array([width, height])
    # random positive-definite conics
    a = jax.random.uniform(keys[1], (n,), minval=0.05, maxval=0.6)
    c = jax.random.uniform(keys[2], (n,), minval=0.05, maxval=0.6)
    b = jax.random.uniform(keys[3], (n,), minval=-0.5, maxval=0.5) * jnp.sqrt(a * c)
    conics = jnp.stack([a, b, c], axis=-1)
    colors = jax.random.uniform(keys[4], (n, channels))
    opacities = jax.random.uniform(keys[5], (n,)) * opac_scale
    depths = jnp.linspace(1.0, 5.0, n)
    radii = jnp.full((n,), 9, dtype=jnp.int32)
    # cull a few
    radii = radii.at[::11].set(0)
    return means2d, conics, colors, opacities, depths, radii


def test_forward_matches_oracle():
    args = make_scene()
    width, height = 48, 32
    r_ref, a_ref, _ = rasterize_pixels_reference(*args, width, height)
    r_pal, a_pal, _ = rasterize_pixels_pallas(*args, width, height, interpret=True)
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(a_pal), np.asarray(a_ref), atol=2e-5)


@pytest.mark.slow
def test_forward_matches_oracle_dense_overlap():
    """Heavy overlap exercises early termination and multi-chunk tiles."""
    args = make_scene(n=300, width=32, height=32, seed=3, opac_scale=0.999)
    r_ref, a_ref, _ = rasterize_pixels_reference(*args, 32, 32)
    r_pal, a_pal, _ = rasterize_pixels_pallas(*args, 32, 32, interpret=True, chunk=128)
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref), atol=5e-5)
    np.testing.assert_allclose(np.asarray(a_pal), np.asarray(a_ref), atol=5e-5)


@pytest.mark.slow
def test_forward_multi_chunk_boundary():
    """Chunk smaller than per-tile counts: loop + range masking correctness."""
    args = make_scene(n=120, width=16, height=16, seed=5)
    r_ref, a_ref, _ = rasterize_pixels_reference(*args, 16, 16)
    r_pal, a_pal, _ = rasterize_pixels_pallas(*args, 16, 16, interpret=True, chunk=128)
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref), atol=2e-5)


@pytest.mark.slow
def test_backward_matches_oracle_autodiff():
    args = make_scene(n=60, width=32, height=32, seed=1)
    means2d, conics, colors, opacities, depths, radii = args
    target = jax.random.uniform(jax.random.PRNGKey(9), (32, 32, 3))

    def loss_pal(m, c, col, op):
        render, alpha, _ = rasterize_pixels_pallas(
            m, c, col, op, depths, radii, 32, 32, interpret=True
        )
        return jnp.sum((render - target) ** 2) + 0.3 * jnp.sum(alpha**2)

    def loss_ref(m, c, col, op):
        render, alpha, _ = rasterize_pixels_reference(
            m, c, col, op, depths, radii, 32, 32
        )
        return jnp.sum((render - target) ** 2) + 0.3 * jnp.sum(alpha**2)

    l_pal = float(loss_pal(means2d, conics, colors, opacities))
    l_ref = float(loss_ref(means2d, conics, colors, opacities))
    np.testing.assert_allclose(l_pal, l_ref, rtol=1e-5)

    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(means2d, conics, colors, opacities)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(means2d, conics, colors, opacities)
    names = ["means2d", "conics", "colors", "opacities"]
    for name, a, b in zip(names, g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4, err_msg=name
        )


@pytest.mark.slow
def test_backward_dense_termination():
    args = make_scene(n=200, width=16, height=16, seed=7, opac_scale=0.999)
    means2d, conics, colors, opacities, depths, radii = args
    target = jnp.zeros((16, 16, 3))

    def loss(fn):
        def f(m, c, col, op):
            out = fn(m, c, col, op, depths, radii, 16, 16)
            render, alpha = out[0], out[1]
            return jnp.mean(jnp.abs(render - target)) + jnp.mean(alpha)

        return f

    import functools

    pal = functools.partial(rasterize_pixels_pallas, interpret=True)
    g_pal = jax.grad(loss(pal), argnums=(0, 1, 2, 3))(means2d, conics, colors, opacities)
    g_ref = jax.grad(loss(rasterize_pixels_reference), argnums=(0, 1, 2, 3))(
        means2d, conics, colors, opacities
    )
    for name, a, b in zip(["m", "c", "col", "op"], g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4, err_msg=name
        )


def _absgrad_oracle(means2d, conics, colors, opacities, depths, radii, width, height, loss_fn, tile_size=16):
    """Per-tile |d means2d| accumulation via per-tile restricted autodiff."""
    tiles_w = -(-width // tile_size)
    tiles_h = -(-height // tile_size)
    n = means2d.shape[0]
    total = np.zeros((n, 2), np.float32)
    for ty in range(tiles_h):
        for tx in range(tiles_w):
            mask = np.zeros((height, width, 1), np.float32)
            y0, x0 = ty * tile_size, tx * tile_size
            mask[y0 : y0 + tile_size, x0 : x0 + tile_size] = 1.0
            mask = jnp.asarray(mask)

            def tile_loss(m):
                render, alpha, _ = rasterize_pixels_reference(
                    m, conics, colors, opacities, depths, radii, width, height
                )
                return loss_fn(render * mask, alpha * mask)

            g = np.asarray(jax.grad(tile_loss)(means2d))
            total += np.abs(g)
    return total


def test_absgrad_matches_per_tile_oracle():
    args = make_scene(n=40, width=32, height=32, seed=2)
    means2d, conics, colors, opacities, depths, radii = args
    target = jax.random.uniform(jax.random.PRNGKey(4), (32, 32, 3))

    def loss_fn(render, alpha):
        return jnp.sum((render - target * (alpha > -1)) ** 2) + 0.1 * jnp.sum(alpha)

    sink = jnp.zeros((40, 2), jnp.float32)

    def loss_pal(m, s):
        render, alpha, _ = rasterize_pixels_pallas(
            m, conics, colors, opacities, depths, radii, 32, 32,
            interpret=True, means2d_sink=s,
        )
        return jnp.sum((render - target) ** 2) + 0.1 * jnp.sum(alpha)

    g_m, g_sink = jax.grad(loss_pal, argnums=(0, 1))(means2d, sink)

    def loss_for_tiles(render, alpha):
        return jnp.sum((render - target * jnp.ones_like(render)) ** 2) + 0.1 * jnp.sum(alpha)

    expected = _absgrad_oracle(
        means2d, conics, colors, opacities, depths, radii, 32, 32, loss_for_tiles
    )
    np.testing.assert_allclose(np.asarray(g_sink), expected, rtol=1e-3, atol=1e-4)
    # absgrad dominates the signed gradient elementwise
    assert np.all(np.asarray(g_sink) >= np.abs(np.asarray(g_m)) - 1e-5)


@pytest.mark.slow
def test_bwd_early_out_shared_chunk_writer_handoff():
    """BWD_EARLY_OUT: tile A owns the first slots of a boundary chunk but has
    terminated before reaching it (its segment over that chunk is dead in the
    backward); tile B shares the chunk and is live — B must become the
    chunk's writer (not accumulate into an unwritten window), and A's dead
    slots must come back as exact zeros through the reduction."""
    import numpy as np

    from freegaussian_tpu.ops import rasterize_pallas as rp
    from freegaussian_tpu.ops.rasterize_ref import rasterize_pixels_reference

    width, height, ts = 32, 16, 16  # two tiles side by side
    na, nb = 200, 40  # A: deep opaque stack -> terminates after ~5 slots
    key = jax.random.PRNGKey(11)
    ka, kb, kc, kd = jax.random.split(key, 4)
    # tile A centers in [0, 16), tile B centers in [16, 32)
    ma = jnp.stack(
        [jax.random.uniform(ka, (na,)) * 12 + 2,
         jax.random.uniform(kb, (na,)) * 12 + 2], axis=-1
    )
    mb = jnp.stack(
        [jax.random.uniform(kc, (nb,)) * 12 + 18,
         jax.random.uniform(kd, (nb,)) * 12 + 2], axis=-1
    )
    means2d = jnp.concatenate([ma, mb], axis=0)
    n = na + nb
    conics = jnp.tile(jnp.asarray([[0.3, 0.0, 0.3]]), (n, 1))
    colors = jax.random.uniform(jax.random.PRNGKey(5), (n, 3))
    opacities = jnp.concatenate(
        [jnp.full((na,), 0.995), jnp.full((nb,), 0.4)]
    )
    depths = jnp.arange(n, dtype=jnp.float32) + 1.0
    radii = jnp.full((n,), 5, jnp.int32)
    target = jax.random.uniform(jax.random.PRNGKey(6), (height, width, 3))

    assert rp.BWD_EARLY_OUT  # default-on path under test

    def loss_pal(m, c, col, op):
        r, a, _ = rp.rasterize_pixels_pallas(
            m, c, col, op, depths, radii, width, height,
            capacity=512, chunk=128, interpret=True,
        )
        return jnp.sum((r - target) ** 2) + 0.2 * jnp.sum(a)

    def loss_ref(m, c, col, op):
        r, a, _ = rasterize_pixels_reference(
            m, c, col, op, depths, radii, width, height, tile_size=ts
        )
        return jnp.sum((r - target) ** 2) + 0.2 * jnp.sum(a)

    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(means2d, conics, colors, opacities)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(means2d, conics, colors, opacities)
    for name, a, b in zip(["means2d", "conics", "colors", "opac"], g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4, err_msg=name
        )


@pytest.mark.slow
def test_fwd_early_out_asymmetric_halves():
    """FWD_EARLY_OUT at half-tile granularity: the top 8 pixel rows are
    buried under an opaque stack (terminate after a few slots) while the
    bottom rows stay live through the whole run — the skipped-half state
    must stay exact for forward AND backward."""
    import numpy as np

    from freegaussian_tpu.ops import rasterize_pallas as rp
    from freegaussian_tpu.ops.rasterize_ref import rasterize_pixels_reference

    assert rp.FWD_EARLY_OUT
    w, h = 16, 16  # one tile
    na, nb = 150, 30
    key = jax.random.PRNGKey(21)
    ka, kb = jax.random.split(key)
    # opaque stack centered in the TOP half; translucent dust over the bottom
    ma = jnp.stack(
        [jax.random.uniform(ka, (na,)) * 14 + 1,
         jax.random.uniform(kb, (na,)) * 5 + 1], axis=-1
    )
    mb = jnp.stack(
        [jax.random.uniform(kb, (nb,)) * 14 + 1,
         jax.random.uniform(ka, (nb,)) * 6 + 9], axis=-1
    )
    means2d = jnp.concatenate([ma, mb], axis=0)
    n = na + nb
    conics = jnp.tile(jnp.asarray([[0.5, 0.0, 0.5]]), (n, 1))
    colors = jax.random.uniform(jax.random.PRNGKey(3), (n, 3))
    opacities = jnp.concatenate([jnp.full((na,), 0.99), jnp.full((nb,), 0.05)])
    depths = jnp.arange(n, dtype=jnp.float32) + 1.0
    radii = jnp.full((n,), 4, jnp.int32)
    target = jax.random.uniform(jax.random.PRNGKey(4), (h, w, 3))

    def loss(fn, tiled=False):
        def f(m, c, col, op):
            if tiled:
                r, a, _ = rasterize_pixels_reference(
                    m, c, col, op, depths, radii, w, h, tile_size=16
                )
            else:
                r, a, _ = rp.rasterize_pixels_pallas(
                    m, c, col, op, depths, radii, w, h,
                    capacity=512, chunk=128, interpret=True,
                )
            return jnp.sum((r - target) ** 2) + 0.1 * jnp.sum(a)
        return f

    l_pal = loss(None)(means2d, conics, colors, opacities)
    l_ref = loss(None, tiled=True)(means2d, conics, colors, opacities)
    np.testing.assert_allclose(float(l_pal), float(l_ref), rtol=1e-5)
    g_pal = jax.grad(loss(None), argnums=(0, 1, 2, 3))(means2d, conics, colors, opacities)
    g_ref = jax.grad(loss(None, tiled=True), argnums=(0, 1, 2, 3))(means2d, conics, colors, opacities)
    for name, a, b in zip(["means2d", "conics", "colors", "opac"], g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4, err_msg=name
        )


def test_unvisited_chunk_mask_discards_nonfinite_garbage():
    """BWD_EARLY_OUT leaves never-visited chunks' output windows UNWRITTEN on
    real TPU hardware — they hold whatever HBM garbage was there, including
    inf/NaN bit patterns (interpret mode leaves zeros, so only this direct
    unit test can cover the hazard on CPU). The zero-mask must be a select:
    the previously-shipped multiply turned inf*0 into NaN and poisoned every
    per-Gaussian gradient — the step-1451 training collapse of the round-2
    quality run (docs/NOTES_ROUND2.md)."""
    from freegaussian_tpu.ops import rasterize_pallas as rp

    chunk = 128
    n_chunks = 4
    d = np.ones((16, n_chunks * chunk), np.float32)
    # chunks 1 and 3 unvisited, filled with hardware-garbage patterns
    d[:, 1 * chunk : 2 * chunk] = np.inf
    d[3:7, 3 * chunk : 4 * chunk] = np.nan
    visited = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    old = rp.PACKED_ROW_MAJOR
    try:
        rp.PACKED_ROW_MAJOR = False
        out = np.asarray(
            rp._mask_unvisited_chunks(jnp.asarray(d), visited, chunk)
        )
        rp.PACKED_ROW_MAJOR = True
        out_rm = np.asarray(
            rp._mask_unvisited_chunks(jnp.asarray(d.T.copy()), visited, chunk)
        ).T
    finally:
        rp.PACKED_ROW_MAJOR = old
    for o in (out, out_rm):
        assert np.isfinite(o).all()
        np.testing.assert_array_equal(o[:, 0 * chunk : 1 * chunk], 1.0)
        np.testing.assert_array_equal(o[:, 1 * chunk : 2 * chunk], 0.0)
        np.testing.assert_array_equal(o[:, 2 * chunk : 3 * chunk], 1.0)
        np.testing.assert_array_equal(o[:, 3 * chunk : 4 * chunk], 0.0)


@pytest.mark.slow
def test_ellipse_tile_cull_is_bit_exact():
    """ELLIPSE_CULL drops bbox-corner tiles the threshold ellipse cannot
    touch. Culled pairs contribute exactly zero (the kernels skip alpha <
    ALPHA_THRESHOLD at every pixel of a culled tile), so image/alpha/grads
    must match to summation-order ulps — and the cull must actually fire."""
    import freegaussian_tpu.ops.rasterize_pallas as rp
    from freegaussian_tpu.ops.tiles import build_intersections

    # anisotropic conics + low-opacity tail maximize corner-tile pruning
    means2d, conics, colors, opacities, depths, radii = make_scene(
        n=120, width=64, height=48, seed=3, opac_scale=0.95
    )
    radii = jnp.full_like(radii, 14).at[::13].set(0)

    base = build_intersections(
        means2d, radii, depths, 64, 48, 16, 1024
    )
    culled = build_intersections(
        means2d, radii, depths, 64, 48, 16, 1024,
        conics=conics, opacities=opacities,
    )
    n_base = int(jnp.sum(base.gauss_ids < means2d.shape[0]))
    n_cull = int(jnp.sum(culled.gauss_ids < means2d.shape[0]))
    assert n_cull < n_base, "cull never fired — test scene too easy"

    def run(flag):
        old = rp.ELLIPSE_CULL
        rp.ELLIPSE_CULL = flag
        try:
            def loss(m, c, col, op):
                render, alpha, _ = rasterize_pixels_pallas(
                    m, c, col, op, depths, radii, 64, 48, tile_size=16
                )
                return jnp.sum(render * render) + jnp.sum(alpha), (render, alpha)

            (l, (render, alpha)), grads = jax.value_and_grad(
                loss, argnums=(0, 1, 2, 3), has_aux=True
            )(means2d, conics, colors, opacities)
            return l, render, alpha, grads
        finally:
            rp.ELLIPSE_CULL = old

    l1, r1, a1, g1 = run(False)
    l2, r2, a2, g2 = run(True)
    # culled contributions are exactly zero, but their removal regroups the
    # kernels' chunked (P,K)@(K,C) reductions -> one-ulp summation-order
    # differences; anything beyond the ulp class would be a real bug
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=2e-6, rtol=2e-6)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=2e-6, rtol=2e-6)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    # gradient reduction runs cumsum + boundary diffs (_gather_rows): group
    # positions shift when slots drop, so grads carry the documented ~2e-4
    # absolute prefix-sum cancellation class on top of the ulp reordering
    for x, y in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=5e-4, rtol=1e-2)


@pytest.mark.slow
def test_ellipse_tile_cull_needle_conics():
    """High-aspect (needle) conics maximize f32 cancellation in the edge-min
    evaluation (q0 ~ qmax * aspect^2 at bbox corners with a tiny true
    minimum); the magnitude-scaled margin must keep the cull conservative —
    parity with the cull off stays in the ulp class."""
    import freegaussian_tpu.ops.rasterize_pallas as rp

    keys = jax.random.split(jax.random.PRNGKey(11), 6)
    n, W, H = 100, 64, 48
    means2d = jax.random.uniform(keys[0], (n, 2)) * jnp.array([W, H])
    # needles: major sigma ~10px, minor ~0.5px, random orientation
    th = jax.random.uniform(keys[1], (n,), maxval=jnp.pi)
    c, s = jnp.cos(th), jnp.sin(th)
    l1, l2 = 100.0, 0.25  # variances px^2 (aspect 20)
    a_cov = c * c * l1 + s * s * l2
    b_cov = c * s * (l1 - l2)
    d_cov = s * s * l1 + c * c * l2
    det = a_cov * d_cov - b_cov * b_cov
    conics = jnp.stack([d_cov / det, -b_cov / det, a_cov / det], axis=-1)
    colors = jax.random.uniform(keys[2], (n, 3))
    opacities = jax.random.uniform(keys[3], (n,), minval=0.02, maxval=0.99)
    depths = jnp.linspace(1.0, 5.0, n)
    radii = jnp.full((n,), 31, dtype=jnp.int32)

    def loss(flag):
        old = rp.ELLIPSE_CULL
        rp.ELLIPSE_CULL = flag
        try:
            def f(m, c_, col, op):
                render, alpha, _ = rasterize_pixels_pallas(
                    m, c_, col, op, depths, radii, W, H, tile_size=16
                )
                return jnp.sum(render * render), render

            (l, render), grads = jax.value_and_grad(f, argnums=(0, 1), has_aux=True)(
                means2d, conics, colors, opacities
            )
            return l, render, grads
        finally:
            rp.ELLIPSE_CULL = old

    l1_, r1, g1 = loss(False)
    l2_, r2, g2 = loss(True)
    # the IMAGE stays ulp-exact (a wrongful cull would shift it by at least
    # ALPHA_THRESHOLD * T ~ 4e-3); gradients carry the prefix-sum
    # cancellation class of the sort-based reduction, which grows with group
    # length — needles overlap ~20 tiles each, so allow ~1e-3 absolute
    # (diagnosed 2026-08-18: cull-on with pruning disabled is BIT-identical,
    # so the diff is boundary-shift reduction noise, not a wrong cull)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=2e-6, rtol=2e-6)
    for x, y in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-3, rtol=5e-2)


@pytest.mark.slow
def test_precull_matches_postcull_exactly():
    """Pre-expansion culling (dense bbox-grid test + kept-tile table) must
    produce the IDENTICAL sorted intersection arrays and reduction
    boundaries as the post-expansion cull when capacity doesn't overflow —
    only `num_isects` differs (it now counts kept pairs, so capacity sizing
    and overflow reflect real work)."""
    from freegaussian_tpu.ops.tiles import build_intersections

    keys = jax.random.split(jax.random.PRNGKey(3), 6)
    n, W, H = 300, 128, 96
    means2d = jax.random.uniform(keys[0], (n, 2)) * jnp.array([W, H])
    a = jax.random.uniform(keys[1], (n,), minval=0.02, maxval=0.6)
    c = jax.random.uniform(keys[2], (n,), minval=0.02, maxval=0.6)
    b = jax.random.uniform(keys[3], (n,), minval=-0.7, maxval=0.7) * jnp.sqrt(a * c)
    conics = jnp.stack([a, b, c], axis=-1)
    opac = jax.random.uniform(keys[4], (n,), minval=0.02, maxval=0.99)
    depths = jnp.linspace(1.0, 5.0, n)
    # mixed radii: every 7th is big (bbox > PRECULL_T_MAX -> rect fallback)
    radii = jnp.where(jnp.arange(n) % 7 == 0, 60, 12).astype(jnp.int32)
    radii = radii.at[::13].set(0)

    kw = dict(width=W, height=H, tile_size=16, capacity=8192,
              conics=conics, opacities=opac)
    pre = build_intersections(means2d, radii, depths, **kw, precull=True)
    post = build_intersections(means2d, radii, depths, **kw, precull=False)
    assert int(jnp.sum(pre.gauss_ids < n)) == int(jnp.sum(post.gauss_ids < n)) > 0
    assert int(pre.num_isects) < int(post.num_isects)  # kept-pair accounting
    for field in ("gauss_ids", "tile_ids", "tile_offsets", "counts", "offsets"):
        np.testing.assert_array_equal(
            np.asarray(getattr(pre, field)), np.asarray(getattr(post, field)),
            err_msg=field,
        )


@pytest.mark.slow
def test_precull_overflow_stays_well_formed():
    """When kept pairs exceed the static capacity, the precull expansion must
    clamp like the rect path: padding ids beyond the clamp, monotone
    tile_offsets bounded by capacity, and num_isects reporting the TRUE kept
    total so the trainer's growth logic fires."""
    from freegaussian_tpu.ops.tiles import build_intersections

    keys = jax.random.split(jax.random.PRNGKey(5), 5)
    n, W, H = 400, 128, 96
    means2d = jax.random.uniform(keys[0], (n, 2)) * jnp.array([W, H])
    a = jax.random.uniform(keys[1], (n,), minval=0.02, maxval=0.3)
    c = jax.random.uniform(keys[2], (n,), minval=0.02, maxval=0.3)
    conics = jnp.stack([a, jnp.zeros_like(a), c], axis=-1)
    opac = jnp.full((n,), 0.9)
    depths = jnp.linspace(1.0, 5.0, n)
    radii = jnp.full((n,), 20, dtype=jnp.int32)

    cap = 256  # far below the kept total
    isect = build_intersections(
        means2d, radii, depths, W, H, 16, cap, conics=conics, opacities=opac
    )
    assert int(isect.num_isects) > cap  # growth logic sees the truth
    to = np.asarray(isect.tile_offsets)
    assert (np.diff(to) >= 0).all() and to[-1] <= cap
    gids = np.asarray(isect.gauss_ids)
    assert ((gids >= 0) & (gids <= n)).all()
    # every in-range slot references a real gaussian or the padding id
    assert (np.asarray(isect.counts) >= 0).all()


def test_precull_flag_routes_through_pallas_path():
    """rasterize_pallas.PRECULL selects the pre- vs post-expansion form of
    the (flag-gated) ellipse cull inside the full pallas path; both forms
    keep exactly the same pairs, so forward images must match to the same
    summation-order ulp class as the cull itself."""
    import freegaussian_tpu.ops.rasterize_pallas as rp

    means2d, conics, colors, opacities, depths, radii = make_scene(
        n=100, width=64, height=48, seed=7, opac_scale=0.95
    )
    radii = jnp.full_like(radii, 14).at[::11].set(40)  # some rect fallbacks

    def run(precull):
        old_c, old_p = rp.ELLIPSE_CULL, rp.PRECULL
        rp.ELLIPSE_CULL, rp.PRECULL = True, precull
        try:
            render, alpha, _ = rasterize_pixels_pallas(
                means2d, conics, colors, opacities, depths, radii,
                64, 48, tile_size=16,
            )
            return render, alpha
        finally:
            rp.ELLIPSE_CULL, rp.PRECULL = old_c, old_p

    r_pre, a_pre = run(True)
    r_post, a_post = run(False)
    np.testing.assert_allclose(
        np.asarray(r_pre), np.asarray(r_post), atol=2e-6, rtol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(a_pre), np.asarray(a_post), atol=2e-6, rtol=2e-6
    )


def test_fwd_split2_scan_precision_close():
    """SCAN_PRECISION_FWD="split2" relaxes only the FORWARD scans (the
    backward keeps HIGHEST — its suffix difference cancels catastrophically,
    docs/NOTES_ROUND2.md r2ab6); image error stays in the 1e-4 class."""
    from freegaussian_tpu.ops import rasterize_pallas as rp

    args = make_scene(n=300, width=32, height=32, seed=3, opac_scale=0.999)
    r_ref, a_ref, _ = rasterize_pixels_reference(*args, 32, 32)
    old = rp.SCAN_PRECISION_FWD
    try:
        rp.SCAN_PRECISION_FWD = "split2"
        r_pal, a_pal, _ = rasterize_pixels_pallas(*args, 32, 32, interpret=True)
    finally:
        rp.SCAN_PRECISION_FWD = old
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref), atol=3e-4)
    np.testing.assert_allclose(np.asarray(a_pal), np.asarray(a_ref), atol=3e-4)

    # and gradients still HIGHEST-clean (bwd unaffected by the fwd knob)
    def loss(m):
        rp.SCAN_PRECISION_FWD = "split2"
        try:
            r, a, _ = rasterize_pixels_pallas(
                m, *args[1:], 32, 32, interpret=True
            )
        finally:
            rp.SCAN_PRECISION_FWD = old
        return jnp.sum(r**2) + jnp.sum(a)

    g = jax.grad(loss)(args[0])
    assert np.all(np.isfinite(np.asarray(g)))


def test_single_key_sort_matches_two_key():
    """SINGLE_KEY_SORT packs (tile, depth) into one int32 key; on scenes
    without sub-2^-12-relative depth ties inside a tile the sorted layout is
    IDENTICAL to the 2-key sort, and the rendered image matches exactly."""
    from freegaussian_tpu.ops import tiles as T

    args = make_scene(n=200, width=48, height=32, seed=7)
    r2k, a2k, _ = rasterize_pixels_pallas(*args, 48, 32, interpret=True)
    old = T.SINGLE_KEY_SORT
    try:
        T.SINGLE_KEY_SORT = True
        r1k, a1k, _ = rasterize_pixels_pallas(*args, 48, 32, interpret=True)
    finally:
        T.SINGLE_KEY_SORT = old
    np.testing.assert_array_equal(np.asarray(r1k), np.asarray(r2k))
    np.testing.assert_array_equal(np.asarray(a1k), np.asarray(a2k))


@pytest.mark.slow
def test_packed_row_major_exact_match():
    """PACKED_ROW_MAJOR stores the per-intersection data (cap, D) row-major
    and flips it to the kernels' (D, K) compute order INSIDE the kernel —
    the same values flow through the identical compositing math, so image,
    alpha, and every gradient must match the legacy (D, cap) order EXACTLY
    (bit-for-bit: no reduction is regrouped by the flip)."""
    from freegaussian_tpu.ops import rasterize_pallas as rp

    args = make_scene(n=200, width=48, height=32, seed=11, opac_scale=0.98)
    means2d, conics, colors, opacities, depths, radii = args
    target = jax.random.uniform(jax.random.PRNGKey(4), (32, 48, 3))

    def run(flag):
        old = rp.PACKED_ROW_MAJOR
        rp.PACKED_ROW_MAJOR = flag
        try:
            def loss(m, c, col, op):
                render, alpha, _ = rasterize_pixels_pallas(
                    m, c, col, op, depths, radii, 48, 32, interpret=True
                )
                return jnp.sum((render - target) ** 2) + 0.3 * jnp.sum(alpha**2)

            render, alpha, _ = rasterize_pixels_pallas(*args, 48, 32, interpret=True)
            grads = jax.grad(loss, argnums=(0, 1, 2, 3))(
                means2d, conics, colors, opacities
            )
            return render, alpha, grads
        finally:
            rp.PACKED_ROW_MAJOR = old

    r0, a0, g0 = run(False)
    r1, a1, g1 = run(True)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r0))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a0))
    for name, x, y in zip(["means2d", "conics", "colors", "opacities"], g1, g0):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=name)


@pytest.mark.slow
def test_kernel_tile_size_keeps_contract_bbox():
    """The kernel tile size is a pure performance knob: gsplat's CONTRACT
    quantizes each Gaussian's radius bbox to 16-px tiles (oracle
    tile_bounds), and at op ~ 1 the threshold ellipse reaches ~3.33 sigma —
    PAST the 3-sigma radii — so a coarser kernel tile would let real
    alpha >= threshold contributions through that the contract cuts.
    The in-kernel contract gate (_alphas, CONTRACT_TILE) must keep tile-32
    renders and gradients oracle-close exactly like tile-16 (the r3 bug:
    61 pixels at 7e-2 before the gate, docs/NOTES_ROUND3.md)."""
    args = make_scene(n=300, width=96, height=64, seed=13, opac_scale=0.999)
    means2d, conics, colors, opacities, depths, radii = args
    r_ref, a_ref, _ = rasterize_pixels_reference(*args, 96, 64)
    target = jax.random.uniform(jax.random.PRNGKey(2), (64, 96, 3))

    def loss_ref(m, c, col, op):
        render, alpha, _ = rasterize_pixels_reference(
            m, c, col, op, depths, radii, 96, 64
        )
        return jnp.sum((render - target) ** 2) + 0.3 * jnp.sum(alpha**2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(
        means2d, conics, colors, opacities
    )
    for ts in (16, 32):
        r, a, _ = rasterize_pixels_pallas(
            *args, 96, 64, tile_size=ts, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(r_ref), atol=5e-5,
            err_msg=f"tile_size={ts} fwd",
        )

        def loss_pal(m, c, col, op):
            render, alpha, _ = rasterize_pixels_pallas(
                m, c, col, op, depths, radii, 96, 64,
                tile_size=ts, interpret=True,
            )
            return jnp.sum((render - target) ** 2) + 0.3 * jnp.sum(alpha**2)

        g = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(
            means2d, conics, colors, opacities
        )
        # dense-termination scenes amplify chunk-regrouping noise through
        # the backward's r_after cancellation (~3e-2 rel on a few conic
        # elements even at tile 16 — measured, docs/NOTES_ROUND3.md); the
        # bbox-contract bug this test pins showed up as 7e-2 in the FORWARD
        # image above, so class-level gradient tolerances suffice here.
        for name, x, y in zip(["means2d", "conics", "colors", "opacities"], g, g_ref):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=5e-2, atol=1e-3,
                err_msg=f"tile_size={ts} {name}",
            )


def test_gather_rows_bwd_immune_to_tail_garbage():
    """The reduction's boundary reads must never touch rows past the kept
    total: padding-gid rows sort to the END, and every boundary is <= the
    kept total (the invariant that let the explicit zeroing select go in
    round 4 — EO_ZERO_WRITE keeps every tile-covered chunk kernel-written,
    and the tail holds hardware garbage including inf/NaN bit patterns)."""
    from freegaussian_tpu.ops import rasterize_pallas as rp

    n, d, cap = 5, 8, 16
    counts = np.array([3, 0, 2, 4, 1], np.int32)  # kept total = 10
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    # expansion-order gids, tile-sorted by an arbitrary permutation
    gids_exp = np.repeat(np.arange(n, dtype=np.int32), counts)
    rng = np.random.default_rng(0)
    perm = rng.permutation(10)
    gids = np.full((cap,), n, np.int32)
    gids[:10] = gids_exp[perm]

    per_gauss = jnp.asarray(rng.normal(size=(n + 1, d)).astype(np.float32))
    rows, vjp = jax.vjp(
        lambda pg: rp._gather_rows(
            pg, jnp.asarray(gids), jnp.asarray(offsets), jnp.asarray(counts)
        ),
        per_gauss,
    )
    d_rows = rng.normal(size=(cap, d)).astype(np.float32)
    d_rows[10:] = np.nan  # tail garbage: never-written HBM
    d_rows[12] = np.inf
    (g,) = vjp(jnp.asarray(d_rows))
    g = np.asarray(g)
    assert np.isfinite(g).all(), "tail garbage leaked into group sums"
    # exact group sums for the kept rows
    want = np.zeros((n + 1, d), np.float32)
    for slot in range(10):
        want[gids[slot]] += d_rows[slot]
    np.testing.assert_allclose(g[:n], want[:n], rtol=1e-5, atol=1e-5)


def test_slot_invert_sort_bit_identical():
    """SLOT_INVERT="sort" (searchsorted merge) must reproduce the scatter+
    cummax inversion exactly, including empty Gaussians sharing offsets and
    capacity overflow."""
    from freegaussian_tpu.ops import tiles

    key = jax.random.PRNGKey(3)
    n = 120
    means2d = jax.random.uniform(key, (n, 2), minval=-5.0, maxval=70.0)
    radii = jnp.where(
        jax.random.uniform(jax.random.PRNGKey(4), (n,)) < 0.2,
        0,
        jax.random.randint(jax.random.PRNGKey(5), (n,), 1, 9),
    ).astype(jnp.int32)
    depths = jax.random.uniform(jax.random.PRNGKey(6), (n,), minval=0.5, maxval=9.0)
    for cap in (64, 4096):  # overflow and headroom regimes
        a = tiles.build_intersections(means2d, radii, depths, 64, 64, 16, cap)
        tiles.SLOT_INVERT = "sort"
        try:
            b = tiles.build_intersections(means2d, radii, depths, 64, 64, 16, cap)
        finally:
            tiles.SLOT_INVERT = "scatter"
        for fa, fb, name in zip(a, b, a._fields):
            if hasattr(fa, "shape"):
                np.testing.assert_array_equal(
                    np.asarray(fa), np.asarray(fb), err_msg=f"{name} cap={cap}"
                )


def test_bwd_rows_bf16_grads_within_budget():
    """BWD_ROWS_BF16: forward bit-identical (flag touches only the backward
    store dtype); gradients within the bf16 rounding class of the f32 path."""
    from freegaussian_tpu.ops import rasterize_pallas as rp

    rng = np.random.default_rng(12)
    n = 70
    means2d = rng.uniform([2, 2], [30, 30], size=(n, 2)).astype(np.float32)
    a_ = rng.uniform(0.08, 0.7, size=n)
    c_ = rng.uniform(0.08, 0.7, size=n)
    b_ = rng.uniform(-0.6, 0.6, size=n) * np.sqrt(a_ * c_)
    conics = np.stack([a_, b_, c_], axis=-1).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    opacities = rng.uniform(0.1, 0.95, size=n).astype(np.float32)
    depths = rng.uniform(1.0, 6.0, size=n).astype(np.float32)
    radii = np.full(n, 7, dtype=np.int32)
    jargs = tuple(
        jnp.asarray(x)
        for x in (means2d, conics, colors, opacities, depths, radii)
    )
    W = H = 32
    target = jnp.asarray(
        np.random.default_rng(8).uniform(size=(H, W, 3)).astype(np.float32)
    )

    def run():
        def loss(m, c, col, op):
            r, a, _ = rp.rasterize_pixels_pallas(
                m, c, col, op, jargs[4], jargs[5], W, H, interpret=True
            )
            return jnp.sum((r - target) ** 2) + 0.3 * jnp.sum(a[..., 0] ** 2)

        return jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(*jargs[:4])

    l0, g0 = run()
    rp.BWD_ROWS_BF16 = True
    try:
        l1, g1 = run()
    finally:
        rp.BWD_ROWS_BF16 = False
    assert float(l0) == float(l1)
    for a, b, nm in zip(g1, g0, ("means2d", "conics", "colors", "opacities")):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.maximum(np.abs(b), 1e-3 * np.abs(b).max() + 1e-8)
        rel = np.abs(a - b) / denom
        # bulk must sit at the bf16 rounding class; isolated elements with
        # cancelling per-intersection terms may reach ~10% relative (their
        # absolute size is small — that is what cancelled)
        assert np.median(rel) < 0.01, f"{nm}: median {np.median(rel):.3e}"
        assert rel.max() < 0.2, f"{nm}: maxrel {rel.max():.3e}"
