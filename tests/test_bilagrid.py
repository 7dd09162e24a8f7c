"""Bilateral-grid tests: identity init is a no-op, grids are learnable, TV
regularization behaves."""

import jax
import jax.numpy as jnp
import numpy as np

from freegaussian_tpu.models.bilagrid import (
    init_bilateral_grids,
    slice_bilateral_grid,
    total_variation_loss,
)


def test_identity_grid_is_noop():
    grids = init_bilateral_grids(2)
    rgb = jax.random.uniform(jax.random.PRNGKey(0), (24, 32, 3))
    out = slice_bilateral_grid(grids, 1, rgb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(rgb), atol=1e-5)
    assert float(total_variation_loss(grids)) == 0.0


def test_grid_learns_color_shift():
    """A constant color bias is representable and learnable by the grid."""
    grids = init_bilateral_grids(1)
    target_shift = jnp.asarray([0.1, -0.05, 0.2])
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (16, 16, 3)) * 0.5 + 0.25
    target = jnp.clip(rgb + target_shift, 0, 1)

    def loss(g):
        out = slice_bilateral_grid(g, 0, rgb)
        return jnp.mean((out - target) ** 2) + 1e-4 * total_variation_loss(g)

    import optax

    opt = optax.adam(0.05)
    opt_state = opt.init(grids)
    val0 = float(loss(grids))
    step = jax.jit(
        lambda g, s: (lambda gr: (optax.apply_updates(g, opt.update(gr, s, g)[0]), opt.update(gr, s, g)[1]))(jax.grad(loss)(g))
    )
    for _ in range(150):
        grids, opt_state = step(grids, opt_state)
    val1 = float(loss(grids))
    assert val1 < 0.2 * val0, f"{val0} -> {val1}"
