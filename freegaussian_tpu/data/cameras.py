"""Camera model: a minimal jit-friendly pytree replacing nerfstudio Cameras
for the surfaces the reference exercises (c2w in OpenGL convention, pinhole
intrinsics, per-frame time, and the `cameras0` previous-frame camera used by
the control-state computation; ref: freegaussian_dataparser.py:489-512)."""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp

from ..ops.math import get_viewmat


@flax.struct.dataclass
class Camera:
    """One pinhole camera. All fields are arrays so a batch of cameras is the
    same pytree with a leading axis (use jax.tree.map / vmap)."""

    c2w: jax.Array  # (3, 4) or (4, 4) camera-to-world, OpenGL convention
    fx: jax.Array  # ()
    fy: jax.Array  # ()
    cx: jax.Array  # ()
    cy: jax.Array  # ()
    time: jax.Array  # () normalized frame time in [0, 1]
    width: int = flax.struct.field(pytree_node=False, default=0)
    height: int = flax.struct.field(pytree_node=False, default=0)

    @property
    def K(self) -> jax.Array:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            -2,
        )

    @property
    def viewmat(self) -> jax.Array:
        """gsplat/OpenCV world-to-camera (4, 4)."""
        c2w = self.c2w
        if c2w.shape[-2] == 3:
            bottom = jnp.zeros_like(c2w[..., :1, :]).at[..., 0, 3].set(1.0)
            c2w = jnp.concatenate([c2w, bottom], axis=-2)
        return get_viewmat(c2w[None])[0]

    def downscaled(self, d: int) -> "Camera":
        """Camera for a 1/d resolution render (progressive training schedule,
        ref: freegaussian_model.py:626-633, camera.rescale_output_resolution)."""
        if d == 1:
            return self
        return self.replace(
            fx=self.fx / d,
            fy=self.fy / d,
            cx=self.cx / d,
            cy=self.cy / d,
            width=self.width // d,
            height=self.height // d,
        )

    @property
    def c2w_opencv(self) -> jax.Array:
        """(3, 4) camera-to-world in OpenCV convention (flip y/z columns)."""
        R = self.c2w[..., :3, :3] * jnp.asarray([1.0, -1.0, -1.0])
        return jnp.concatenate([R, self.c2w[..., :3, 3:4]], axis=-1)

    @property
    def position(self) -> jax.Array:
        return self.c2w[..., :3, 3]
