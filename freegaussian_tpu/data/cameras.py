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


def orbit_camera_path(cameras, num_frames: int = 60, radius=None, height=None):
    """Generate an orbit camera path around the scene (the `ns-render
    camera-path` analogue): a circle at the mean camera height/distance,
    looking at the origin, with time sweeping 0 -> 1 across the orbit."""
    import numpy as np

    ref = cameras[0]
    pos = np.stack([np.asarray(c.position) for c in cameras])
    if radius is None:
        radius = float(np.linalg.norm(pos[:, [0, 2]], axis=1).mean())
    if height is None:
        height = float(pos[:, 1].mean())
    out = []
    for i in range(num_frames):
        ang = 2 * np.pi * i / num_frames
        eye = np.array(
            [radius * np.sin(ang), height, radius * np.cos(ang)], np.float32
        )
        fwd = -eye / max(np.linalg.norm(eye), 1e-8)
        right = np.cross(np.array([0, 1, 0], np.float32), -fwd)
        right = right / max(np.linalg.norm(right), 1e-8)
        up = np.cross(-fwd, right)
        c2w = np.concatenate(
            [np.stack([right, up, -fwd], axis=-1), eye[:, None]], axis=-1
        ).astype(np.float32)
        out.append(
            ref.replace(
                c2w=jnp.asarray(c2w),
                time=jnp.asarray(i / max(num_frames - 1, 1), jnp.float32),
            )
        )
    return out
