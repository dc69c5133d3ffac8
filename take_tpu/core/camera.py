"""Pinhole camera ray generation.

Mirrors the reference's driver-side camera math (render.cpp:37-44, 69-75):
basis w = normalize(lookfrom - lookat), u = normalize(cross(up, w)),
v = cross(w, u); viewport height = 2 tan(vfov/2); x jitter in [0,1).

The y-flip of the reference (`img(x, H-1-y)`, render.cpp:78) is applied at
image assembly, not here: ray (x, y) shades output pixel (x, H-1-y).
"""

from dataclasses import dataclass

import jax.numpy as jnp

from take_tpu.core.math import C_PI, cross, normalize


@dataclass(frozen=True)
class Camera:
    """Static (host-side) camera description; fields mirror camera.h:5-11."""

    width: int
    height: int
    lookfrom: tuple
    lookat: tuple
    up: tuple
    vfov: float  # vertical fov in degrees

    def basis(self, dtype=jnp.float32):
        lookfrom = jnp.asarray(self.lookfrom, dtype)
        lookat = jnp.asarray(self.lookat, dtype)
        up = jnp.asarray(self.up, dtype)
        w = normalize(lookfrom - lookat)
        u = normalize(cross(up, w))
        v = cross(w, u)
        return u, v, w

    def viewport(self):
        theta = self.vfov / 180.0 * C_PI
        h = jnp.tan(theta / 2.0)
        viewport_height = 2.0 * h
        viewport_width = viewport_height / self.height * self.width
        return viewport_width, viewport_height


def generate_rays(camera, px, py, jx, jy, dtype=jnp.float32):
    """Primary rays through pixel (px, py) with sub-pixel jitter (jx, jy).

    Args:
        camera: Camera.
        px, py: [...] integer pixel coordinates (x right, y up as in reference).
        jx, jy: [...] uniforms in [0,1).
    Returns:
        (origins [..., 3], directions [..., 3]) — directions normalized.
    """
    u, v, w = camera.basis(dtype)
    vp_w, vp_h = camera.viewport()
    sx = ((px + jx) / camera.width - 0.5) * vp_w
    sy = ((py + jy) / camera.height - 0.5) * vp_h
    d = sx[..., None] * u + sy[..., None] * v - w
    d = normalize(d)
    o = jnp.broadcast_to(jnp.asarray(camera.lookfrom, dtype), d.shape)
    return o, d
