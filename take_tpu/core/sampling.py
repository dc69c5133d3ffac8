"""Low-level sampling warps (batched, differentiable).

Each function maps uniforms u1,u2 in [0,1) to directions/points, mirroring
the reference's samplers:
  * cosine hemisphere      — material.h:121-132
  * Phong/Blinn cos^alpha  — materials/phong.inl:10-17, blinn_phong.inl:10-22
  * triangle sqrt warp     — shape.cpp:146-169
  * sphere visible cone    — shape.cpp:125-144
"""

import jax.numpy as jnp

from take_tpu.core.math import C_PI, C_TWOPI, normalize, to_world


def sample_hemisphere_cos(u1, u2):
    """Cosine-weighted hemisphere in local frame (z-up). pdf = cos(theta)/pi."""
    phi = C_TWOPI * u2
    sqrt_u1 = jnp.sqrt(jnp.clip(u1, 0.0, 1.0))
    z = jnp.sqrt(jnp.clip(1.0 - u1, 0.0, 1.0))
    return jnp.stack([jnp.cos(phi) * sqrt_u1, jnp.sin(phi) * sqrt_u1, z], axis=-1)


def sample_cos_power(u1, u2, exponent):
    """cos^alpha lobe around local z. pdf = (alpha+1)/(2 pi) cos^alpha(theta).

    Matches phong.inl:10-17 exactly (including the clamp structure).
    u1, u2, exponent must have the same (broadcast-compatible) shape [N].
    """
    recip_a1 = 1.0 / (exponent + 1.0)
    phi = C_TWOPI * u2
    cos_t = jnp.clip(u1 ** recip_a1, 0.0, 1.0)
    sin_t = jnp.sqrt(jnp.clip(1.0 - u1 ** (2.0 * recip_a1), 0.0, 1.0))
    v = jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1)
    return normalize(v)


def sample_triangle(u1, u2):
    """sqrt-warp uniform barycentric sampling (shape.cpp:157-160).

    Returns (b1, b2); the point is (1-b1-b2) v0 + b1 v1 + b2 v2.
    """
    su1 = jnp.sqrt(u1)
    return 1.0 - su1, su1 * u2


def sample_sphere_visible(u1, u2, center, radius, ref_pos):
    """Visible-cap sphere sampling w.r.t. a reference point (shape.cpp:125-144).

    Reproduces the reference's exact warp: z in [r/d, 1] linearly from u1,
    local frame around normalize(ref_pos - center). Its pdf (solid-angle
    converted in the integrator) is 1 / (2 pi r^2 (1 - r/d)) per area
    (light.cpp:43-46).

    Returns (point [...,3], normal [...,3]).
    """
    d = jnp.linalg.norm(center - ref_pos, axis=-1, keepdims=True)
    z = 1.0 + u1[..., None] * (radius[..., None] / d - 1.0)
    sin_t = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
    phi = C_TWOPI * u2[..., None]
    local_p = jnp.concatenate(
        [jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, z], axis=-1
    )
    local_p = normalize(local_p)
    axis = normalize(ref_pos - center)
    n = normalize(to_world(axis, local_p))
    point = center + radius[..., None] * n
    return point, n


def pdf_hemisphere_cos(cos_theta):
    return jnp.maximum(cos_theta, 0.0) / C_PI
