"""Vectorized light selection, surface sampling, and pdfs.

Counterpart of light.{h,cpp}. Differences from the reference are intentful
fixes, each flagged in SURVEY §7.4:
  * the power PMF/CDF actually exists (scene.h:28-29 is never populated ⚠),
  * point lights are handled in NEE (the reference parses them, swaps their
    fields ⚠ parse_scene.cpp:723, then ignores them in every integrator).
"""

from typing import NamedTuple

import jax.numpy as jnp

from take_tpu.core.math import C_TWOPI, dot, normalize
from take_tpu.core.sampling import sample_sphere_visible, sample_triangle
from take_tpu.scene.types import LIGHT_AREA, LIGHT_POINT, SHAPE_SPHERE, SHAPE_TRI, Scene


class LightSample(NamedTuple):
    light_id: jnp.ndarray  # [N] int32
    position: jnp.ndarray  # [N, 3]
    normal: jnp.ndarray  # [N, 3] surface normal at the sample (0 for point)
    is_area: jnp.ndarray  # [N] bool
    intensity: jnp.ndarray  # [N, 3]


def select_uniform(scene: Scene, u):
    """Uniform light pick (light.cpp:5-7)."""
    n = scene.meta.n_lights
    idx = jnp.floor(u * n).astype(jnp.int32)
    return jnp.clip(idx, 0, n - 1)


def select_power(scene: Scene, u):
    """Power-proportional pick via CDF inversion (light.cpp:9-17, fixed)."""
    cdf = scene.lights.power_cdf
    idx = jnp.searchsorted(cdf, u, side="right")
    return jnp.clip(idx, 0, scene.meta.n_lights - 1).astype(jnp.int32)


def sample_on_light(scene: Scene, light_id, ref_pos, u1, u2) -> LightSample:
    """Sample a point on light `light_id` w.r.t. reference point `ref_pos`.

    Area lights dispatch on their shape (sample_on_light_op ->
    sample_on_shape_op): triangles use the sqrt warp (shape.cpp:146-169),
    spheres the visible-cap warp (shape.cpp:125-144). Point lights return
    their position.
    """
    L = scene.lights
    g = scene.geometry
    tag = L.tag[light_id]
    kind = L.shape_kind[light_id]
    sidx = L.shape_idx[light_id]
    intensity = L.intensity[light_id]

    # --- triangle branch ---
    v0 = g.tri_v0[sidx]
    e1 = g.tri_e1[sidx]
    e2 = g.tri_e2[sidx]
    b1, b2 = sample_triangle(u1, u2)
    p_tri = v0 + b1[..., None] * e1 + b2[..., None] * e2
    n_tri = normalize(jnp.cross(e1, e2), eps=1e-30)
    # flip geometric normal toward interpolated shading normal (shape.cpp:168)
    sh = (
        (1.0 - b1 - b2)[..., None] * g.tri_n0[sidx]
        + b1[..., None] * g.tri_n1[sidx]
        + b2[..., None] * g.tri_n2[sidx]
    )
    has_sh = jnp.sum(sh * sh, axis=-1) > 1e-12
    flip = jnp.where(has_sh, dot(sh, n_tri) > 0.0, True)
    n_tri = jnp.where(flip[..., None], n_tri, -n_tri)

    # --- sphere branch ---
    if scene.meta.n_sph > 0:
        p_sph, n_sph = sample_sphere_visible(
            u1, u2, g.sph_center[sidx], g.sph_radius[sidx], ref_pos
        )
        is_sph = (kind == SHAPE_SPHERE)[..., None]
        pos = jnp.where(is_sph, p_sph, p_tri)
        nrm = jnp.where(is_sph, n_sph, n_tri)
    else:
        pos, nrm = p_tri, n_tri

    # --- point branch ---
    is_point = (tag == LIGHT_POINT)[..., None]
    pos = jnp.where(is_point, L.position[light_id], pos)
    nrm = jnp.where(is_point, 0.0, nrm)

    return LightSample(
        light_id=light_id,
        position=pos,
        normal=nrm,
        is_area=tag == LIGHT_AREA,
        intensity=intensity,
    )


def area_pdf(scene: Scene, light_id, light_pos, ref_pos):
    """Per-area pdf of a sampled point (get_light_pdf, light.cpp:32-48).

    Triangles: 1/area. Spheres: visible-cap pdf 1/(2 pi r^2 (1 - r/d)) with
    d measured to the *sampled point* exactly as the reference does
    (light.cpp:43-45). Point lights return 0 (delta).
    """
    L = scene.lights
    g = scene.geometry
    kind = L.shape_kind[light_id]
    sidx = L.shape_idx[light_id]
    inv_area_tri = 1.0 / jnp.maximum(L.area[light_id], 1e-30)
    if scene.meta.n_sph > 0:
        r = g.sph_radius[sidx]
        d = jnp.linalg.norm(light_pos - ref_pos, axis=-1)
        denom = C_TWOPI * r * r * (1.0 - r / jnp.maximum(d, 1e-30))
        pdf_sph = 1.0 / jnp.maximum(denom, 1e-30)
        pdf = jnp.where(kind == SHAPE_SPHERE, pdf_sph, inv_area_tri)
    else:
        pdf = inv_area_tri
    return jnp.where(L.tag[light_id] == LIGHT_AREA, pdf, 0.0)


def power_pmf(scene: Scene, light_id):
    """Selection pmf under power sampling (get_light_pmf, light.cpp:20-24)."""
    return scene.lights.power_pmf[light_id]
