"""Batched ray/scene intersection (brute force path).

The wavefront design keeps rays as flat SoA arrays [N]; intersection tests
all primitives per ray with broadcasting ([N, T] / [N, S] temporaries) and
reduces with argmin — the vectorized counterpart of scene_intersect's
brute-force fallback (scene.cpp:25-47). The BVH path (geometry/traverse.py)
replaces the all-pairs sweep for large scenes; both produce identical Hit
records.

Primitive semantics mirror the reference exactly:
  * Möller–Trumbore with parallel-ray epsilon reject (shape.cpp:44-110),
  * sphere quadratic with near/far root selection (shape.cpp:13-42),
  * geometric normal always flipped to face the incoming ray
    (shape.cpp:35, :84),
  * barycentric UV / interpolated UV, interpolated (unflipped) shading
    normal (shape.cpp:88-107),
  * sphere spherical UV via get_sphere_uv (shape.cpp:3-11).
"""

import jax.numpy as jnp

from take_tpu.core.math import C_PI, C_TWOPI, normalize
from take_tpu.scene.types import Hit, Scene, TRI_HAS_NORMALS, TRI_HAS_UV

# Parallel-ray determinant epsilon (take.h:30). Scale-free enough in f32 for
# the scenes we target; the self-intersection guard is the *ray offset*
# policy in the integrator, not this.
_DET_EPS = 1e-7

_BIG = jnp.float32(3.4e38)


def _tri_candidates(g, n_tri, ro, rd, tmin, tmax):
    """Möller–Trumbore all triangles: returns (t, u, v, valid) each [N, T]."""
    v0 = g.tri_v0  # [T, 3]
    e1 = g.tri_e1
    e2 = g.tri_e2
    # [N, T, 3] broadcasting
    h = jnp.cross(rd[:, None, :], e2[None, :, :])
    a = jnp.sum(e1[None] * h, axis=-1)  # [N, T]
    parallel = jnp.abs(a) < _DET_EPS
    f = 1.0 / jnp.where(parallel, 1.0, a)
    s = ro[:, None, :] - v0[None]
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1[None])
    v = f * jnp.sum(rd[:, None, :] * q, axis=-1)
    t = f * jnp.sum(e2[None] * q, axis=-1)
    valid = (
        (~parallel)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= tmin[:, None])
        & (t <= tmax[:, None])
    )
    T = v0.shape[0]
    if n_tri < T:
        idx = jnp.arange(T)
        valid = valid & (idx[None, :] < n_tri)
    return t, u, v, valid


def _sph_candidates(g, n_sph, ro, rd, tmin, tmax):
    """Sphere quadratic (shape.cpp:13-29): returns (t, valid) each [N, S]."""
    oc = ro[:, None, :] - g.sph_center[None]  # [N, S, 3]
    a = jnp.sum(rd * rd, axis=-1)[:, None]  # [N, 1]
    half_b = jnp.sum(oc * rd[:, None, :], axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - g.sph_radius[None] ** 2
    disc = half_b * half_b - a * c
    hit = disc >= 0.0
    sqrtd = jnp.sqrt(jnp.maximum(disc, 0.0))
    root0 = (-half_b - sqrtd) / a
    root1 = (-half_b + sqrtd) / a
    in0 = (root0 >= tmin[:, None]) & (root0 <= tmax[:, None])
    in1 = (root1 >= tmin[:, None]) & (root1 <= tmax[:, None])
    t = jnp.where(in0, root0, root1)
    valid = hit & (in0 | in1)
    S = g.sph_radius.shape[0]
    if n_sph < S:
        idx = jnp.arange(S)
        valid = valid & (idx[None, :] < n_sph)
    return t, valid


def _sphere_uv(p):
    """Spherical UV of a unit vector (shape.cpp:3-11), incl. the negative v."""
    theta = jnp.arccos(jnp.clip(-p[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(-p[..., 2], p[..., 0]) + C_PI
    return jnp.stack([phi / C_TWOPI, -theta / C_PI], axis=-1)


def intersect_scene(scene: Scene, ro, rd, tmin, tmax) -> Hit:
    """Closest-hit query for a batch of rays.

    Args:
        scene: Scene.
        ro, rd: [N, 3] origins / directions (rd need not be unit length —
            the reference's sphere code divides by dot(d, d)).
        tmin, tmax: [N] parametric range.
    Returns:
        Hit SoA with [N] leading axis.
    """
    if scene.bvh is not None:
        from take_tpu.geometry.traverse import bvh_intersect

        return bvh_intersect(scene, ro, rd, tmin, tmax)
    return _brute_force_intersect(scene, ro, rd, tmin, tmax)


def _brute_force_intersect(scene: Scene, ro, rd, tmin, tmax) -> Hit:
    g = scene.geometry
    meta = scene.meta
    N = ro.shape[0]

    # --- triangles ---
    t_tri, u, v, valid_t = _tri_candidates(g, meta.n_tri, ro, rd, tmin, tmax)
    t_tri_masked = jnp.where(valid_t, t_tri, _BIG)
    best_tri = jnp.argmin(t_tri_masked, axis=1)  # [N]
    tri_t = jnp.take_along_axis(t_tri_masked, best_tri[:, None], axis=1)[:, 0]
    tri_hit = tri_t < _BIG

    # --- spheres ---
    if meta.n_sph > 0:
        t_sph, valid_s = _sph_candidates(g, meta.n_sph, ro, rd, tmin, tmax)
        t_sph_masked = jnp.where(valid_s, t_sph, _BIG)
        best_sph = jnp.argmin(t_sph_masked, axis=1)
        sph_t = jnp.take_along_axis(t_sph_masked, best_sph[:, None], axis=1)[:, 0]
        sph_hit = sph_t < _BIG
    else:
        best_sph = jnp.zeros(N, jnp.int32)
        sph_t = jnp.full(N, _BIG)
        sph_hit = jnp.zeros(N, bool)

    use_sph = sph_hit & (sph_t < tri_t)
    valid = tri_hit | sph_hit
    t = jnp.where(use_sph, sph_t, tri_t)
    # Invalid lanes keep t=_BIG in the output, but shading math uses a safe t
    # so masked lanes never generate inf/nan that poison gradients.
    t_safe = jnp.where(valid, t, 1.0)

    # --- shade attributes for the winning primitive ---
    hit_tri = shade_triangle_hit(
        g, best_tri,
        jnp.take_along_axis(u, best_tri[:, None], axis=1)[:, 0],
        jnp.take_along_axis(v, best_tri[:, None], axis=1)[:, 0],
        ro, rd, t_safe,
    )
    if meta.n_sph > 0:
        hit_sph = shade_sphere_hit(g, best_sph, ro, rd, t_safe)
        sel = use_sph[:, None]
        pos = jnp.where(sel, hit_sph.pos, hit_tri.pos)
        geo_n = jnp.where(sel, hit_sph.geo_n, hit_tri.geo_n)
        sh_n = jnp.where(sel, hit_sph.sh_n, hit_tri.sh_n)
        uv = jnp.where(sel, hit_sph.uv, hit_tri.uv)
        mat_id = jnp.where(use_sph, hit_sph.mat_id, hit_tri.mat_id)
        light_id = jnp.where(use_sph, hit_sph.light_id, hit_tri.light_id)
    else:
        pos, geo_n, sh_n = hit_tri.pos, hit_tri.geo_n, hit_tri.sh_n
        uv, mat_id, light_id = hit_tri.uv, hit_tri.mat_id, hit_tri.light_id

    return Hit(
        valid=valid, t=t, pos=pos, geo_n=geo_n, sh_n=sh_n, uv=uv,
        mat_id=mat_id, light_id=light_id,
    )


def shade_triangle_hit(g, idx, u, v, ro, rd, t) -> Hit:
    """Build the Hit record for triangle `idx` at barycentrics (u, v)."""
    v0 = g.tri_v0[idx]
    e1 = g.tri_e1[idx]
    e2 = g.tri_e2[idx]
    pos = ro + rd * t[:, None]
    geo_n = normalize(jnp.cross(e1, e2), eps=1e-30)
    # flip toward incoming ray (shape.cpp:84)
    flip = jnp.sum(rd * geo_n, axis=-1, keepdims=True) < 0.0
    geo_n = jnp.where(flip, geo_n, -geo_n)

    w = 1.0 - u - v
    flags = g.tri_flags[idx]
    has_n = (flags & TRI_HAS_NORMALS) != 0
    sh_interp = normalize(
        w[:, None] * g.tri_n0[idx] + u[:, None] * g.tri_n1[idx]
        + v[:, None] * g.tri_n2[idx],
        eps=1e-30,
    )
    sh_n = jnp.where(has_n[:, None], sh_interp, geo_n)

    has_uv = (flags & TRI_HAS_UV) != 0
    uv_interp = (
        w[:, None] * g.tri_uv0[idx] + u[:, None] * g.tri_uv1[idx]
        + v[:, None] * g.tri_uv2[idx]
    )
    uv = jnp.where(has_uv[:, None], uv_interp, jnp.stack([u, v], axis=-1))

    return Hit(
        valid=None, t=t, pos=pos, geo_n=geo_n, sh_n=sh_n, uv=uv,
        mat_id=g.tri_mat[idx], light_id=g.tri_light[idx],
    )


def shade_sphere_hit(g, idx, ro, rd, t) -> Hit:
    center = g.sph_center[idx]
    pos = ro + rd * t[:, None]
    n = normalize(pos - center, eps=1e-30)
    flip = jnp.sum(rd * n, axis=-1, keepdims=True) < 0.0
    n_flipped = jnp.where(flip, n, -n)
    uv = _sphere_uv(n_flipped)
    return Hit(
        valid=None, t=t, pos=pos, geo_n=n_flipped, sh_n=n_flipped, uv=uv,
        mat_id=g.sph_mat[idx], light_id=g.sph_light[idx],
    )


def occluded(scene: Scene, ro, rd, tmin, tmax):
    """Any-hit query: True where something lies in (tmin, tmax).

    The reference runs a full closest-hit for this (scene.cpp:49-63 ⚠); our
    brute-force path reduces with `any` (no argmin/gather), and the BVH path
    early-outs.
    """
    if scene.bvh is not None:
        from take_tpu.geometry.traverse import bvh_occluded

        return bvh_occluded(scene, ro, rd, tmin, tmax)
    g = scene.geometry
    meta = scene.meta
    _, _, _, valid_t = _tri_candidates(g, meta.n_tri, ro, rd, tmin, tmax)
    occ = jnp.any(valid_t, axis=1)
    if meta.n_sph > 0:
        _, valid_s = _sph_candidates(g, meta.n_sph, ro, rd, tmin, tmax)
        occ = occ | jnp.any(valid_s, axis=1)
    return occ
