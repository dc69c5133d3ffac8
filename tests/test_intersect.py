"""Unit tests for ray-primitive intersection (geometry/intersect.py)."""

import numpy as np
import jax.numpy as jnp

from take_tpu.core.camera import Camera
from take_tpu.geometry.intersect import intersect_scene, occluded
from take_tpu.scene.build import SceneBuilder
from take_tpu.scene.types import MAT_DIFFUSE


def _single_tri_scene():
    b = SceneBuilder()
    b.camera = Camera(4, 4, (0, 0, 1), (0, 0, 0), (0, 1, 0), 45.0)
    m = b.add_material(MAT_DIFFUSE)
    b.add_mesh(
        positions=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float),
        indices=np.array([[0, 1, 2]]),
        material_id=m,
        uvs=np.array([[0, 0], [1, 0], [0, 1]], float),
    )
    return b.build()


def _rays(o, d):
    o = jnp.asarray(o, jnp.float32).reshape(-1, 3)
    d = jnp.asarray(d, jnp.float32).reshape(-1, 3)
    n = o.shape[0]
    return o, d, jnp.full(n, 1e-4), jnp.full(n, jnp.inf)


def test_triangle_hit_miss():
    s = _single_tri_scene()
    hit = intersect_scene(s, *_rays([[0.25, 0.25, 1.0], [0.9, 0.9, 1.0]],
                                    [[0, 0, -1], [0, 0, -1]]))
    assert bool(hit.valid[0]) and not bool(hit.valid[1])
    np.testing.assert_allclose(float(hit.t[0]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(hit.pos[0]), [0.25, 0.25, 0.0], atol=1e-6
    )
    # barycentric uv interpolated over explicit uvs == (u, v)
    np.testing.assert_allclose(np.asarray(hit.uv[0]), [0.25, 0.25], atol=1e-5)


def test_geo_normal_faces_ray():
    s = _single_tri_scene()
    # from +z: normal +z; from -z: flipped
    hit1 = intersect_scene(s, *_rays([[0.2, 0.2, 1.0]], [[0, 0, -1]]))
    hit2 = intersect_scene(s, *_rays([[0.2, 0.2, -1.0]], [[0, 0, 1]]))
    np.testing.assert_allclose(np.asarray(hit1.geo_n[0]), [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(hit2.geo_n[0]), [0, 0, -1], atol=1e-6)


def test_tmax_respected():
    s = _single_tri_scene()
    o = jnp.asarray([[0.25, 0.25, 1.0]], jnp.float32)
    d = jnp.asarray([[0, 0, -1]], jnp.float32)
    hit = intersect_scene(s, o, d, jnp.full(1, 1e-4), jnp.full(1, 0.5))
    assert not bool(hit.valid[0])


def test_sphere_roots_and_uv():
    b = SceneBuilder()
    b.camera = Camera(4, 4, (0, 0, 3), (0, 0, 0), (0, 1, 0), 45.0)
    m = b.add_material(MAT_DIFFUSE)
    b.add_sphere((0, 0, 0), 1.0, m)
    s = b.build()
    hit = intersect_scene(s, *_rays([[0, 0, 3]], [[0, 0, -1]]))
    assert bool(hit.valid[0])
    np.testing.assert_allclose(float(hit.t[0]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.geo_n[0]), [0, 0, 1], atol=1e-5)
    # inside the sphere: far root, normal flipped toward ray
    hit_in = intersect_scene(s, *_rays([[0, 0, 0]], [[0, 0, -1]]))
    assert bool(hit_in.valid[0])
    np.testing.assert_allclose(float(hit_in.t[0]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(hit_in.geo_n[0]), [0, 0, 1], atol=1e-5)


def test_occlusion_any_hit():
    s = _single_tri_scene()
    o = jnp.asarray([[0.25, 0.25, 1.0], [0.9, 0.9, 1.0]], jnp.float32)
    d = jnp.asarray([[0, 0, -1], [0, 0, -1]], jnp.float32)
    occ = occluded(s, o, d, jnp.full(2, 1e-4), jnp.full(2, 10.0))
    assert bool(occ[0]) and not bool(occ[1])
    # occluder beyond tmax does not count
    occ2 = occluded(s, o, d, jnp.full(2, 1e-4), jnp.full(2, 0.5))
    assert not bool(occ2[0])


def test_closest_of_two_triangles():
    b = SceneBuilder()
    b.camera = Camera(4, 4, (0, 0, 3), (0, 0, 0), (0, 1, 0), 45.0)
    m0 = b.add_material(MAT_DIFFUSE)
    m1 = b.add_material(MAT_DIFFUSE)
    tri = np.array([[-1, -1, 0], [3, -1, 0], [-1, 3, 0]], float)
    b.add_mesh(tri, np.array([[0, 1, 2]]), m0)  # z=0
    b.add_mesh(tri + [0, 0, 0.5], np.array([[0, 1, 2]]), m1)  # z=0.5 (closer)
    s = b.build()
    hit = intersect_scene(s, *_rays([[0.0, 0.0, 2.0]], [[0, 0, -1]]))
    assert int(hit.mat_id[0]) == m1
    np.testing.assert_allclose(float(hit.t[0]), 1.5, rtol=1e-5)
