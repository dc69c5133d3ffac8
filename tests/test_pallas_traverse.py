"""Pallas packet-traversal kernel: interpret-mode correctness vs the jnp
while-loop traversal (same BVH, same rays)."""

import numpy as np
import jax.numpy as jnp
import pytest

from take_tpu.geometry.intersect import intersect_scene
from take_tpu.geometry.pallas_traverse import BLOCK, packet_traverse, prep_tables

from tests.test_bvh import random_soup_scene


@pytest.mark.parametrize("n_tri", [120, 1500])
def test_packet_matches_whileloop(n_tri, rng_np):
    scene = random_soup_scene(n_tri, build_bvh=True)
    N = 2 * BLOCK
    ro = jnp.asarray(rng_np.uniform(-15, 15, (N, 3)), jnp.float32)
    d = rng_np.normal(size=(N, 3))
    rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    tmin = jnp.full(N, 1e-4)
    tmax = jnp.full(N, jnp.inf)

    ref = intersect_scene(scene, ro, rd, tmin, tmax)
    nodes, tris = prep_tables(scene)
    t, u, v, prim = packet_traverse(
        nodes, tris, ro, rd, tmin, tmax, interpret=True
    )
    t = np.asarray(t)
    hit = t < 1e38
    np.testing.assert_array_equal(hit, np.asarray(ref.valid))
    sel = hit
    np.testing.assert_allclose(
        t[sel], np.asarray(ref.t)[sel], rtol=3e-4, atol=1e-3
    )
    # winning primitive agrees wherever t is uniquely closest
    # (ties may resolve differently; t-agreement above is the invariant)
    assert (np.asarray(prim)[sel] >= 0).all()


def test_packet_any_hit_and_tmax(rng_np):
    """any_hit=True matches occlusion ground truth; finite tmax rays must
    not report hits beyond tmax (tmax is honored DURING traversal now);
    dead lanes (tmax < tmin) never hit."""
    from take_tpu.geometry.intersect import _tri_uvt

    scene = random_soup_scene(400, build_bvh=True)
    N = 2 * BLOCK
    ro = jnp.asarray(rng_np.uniform(-15, 15, (N, 3)), jnp.float32)
    d = rng_np.normal(size=(N, 3))
    rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    tmin = jnp.full(N, 1e-4)
    tmax = jnp.asarray(rng_np.uniform(1.0, 25.0, N), jnp.float32)
    # kill a third of the lanes (dead-lane encoding used by the integrator)
    dead = rng_np.uniform(size=N) < 0.33
    tmax = jnp.where(jnp.asarray(dead), -3.4e38, tmax)

    _, _, _, ok = _tri_uvt(scene.geometry, ro, rd, tmin, tmax, scene.meta.n_tri)
    occ_ref = np.asarray(ok).any(axis=1)

    nodes, tris = prep_tables(scene)
    *_, prim = packet_traverse(
        nodes, tris, ro, rd, tmin, tmax, interpret=True, any_hit=True
    )
    occ = np.asarray(prim) >= 0
    np.testing.assert_array_equal(occ, occ_ref)
    assert not occ[dead].any()

    # closest-hit with the same finite tmax: no hit may exceed tmax
    t, *_ = packet_traverse(nodes, tris, ro, rd, tmin, tmax, interpret=True)
    t = np.asarray(t)
    hit = t < 1e38
    assert (t[hit] <= np.asarray(tmax)[hit] + 1e-5).all()
    np.testing.assert_array_equal(hit, occ_ref)
