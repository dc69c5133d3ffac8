"""Streaming two-level cull+sweep pipeline vs brute force (interpret mode).

The kernels run in Pallas interpret mode on the CPU backend; the real-TPU
path compiles the identical program. Parity target: exact agreement with
the brute-force sweep (same f32 Moeller-Trumbore semantics, lowest-prim
tie-breaking)."""

import numpy as np
import jax.numpy as jnp
import pytest

from take_tpu.geometry.intersect import _pad_rays, _tri_uvt
from take_tpu.geometry.pallas_cluster import BLOCK, cluster_traverse

from tests.test_bvh import random_soup_scene

_BIG = 3.4e38


def _brute_reference(scene, ro, rd, tmin, tmax):
    t, u, v, ok = _tri_uvt(
        scene.geometry, ro, rd, tmin, tmax, scene.meta.n_tri
    )
    tm = np.asarray(jnp.where(ok, t, _BIG))
    prim = tm.argmin(axis=1)
    tbest = tm.min(axis=1)
    found = tbest < _BIG
    return tbest, np.where(found, prim, -1), found


def _rays(rng_np, N, spread=15.0):
    ro = jnp.asarray(rng_np.uniform(-spread, spread, (N, 3)), jnp.float32)
    d = rng_np.normal(size=(N, 3))
    rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    return ro, rd


def _run(scene, ro_p, rd_p, tmin_p, tmax_p, any_hit):
    return cluster_traverse(
        scene.bvh.sup_aabb,
        scene.geometry.tri_sweep,
        ro_p, rd_p, tmin_p, tmax_p,
        any_hit=any_hit, interpret=True,
    )


@pytest.mark.parametrize("n_tri", [40, 700])
def test_cluster_matches_brute(n_tri, rng_np):
    scene = random_soup_scene(n_tri, build_bvh=True)
    N = 3 * BLOCK - 28  # deliberately not a BLOCK multiple
    ro, rd = _rays(rng_np, N)
    tmin = jnp.full(N, 1e-4)
    tmax = jnp.full(N, jnp.inf)

    t_ref, prim_ref, found_ref = _brute_reference(scene, ro, rd, tmin, tmax)

    Np, ro_p, rd_p, tmin_p, tmax_p = _pad_rays(ro, rd, tmin, tmax, BLOCK)
    t, u, v, prim = _run(scene, ro_p, rd_p, tmin_p, tmax_p, any_hit=False)
    t, prim = np.asarray(t)[:N], np.asarray(prim)[:N]

    np.testing.assert_array_equal(prim, prim_ref)
    hit = found_ref
    # kernel uses VPU FMA chains, brute uses 6-pass matmuls: identical
    # semantics, last-ulp f32 rounding differences
    np.testing.assert_allclose(t[hit], t_ref[hit], rtol=2e-5, atol=2e-5)
    assert np.all(t[~hit] >= 1e37)


def test_cluster_any_hit(rng_np):
    scene = random_soup_scene(300, build_bvh=True)
    N = 2 * BLOCK
    ro, rd = _rays(rng_np, N)
    tmin = jnp.full(N, 1e-4)
    tmax = jnp.asarray(rng_np.uniform(1.0, 25.0, N), jnp.float32)

    _, _, _, ok = _tri_uvt(scene.geometry, ro, rd, tmin, tmax, scene.meta.n_tri)
    occ_ref = np.asarray(ok).any(axis=1)

    Np, ro_p, rd_p, tmin_p, tmax_p = _pad_rays(ro, rd, tmin, tmax, BLOCK)
    occ = _run(scene, ro_p, rd_p, tmin_p, tmax_p, any_hit=True)
    np.testing.assert_array_equal(np.asarray(occ)[:N], occ_ref)


def test_cluster_respects_tmax(rng_np):
    """Finite tmax (shadow-ray style): hits beyond tmax must not count."""
    scene = random_soup_scene(200, build_bvh=True)
    N = BLOCK
    ro, rd = _rays(rng_np, N)
    tmin = jnp.full(N, 1e-4)
    tmax = jnp.full(N, 8.0)

    t_ref, prim_ref, _ = _brute_reference(scene, ro, rd, tmin, tmax)
    t, _, _, prim = _run(scene, ro, rd, tmin, tmax, any_hit=False)
    np.testing.assert_array_equal(np.asarray(prim), prim_ref)
