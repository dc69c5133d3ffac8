"""Cluster-sweep kernel (pallas_sweep) vs brute force (interpret mode).

Same parity contract as the other two kernel backends: exact agreement with
the brute-force sweep (identical f32 Moeller-Trumbore semantics, lowest-prim
tie-breaking), plus any-hit consistency and tmax/dead-lane handling."""

import numpy as np
import jax.numpy as jnp
import pytest

from take_tpu.geometry.intersect import _pad_rays, _tri_uvt
from take_tpu.geometry.pallas_sweep import BLOCK, sweep_traverse
from take_tpu.geometry.pallas_traverse import prep_tables

from tests.test_bvh import random_soup_scene

_BIG = 3.4e38


def _brute(scene, ro, rd, tmin, tmax):
    t, u, v, ok = _tri_uvt(
        scene.geometry, ro, rd, tmin, tmax, scene.meta.n_tri
    )
    tm = np.asarray(jnp.where(ok, t, _BIG))
    prim = tm.argmin(axis=1)  # first occurrence = lowest prim on ties
    tbest = tm.min(axis=1)
    found = tbest < _BIG
    return tbest, np.where(found, prim, -1), found


def _rays(rng_np, N, spread=15.0):
    ro = jnp.asarray(rng_np.uniform(-spread, spread, (N, 3)), jnp.float32)
    d = rng_np.normal(size=(N, 3))
    rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True),
                     jnp.float32)
    return ro, rd


def _run(scene, ro_p, rd_p, tmin_p, tmax_p, any_hit):
    return sweep_traverse(
        scene.bvh.cl_aabb,
        prep_tables(scene)[1],
        ro_p, rd_p, tmin_p, tmax_p,
        n_tri=scene.meta.n_tri, any_hit=any_hit, interpret=True,
    )


@pytest.mark.parametrize("n_tri", [40, 700])
def test_sweep_matches_brute(n_tri, rng_np):
    scene = random_soup_scene(n_tri, build_bvh=True)
    N = 2 * BLOCK - 28  # deliberately not a BLOCK multiple
    ro, rd = _rays(rng_np, N)
    tmin = jnp.full(N, 1e-4)
    tmax = jnp.full(N, jnp.inf)

    t_ref, prim_ref, found_ref = _brute(scene, ro, rd, tmin, tmax)

    Np, ro_p, rd_p, tmin_p, tmax_p = _pad_rays(ro, rd, tmin, tmax, BLOCK)
    t, u, v, prim = _run(scene, ro_p, rd_p, tmin_p, tmax_p, any_hit=False)
    t, prim = np.asarray(t)[:N], np.asarray(prim)[:N]

    np.testing.assert_array_equal(prim, prim_ref)
    np.testing.assert_array_equal(t[found_ref], t_ref[found_ref])


def test_sweep_tmax_and_dead_lanes(rng_np):
    scene = random_soup_scene(300, build_bvh=True)
    N = BLOCK
    ro, rd = _rays(rng_np, N)
    tmin = jnp.full(N, 1e-4)
    tmax = jnp.asarray(rng_np.uniform(2.0, 40.0, N), jnp.float32)
    tmax = jnp.where(jnp.asarray(rng_np.uniform(size=N) < 0.25),
                     -_BIG, tmax)  # dead lanes

    t_ref, prim_ref, found_ref = _brute(scene, ro, rd, tmin, tmax)
    t, u, v, prim = _run(scene, ro, rd, tmin, tmax, any_hit=False)
    np.testing.assert_array_equal(np.asarray(prim), prim_ref)

    # any-hit: occluded exactly where a closest hit exists
    *_, prim_a = _run(scene, ro, rd, tmin, tmax, any_hit=True)
    np.testing.assert_array_equal(np.asarray(prim_a) >= 0, found_ref)
