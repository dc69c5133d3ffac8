"""Fused Pallas brute-force sweep (geometry/pallas_brute.py): interpret-mode
correctness vs the XLA brute path on a real parsed scene — the same pairing
the hybrid custom_vjp relies on (Pallas primal / XLA backward)."""

import os

import numpy as np
import jax.numpy as jnp

from take_tpu.geometry.intersect import (
    _brute_force_intersect,
    _merge_and_shade,
    _tri_uvt,
)
from take_tpu.geometry.pallas_brute import (
    BLOCK,
    pallas_tri_occluded,
    pallas_tri_sweep,
)
from take_tpu.scene.parse_xml import parse_scene_file

CBOX = os.path.join(
    os.path.dirname(__file__), "..", "scenes", "cbox", "cbox.xml"
)


def _rays(scene, rng_np, N):
    lo = np.array([-400.0, -100.0, -400.0])
    hi = np.array([400.0, 600.0, 400.0])
    ro = jnp.asarray(rng_np.uniform(lo, hi, (N, 3)), jnp.float32)
    d = rng_np.normal(size=(N, 3))
    rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    return ro, rd


def test_sweep_matches_xla_brute(rng_np):
    scene = parse_scene_file(CBOX)
    N = 2 * BLOCK
    ro, rd = _rays(scene, rng_np, N)
    tmin = jnp.full(N, 1e-4)
    tmax = jnp.full(N, jnp.inf)

    ref = _brute_force_intersect(scene, ro, rd, tmin, tmax)
    attrs, t, u, v, found = pallas_tri_sweep(
        scene.geometry, scene.meta.n_tri, ro, rd, tmin, tmax, interpret=True
    )
    hit = _merge_and_shade(scene, ro, rd, tmin, tmax,
                           jnp.where(found, t, 3.4e38), found, attrs, u, v)

    np.testing.assert_array_equal(np.asarray(hit.valid), np.asarray(ref.valid))
    sel = np.asarray(ref.valid)
    for field in ("t", "pos", "geo_n", "sh_n", "uv", "emit", "light_geom"):
        np.testing.assert_allclose(
            np.asarray(getattr(hit, field))[sel],
            np.asarray(getattr(ref, field))[sel],
            rtol=2e-4, atol=2e-3, err_msg=field,
        )
    for field in ("mat_id", "light_id", "front"):
        np.testing.assert_array_equal(
            np.asarray(getattr(hit, field))[sel],
            np.asarray(getattr(ref, field))[sel],
            err_msg=field,
        )


def test_occluded_matches_xla_brute(rng_np):
    scene = parse_scene_file(CBOX)
    N = BLOCK
    ro, rd = _rays(scene, rng_np, N)
    tmin = jnp.full(N, 1e-4)
    # finite range exercises the tmax clamp the shadow rays rely on
    tmax = jnp.asarray(rng_np.uniform(10.0, 2000.0, N), jnp.float32)

    ref = jnp.any(
        _tri_uvt(scene.geometry, ro, rd, tmin, tmax, scene.meta.n_tri)[3],
        axis=1,
    )
    occ = pallas_tri_occluded(
        scene.geometry, scene.meta.n_tri, ro, rd, tmin, tmax, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref))
