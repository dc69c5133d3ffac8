"""Wavefront-refill driver vs scan driver: exact per-path parity.

The refill driver recycles lanes into not-yet-started paths; per-path RNG
is keyed logically, per-path math is the shared phase helpers, and each
path owns a dedicated output slot — so its per-path radiance must be
BITWISE identical to trace_mis for any wave size."""

import numpy as np
import jax.numpy as jnp
import pytest

from take_tpu import config
from take_tpu.core import rng as rng_mod
from take_tpu.core.camera import generate_rays
from take_tpu.integrator.path_tracer import trace_mis
from take_tpu.integrator.wavefront import trace_wavefront
from take_tpu.scene.types import RenderOptions

from tests.scenes import cornell_box, sphere_furnace


def _assert_path_parity(got, ref):
    """Per-path comparison across two independently-fused XLA programs:
    almost every path must agree to the last ulp; a tiny number of paths
    may flip a measure-zero estimator decision (occlusion / lobe / box
    boundary) from 1-ulp FMA input differences and disagree discretely.
    Any structural bug disagrees on a large fraction instead."""
    exact = np.isclose(got, ref, rtol=1e-5, atol=1e-6)
    frac_bad = 1.0 - exact.mean()
    assert frac_bad < 0.005, f"{frac_bad:.4%} of elements differ"
    np.testing.assert_allclose(
        got.mean(axis=0), ref.mean(axis=0), rtol=1e-3)


def _paths(scene, spp):
    cam = scene.meta.camera
    W, H = cam.width, cam.height
    P = W * H * spp
    pix = jnp.tile(jnp.arange(W * H, dtype=jnp.int32), spp)
    samp = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), W * H)
    return pix, samp, W


def _scan_radiance(scene, options, pix, samp, width):
    streams = rng_mod.make_stream(options.seed, pix, samp)
    jx = rng_mod.uniform(
        streams, rng_mod.camera_counter(rng_mod.DIM_CAMERA_JITTER_X))
    jy = rng_mod.uniform(
        streams, rng_mod.camera_counter(rng_mod.DIM_CAMERA_JITTER_Y))
    px = (pix % width).astype(jnp.float32)
    py = (pix // width).astype(jnp.float32)
    ro, rd = generate_rays(scene.meta.camera, px, py, jx, jy)
    return trace_mis(scene, options, ro, rd, streams)


@pytest.mark.parametrize("depth,wave", [(4, 256), (11, 777)])
def test_wavefront_matches_scan_cbox(monkeypatch, depth, wave):
    scene = cornell_box(width=24, height=24).build()
    options = RenderOptions(spp=2, max_depth=depth, seed=3)
    pix, samp, W = _paths(scene, options.spp)

    ref = np.asarray(_scan_radiance(scene, options, pix, samp, W))
    monkeypatch.setattr(config, "WAVE_SIZE", wave)
    got = np.asarray(trace_wavefront(scene, options, pix, samp, W))
    _assert_path_parity(got, ref)


def test_wavefront_matches_scan_envscene(monkeypatch):
    scene = sphere_furnace(width=16, height=16).build()
    options = RenderOptions(spp=2, max_depth=6, seed=1)
    pix, samp, W = _paths(scene, options.spp)
    ref = np.asarray(_scan_radiance(scene, options, pix, samp, W))
    monkeypatch.setattr(config, "WAVE_SIZE", 128)
    got = np.asarray(trace_wavefront(scene, options, pix, samp, W))
    _assert_path_parity(got, ref)


def test_wavefront_counts(monkeypatch):
    scene = cornell_box(width=16, height=16).build()
    options = RenderOptions(spp=4, max_depth=50, seed=0)
    pix, samp, W = _paths(scene, options.spp)
    monkeypatch.setattr(config, "WAVE_SIZE", 32)
    out, nominal, active = trace_wavefront(
        scene, options, pix, samp, W, with_counts=True)
    frac = float(active) / float(nominal)
    # the whole point: at depth 50 the refill wave stays nearly full
    # until the pool drains, where the scan driver's fraction would be
    # ~0.1; the residual waste is the un-refillable drain tail, which
    # shrinks as pool/wave grows (production: P ~ 2M, Q = 2^16)
    assert frac > 0.75, frac
    assert np.isfinite(np.asarray(out)).all()


def test_driver_policy_matrix():
    """The measured driver-policy matrix (render.use_wavefront_policy):
    wavefront for deep BVH / envmap / open-BVH scenes, scan elsewhere."""
    import dataclasses

    from take_tpu.render import use_wavefront_policy
    from take_tpu.scene.types import RenderOptions

    class M:  # minimal stand-ins for (scene.meta, scene.bvh)
        def __init__(self, envmap=False, background=False):
            self.has_envmap = envmap
            self.has_background = background

    class S:
        def __init__(self, bvh, envmap=False, background=False):
            self.bvh = object() if bvh else None
            self.meta = M(envmap, background)

    o = lambda d, integ="mis": RenderOptions(
        spp=1, max_depth=d, integrator=integ)

    # closed interior (room-like): scan at d6, wavefront at d8+
    assert not use_wavefront_policy(S(bvh=True), o(6))
    assert use_wavefront_policy(S(bvh=True), o(8))
    # open BVH scene (textured-like): wavefront from d3
    assert not use_wavefront_policy(S(bvh=True, background=True), o(2))
    assert use_wavefront_policy(S(bvh=True, background=True), o(3))
    # envmap scene (ibl-like, brute): wavefront from d2
    assert use_wavefront_policy(S(bvh=False, envmap=True), o(2))
    # brute closed scene (cbox-like): scan at any depth
    assert not use_wavefront_policy(S(bvh=False), o(50))
    # explicit driver selection always wins / other integrators opt out
    assert use_wavefront_policy(S(bvh=False), o(1, "mis_wavefront"))
    assert not use_wavefront_policy(S(bvh=True), o(50, "mis_replay"))


def test_has_background_from_parsed_scenes():
    """The policy's static scene fact comes through the XML parser/builder:
    cornell boxes are closed (bg 0), the builder records nonzero bg."""
    import numpy as np

    from take_tpu.scene.build import SceneBuilder
    from take_tpu.core.camera import Camera
    from take_tpu.scene.types import MAT_DIFFUSE

    s = cornell_box(8, 8).build()
    assert s.meta.has_background is False

    b = SceneBuilder()
    b.camera = Camera(8, 8, (0, 0, 3), (0, 0, 0), (0, 1, 0), 45.0)
    b.background = np.array([0.05, 0.05, 0.08])
    b.add_sphere((0, 0, 0), 1.0,
                 b.add_material(MAT_DIFFUSE, tex_value=(0.5,) * 3))
    assert b.build().meta.has_background is True
