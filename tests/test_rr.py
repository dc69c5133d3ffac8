"""Russian roulette (RenderOptions.rr_depth — round 5, off by default).

The reference has no RR (path_tracing.h:20-109), so rr_depth = -1 is the
parity default; with it enabled the estimator must stay unbiased and every
driver must kill the same paths (the survival draw is keyed on the
counter-based stream, not on lane position).
"""

import numpy as np
import jax
import jax.numpy as jnp

from take_tpu.core import rng as R
from take_tpu.core.camera import generate_rays
from take_tpu.integrator.path_tracer import trace_mis, trace_mis_replay
from take_tpu.integrator.wavefront import trace_wavefront
from take_tpu.scene.types import RenderOptions

from tests.scenes import cornell_box


def _batch(scene, spp=8, seed=0):
    cam = scene.meta.camera
    n = cam.width * cam.height
    pix = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, spp)
    ).reshape(-1)
    samp = jnp.broadcast_to(
        jnp.arange(spp, dtype=jnp.int32)[None, :], (n, spp)
    ).reshape(-1)
    streams = R.make_stream(seed, pix, samp)
    jx = R.uniform(streams, R.camera_counter(R.DIM_CAMERA_JITTER_X))
    jy = R.uniform(streams, R.camera_counter(R.DIM_CAMERA_JITTER_Y))
    px = (pix % cam.width).astype(jnp.float32)
    py = (pix // cam.width).astype(jnp.float32)
    ro, rd = generate_rays(cam, px, py, jx, jy)
    return pix, samp, streams, ro, rd


def test_rr_unbiased_mean():
    scene = cornell_box(width=16, height=16).build()
    pix, samp, streams, ro, rd = _batch(scene, spp=256)
    base = RenderOptions(spp=1, max_depth=8)
    rr = RenderOptions(spp=1, max_depth=8, rr_depth=2)
    a = np.asarray(jax.jit(
        lambda s: trace_mis(s, base, ro, rd, streams))(scene))
    b = np.asarray(jax.jit(
        lambda s: trace_mis(s, rr, ro, rd, streams))(scene))
    # same RNG, so the first rr_depth bounces agree exactly; the tail is
    # an unbiased reweighting — image means must agree within MC noise
    ma, mb = a.mean(), b.mean()
    assert abs(ma - mb) / ma < 0.03, (ma, mb)
    # RR must actually fire (variance strictly higher with the same seeds)
    assert not np.array_equal(a, b)


def test_rr_driver_parity():
    scene = cornell_box(width=8, height=8).build()
    pix, samp, streams, ro, rd = _batch(scene, spp=4, seed=3)
    opts = RenderOptions(spp=1, max_depth=6, rr_depth=2, seed=3)
    a = jax.jit(lambda s: trace_mis(s, opts, ro, rd, streams))(scene)
    b = jax.jit(lambda s: trace_mis_replay(s, opts, ro, rd, streams))(scene)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # wavefront: same per-path kills via the logical bounce counter
    c = trace_wavefront(scene, opts, pix, samp, scene.meta.camera.width)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(c), rtol=2e-4, atol=2e-6
    )


def test_rr_replay_grad_finite_and_matches_ad():
    import dataclasses

    from take_tpu.grad import render_radiance

    scene = cornell_box(width=8, height=8).build()
    pix = jnp.arange(64, dtype=jnp.int32)

    def f(d, mode):
        o = RenderOptions(spp=1, max_depth=4, rr_depth=1, grad_mode=mode,
                          seed=7)
        attr = scene.materials.attr.at[0, 7:10].add(d)
        s = dataclasses.replace(
            scene,
            materials=dataclasses.replace(scene.materials, attr=attr),
        )
        return render_radiance(s, o, pix, jnp.int32(0), 32).mean()

    g_ad = float(jax.grad(lambda d: f(d, "ad"))(jnp.float32(0.0)))
    g_rp = float(jax.grad(lambda d: f(d, "replay"))(jnp.float32(0.0)))
    assert np.isfinite(g_ad) and abs(g_ad) > 1e-6
    np.testing.assert_allclose(g_rp, g_ad, rtol=1e-4, atol=1e-7)
