"""Early-exit while-loop driver + path-replay VJP vs the lax.scan reference.

trace_mis_replay must be the SAME estimator as trace_mis (identical RNG
keys, identical per-bounce math) — primal equality is bit-exact. Gradients
come from the two-pass path-replay custom_vjp; since round 5 the suffix
radiance is computed exactly (stored per-bounce c/w stacks + reverse
fold), so replay matches AD-of-scan on EVERY parameter, including
exactly-zero albedos — the case the old (L - A)/w quotient dropped
(caught by benchmarks/room_grad_fd.py on room's black emitter backing).
"""

import numpy as np
import jax
import jax.numpy as jnp

from take_tpu.core import rng as R
from take_tpu.core.camera import generate_rays
from take_tpu.grad import render_radiance
from take_tpu.integrator.path_tracer import trace_mis, trace_mis_replay
from take_tpu.scene.types import RenderOptions

from tests.scenes import cornell_box


def _camera_batch(scene, seed=0):
    cam = scene.meta.camera
    n = cam.width * cam.height
    pix = jnp.arange(n, dtype=jnp.int32)
    streams = R.make_stream(seed, pix, 0)
    jx = R.uniform(streams, R.camera_counter(R.DIM_CAMERA_JITTER_X))
    jy = R.uniform(streams, R.camera_counter(R.DIM_CAMERA_JITTER_Y))
    px = (pix % cam.width).astype(jnp.float32)
    py = (pix // cam.width).astype(jnp.float32)
    ro, rd = generate_rays(cam, px, py, jx, jy)
    return ro, rd, streams, n


def test_replay_primal_bitexact():
    scene = cornell_box(width=16, height=16).build()
    ro, rd, streams, _ = _camera_batch(scene)
    opts = RenderOptions(spp=1, max_depth=4)
    a = jax.jit(lambda s: trace_mis(s, opts, ro, rd, streams))(scene)
    b = jax.jit(lambda s: trace_mis_replay(s, opts, ro, rd, streams))(scene)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_replay_grads_match_ad():
    scene = cornell_box(width=8, height=8).build()
    ro, rd, streams, n = _camera_batch(scene)
    opts = RenderOptions(spp=1, max_depth=3)
    w_im = jax.random.normal(jax.random.PRNGKey(0), (n, 3))

    g_ad = jax.grad(
        lambda s: jnp.sum(trace_mis(s, opts, ro, rd, streams) * w_im),
        allow_int=True,
    )(scene)
    g_rp = jax.grad(
        lambda s: jnp.sum(trace_mis_replay(s, opts, ro, rd, streams) * w_im),
        allow_int=True,
    )(scene)

    # every parameter must match — INCLUDING the exactly-zero albedo of
    # the black light material (exact-suffix replay, round 5)
    flat_ad = jax.tree_util.tree_leaves_with_path(g_ad)
    flat_rp = jax.tree_util.tree_leaves(g_rp)
    for (path, a), b in zip(flat_ad, flat_rp):
        if not hasattr(a, "dtype") or a.dtype == jax.dtypes.float0:
            continue
        a = np.asarray(a)
        b = np.asarray(b)
        name = jax.tree_util.keystr(path)
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(
            a, b, atol=1e-5 * scale, err_msg=f"grad mismatch in {name}"
        )


def test_black_albedo_grad_matches_fd():
    """The albedo gradient of an exactly-black material: nonzero (one-sided
    FD) and identical between replay and AD. Regression for the
    suffix-quotient dropout found at room scale (the emitter-backing
    material read grad 0 through replay while AD matched FD)."""
    import dataclasses

    scene = cornell_box(width=8, height=8).build()
    albedo = np.asarray(scene.materials.attr)[:, 7:10]
    black_rows = np.where(np.all(albedo == 0.0, axis=1))[0]
    assert black_rows.size, "cornell box must carry a black light material"
    m = int(black_rows[0])
    pix = jnp.arange(64, dtype=jnp.int32)
    opts = RenderOptions(spp=1, max_depth=3, seed=2)

    def f(d, mode):
        o = dataclasses.replace(opts, grad_mode=mode)
        attr = scene.materials.attr.at[m, 7:10].add(d)
        s = dataclasses.replace(
            scene,
            materials=dataclasses.replace(scene.materials, attr=attr),
        )
        return render_radiance(s, o, pix, jnp.int32(0), 64).mean()

    g_rp = float(jax.grad(lambda d: f(d, "replay"))(jnp.float32(0.0)))
    g_ad = float(jax.grad(lambda d: f(d, "ad"))(jnp.float32(0.0)))
    np.testing.assert_allclose(g_rp, g_ad, rtol=1e-4, atol=1e-7)
    # one-sided FD (albedo cannot go negative) with common random numbers
    eps = 2e-2
    fd = (float(f(jnp.float32(eps), "ad")) - float(f(0.0, "ad"))) / eps
    assert abs(fd) > 1e-5, "black albedo must be visible in this scene"
    np.testing.assert_allclose(g_ad, fd, rtol=0.08, atol=1e-5)


def test_replay_via_render_radiance():
    """grad_mode='replay' is exposed through the public gradient API."""
    scene = cornell_box(width=8, height=8).build()
    pix = jnp.arange(64, dtype=jnp.int32)
    for mode in ("ad", "replay"):
        opts = RenderOptions(spp=1, max_depth=2, grad_mode=mode)
        img = render_radiance(scene, opts, pix, jnp.int32(0), 1)
        assert np.isfinite(np.asarray(img)).all()

    o_ad = RenderOptions(spp=1, max_depth=2, grad_mode="ad")
    o_rp = RenderOptions(spp=1, max_depth=2, grad_mode="replay")

    def loss(s, o):
        return jnp.mean(render_radiance(s, o, pix, jnp.int32(0), 2))

    g_ad = jax.grad(loss, allow_int=True)(scene, o_ad)
    g_rp = jax.grad(loss, allow_int=True)(scene, o_rp)
    a = np.asarray(g_ad.geometry.tri_attr)
    b = np.asarray(g_rp.geometry.tri_attr)
    np.testing.assert_allclose(a, b, atol=1e-6 * max(np.abs(a).max(), 1.0))


def test_replay_early_exit_semantics():
    """Estimator is depth-cap-exact: a cap deeper than the longest live path
    changes nothing (the while loop exits when the wave dies)."""
    scene = cornell_box(width=8, height=8, light_scale=0.3).build()
    ro, rd, streams, _ = _camera_batch(scene)
    # background zero + closed box: paths die only via pdf/miss; compare a
    # deep cap vs scan at the same cap for exactness at both ends
    a = jax.jit(
        lambda s: trace_mis_replay(
            s, RenderOptions(spp=1, max_depth=8), ro, rd, streams
        )
    )(scene)
    b = jax.jit(
        lambda s: trace_mis(
            s, RenderOptions(spp=1, max_depth=8), ro, rd, streams
        )
    )(scene)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
