"""Gradient correctness: AD through the wavefront integrator vs finite
differences and vs analytic answers (BASELINE 'pixel-grad max abs err')."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from take_tpu.grad import render_radiance
from take_tpu.scene.types import RenderOptions

from tests.scenes import cornell_box, sphere_furnace


def _center_pixels(scene, k=2):
    cam = scene.meta.camera
    W, H = cam.width, cam.height
    ys, xs = np.meshgrid(
        np.arange(H // 2 - k, H // 2 + k), np.arange(W // 2 - k, W // 2 + k)
    )
    return jnp.asarray((ys * W + xs).ravel(), jnp.int32)


def _with_albedo(scene, mat_id, value):
    from take_tpu.scene.edit import with_material_reflectance

    return with_material_reflectance(scene, mat_id, value)


def test_furnace_albedo_grad_analytic():
    """Furnace sphere: center radiance == albedo -> d/d(albedo) == 1."""
    scene = sphere_furnace(albedo=0.5, width=16, height=16).build()
    pix = _center_pixels(scene, k=1)
    options = RenderOptions(spp=1, max_depth=6, seed=3)

    def f(a):
        s = _with_albedo(scene, 0, jnp.stack([a, a, a]))
        img = render_radiance(s, options, pix, jnp.int32(0), 64)
        return img.mean()

    val, g = jax.value_and_grad(f)(jnp.float32(0.5))
    # L = a*bg at the first bounce, higher orders vanish on a convex body
    np.testing.assert_allclose(float(val), 0.5, rtol=0.05)
    np.testing.assert_allclose(float(g), 1.0, rtol=0.08)


def test_cbox_albedo_grad_matches_fd():
    """Cornell wall albedo gradient vs central finite differences with
    common random numbers (same seed => same paths => FD is exact up to
    second order)."""
    scene = cornell_box(width=16, height=16).build()
    pix = _center_pixels(scene, k=2)
    options = RenderOptions(spp=1, max_depth=3, seed=11)
    n_samples = 128

    def f(delta):
        from take_tpu.scene import types as _T
        base = scene.materials.attr[0, _T.MATTR_TEX_VALUE : _T.MATTR_TEX_VALUE + 3]  # white walls
        s = _with_albedo(scene, 0, base + delta)
        img = render_radiance(s, options, pix, jnp.int32(0), n_samples)
        return img.mean()

    g = jax.grad(lambda d: f(jnp.stack([d, d, d])))(jnp.float32(0.0))
    eps = 3e-3
    fd = (f(jnp.full(3, eps)) - f(jnp.full(3, -eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=0.03, atol=1e-4)


def test_emission_grad_matches_fd():
    scene = cornell_box(width=16, height=16).build()
    pix = _center_pixels(scene, k=2)
    options = RenderOptions(spp=1, max_depth=2, seed=7)

    def f(scale):
        from take_tpu.scene.edit import with_light_intensity_scale

        s = with_light_intensity_scale(scene, scale)
        img = render_radiance(s, options, pix, jnp.int32(0), 64)
        return img.mean()

    val, g = jax.value_and_grad(f)(jnp.float32(1.0))
    # radiance is LINEAR in emission (depth-2 paths see the light once):
    # f(s) = s * f(1) => f'(1) == f(1)
    np.testing.assert_allclose(float(g), float(val), rtol=1e-3)


def test_grad_finite_everywhere():
    """No NaN/inf in gradients of any differentiable scene array."""
    scene = cornell_box(width=8, height=8).build()
    pix = jnp.arange(64, dtype=jnp.int32)
    options = RenderOptions(spp=1, max_depth=3, seed=1)

    def loss(s):
        img = render_radiance(s, options, pix, jnp.int32(0), 8)
        return jnp.sum(img)

    g = jax.grad(loss, allow_int=True)(scene)
    leaves, _ = jax.tree_util.tree_flatten(g)
    for leaf in leaves:
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert np.isfinite(np.asarray(leaf)).all()


def test_bvh_scene_grads_flow():
    """BVH scenes are differentiable: traversal is detached (while_loop /
    Pallas are primal-only) but emission still flows through the attribute
    gather, exactly like the brute path's scope."""
    from take_tpu.scene.edit import with_light_intensity_scale

    scene = cornell_box(width=8, height=8).build(build_bvh=True)
    assert scene.bvh is not None
    pix = _center_pixels(scene, k=2)
    options = RenderOptions(spp=1, max_depth=2, seed=7)

    def f(scale):
        s = with_light_intensity_scale(scene, scale)
        img = render_radiance(s, options, pix, jnp.int32(0), 32)
        return img.mean()

    val, g = jax.value_and_grad(f)(jnp.float32(1.0))
    # linear in emission at depth 2 => f'(1) == f(1), and both positive
    assert float(val) > 0
    np.testing.assert_allclose(float(g), float(val), rtol=1e-3)
