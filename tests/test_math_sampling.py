"""Unit tests for math primitives and sampling warps vs analytic answers."""

import numpy as np
import jax.numpy as jnp

from take_tpu.core.math import (
    C_PI,
    dot,
    luminance,
    normalize,
    reflect,
    srgb_to_linear,
    to_world,
)
from take_tpu.core.sampling import (
    sample_cos_power,
    sample_hemisphere_cos,
    sample_sphere_visible,
    sample_triangle,
)


def test_to_world_orthonormal_frame(rng_np):
    n = normalize(jnp.asarray(rng_np.normal(size=(500, 3))))
    # frame axes: images of e1, e2, e3
    ex = to_world(n, jnp.broadcast_to(jnp.array([1.0, 0, 0]), n.shape))
    ey = to_world(n, jnp.broadcast_to(jnp.array([0, 1.0, 0]), n.shape))
    ez = to_world(n, jnp.broadcast_to(jnp.array([0, 0, 1.0]), n.shape))
    # f32 tolerance: the Frisvad construction loses ~1e-4 near nz = -1
    np.testing.assert_allclose(np.asarray(dot(ez, n)), 1.0, atol=1e-4)
    for a, b in [(ex, ey), (ex, ez), (ey, ez)]:
        np.testing.assert_allclose(np.asarray(dot(a, b)), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dot(ex, ex)), 1.0, atol=1e-4)


def test_to_world_singular_branch():
    n = jnp.array([[0.0, 0.0, -1.0]])
    v = jnp.array([[0.3, 0.4, 0.866]])
    out = to_world(n, v)
    assert np.isfinite(np.asarray(out)).all()
    # z-component maps along n
    np.testing.assert_allclose(
        np.asarray(dot(out, n))[0], 0.866, atol=1e-6
    )


def test_reflect():
    d_in = normalize(jnp.array([[1.0, 1.0, 0.0]]))
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = reflect(d_in, n)
    np.testing.assert_allclose(
        np.asarray(r)[0], [-0.70710678, 0.70710678, 0.0], atol=1e-6
    )


def test_luminance():
    np.testing.assert_allclose(
        float(luminance(jnp.array([1.0, 1.0, 1.0]))), 1.0, atol=1e-5
    )


def test_srgb_roundtrip_values():
    # spot values of the sRGB EOTF
    np.testing.assert_allclose(float(srgb_to_linear(0.0)), 0.0, atol=1e-7)
    np.testing.assert_allclose(float(srgb_to_linear(1.0)), 1.0, atol=1e-6)
    np.testing.assert_allclose(
        float(srgb_to_linear(0.5)), 0.21404114, atol=1e-6
    )


def test_cosine_hemisphere_moments(rng_np):
    u1 = jnp.asarray(rng_np.random(200_000))
    u2 = jnp.asarray(rng_np.random(200_000))
    d = np.asarray(sample_hemisphere_cos(u1, u2))
    assert (d[:, 2] >= 0).all()
    # E[cos theta] under cos-weighted sampling = 2/3
    np.testing.assert_allclose(d[:, 2].mean(), 2.0 / 3.0, atol=3e-3)
    np.testing.assert_allclose(
        np.linalg.norm(d, axis=-1), 1.0, atol=1e-4
    )


def test_cos_power_moments(rng_np):
    alpha = 10.0
    u1 = jnp.asarray(rng_np.random(200_000))
    u2 = jnp.asarray(rng_np.random(200_000))
    d = np.asarray(sample_cos_power(u1, u2, jnp.full(200_000, alpha)))
    # pdf ∝ cos^alpha  =>  E[cos] = (alpha+1)/(alpha+2)
    np.testing.assert_allclose(
        d[:, 2].mean(), (alpha + 1) / (alpha + 2), atol=3e-3
    )


def test_triangle_warp_uniform(rng_np):
    u1 = jnp.asarray(rng_np.random(100_000))
    u2 = jnp.asarray(rng_np.random(100_000))
    b1, b2 = sample_triangle(u1, u2)
    b1, b2 = np.asarray(b1), np.asarray(b2)
    assert (b1 >= 0).all() and (b2 >= 0).all() and (b1 + b2 <= 1 + 1e-6).all()
    # uniform over the unit right triangle: E[b1] = E[b2] = 1/3
    np.testing.assert_allclose(b1.mean(), 1 / 3, atol=3e-3)
    np.testing.assert_allclose(b2.mean(), 1 / 3, atol=3e-3)


def test_sphere_visible_cap(rng_np):
    n = 50_000
    u1 = jnp.asarray(rng_np.random(n))
    u2 = jnp.asarray(rng_np.random(n))
    center = jnp.zeros((n, 3))
    radius = jnp.ones(n)
    ref = jnp.broadcast_to(jnp.array([0.0, 0.0, 5.0]), (n, 3))
    p, nrm = sample_sphere_visible(u1, u2, center, radius, ref)
    p, nrm = np.asarray(p), np.asarray(nrm)
    np.testing.assert_allclose(np.linalg.norm(p, axis=-1), 1.0, atol=1e-4)
    # all samples on the cap facing the reference point: z >= r/d = 0.2
    assert (p[:, 2] >= 0.2 - 1e-4).all()
    np.testing.assert_allclose(nrm, p, atol=1e-4)
