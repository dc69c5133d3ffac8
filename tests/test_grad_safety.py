"""Unit tests for the round-4 grad-safe numeric helpers: each one must
produce the SAME primal as the naive form and a FINITE (zero) gradient at
the degenerate boundary where the naive form NaNs."""

import numpy as np
import jax
import jax.numpy as jnp

from take_tpu.core.math import normalize, safe_norm
from take_tpu.materials.disney import _ggx_D, _sqrt0


def test_safe_norm_matches_and_zero_grad_at_origin():
    x = jnp.asarray([[3.0, 4.0, 0.0], [0.0, 0.0, 0.0], [1e-20, 0.0, 0.0]])
    np.testing.assert_array_equal(
        np.asarray(safe_norm(x)), np.asarray(jnp.linalg.norm(x, axis=-1)))

    g = jax.grad(lambda v: safe_norm(v).sum())(x)
    assert np.isfinite(np.asarray(g)).all()
    # naive form NaNs at the origin row
    g_naive = jax.grad(lambda v: jnp.linalg.norm(v, axis=-1).sum())(x)
    assert np.isnan(np.asarray(g_naive)[1]).any()


def test_sqrt0_matches_and_zero_grad_at_zero():
    x = jnp.asarray([4.0, 1e-12, 0.0])
    np.testing.assert_array_equal(
        np.asarray(_sqrt0(x)), np.asarray(jnp.sqrt(x)))
    g = jax.grad(lambda v: _sqrt0(v).sum())(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(np.asarray(g)[2]) == 0.0
    g_naive = jax.grad(lambda v: jnp.sqrt(v).sum())(x)
    assert np.isinf(np.asarray(g_naive)[2])


def test_normalize_eps_grad_finite_at_zero_vector():
    x = jnp.asarray([[1.0, 2.0, 2.0], [0.0, 0.0, 0.0]])
    out = normalize(x, eps=1e-20)
    np.testing.assert_allclose(
        np.asarray(out)[0], [1 / 3, 2 / 3, 2 / 3], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out)[1], [0, 0, 0])
    g = jax.grad(lambda v: normalize(v, eps=1e-20).sum())(x)
    assert np.isfinite(np.asarray(g)).all()


def test_ggx_d_grad_finite_small_alpha_small_k():
    # near-grazing half vector + tiny roughness: the naive
    # 1/(pi ax ay k^2) underflows and NaNs under AD
    hl = jnp.asarray([[1e-3, 0.0, 0.9999], [0.0, 0.0, 1.0],
                      [0.5, 0.5, -0.1]])

    def f(a):
        return _ggx_D(hl, a, a).sum()

    for a0 in [1e-4, 1e-2, 0.5]:
        v, g = jax.value_and_grad(f)(jnp.float32(a0))
        assert np.isfinite(float(v)) and np.isfinite(float(g)), a0
    # backfacing row is exactly zero
    assert float(_ggx_D(hl, 0.1, 0.1)[2]) == 0.0
