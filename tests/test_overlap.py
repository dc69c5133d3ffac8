"""Banded-overlap gradient reduction (parallel/overlap.py) vs the
monolithic sharded gradient: same loss, same grads (up to band-sum
re-association), at 1 and 8 devices."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from take_tpu.grad import render_loss_grad
from take_tpu.parallel.overlap import banded_loss_grad
from take_tpu.parallel.sharding import AXIS
from take_tpu.scene.types import RenderOptions

from tests.scenes import cornell_box


@pytest.mark.parametrize("n_dev,n_bands", [(1, 4), (8, 2)])
def test_banded_grad_matches_monolithic(n_dev, n_bands):
    scene = cornell_box(width=16, height=16).build()
    options = RenderOptions(spp=1, max_depth=2, seed=3)
    N = 256
    pix = jnp.arange(N, dtype=jnp.int32)
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)

    loss_ref, g_ref = render_loss_grad(scene, options, pix, target, 1)

    mesh = Mesh(np.array(jax.devices()[:n_dev]), (AXIS,))
    sh = NamedSharding(mesh, P(AXIS))
    pix_s = jax.device_put(pix, sh)
    tgt_s = jax.device_put(target, sh)
    scene_s = jax.device_put(scene, NamedSharding(mesh, P()))

    loss_b, g_b = banded_loss_grad(
        scene_s, options, pix_s, tgt_s, n_bands, mesh)

    np.testing.assert_allclose(float(loss_b), float(loss_ref), rtol=1e-5)
    ref_leaves = jax.tree_util.tree_leaves(g_ref)
    band_leaves = jax.tree_util.tree_leaves(g_b)
    ref_f = [x for x in ref_leaves
             if hasattr(x, "dtype") and x.dtype == jnp.float32]
    band_f = [x for x in band_leaves
              if hasattr(x, "dtype") and x.dtype == jnp.float32]
    assert len(ref_f) == len(band_f)
    for a, b in zip(ref_f, band_f):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6)
