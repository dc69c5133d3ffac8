"""Multi-device invariance on the virtual 8-device CPU mesh (SURVEY §4.4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from take_tpu.parallel.sharding import make_mesh, render_image_sharded, shard_scene
from take_tpu.render import render_image
from take_tpu.scene.types import RenderOptions

from tests.scenes import cornell_box


@pytest.fixture(scope="module")
def scene():
    return cornell_box(width=16, height=16).build()


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_render_matches_single_device(scene):
    opts = RenderOptions(spp=8, max_depth=3, seed=21)
    single = render_image(scene, opts)
    mesh8 = make_mesh(8)
    sharded = render_image_sharded(scene, opts, mesh8)
    np.testing.assert_array_equal(single, sharded)


def test_device_count_invariance(scene):
    opts = RenderOptions(spp=4, max_depth=2, seed=5)
    img2 = render_image_sharded(scene, opts, make_mesh(2))
    img8 = render_image_sharded(scene, opts, make_mesh(8))
    np.testing.assert_array_equal(img2, img8)


def test_sharded_gradients_match(scene):
    """Gradient of a sharded loss == single-device gradient (psum path)."""
    from take_tpu.grad import render_radiance

    opts = RenderOptions(spp=1, max_depth=2, seed=3)
    pix = jnp.arange(256, dtype=jnp.int32)

    def loss(s, pix):
        img = render_radiance(s, opts, pix, jnp.int32(0), 4)
        return jnp.mean(img)

    g_single = jax.grad(loss, allow_int=True)(scene, pix)

    mesh = make_mesh(8)
    s_repl = shard_scene(scene, mesh)
    pix_sharded = jax.device_put(pix, NamedSharding(mesh, P("rays")))
    g_sharded = jax.jit(jax.grad(loss, allow_int=True))(s_repl, pix_sharded)

    a = np.asarray(g_single.materials.attr)
    b = np.asarray(g_sharded.materials.attr)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
    c = np.asarray(g_single.lights.attr)
    d = np.asarray(g_sharded.lights.attr)
    np.testing.assert_allclose(c, d, rtol=1e-5, atol=1e-7)


def test_sharded_wavefront_matches_single_device():
    """The depth-gated default routes deep BVH renders through the
    lane-refill wavefront driver (render.py policy); its internal
    cumsum/scatter refill machinery must partition correctly under GSPMD.
    Compare an 8-device sharded render against the single-device image on
    a BVH scene past the depth gate."""
    import numpy as np
    from take_tpu.render import render_image
    from take_tpu.scene.types import RenderOptions

    from tests.test_bvh import random_soup_scene

    scene = random_soup_scene(700, build_bvh=True)
    assert scene.bvh is not None
    opts = RenderOptions(spp=2, max_depth=9, seed=5)  # >= 8 -> wavefront
    single = render_image(scene, opts)
    img8 = render_image_sharded(scene, opts, make_mesh(8))
    # two independently partitioned programs: tight-tolerance equality
    # (see integrator/wavefront.py docstring on XLA fusion and last-ulp)
    np.testing.assert_allclose(img8, single, rtol=1e-5, atol=1e-6)
