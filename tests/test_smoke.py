"""End-to-end smoke tests: tiny renders with analytically known answers."""

import numpy as np
import pytest

from take_tpu.render import render_image
from take_tpu.scene.types import RenderOptions

from tests.scenes import cornell_box, sphere_furnace


def test_empty_scene_returns_background():
    b = sphere_furnace()
    b._spheres.clear()  # leave only background
    scene = b.build()
    img = render_image(scene, RenderOptions(spp=2, max_depth=2))
    assert img.shape == (32, 32, 3)
    np.testing.assert_allclose(img, 1.0, atol=1e-5)


def test_furnace_sphere():
    """Diffuse convex sphere under constant env: L = albedo * bg."""
    scene = sphere_furnace(albedo=0.5).build()
    img = render_image(scene, RenderOptions(spp=64, max_depth=4, seed=7))
    # center pixel looks straight at the sphere
    center = img[14:18, 14:18].mean(axis=(0, 1))
    np.testing.assert_allclose(center, 0.5, rtol=0.05)
    # corners see pure background
    corner = img[0, 0]
    np.testing.assert_allclose(corner, 1.0, atol=1e-5)


def test_cornell_smoke():
    scene = cornell_box(width=32, height=32).build()
    img = render_image(scene, RenderOptions(spp=8, max_depth=3, seed=3))
    assert np.isfinite(img).all()
    assert img.max() > 0.1  # something is lit
    assert img.min() >= 0.0
    # red wall on the left, green on the right (y-flipped image, x unchanged)
    mid = img[16]
    left, right = mid[2], mid[29]
    assert left[0] > left[1], f"left wall should be red-ish, got {left}"
    assert right[1] > right[0], f"right wall should be green-ish, got {right}"


def test_determinism_same_seed():
    scene = cornell_box(width=16, height=16).build()
    a = render_image(scene, RenderOptions(spp=4, max_depth=2, seed=11))
    bimg = render_image(scene, RenderOptions(spp=4, max_depth=2, seed=11))
    np.testing.assert_array_equal(a, bimg)


def test_different_seed_differs():
    scene = cornell_box(width=16, height=16).build()
    a = render_image(scene, RenderOptions(spp=4, max_depth=2, seed=1))
    bimg = render_image(scene, RenderOptions(spp=4, max_depth=2, seed=2))
    assert not np.array_equal(a, bimg)
