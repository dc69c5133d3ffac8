"""Environment light (IBL): alias tables, mapping, and integrator MIS.

The env furnace is the sharpest test: with a CONSTANT env map, NEE-env +
BSDF-miss MIS weights must sum to exactly 1 — any double counting or
missing weight shows up as a biased furnace.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from take_tpu.lights.envmap import (
    build_alias_table,
    build_envmap,
    envmap_eval,
    envmap_pdf,
    envmap_sample,
)
from take_tpu.render import render_image
from take_tpu.scene.build import SceneBuilder
from take_tpu.scene.types import MAT_DIFFUSE, RenderOptions
from take_tpu.core.camera import Camera


def test_alias_table_distribution(rng_np):
    w = np.array([1.0, 2.0, 3.0, 4.0])
    prob, alias = build_alias_table(w)
    n = 400_000
    u1 = rng_np.random(n)
    u2 = rng_np.random(n)
    slot = np.minimum((u1 * 4).astype(int), 3)
    take_alias = u2 > prob[slot]
    pick = np.where(take_alias, alias[slot], slot)
    counts = np.bincount(pick, minlength=4) / n
    np.testing.assert_allclose(counts, w / w.sum(), atol=5e-3)


def test_envmap_pdf_integrates_to_one(rng_np):
    img = rng_np.random((32, 64, 3)).astype(np.float32) + 0.05
    env = build_envmap(img)
    n = 400_000
    z = 1 - 2 * rng_np.random(n)
    phi = 2 * np.pi * rng_np.random(n)
    s = np.sqrt(np.clip(1 - z * z, 0, 1))
    d = jnp.asarray(np.stack([s * np.cos(phi), s * np.sin(phi), z], -1),
                    jnp.float32)
    pdf = np.asarray(envmap_pdf(env, d))
    np.testing.assert_allclose(pdf.mean() * 4 * np.pi, 1.0, rtol=0.02)


def test_envmap_sample_matches_pdf(rng_np):
    """Importance sampling actually concentrates on the bright texel."""
    img = np.full((16, 32, 3), 0.01, np.float32)
    img[4, 7] = 50.0  # one bright texel
    env = build_envmap(img)
    n = 100_000
    u = [jnp.asarray(rng_np.random(n), jnp.float32) for _ in range(3)]
    d, pdf = envmap_sample(env, *u)
    # nearly all samples land inside the bright texel's 3x3 sampling
    # neighborhood (the alias table is built over dilated luminance)
    Li = np.asarray(envmap_eval(env, d))
    pdfs = np.asarray(pdf)
    uniform_pdf = 1.0 / (4 * np.pi)
    assert (pdfs > 3 * uniform_pdf).mean() > 0.9
    # estimator of total env power: E[L/pdf]/(4pi-ish) is consistent
    est = (np.asarray(Li[:, 0]) / np.maximum(np.asarray(pdf), 1e-12)).mean()
    # reference: uniform-sphere quadrature of the SAME bilinear eval
    # (the importance estimator integrates the filtered map, not raw texels)
    rng2 = np.random.default_rng(999)
    m = 2_000_000
    z = 1 - 2 * rng2.random(m)
    phi = 2 * np.pi * rng2.random(m)
    sq = np.sqrt(np.clip(1 - z * z, 0, 1))
    du = jnp.asarray(np.stack([sq * np.cos(phi), sq * np.sin(phi), z], -1),
                     jnp.float32)
    ref = float(np.asarray(envmap_eval(env, du))[:, 0].mean() * 4 * np.pi)
    np.testing.assert_allclose(est, ref, rtol=0.05)


def test_envmap_round_trip_direction():
    img = np.ones((8, 16, 3), np.float32)
    env = build_envmap(img)
    d = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]],
                    jnp.float32)
    val = np.asarray(envmap_eval(env, d))
    np.testing.assert_allclose(val, 1.0, atol=1e-5)


def _env_furnace_scene(albedo=0.5, env_value=1.0, h=8, w=16):
    b = SceneBuilder()
    b.camera = Camera(16, 16, (0, 0, 3), (0, 0, 0), (0, 1, 0), 45.0)
    m = b.add_material(MAT_DIFFUSE, tex_value=(albedo,) * 3)
    b.add_sphere((0, 0, 0), 1.0, m)
    b.envmap = build_envmap(np.full((h, w, 3), env_value, np.float32))
    b.background = np.zeros(3)  # ignored when envmap present
    return b.build()


def test_env_furnace():
    """Constant env + diffuse sphere: center == albedo * env, corner == env.
    Verifies the NEE-env/BSDF-miss MIS partition sums to one."""
    scene = _env_furnace_scene(albedo=0.5)
    assert scene.meta.has_envmap
    img = render_image(scene, RenderOptions(spp=256, max_depth=4, seed=4))
    center = img[6:10, 6:10].mean()
    corner = img[0, 0].mean()
    np.testing.assert_allclose(corner, 1.0, atol=1e-3)
    np.testing.assert_allclose(center, 0.5, rtol=0.04)


def test_env_plus_area_light():
    """Env light + area light coexist; both contribute."""
    b = SceneBuilder()
    b.camera = Camera(16, 16, (0.5, 0.5, 1.4), (0.5, 0.5, 0), (0, 1, 0), 33.0)
    white = b.add_material(MAT_DIFFUSE, tex_value=(0.7, 0.7, 0.7))
    black = b.add_material(MAT_DIFFUSE, tex_value=(0, 0, 0))
    floor = np.array([[0, 0, 0], [1, 0, 0], [1, 0, -1], [0, 0, -1]], float)
    idx = np.array([[0, 1, 2], [0, 2, 3]])
    b.add_mesh(floor, idx, white)
    b.add_mesh(
        floor + [0, 0.9, 0], idx[:, ::-1], black, emission=(5.0, 5.0, 5.0)
    )
    b.envmap = build_envmap(np.full((8, 16, 3), 0.2, np.float32))
    scene_both = b.build()
    img = render_image(scene_both, RenderOptions(spp=128, max_depth=3, seed=2))
    assert np.isfinite(img).all()
    assert img.mean() > 0.1
