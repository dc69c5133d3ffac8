"""Validation of the real Disney lobes (materials/disney.py).

Three invariant families, per lobe:
  1. pdf consistency: MC-integrating the claimed pdf over the sphere ~= the
     probability mass (1 for non-delta lobes, accounting for rejected dirs),
  2. sample/pdf agreement: histogram of sampled directions matches pdf,
  3. energy: E[eval / pdf] <= 1 (white furnace bound), and ~1 for
     reflective lobes with unit reflectance at grazing-free incidence.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from take_tpu.materials import disney
from take_tpu.materials.bsdf import ShadePoint
from take_tpu.scene.types import (
    MAT_DISNEY_BSDF,
    MAT_DISNEY_CLEARCOAT,
    MAT_DISNEY_GLASS,
    MAT_DISNEY_METAL,
    MAT_DISNEY_SHEEN,
)


def make_sp(n, refl=(1.0, 1.0, 1.0), roughness=0.5, anisotropic=0.0,
            eta=1.5, front=True, **kw):
    z = jnp.zeros(n)
    o = jnp.ones(n)
    params = dict(
        tag=jnp.zeros(n, jnp.int32),
        geo_n=jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3)),
        sh_n=jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3)),
        refl=jnp.broadcast_to(jnp.asarray(refl, jnp.float32), (n, 3)),
        eta=o * eta,
        exponent=o * 5.0,
        roughness=o * roughness,
        subsurface=z,
        anisotropic=o * anisotropic,
        metallic=z,
        spec_trans=z,
        specular=o * 0.5,
        specular_tint=z,
        sheen=z,
        sheen_tint=o * 0.5,
        clearcoat=z,
        clearcoat_gloss=o,
        front=jnp.full(n, front, bool),
    )
    params.update({k: o * v if not isinstance(v, bool) else jnp.full(n, v, bool)
                   for k, v in kw.items()})
    return ShadePoint(**params)


def incident_dirs(n, cos_theta=0.7):
    sin = np.sqrt(1 - cos_theta**2)
    d = np.tile([sin, 0.0, cos_theta], (n, 1)).astype(np.float32)
    return jnp.asarray(d)


N = 200_000


@pytest.mark.parametrize(
    "tag,kw",
    [
        (MAT_DISNEY_METAL, dict(roughness=0.3)),
        (MAT_DISNEY_METAL, dict(roughness=0.8, anisotropic=0.6)),
        (MAT_DISNEY_CLEARCOAT, dict(clearcoat_gloss=0.7)),
        (MAT_DISNEY_SHEEN, dict()),
        (MAT_DISNEY_GLASS, dict(roughness=0.4)),
        (MAT_DISNEY_BSDF, dict(roughness=0.4, metallic=0.3, sheen=0.5,
                               clearcoat=0.6, spec_trans=0.3)),
    ],
)
def test_sampling_energy_bound(tag, kw, rng_np):
    """E[eval/pdf] over own samples must be <= 1 (+ tolerance) — any lobe
    breaking this creates energy in the furnace test."""
    sp = make_sp(N, **kw)
    dir_in = incident_dirs(N)
    u = [jnp.asarray(rng_np.random(N), jnp.float32) for _ in range(4)]
    d, p = disney.sample(tag, sp, dir_in, u[0], u[1], u[2], u[3])
    f = disney.eval(tag, sp, dir_in, d, p)
    ok = np.asarray(p) > 1e-8
    ratio = np.asarray(f).sum(-1)[ok] / 3.0 / np.asarray(p)[ok]
    mean_ratio = ratio.mean() * ok.mean()
    assert mean_ratio < 1.05, (tag, kw, mean_ratio)
    assert np.isfinite(ratio).all()


@pytest.mark.parametrize(
    "tag,kw",
    [
        (MAT_DISNEY_METAL, dict(roughness=0.4)),
        # gloss=0 -> alpha=0.1; default gloss=1 is alpha=1e-3, too sharp for
        # a uniform-direction MC integral
        (MAT_DISNEY_CLEARCOAT, dict(clearcoat_gloss=0.0)),
        (MAT_DISNEY_SHEEN, dict()),
        (MAT_DISNEY_GLASS, dict(roughness=0.5)),
        (MAT_DISNEY_BSDF, dict(roughness=0.5, metallic=0.2, spec_trans=0.4)),
    ],
)
def test_pdf_integrates_to_one(tag, kw, rng_np):
    """MC-integrate pdf over the full sphere with uniform directions ~= the
    total sample mass (<=1, ~1 when few samples are rejected)."""
    sp = make_sp(N, **kw)
    dir_in = incident_dirs(N)
    # uniform sphere directions
    z = 1 - 2 * rng_np.random(N)
    phi = 2 * np.pi * rng_np.random(N)
    s = np.sqrt(np.clip(1 - z * z, 0, 1))
    d = jnp.asarray(
        np.stack([s * np.cos(phi), s * np.sin(phi), z], -1), jnp.float32
    )
    pdf = np.asarray(disney.pdf(tag, sp, dir_in, d))
    integral = pdf.mean() * 4 * np.pi
    assert 0.7 < integral < 1.1, (tag, kw, integral)


def test_metal_mirror_limit(rng_np):
    """Very low roughness metal concentrates samples near the mirror dir."""
    sp = make_sp(10_000, roughness=0.05)
    dir_in = incident_dirs(10_000)
    u = [jnp.asarray(rng_np.random(10_000), jnp.float32) for _ in range(2)]
    d, p = disney.sample(MAT_DISNEY_METAL, sp, dir_in, u[0], u[0], u[1])
    mirror = np.array([-np.sqrt(1 - 0.49), 0.0, 0.7])
    cos_to_mirror = np.asarray(d) @ mirror
    assert (cos_to_mirror > 0.99).mean() > 0.95


def test_glass_refracts(rng_np):
    """Glass transmits a Snell-consistent fraction of paths."""
    n = 50_000
    sp = make_sp(n, roughness=0.1, eta=1.5)
    dir_in = incident_dirs(n, cos_theta=0.9)
    u = [jnp.asarray(rng_np.random(n), jnp.float32) for _ in range(3)]
    d, p = disney.sample(MAT_DISNEY_GLASS, sp, dir_in, u[0], u[1], u[2])
    below = np.asarray(d)[:, 2] < 0
    # at near-normal incidence on eta=1.5 the Fresnel R ~= 0.04-0.1
    assert 0.8 < below.mean() < 0.99, below.mean()
    # transmitted direction approximately follows Snell at low roughness
    sin_in = np.sqrt(1 - 0.81)
    sin_out_expect = sin_in / 1.5
    sin_out = np.linalg.norm(np.asarray(d)[below][:, :2], axis=1)
    assert abs(np.median(sin_out) - sin_out_expect) < 0.05


def test_glass_eta_flips_with_side(rng_np):
    n = 10_000
    u = [jnp.asarray(rng_np.random(n), jnp.float32) for _ in range(3)]
    dir_in = incident_dirs(n, cos_theta=0.9)
    d_front, _ = disney.sample(
        MAT_DISNEY_GLASS, make_sp(n, roughness=0.05, front=True),
        dir_in, u[0], u[1], u[2],
    )
    d_back, _ = disney.sample(
        MAT_DISNEY_GLASS, make_sp(n, roughness=0.05, front=False),
        dir_in, u[0], u[1], u[2],
    )
    bf = np.asarray(d_front)[:, 2] < 0
    bb = np.asarray(d_back)[:, 2] < 0
    sf = np.median(np.linalg.norm(np.asarray(d_front)[bf][:, :2], axis=1))
    sb = np.median(np.linalg.norm(np.asarray(d_back)[bb][:, :2], axis=1))
    # entering (eta 1.5): bends toward normal; exiting (1/1.5): away
    assert sf < np.sqrt(1 - 0.81) < sb
