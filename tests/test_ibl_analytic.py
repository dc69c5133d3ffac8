"""Analytic IBL acceptance test (VERDICT r3 weak #5 / ask #9).

The env furnace (test_envmap.py) only exercises a CONSTANT map — importance
sampling and MIS weights cancel there by construction. This test uses a
STRUCTURED, azimuth-only environment over a diffuse floor, which has an
exact closed form under the renderer's own equirect bilinear lookup:

  For an equirect map whose texels depend only on the column (azimuth),
  the bilinear interpolant at any direction is f(u) (rows identical), and
  the azimuthal integral of the wrap-interpolated f equals the plain texel
  mean (trapezoid rule over a full period). A diffuse floor with normal +y
  and albedo rho therefore reflects EXACTLY

      L_out = rho * mean(texels)

  toward any viewer: L_out = rho/pi * Int L(phi) cos(theta) dOmega over the
  upper hemisphere = rho/pi * [Int f(u) du * 2pi] * [Int_0^{pi/2}
  cos sin dtheta] = rho * mean(f).

Estimator unbiasedness + alias-table importance sampling + env MIS weights
must all hold for the Monte Carlo mean to land on this value; none of it
cancels (the map is 10:1 nonuniform). Cross-integrator agreement (mis /
one-sample MIS / raw) is asserted against the same closed form.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from take_tpu.core.camera import Camera
from take_tpu.lights.envmap import build_envmap
from take_tpu.render import render_image
from take_tpu.scene.build import SceneBuilder
from take_tpu.scene.types import MAT_DIFFUSE, RenderOptions


def _floor_under_azimuth_env(rho=0.6, w=32, h=16, seed=5):
    rng = np.random.default_rng(seed)
    col = rng.uniform(0.2, 2.0, (1, w, 1)).astype(np.float32)
    img = np.broadcast_to(col, (h, w, 3)).copy()
    b = SceneBuilder()
    # camera above the floor looking straight down; floor spans the view
    b.camera = Camera(8, 8, (0.0, 3.0, 0.0), (0.0, 0.0, 0.0),
                      (0.0, 0.0, -1.0), 45.0)
    m = b.add_material(MAT_DIFFUSE, tex_value=(rho,) * 3)
    s = 50.0
    verts = np.array(
        [[-s, 0.0, -s], [s, 0.0, -s], [s, 0.0, s], [-s, 0.0, s]],
        np.float32,
    )
    faces = np.array([[0, 2, 1], [0, 3, 2]])
    b.add_mesh(verts, faces, m)
    b.envmap = build_envmap(img)
    expected = rho * float(col.mean())
    return b.build(), expected


@pytest.mark.parametrize(
    "integrator,rtol",
    [("mis", 0.02), ("one_sample_mis", 0.04), ("raw", 0.08)],
)
def test_ibl_azimuth_env_closed_form(integrator, rtol):
    scene, expected = _floor_under_azimuth_env()
    spp = 512 if integrator != "raw" else 1024
    img = render_image(
        scene,
        RenderOptions(spp=spp, max_depth=3, seed=7, integrator=integrator),
    )
    mean = img.mean()
    np.testing.assert_allclose(mean, expected, rtol=rtol)
    # per-pixel: every pixel sees the same closed-form radiance
    np.testing.assert_allclose(img.mean(axis=2), expected, rtol=5 * rtol)


@pytest.mark.slow
def test_ibl_scene_cross_integrator_agreement():
    """The ibl BASELINE config has no external golden (the reference's
    parser rejects envmap emitters), so its quantitative acceptance is
    agreement of three INDEPENDENT estimator constructions on the real 2K
    map: multi-sample MIS, one-sample MIS, and raw BSDF sampling share no
    weighting code path, so a bias in any of them breaks agreement."""
    import dataclasses
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scenes"))
    from generate import ensure_assets
    from take_tpu.scene.parse_xml import parse_scene_file

    ensure_assets()
    scene = parse_scene_file(
        os.path.join(os.path.dirname(__file__), "..", "scenes", "ibl",
                     "ibl.xml"))
    cam = scene.meta.camera
    scene = dataclasses.replace(
        scene,
        meta=dataclasses.replace(
            scene.meta,
            camera=Camera(96, 96, cam.lookfrom, cam.lookat, cam.up,
                          cam.vfov),
        ),
    )
    imgs = {}
    for integ, spp in [("mis", 128), ("one_sample_mis", 128),
                       ("raw", 256)]:
        imgs[integ] = render_image(
            scene,
            RenderOptions(spp=spp, max_depth=4, seed=11,
                          integrator=integ),
        )
    m = imgs["mis"]
    for other in ("one_sample_mis", "raw"):
        o = imgs[other]
        # mean image agreement
        np.testing.assert_allclose(
            o.mean(axis=(0, 1)), m.mean(axis=(0, 1)), rtol=0.03)
        # 8x8 block means within a noise band
        b = m.shape[0] // 8
        mb = m[: 8 * b, : 8 * b].reshape(8, b, 8, b, 3).mean((1, 3)).sum(-1)
        ob = o[: 8 * b, : 8 * b].reshape(8, b, 8, b, 3).mean((1, 3)).sum(-1)
        rel = np.abs(ob - mb) / (mb + 0.05)
        assert np.quantile(rel, 0.95) < 0.1, (other, np.quantile(rel, 0.95))
