"""Cross-validation of the three integrators: all unbiased estimators of the
same light transport, so converged means must agree (path_tracing.h's three
production variants)."""

import numpy as np
import pytest

from take_tpu.render import render_image
from take_tpu.scene.types import RenderOptions

from tests.scenes import cornell_box, sphere_furnace


@pytest.mark.slow
def test_variants_agree_on_cornell():
    scene = cornell_box(width=16, height=16).build()
    spp = 384
    mis = render_image(scene, RenderOptions(spp=spp, max_depth=3, seed=0))
    one = render_image(
        scene,
        RenderOptions(spp=spp, max_depth=3, seed=0, integrator="one_sample_mis"),
    )
    raw = render_image(
        scene, RenderOptions(spp=spp, max_depth=3, seed=0, integrator="raw")
    )
    m_mis = mis.mean(axis=(0, 1))
    m_one = one.mean(axis=(0, 1))
    m_raw = raw.mean(axis=(0, 1))
    np.testing.assert_allclose(m_one, m_mis, rtol=0.05)
    # raw (BSDF-only sampling) is noisy; loose band
    np.testing.assert_allclose(m_raw, m_mis, rtol=0.2)


def test_variants_furnace():
    scene = sphere_furnace(albedo=0.5, width=16, height=16).build()
    for integ, spp in (
        ("one_sample_mis", 256),
        ("one_sample_mis_power", 256),
        ("raw", 256),
    ):
        img = render_image(
            scene, RenderOptions(spp=spp, max_depth=4, seed=2, integrator=integ)
        )
        center = img[6:10, 6:10].mean()
        np.testing.assert_allclose(center, 0.5, rtol=0.08), integ
