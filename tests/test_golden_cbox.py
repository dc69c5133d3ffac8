"""Golden-image test: take-tpu vs the C++ reference renderer on cbox.

The reference binary is built out-of-tree at /root/ref_build/build/take (see
.claude/skills/verify/SKILL.md for the recipe). Its RNG is nondeterministic
(render.cpp:60 seeds mt19937 from random_device), so comparison is
statistical: mean image + block-downsampled tolerance (SURVEY §4.2).

These tests are skipped when the reference binary or a cached golden EXR is
unavailable.
"""

import os
import subprocess

import numpy as np
import pytest

from take_tpu.io.exr import read_exr
from take_tpu.render import render_image
from take_tpu.scene.parse_xml import parse_scene_file
from take_tpu.scene.types import RenderOptions

REF_BIN = "/root/ref_build/build/take"
SCENE = os.path.join(os.path.dirname(__file__), "..", "scenes", "cbox", "cbox.xml")
# depth-keyed cache, shared with benchmarks/run_benchmarks.py (this test
# renders at max_depth 4)
GOLDEN_CACHE = "/tmp/take_golden_cbox_d4.exr"


def _golden():
    if not os.path.exists(GOLDEN_CACHE):
        if not os.path.exists(REF_BIN):
            pytest.skip("reference binary not available")
        subprocess.run(
            [REF_BIN, os.path.abspath(SCENE), "-max_depth", "4"],
            cwd="/tmp",
            check=True,
            capture_output=True,
        )
        os.replace("/tmp/image.exr", GOLDEN_CACHE)
    return read_exr(GOLDEN_CACHE)


@pytest.mark.slow
def test_cbox_matches_reference():
    ref = _golden()
    scene = parse_scene_file(SCENE)
    ours = render_image(scene, RenderOptions(spp=16, max_depth=4, seed=1))
    assert ours.shape == ref.shape

    # whole-image mean: 16 spp x 65k pixels -> noise on the mean is tiny;
    # tolerate 1.5% relative
    m_ref = ref.mean(axis=(0, 1))
    m_ours = ours.mean(axis=(0, 1))
    np.testing.assert_allclose(m_ours, m_ref, rtol=0.015)

    # 16x16-block means within noise bands
    r = ref.reshape(16, 16, 16, 16, 3).mean(axis=(1, 3))
    o = ours.reshape(16, 16, 16, 16, 3).mean(axis=(1, 3))
    lum_r = r.sum(-1)
    lum_o = o.sum(-1)
    rel = np.abs(lum_o - lum_r) / (lum_r + 0.05)
    # 16spp block of 256 pixels: generous noise band
    assert np.median(rel) < 0.05, np.median(rel)
    assert (rel < 0.35).mean() > 0.97, rel.max()
