"""Opt-in numeric guard: TAKE_TPU_CHECKS=1 must flag injected NaNs.

The functional-model replacement for the reference's always-on asserts
(take.h:3-5) and the sanitizer row of SURVEY §5.
"""

import dataclasses

import numpy as np
import pytest

from take_tpu.render import render_image
from take_tpu.scene.types import RenderOptions

from tests.scenes import cornell_box


def _poisoned_scene():
    scene = cornell_box().build()
    # NaN background: escaped rays pick it up -> non-finite radiance
    return dataclasses.replace(
        scene, background=np.full(3, np.nan, np.float32)
    )


def test_checks_flag_injected_nan(monkeypatch):
    monkeypatch.setenv("TAKE_TPU_CHECKS", "1")
    with pytest.raises(FloatingPointError, match="non-finite"):
        render_image(_poisoned_scene(), RenderOptions(spp=2, max_depth=2))


def test_checks_off_by_default(monkeypatch):
    monkeypatch.delenv("TAKE_TPU_CHECKS", raising=False)
    img = render_image(_poisoned_scene(), RenderOptions(spp=2, max_depth=2))
    assert np.isnan(img).any()  # silently propagates when unchecked
