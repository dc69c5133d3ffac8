"""Smoke-render every BASELINE config scene at reduced resolution/spp.

These are the five benchmark configurations (BASELINE.json configs[0..4]);
full-resolution runs live in benchmarks/, this just proves each scene
parses, builds, and renders finitely with plausible content.
"""

import dataclasses
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scenes"))

from take_tpu.core.camera import Camera
from take_tpu.render import render_image
from take_tpu.scene.parse_xml import parse_scene_file
from take_tpu.scene.types import RenderOptions

SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")


@pytest.fixture(scope="module", autouse=True)
def assets():
    from generate import ensure_assets

    ensure_assets()


def _mini(scene, res):
    cam = scene.meta.camera
    return dataclasses.replace(
        scene,
        meta=dataclasses.replace(
            scene.meta,
            camera=Camera(res, res, cam.lookfrom, cam.lookat, cam.up, cam.vfov),
        ),
    )


def _render(name, res=32, spp=16, depth=4):
    scene = parse_scene_file(os.path.join(SCENES, name))
    scene = _mini(scene, res)
    img = render_image(scene, RenderOptions(spp=spp, max_depth=depth, seed=1))
    assert np.isfinite(img).all(), name
    return img, scene


def test_textured_scene():
    img, scene = _render("textured/textured.xml")
    assert scene.meta.has_image_textures
    assert scene.meta.n_tex == 1
    assert img.mean() > 0.01
    # checkerboard visible on the floor: variance across pixels
    assert img.std() > 0.02


def test_mis_scene():
    img, scene = _render("mis/mis.xml", res=48, spp=16)
    assert scene.meta.n_lights == 4
    # four plates progressively glossy; all lit
    assert img.mean() > 0.005
    # also exercises the one-sample-MIS variant on the same scene
    img2 = render_image(
        _mini(parse_scene_file(os.path.join(SCENES, "mis/mis.xml")), 32),
        RenderOptions(spp=8, max_depth=3, seed=2, integrator="one_sample_mis"),
    )
    assert np.isfinite(img2).all()


def test_ibl_scene():
    img, scene = _render("ibl/ibl.xml", res=32, spp=24)
    assert scene.meta.has_envmap
    assert img.mean() > 0.05
    # sky visible at top of frame
    assert img[:4].mean() > 0.1


def test_room_scene():
    img, scene = _render("room/room.xml", res=32, spp=8, depth=3)
    assert scene.meta.n_tri > 5000  # BVH-scale geometry
    assert scene.bvh is not None  # auto-built above threshold
    assert img.mean() > 0.005
