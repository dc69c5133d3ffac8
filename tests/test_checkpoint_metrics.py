"""Checkpoint/resume bit-exactness + observability utilities."""

import numpy as np

from take_tpu.render import render_image
from take_tpu.scene.types import RenderOptions
from take_tpu.utils.checkpoint import (
    load_accumulator,
    render_image_resumable,
    save_accumulator,
)
from take_tpu.utils.metrics import PhaseTimer, ThroughputMeter, scene_summary

from tests.scenes import cornell_box


def test_resume_is_bit_exact(tmp_path):
    scene = cornell_box(width=16, height=16).build()
    opts = RenderOptions(spp=8, max_depth=2, seed=13, max_rays_per_pass=16 * 16 * 2)
    straight = render_image(scene, opts)

    ckpt = str(tmp_path / "render.ckpt")
    # interrupt after the first checkpoint: run with a tiny budget by
    # checkpointing every batch and simulating a crash via partial state
    img_full = render_image_resumable(scene, opts, ckpt, checkpoint_every=1)
    np.testing.assert_array_equal(straight, img_full)

    # now rewind the checkpoint to a mid-way state and resume
    acc, spp_done, seed, meta = load_accumulator(ckpt)
    # fabricate a half-done checkpoint from a fresh run's own history:
    half_opts = RenderOptions(spp=4, max_depth=2, seed=13,
                              max_rays_per_pass=16 * 16 * 2)
    half = render_image(scene, half_opts)  # 4-sample average
    save_accumulator(ckpt, (half[::-1].reshape(-1, 3) * 4), 4, 13)
    resumed = render_image_resumable(scene, opts, ckpt, checkpoint_every=100)
    np.testing.assert_allclose(straight, resumed, atol=1e-5)


def test_checkpoint_rejects_mismatched_seed(tmp_path):
    scene = cornell_box(width=8, height=8).build()
    ckpt = str(tmp_path / "c.ckpt")
    save_accumulator(ckpt, np.zeros((64, 3)), 2, seed=999)
    try:
        render_image_resumable(
            scene, RenderOptions(spp=4, max_depth=1, seed=1), ckpt
        )
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "seed" in str(e)


def test_phase_timer_and_meter(capsys):
    t = PhaseTimer(log=False)
    with t.phase("parse"):
        pass
    with t.phase("render"):
        pass
    rep = t.report()
    assert set(rep) == {"parse", "render"}

    m = ThroughputMeter()
    m.add(n_paths=1000, n_rays=11000, seconds=0.001)
    assert m.report()["Mrays/s"] > 0


def test_scene_summary():
    scene = cornell_box(width=8, height=8).build()
    info = scene_summary(scene)
    assert info["triangles"] == 32
    assert info["lights"] == 2
    assert info["camera"]["resolution"] == [8, 8]
