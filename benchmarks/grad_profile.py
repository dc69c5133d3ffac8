#!/usr/bin/env python
"""Profile the path-replay backward (VERDICT r3 weak #3): one 2^18-path
band of the 1080p cbox gradient, decomposed into forward / forward+replay,
to see where the 15.8 s/frame goes before optimizing."""

import dataclasses
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from take_tpu.config import enable_compile_cache

    enable_compile_cache()
    from take_tpu.core.camera import Camera
    from take_tpu.grad import render_loss_grad
    from take_tpu.render import render_pass
    from take_tpu.scene.parse_xml import parse_scene_file
    from take_tpu.scene.types import RenderOptions

    scene = parse_scene_file(os.path.join(ROOT, "scenes/cbox/cbox.xml"))
    cam = scene.meta.camera
    scene = dataclasses.replace(
        scene, meta=dataclasses.replace(
            scene.meta,
            camera=Camera(1920, 1080, cam.lookfrom, cam.lookat, cam.up,
                          cam.vfov)))
    band = 1 << 18
    gopts = RenderOptions(spp=1, max_depth=4, seed=0, grad_mode="replay")
    pixb = jnp.arange(band, dtype=jnp.int32)
    target = jnp.zeros((band, 3))

    def force(x):
        leaves = jax.tree_util.tree_leaves(x)
        return [float(jnp.sum(l)) for l in leaves
                if hasattr(l, "dtype") and l.dtype == jnp.float32][:1]

    def bench(label, fn, reps=3):
        force(fn())
        t0 = time.time()
        for _ in range(reps):
            force(fn())
        dt = (time.time() - t0) / reps
        print(f"{label:34s} {dt*1e3:9.1f} ms", flush=True)
        return dt

    # forward only (scan driver — what a plain render pass costs)
    o_fwd = RenderOptions(spp=1, max_depth=4, seed=0)
    bench("forward pass (scan)", lambda: render_pass(
        scene, o_fwd, pixb, jnp.int32(0), 1920, 1))
    # forward via the replay (while-loop) driver
    o_rep = dataclasses.replace(o_fwd, integrator="mis_replay")
    bench("forward pass (replay driver)", lambda: render_pass(
        scene, o_rep, pixb, jnp.int32(0), 1920, 1))
    # loss + gradient via path replay
    bench("loss+grad (replay vjp)", lambda: render_loss_grad(
        scene, gopts, pixb, target, 1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
