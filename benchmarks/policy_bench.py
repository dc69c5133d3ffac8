#!/usr/bin/env python
"""End-to-end policy measurements (TPU): TWO_PHASE on/off, scan vs
wavefront driver, on a room band and deep cbox. Informs round-4 defaults."""

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
    from take_tpu import config
    from take_tpu.core.camera import Camera
    from take_tpu.render import render_pass
    from take_tpu.scene.parse_xml import parse_scene_file
    from take_tpu.scene.types import RenderOptions

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    def force(x):
        # block_until_ready is a NO-OP through the axon tunnel (measured
        # round 4): only materialization actually waits
        return float(jnp.sum(x))

    def timed_pass(scene, opts, n_pix, width, label):
        pix = jnp.arange(n_pix, dtype=jnp.int32)
        t0 = time.time()
        force(render_pass(scene, opts, pix, jnp.int32(0), width, 1))
        tc = time.time() - t0
        t0 = time.time()
        reps = 2
        for r in range(reps):
            force(render_pass(scene, opts, pix, jnp.int32(r + 1), width, 1))
        dt = (time.time() - t0) / reps
        rays = n_pix * (1 + 2 * (opts.max_depth + 1))
        print(f"{label}: compile+1st {tc:6.1f}s  steady {dt*1e3:8.1f} ms "
              f"({rays/dt/1e6:6.2f} Mrays/s nominal)", flush=True)
        return dt

    if which in ("room", "all"):
        room = parse_scene_file(os.path.join(ROOT, "scenes/room/room.xml"))
        n_pix = 1 << 18
        W = room.meta.camera.width
        o6 = RenderOptions(spp=1, max_depth=6, seed=0)

        config.TWO_PHASE = True
        timed_pass(room, o6, n_pix, W, "room d6 scan   two_phase=ON ")
        config.TWO_PHASE = False
        jax.clear_caches()
        timed_pass(room, o6, n_pix, W, "room d6 scan   two_phase=OFF")
        o6w = dataclasses.replace(o6, integrator="mis_wavefront")
        timed_pass(room, o6w, n_pix, W, "room d6 wave   two_phase=OFF")

    if which in ("room50",):
        room = parse_scene_file(os.path.join(ROOT, "scenes/room/room.xml"))
        n_pix = 1 << 18
        W = room.meta.camera.width
        o50 = RenderOptions(spp=1, max_depth=50, seed=0)
        timed_pass(room, o50, n_pix, W, "room d50 scan")
        o50w = dataclasses.replace(o50, integrator="mis_wavefront")
        timed_pass(room, o50w, n_pix, W, "room d50 wave")

    if which in ("cbox", "all"):
        cbox = parse_scene_file(os.path.join(ROOT, "scenes/cbox/cbox.xml"))
        cam = cbox.meta.camera
        cbox = dataclasses.replace(
            cbox, meta=dataclasses.replace(
                cbox.meta,
                camera=Camera(512, 512, cam.lookfrom, cam.lookat, cam.up,
                              cam.vfov)))
        n_pix = 512 * 512
        o50 = RenderOptions(spp=1, max_depth=50, seed=0)
        timed_pass(cbox, o50, n_pix, 512, "cbox d50 scan")
        o50w = dataclasses.replace(o50, integrator="mis_wavefront")
        timed_pass(cbox, o50w, n_pix, 512, "cbox d50 wave")
        o4 = RenderOptions(spp=1, max_depth=4, seed=0)
        timed_pass(cbox, o4, n_pix, 512, "cbox d4  scan")
        o4w = dataclasses.replace(o4, integrator="mis_wavefront")
        timed_pass(cbox, o4w, n_pix, 512, "cbox d4  wave")
    return 0


if __name__ == "__main__":
    sys.exit(main())
