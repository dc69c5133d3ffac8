#!/usr/bin/env python
"""Round-4 batch B measurements (TPU): grad AD-vs-replay at band size,
RAY_SORT on/off end-to-end, wavefront active fraction at depth 50, and the
bench on-chip kernel check."""

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
    from take_tpu.grad import render_loss_grad
    from take_tpu.render import render_pass
    from take_tpu.scene.parse_xml import parse_scene_file
    from take_tpu.scene.types import RenderOptions

    def force(x):
        leaves = [l for l in jax.tree_util.tree_leaves(x)
                  if hasattr(l, "dtype") and l.dtype == jnp.float32]
        return float(jnp.sum(leaves[0]))

    def bench(label, fn, reps=3):
        force(fn())
        t0 = time.time()
        for _ in range(reps):
            force(fn())
        dt = (time.time() - t0) / reps
        print(f"{label:40s} {dt*1e3:9.1f} ms", flush=True)
        return dt

    # --- 1. gradient: replay vs AD-of-scan at the bench band size ---
    cbox = parse_scene_file(os.path.join(ROOT, "scenes/cbox/cbox.xml"))
    cam = cbox.meta.camera
    cbox_hd = dataclasses.replace(
        cbox, meta=dataclasses.replace(
            cbox.meta,
            camera=Camera(1920, 1080, cam.lookfrom, cam.lookat, cam.up,
                          cam.vfov)))
    band = 1 << 18
    pixb = jnp.arange(band, dtype=jnp.int32)
    target = jnp.zeros((band, 3))
    for mode in ["replay", "ad"]:
        gopts = RenderOptions(spp=1, max_depth=4, seed=0, grad_mode=mode)
        try:
            bench(f"grad band 2^18 d4 mode={mode}", lambda: render_loss_grad(
                cbox_hd, gopts, pixb, target, 1))
        except Exception as e:
            print(f"grad mode={mode} FAIL {type(e).__name__} "
                  f"{str(e)[:150]}", flush=True)

    # --- 2. RAY_SORT on/off, room d6 full pass ---
    room = parse_scene_file(os.path.join(ROOT, "scenes/room/room.xml"))
    W = room.meta.camera.width
    pix = jnp.arange(1 << 18, dtype=jnp.int32)
    o6 = RenderOptions(spp=1, max_depth=6, seed=0)
    for sort in [True, False]:
        config.RAY_SORT = sort
        jax.clear_caches()
        bench(f"room d6 scan RAY_SORT={sort}", lambda: render_pass(
            room, o6, pix, jnp.int32(0), W, 1))
    config.RAY_SORT = True
    jax.clear_caches()

    # --- 3. wavefront active fraction, cbox 1024^2 d50 ---
    from take_tpu.integrator.wavefront import trace_wavefront

    cbox_1k = dataclasses.replace(
        cbox, meta=dataclasses.replace(
            cbox.meta,
            camera=Camera(1024, 1024, cam.lookfrom, cam.lookat, cam.up,
                          cam.vfov)))
    P = 1024 * 1024
    o50 = RenderOptions(spp=1, max_depth=50, seed=0)
    pixw = jnp.arange(P, dtype=jnp.int32)
    sampw = jnp.zeros(P, jnp.int32)
    t0 = time.time()
    out, nom, act = trace_wavefront(cbox_1k, o50, pixw, sampw, 1024,
                                    with_counts=True)
    s = float(jnp.sum(out))
    print(f"cbox 1024^2 d50 wavefront: {time.time()-t0:.1f}s "
          f"active_fraction={float(act)/float(nom):.4f} sum={s:.1f}",
          flush=True)

    # --- 4. bench on-chip kernel check ---
    sys.path.insert(0, ROOT)
    import bench as bench_mod

    ok, err = bench_mod._kernels_onchip_check()
    print(f"kernels_onchip_ok={ok} {err}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
