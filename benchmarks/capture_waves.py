#!/usr/bin/env python
"""Capture real room bounce waves + time the closest-hit backends on them.

Runs the integrator eagerly on the chip for a 2^18-path band of the room
camera, records each bounce wave's (origin, direction, active) to
/tmp/room_waves.npz for offline divergence analysis, and times the current
traversal backend on every wave (the number VERDICT r3 pegs at ~3 Mrays/s
incoherent). Own-process tool; not part of the test suite.
"""

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

    from take_tpu.core import rng as rng_mod
    from take_tpu.core.camera import generate_rays
    from take_tpu.geometry.traverse import _traverse_backend
    from take_tpu.integrator.path_tracer import (
        _bounce_step,
        _camera_vertex,
    )
    from take_tpu.scene.parse_xml import parse_scene_file

    scene = parse_scene_file(os.path.join(ROOT, "scenes/room/room.xml"))
    W = scene.meta.camera.width
    N = 1 << 18
    print(f"room: {scene.meta.n_tri} tris, {W}x{scene.meta.camera.height}",
          flush=True)

    # rays for the middle band (interior bounces, not ceiling/floor only)
    pix = jnp.arange(400 * W, 400 * W + N, dtype=jnp.int32)
    streams = rng_mod.make_stream(0, pix, jnp.zeros_like(pix))
    jx = rng_mod.uniform(
        streams, rng_mod.camera_counter(rng_mod.DIM_CAMERA_JITTER_X))
    jy = rng_mod.uniform(
        streams, rng_mod.camera_counter(rng_mod.DIM_CAMERA_JITTER_Y))
    px = (pix % W).astype(jnp.float32)
    py = (pix // W).astype(jnp.float32)
    ro, rd = generate_rays(scene.meta.camera, px, py, jx, jy)

    waves = {"primary_ro": np.asarray(ro), "primary_rd": np.asarray(rd)}
    t0 = time.time()
    _, state = _camera_vertex(scene, ro, rd)
    jax.block_until_ready(state)
    print(f"camera vertex in {time.time()-t0:.1f}s "
          f"(primary hit rate {float(jnp.mean(state[3])):.3f})", flush=True)

    for i in range(3):
        t0 = time.time()
        state, c, w = _bounce_step(scene, streams, jnp.uint32(i), state)
        jax.block_until_ready(state)
        ro_i, rd_i, _, act = state
        waves[f"b{i}_ro"] = np.asarray(ro_i)
        waves[f"b{i}_rd"] = np.asarray(rd_i)
        waves[f"b{i}_act"] = np.asarray(act)
        print(f"bounce {i} in {time.time()-t0:.1f}s eager, "
              f"active {float(jnp.mean(act)):.3f}", flush=True)

    np.savez_compressed("/tmp/room_waves.npz", **waves)
    print("saved /tmp/room_waves.npz", flush=True)

    # --- time the traversal backend on each wave ---
    q = jax.jit(lambda ro, rd, tmax: _traverse_backend(
        scene, ro, rd, jnp.full(N, 1e-4), tmax)[0])

    for name in ["primary", "b0", "b1", "b2"]:
        ro_i = jnp.asarray(waves[f"{name}_ro"])
        rd_i = jnp.asarray(waves[f"{name}_rd"])
        act = waves.get(f"{name}_act")
        tmax = jnp.full(N, np.inf) if act is None else jnp.where(
            jnp.asarray(act), np.inf, -3.4e38)
        n_act = N if act is None else int(act.sum())
        out = jax.block_until_ready(q(ro_i, rd_i, tmax))  # compile
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = q(ro_i, rd_i, tmax)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        print(f"{name}: {dt*1e3:8.1f} ms  {N/dt/1e6:8.2f} Mrays/s nominal  "
              f"{n_act/dt/1e6:8.2f} Mrays/s active ({n_act} live)",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
