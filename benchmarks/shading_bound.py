#!/usr/bin/env python
"""Amdahl bound for material-sorted batching (VERDICT r3 #10, the EP
analog): measure the full shading stage (shade-point build + NEE bsdf
eval/pdf + sampling) on a real room bounce wave vs the full pass time.
XLA lanes evaluate every PRESENT lobe regardless of order, so sorting by
tag can at best eliminate the multi-lobe overhead inside this stage — the
pass-level ceiling on any win is the stage's share of the pass."""

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
    from take_tpu.materials.bsdf import (
        bsdf_eval,
        bsdf_pdf,
        bsdf_sample,
        is_specular,
        make_shade_point,
    )
    from take_tpu.geometry.intersect import intersect_scene
    from take_tpu.render import render_pass
    from take_tpu.scene.parse_xml import parse_scene_file
    from take_tpu.scene.types import RenderOptions

    scene = parse_scene_file(os.path.join(ROOT, "scenes/room/room.xml"))
    W = scene.meta.camera.width
    waves = np.load("/tmp/room_waves.npz")
    N = waves["b0_ro"].shape[0]
    ro = jnp.asarray(waves["b0_ro"])
    rd = jnp.asarray(waves["b0_rd"])

    def force(x):
        leaves = [l for l in jax.tree_util.tree_leaves(x)
                  if hasattr(l, "dtype")]
        return float(jnp.sum(leaves[0].astype(jnp.float32)))

    def bench(label, fn, reps=3):
        force(fn())
        t0 = time.time()
        for _ in range(reps):
            force(fn())
        dt = (time.time() - t0) / reps
        print(f"{label:34s} {dt*1e3:9.1f} ms", flush=True)
        return dt

    hit = intersect_scene(scene, ro, rd, jnp.full(N, 1e-4),
                          jnp.full(N, jnp.inf))
    hit = jax.tree_util.tree_map(jnp.asarray, hit)
    pix = jnp.arange(N, dtype=jnp.int32)
    streams = rng_mod.make_stream(0, pix, jnp.zeros_like(pix))

    @jax.jit
    def shading_stage(hit, rd):
        sp = make_shade_point(scene, hit)
        spec = is_specular(sp)
        dir_in = -rd
        # NEE-side eval+pdf toward a fixed plausible direction + sampling
        ldir = jnp.broadcast_to(
            jnp.asarray([0.0, 1.0, 0.0]), rd.shape)
        FG1 = bsdf_eval(scene, sp, dir_in, ldir)
        bp1 = bsdf_pdf(scene, sp, dir_in, ldir)
        u = rng_mod.uniform(streams, rng_mod.bounce_counter(0, 3))
        d, p = bsdf_sample(scene, sp, dir_in, u, u, u, u)
        FG2 = bsdf_eval(scene, sp, dir_in, d, sample_pdf=p)
        return FG1.sum() + bp1.sum() + FG2.sum() + p.sum() + spec.sum()

    t_shade = bench("shading stage (2 evals+pdf+sample)",
                    lambda: shading_stage(hit, rd))

    o6 = RenderOptions(spp=1, max_depth=6, seed=0)
    t_pass = bench("full room d6 pass (2^18 paths)", lambda: render_pass(
        scene, o6, pix, jnp.int32(0), W, 1))

    # the pass runs the shading stage ~7x (per bounce); EP-max win bound:
    frac = 7 * t_shade / t_pass
    print(f"shading share of pass ~= {frac*100:.1f}% -> material-sorted "
          f"batching Amdahl ceiling {frac*100:.1f}%", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
