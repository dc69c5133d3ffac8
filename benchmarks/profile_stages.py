"""Per-stage TPU timing for the cbox hot path: isolates intersect / occluded /
shade+sample costs at the bench batch size so optimization effort goes where
the milliseconds are. Not part of the test suite."""

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from take_tpu.config import enable_compile_cache

enable_compile_cache()

from take_tpu.core import rng
from take_tpu.core.camera import Camera, generate_rays
from take_tpu.geometry.intersect import intersect_scene, occluded
from take_tpu.materials.bsdf import bsdf_eval, bsdf_pdf, bsdf_sample, make_shade_point
from take_tpu.render import render_pass
from take_tpu.scene.parse_xml import parse_scene_file
from take_tpu.scene.types import RenderOptions


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:34s} {dt * 1e3:9.3f} ms")
    return dt


def main():
    scene = parse_scene_file("scenes/cbox/cbox.xml")
    cam = scene.meta.camera
    res = 1024
    scene = dataclasses.replace(
        scene,
        meta=dataclasses.replace(
            scene.meta,
            camera=Camera(res, res, cam.lookfrom, cam.lookat, cam.up, cam.vfov),
        ),
    )
    N = res * res
    options = RenderOptions(spp=16, max_depth=4, seed=0)

    pix = jnp.arange(N, dtype=jnp.int32)
    samp = jnp.zeros(N, jnp.int32)
    streams = rng.make_stream(0, pix, samp)
    jx = rng.uniform(streams, rng.camera_counter(rng.DIM_CAMERA_JITTER_X))
    jy = rng.uniform(streams, rng.camera_counter(rng.DIM_CAMERA_JITTER_Y))
    px = (pix % res).astype(jnp.float32)
    py = (pix // res).astype(jnp.float32)
    ro, rd = generate_rays(scene.meta.camera, px, py, jx, jy)
    tmin = jnp.full(N, 1e-4)
    tmax = jnp.full(N, jnp.inf)

    print(f"N = {N} rays, n_tri(padded) = {scene.geometry.tri_attr.shape[0]}, "
          f"bvh = {scene.bvh is not None}")

    f_int = jax.jit(lambda ro, rd: intersect_scene(scene, ro, rd, tmin, tmax))
    f_occ = jax.jit(lambda ro, rd: occluded(scene, ro, rd, tmin, tmax))
    d_int = timeit("intersect_scene", f_int, ro, rd)
    d_occ = timeit("occluded", f_occ, ro, rd)

    hit = f_int(ro, rd)

    def shade(hit, rd):
        sp = make_shade_point(scene, hit)
        dir_in = -rd
        u = [rng.uniform(streams, rng.bounce_counter(0, d)) for d in range(4)]
        dir_out, pdf = bsdf_sample(scene, sp, dir_in, u[0], u[1], u[2], u[3])
        fg = bsdf_eval(scene, sp, dir_in, dir_out, sample_pdf=pdf)
        bp = bsdf_pdf(scene, sp, dir_in, dir_out)
        return fg, bp, dir_out

    d_shade = timeit("shade (sample+eval+pdf)", jax.jit(shade), hit, rd)

    def one_bounce_equiv():
        # 2 intersects + 1 occluded + 1 shade is roughly one MIS bounce
        return 2 * d_int + d_occ + d_shade

    print(f"{'~1 MIS bounce (2int+occ+shade)':34s} {one_bounce_equiv() * 1e3:9.3f} ms")

    # whole pass, 1 sample (what bench loops 16x)
    f_pass = lambda: render_pass(scene, options, pix, jnp.int32(0), res, 1)
    d_pass = timeit("render_pass spp=1 (5 bounces)", lambda _: f_pass(), 0, n=5)
    print(f"{'accounted by 5 bounces':34s} {5 * one_bounce_equiv() * 1e3:9.3f} ms")


if __name__ == "__main__":
    main()
