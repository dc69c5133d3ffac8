#!/usr/bin/env python
"""On-device smoke test for the Pallas cluster traversal (REAL TPU).

Round-2 lesson: interpret-mode-only validation shipped a kernel that Mosaic
rejected at every block count. This script compiles and runs the cluster
pipeline ON THE CHIP at nb in {1, 2, 64}, checks exact primitive parity
against the brute-force sweep, exercises the any-hit kernel, and reports a
traversal throughput number. Exit code != 0 on any mismatch.

Run: python benchmarks/tpu_smoke.py            (real TPU)
     JAX_PLATFORMS=cpu ... --interpret         (CPU fallback for debugging)
"""

import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def soup_scene(n_tri, seed=0, spread=10.0):
    from take_tpu.core.camera import Camera
    from take_tpu.scene.build import SceneBuilder
    from take_tpu.scene.types import MAT_DIFFUSE

    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    b.camera = Camera(8, 8, (0, 0, 30), (0, 0, 0), (0, 1, 0), 45.0)
    m = b.add_material(MAT_DIFFUSE)
    centers = rng.uniform(-spread, spread, (n_tri, 3))
    verts = centers[:, None, :] + rng.uniform(-0.8, 0.8, (n_tri, 3, 3))
    faces = np.arange(3 * n_tri).reshape(n_tri, 3)
    b.add_mesh(verts.reshape(-1, 3), faces, m)
    return b.build(build_bvh=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from take_tpu.config import enable_compile_cache

    enable_compile_cache()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    from take_tpu.geometry.intersect import _pad_rays, _tri_uvt
    from take_tpu.geometry.pallas_cluster import BLOCK, cluster_traverse

    print(f"backend: {jax.devices()}")
    _BIG = 3.4e38
    failures = 0

    for n_tri, nb in [(40, 1), (700, 2), (20000, 64)]:
        scene = soup_scene(n_tri, seed=n_tri)
        N = nb * BLOCK
        rng = np.random.default_rng(7)
        ro = jnp.asarray(rng.uniform(-15, 15, (N, 3)), jnp.float32)
        d = rng.normal(size=(N, 3))
        rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True),
                         jnp.float32)
        tmin = jnp.full(N, 1e-4)
        tmax = jnp.full(N, jnp.inf)

        t0 = time.time()
        t, u, v, prim = jax.block_until_ready(cluster_traverse(
            scene.bvh.sup_aabb, scene.geometry.tri_sweep,
            ro, rd, tmin, tmax, any_hit=False, interpret=args.interpret,
        ))
        dt_first = time.time() - t0

        tb, ub, vb, okb = _tri_uvt(
            scene.geometry, ro, rd, tmin, tmax, scene.meta.n_tri
        )
        tm = np.asarray(jnp.where(okb, tb, _BIG))
        prim_ref = np.where(tm.min(axis=1) < _BIG, tm.argmin(axis=1), -1)

        prim_np = np.asarray(prim)
        bad = int((prim_np != prim_ref).sum())
        # any-hit with finite tmax
        tmax_f = jnp.asarray(rng.uniform(1.0, 25.0, N), jnp.float32)
        occ = np.asarray(jax.block_until_ready(cluster_traverse(
            scene.bvh.sup_aabb, scene.geometry.tri_sweep,
            ro, rd, tmin, tmax_f, any_hit=True, interpret=args.interpret,
        )))
        _, _, _, okf = _tri_uvt(
            scene.geometry, ro, rd, tmin, tmax_f, scene.meta.n_tri
        )
        occ_ref = np.asarray(okf).any(axis=1)
        bad_occ = int((occ != occ_ref).sum())

        status = "OK" if bad == 0 and bad_occ == 0 else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"[{status}] n_tri={n_tri:6d} nb={nb:3d}: "
            f"prim mismatches {bad}/{N}, occ mismatches {bad_occ}/{N}, "
            f"first-call {dt_first:.1f}s "
            f"(hit rate {float((prim_ref >= 0).mean()):.2f})"
        )

    # throughput: repeat traversal on the 20k scene at a bigger batch
    scene = soup_scene(20000, seed=20000)
    N = 1 << 18
    rng = np.random.default_rng(11)
    # coherent-ish batch: common origin shell, directions toward the cloud
    ro = jnp.asarray(
        np.tile(np.array([0.0, 0.0, 30.0]), (N, 1))
        + rng.uniform(-1, 1, (N, 3)),
        jnp.float32,
    )
    tgt = rng.uniform(-10, 10, (N, 3))
    d = tgt - np.asarray(ro)
    rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    tmin = jnp.full(N, 1e-4)
    tmax = jnp.full(N, jnp.inf)
    f = jax.jit(lambda *a: cluster_traverse(
        scene.bvh.sup_aabb, scene.geometry.tri_sweep,
        *a, any_hit=False, interpret=args.interpret))
    jax.block_until_ready(f(ro, rd, tmin, tmax))
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        out = f(ro, rd, tmin, tmax)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"cluster closest-hit, 20k tris, {N} coherent rays: "
          f"{N / dt / 1e6:.1f} Mrays/s")

    # incoherent batch (the bounce-wave regime the design bounds)
    ro_i = jnp.asarray(rng.uniform(-10, 10, (N, 3)), jnp.float32)
    d = rng.normal(size=(N, 3))
    rd_i = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True),
                       jnp.float32)
    jax.block_until_ready(f(ro_i, rd_i, tmin, tmax))
    t0 = time.time()
    for _ in range(reps):
        out = f(ro_i, rd_i, tmin, tmax)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"cluster closest-hit, 20k tris, {N} incoherent rays: "
          f"{N / dt / 1e6:.1f} Mrays/s")

    print("SMOKE " + ("PASS" if failures == 0 else f"FAIL ({failures})"))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
