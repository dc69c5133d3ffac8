#!/usr/bin/env python
"""On-chip check + timing of the new cluster-sweep kernel on room waves.

1. Parity vs the jnp while-loop traversal on a 4096-ray slice (exact).
2. Timing on the captured primary/b0/b2 waves (sorted and unsorted).
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
    from take_tpu.geometry.pallas_sweep import BLOCK, sweep_traverse
    from take_tpu.geometry.pallas_traverse import prep_tables
    from take_tpu.geometry.traverse import _coherence_perm, _traverse
    from take_tpu.scene.parse_xml import parse_scene_file

    scene = parse_scene_file(os.path.join(ROOT, "scenes/room/room.xml"))
    waves = np.load("/tmp/room_waves.npz")
    N = waves["primary_ro"].shape[0]
    tris = prep_tables(scene)[1]
    cl = scene.bvh.cl_aabb
    n_tri = int(scene.meta.n_tri)
    print(f"room: {n_tri} tris, cl_aabb {cl.shape}, tris {tris.shape}",
          flush=True)

    # --- parity on 4096 rays of b2 ---
    M = 4096
    ro = jnp.asarray(waves["b2_ro"][:M])
    rd = jnp.asarray(waves["b2_rd"][:M])
    tmin = jnp.full(M, 1e-4)
    tmax = jnp.full(M, np.inf)
    t0 = time.time()
    t, u, v, prim = jax.block_until_ready(sweep_traverse(
        cl, tris, ro, rd, tmin, tmax, n_tri=n_tri))
    print(f"sweep kernel compiled+ran in {time.time()-t0:.1f}s", flush=True)
    t_ref, u_ref, v_ref, p_ref, found = jax.block_until_ready(jax.jit(
        lambda *a: _traverse(scene, *a, any_hit=False))(ro, rd, tmin, tmax))
    p_ref = np.where(np.asarray(found), np.asarray(p_ref), -1)
    match = (np.asarray(prim) == p_ref).mean()
    print(f"closest parity vs jnp traversal: {match*100:.3f}% prim match",
          flush=True)
    if match < 1.0:
        bad = np.nonzero(np.asarray(prim) != p_ref)[0][:5]
        for b in bad:
            print(f"  ray {b}: sweep prim {prim[b]} t {t[b]:.6f} | "
                  f"ref prim {p_ref[b]} t {t_ref[b]:.6f}", flush=True)

    # any-hit parity on shadow-like finite tmax
    tmax_s = jnp.asarray(np.random.default_rng(0).uniform(0.5, 30.0, M),
                         jnp.float32)
    *_, prim_a = jax.block_until_ready(sweep_traverse(
        cl, tris, ro, rd, tmin, tmax_s, n_tri=n_tri, any_hit=True))
    *_, p_ref2, found2 = jax.block_until_ready(jax.jit(
        lambda *a: _traverse(scene, *a, any_hit=False))(ro, rd, tmin, tmax_s))
    agree = ((np.asarray(prim_a) >= 0) == np.asarray(found2)).mean()
    print(f"any-hit parity: {agree*100:.3f}%", flush=True)

    # --- timing on full waves ---
    @jax.jit
    def sweep(ro, rd, tmin, tmax):
        return sweep_traverse(cl, tris, ro, rd, tmin, tmax, n_tri=n_tri)[0]

    def stage_fn(stage):
        @jax.jit
        def f(ro, rd, tmin, tmax):
            return sweep_traverse(cl, tris, ro, rd, tmin, tmax,
                                  n_tri=n_tri, stage=stage)[0]
        return f

    cull_fn = stage_fn("cull")
    nosweep_fn = stage_fn("loop_nosweep")

    @jax.jit
    def sort_then_sweep(ro, rd, tmin, tmax):
        perm, inv = _coherence_perm(scene, ro, rd)
        t = sweep_traverse(cl, tris, ro[perm], rd[perm], tmin[perm],
                           tmax[perm], n_tri=n_tri)[0]
        return t[inv]

    def bench(fn, *args, reps=3):
        # float() forces: block_until_ready is a NO-OP through the tunnel
        float(jnp.sum(fn(*args)))
        t0 = time.time()
        for _ in range(reps):
            float(jnp.sum(fn(*args)))
        return (time.time() - t0) / reps

    for name in ["primary", "b0", "b2"]:
        ro_w = jnp.asarray(waves[f"{name}_ro"])
        rd_w = jnp.asarray(waves[f"{name}_rd"])
        act = waves.get(f"{name}_act")
        tmin_w = jnp.full(N, 1e-4)
        tmax_w = jnp.full(N, np.inf) if act is None else jnp.where(
            jnp.asarray(act), np.inf, -_big())
        dt_u = bench(sweep, ro_w, rd_w, tmin_w, tmax_w)
        dt_s = bench(sort_then_sweep, ro_w, rd_w, tmin_w, tmax_w)
        dt_c = bench(cull_fn, ro_w, rd_w, tmin_w, tmax_w)
        dt_n = bench(nosweep_fn, ro_w, rd_w, tmin_w, tmax_w)
        print(f"{name}: unsorted {dt_u*1e3:7.1f} ms {N/dt_u/1e6:7.2f} Mr/s"
              f" | sort+sweep {dt_s*1e3:7.1f} ms {N/dt_s/1e6:7.2f} Mr/s"
              f" | cull {dt_c*1e3:6.1f} ms | nosweep {dt_n*1e3:7.1f} ms",
              flush=True)
    return 0


def _big():
    return 3.4e38


if __name__ == "__main__":
    sys.exit(main())
