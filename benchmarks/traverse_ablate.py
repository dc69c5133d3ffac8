#!/usr/bin/env python
"""Decompose _traverse_backend cost on captured room waves (TPU).

Times, per wave: packet kernel raw (pre-sorted rays), sort overhead,
two-phase overhead, cluster kernel raw — to find where the milliseconds go
before redesigning anything. Reads /tmp/room_waves.npz (capture_waves.py).
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
    from take_tpu import config
    from take_tpu.geometry.intersect import _pad_rays
    from take_tpu.geometry.pallas_cluster import BLOCK as CBLOCK
    from take_tpu.geometry.pallas_cluster import cluster_traverse
    from take_tpu.geometry.pallas_traverse import packet_traverse, prep_tables
    from take_tpu.geometry.traverse import _coherence_perm, _two_phase_closest
    from take_tpu.scene.parse_xml import parse_scene_file

    scene = parse_scene_file(os.path.join(ROOT, "scenes/room/room.xml"))
    waves = np.load("/tmp/room_waves.npz")
    N = waves["primary_ro"].shape[0]
    nodes, tris = prep_tables(scene)
    nodes, tris = jax.block_until_ready((nodes, tris))

    def bench(fn, *args, reps=3):
        # float() forces: block_until_ready is a NO-OP through the tunnel
        def run():
            out = fn(*args)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(float(jnp.sum(x)) for x in leaves[:1])

        run()
        t0 = time.time()
        for _ in range(reps):
            run()
        return (time.time() - t0) / reps

    @jax.jit
    def sort_rays(ro, rd, tmin, tmax):
        perm, inv = _coherence_perm(scene, ro, rd)
        return ro[perm], rd[perm], tmin[perm], tmax[perm], inv

    @jax.jit
    def packet_raw(ro, rd, tmin, tmax):
        _, ro_p, rd_p, tmin_p, tmax_p = _pad_rays(ro, rd, tmin, tmax, 256)
        return packet_traverse(nodes, tris, ro_p, rd_p, tmin_p, tmax_p,
                               block=256)[0]

    @jax.jit
    def cluster_raw(ro, rd, tmin, tmax):
        _, ro_p, rd_p, tmin_p, tmax_p = _pad_rays(ro, rd, tmin, tmax, CBLOCK)
        return cluster_traverse(scene.bvh.sup_aabb, scene.geometry.tri_sweep,
                                ro_p, rd_p, tmin_p, tmax_p)[0]

    @jax.jit
    def packet_twophase(ro, rd, tmin, tmax):
        def closest(ro_q, rd_q, tmin_q, tmax_q):
            _, ro_p, rd_p, tmin_p, tmax_p = _pad_rays(
                ro_q, rd_q, tmin_q, tmax_q, 256)
            t, u, v, p = packet_traverse(
                nodes, tris, ro_p, rd_p, tmin_p, tmax_p, block=256)
            return t[:N], u[:N], v[:N], p[:N]

        bvh = scene.bvh
        bmin = jnp.min(bvh.node_min[0], axis=0)
        bmax = jnp.max(bvh.node_max[0], axis=0)
        d0 = config.TWO_PHASE_FRAC * jnp.linalg.norm(bmax - bmin)
        return _two_phase_closest(closest, d0, ro, rd, tmin, tmax)[0]

    for name in ["primary", "b0", "b2"]:
        ro = jnp.asarray(waves[f"{name}_ro"])
        rd = jnp.asarray(waves[f"{name}_rd"])
        act = waves.get(f"{name}_act")
        tmin = jnp.full(N, 1e-4)
        tmax = jnp.full(N, np.inf) if act is None else jnp.where(
            jnp.asarray(act), np.inf, -3.4e38)

        dt_sort = bench(sort_rays, ro, rd, tmin, tmax)
        ro_s, rd_s, tmin_s, tmax_s, _ = jax.block_until_ready(
            sort_rays(ro, rd, tmin, tmax))

        rows = [("sort", dt_sort)]
        for label, fn, args in [
            ("packet_raw_sorted", packet_raw, (ro_s, rd_s, tmin_s, tmax_s)),
            ("packet_raw_unsorted", packet_raw, (ro, rd, tmin, tmax)),
            ("packet_2ph_sorted", packet_twophase,
             (ro_s, rd_s, tmin_s, tmax_s)),
            ("cluster_raw_sorted", cluster_raw, (ro_s, rd_s, tmin_s, tmax_s)),
            ("cluster_raw_unsorted", cluster_raw, (ro, rd, tmin, tmax)),
        ]:
            try:
                rows.append((label, bench(fn, *args)))
            except Exception as e:
                rows.append((label, None))
                print(f"  {label}: FAIL {type(e).__name__} {str(e)[:120]}",
                      flush=True)
        print(f"--- {name} (N={N}) ---", flush=True)
        for label, dt in rows:
            if dt is not None:
                print(f"  {label:22s} {dt*1e3:8.1f} ms  "
                      f"{N/dt/1e6:8.2f} Mrays/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
