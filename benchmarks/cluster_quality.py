#!/usr/bin/env python
"""Cluster-construction quality experiment (VERDICT r4 next #4b).

Round 4's equilibrium analysis measured ~10-cluster per-ray oracle sets on
room bounce waves under the shipped Morton-run clustering (64 triangles
per cluster in BVH/Morton order) and a 7-13x lockstep block-union tax.
Hypothesis to test: better-shaped clusters (recursive bisection on
triangle centroids — balanced median splits along the widest axis, the
SAH-lite that k-means approximates for equal-size cells) shrink BOTH the
per-ray oracle visit count and the block unions.

Method: offline (CPU) on the captured b2 room wave (/tmp/room_waves.npz,
benchmarks/capture_waves.py): build the alternative 64-triangle
clustering, compute cluster AABBs, and compare per-ray oracle visits
(slab hit with tlo <= true closest t) and per-block union work under the
production ray ordering against the shipped table. A >= 30% union
reduction would justify wiring it into scene/build.py; anything less is a
committed negative result (the sweep/cluster backends are equilibrium-
bound per BASELINE r4 regardless).
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

M = 16384
CLUSTER = 64


def slab_np(lo, hi, ro, inv, tmin, tmax):
    t0 = (lo[None, :, :] - ro[:, None, :]) * inv[:, None, :]
    t1 = (hi[None, :, :] - ro[:, None, :]) * inv[:, None, :]
    tlo = np.minimum(t0, t1).max(-1)
    thi = np.maximum(t0, t1).min(-1)
    hit = (tlo <= thi) & (thi >= tmin[:, None]) & (tlo <= tmax[:, None])
    return hit, tlo


def bisect_clusters(cent, size):
    """Recursive balanced median split on the widest centroid axis ->
    cluster id per triangle (every cluster size <= `size`, all but the
    ragged tail exactly `size`)."""
    n = cent.shape[0]
    ids = np.zeros(n, np.int64)
    next_id = [0]

    def rec(idx):
        if idx.size <= size:
            ids[idx] = next_id[0]
            next_id[0] += 1
            return
        c = cent[idx]
        ax = int(np.argmax(c.max(0) - c.min(0)))
        order = idx[np.argsort(c[:, ax], kind="stable")]
        # split at a multiple of `size` nearest the median: keeps every
        # cluster full (fixed-64 table slots)
        half = (idx.size // 2 + size - 1) // size * size
        half = min(max(half, size), idx.size - 1)
        rec(order[:half])
        rec(order[half:])

    sys.setrecursionlimit(100000)
    rec(np.arange(n))
    return ids, next_id[0]


def cluster_aabbs(ids, n_cl, tri_lo, tri_hi):
    lo = np.full((n_cl, 3), 1e30, np.float32)
    hi = np.full((n_cl, 3), -1e30, np.float32)
    np.minimum.at(lo, ids, tri_lo)
    np.maximum.at(hi, ids, tri_hi)
    return lo, hi


def union_work(visit, blocks=(64, 128, 256)):
    out = {}
    for B in blocks:
        nb = visit.shape[0] // B
        u = visit[: nb * B].reshape(nb, B, -1).any(1).sum(1)
        out[B] = float(u.sum() * B)
    return out


def main():
    from take_tpu.scene.parse_xml import parse_scene_file
    from take_tpu.geometry.traverse import _traverse, _morton8

    scene = parse_scene_file(os.path.join(ROOT, "scenes/room/room.xml"))
    waves = np.load("/tmp/room_waves.npz")
    name = sys.argv[1] if len(sys.argv) > 1 else "b2"
    act = waves.get(f"{name}_act")
    ro_all, rd_all = waves[f"{name}_ro"], waves[f"{name}_rd"]
    if act is not None:
        ro_all, rd_all = ro_all[act], rd_all[act]
    rng = np.random.default_rng(0)
    s0 = rng.integers(0, ro_all.shape[0] - M)
    ro, rd = ro_all[s0 : s0 + M], rd_all[s0 : s0 + M]
    tmin = np.full(M, 1e-4, np.float32)
    tmax = np.full(M, np.inf, np.float32)

    t_true, *_ = jax.jit(
        lambda *a: _traverse(scene, *a, any_hit=False)
    )(jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(tmin),
      jnp.asarray(tmax))
    tcap = np.where(np.asarray(t_true) < 3e38, np.asarray(t_true),
                    np.inf).astype(np.float32)
    inv = 1.0 / np.where(np.abs(rd) < 1e-20, 1e-20, rd)

    # triangle AABBs from the packed soup (v0, v0+e1, v0+e2)
    g = scene.geometry
    n_tri = int(scene.meta.n_tri)
    v0 = np.asarray(g.tri_v0)[:n_tri]
    p1 = v0 + np.asarray(g.tri_e1)[:n_tri]
    p2 = v0 + np.asarray(g.tri_e2)[:n_tri]
    tri_lo = np.minimum(np.minimum(v0, p1), p2).astype(np.float32)
    tri_hi = np.maximum(np.maximum(v0, p1), p2).astype(np.float32)
    cent = (tri_lo + tri_hi) * 0.5

    # production ray order (octant + origin morton) for the union model
    bmin = np.asarray(jnp.min(scene.bvh.node_min[0], axis=0))
    bmax = np.asarray(jnp.max(scene.bvh.node_max[0], axis=0))
    ext = np.maximum(bmax - bmin, 1e-12)
    oq = np.clip((ro - bmin) / ext * 256.0, 0, 255).astype(np.int32)
    om = np.asarray(_morton8(jnp.asarray(oq)))
    octant = ((rd[:, 0] < 0) << 2) | ((rd[:, 1] < 0) << 1) | (rd[:, 2] < 0)
    order = np.lexsort((om, octant))
    ro_s, inv_s = ro[order], inv[order]
    tmin_s, tcap_s = tmin[order], tcap[order]

    def evaluate(label, lo, hi, valid=None):
        if valid is not None:
            lo = np.where(valid[:, None], lo, 1e30)
            hi = np.where(valid[:, None], hi, -1e30)
        hit, _ = slab_np(lo, hi, ro_s, inv_s, tmin_s, tcap_s)
        per_ray = hit.sum(1)
        work = union_work(hit)
        ideal = float(per_ray.sum())
        print(f"{label:28s} oracle/ray mean {per_ray.mean():6.2f} "
              f"p95 {np.percentile(per_ray, 95):4.0f}  "
              + "  ".join(f"B{B} tax {w/ideal:5.2f}x"
                          for B, w in work.items()), flush=True)
        return per_ray.mean(), work

    cl = np.asarray(scene.bvh.cl_aabb)
    valid_cl = ~np.isnan(cl[:, 0])
    base_mean, base_work = evaluate(
        "shipped morton-run 64", cl[:, 0:3], cl[:, 3:6], valid_cl)

    ids, n_cl = bisect_clusters(cent, CLUSTER)
    lo, hi = cluster_aabbs(ids, n_cl, tri_lo, tri_hi)
    bis_mean, bis_work = evaluate(
        f"recursive-bisection {n_cl}cl", lo, hi)

    import json

    rec = {
        "wave": name,
        "oracle_per_ray": {"shipped": round(float(base_mean), 2),
                           "bisection": round(float(bis_mean), 2)},
        "union_work_B256": {"shipped": base_work[256],
                            "bisection": bis_work[256]},
        "union_reduction_B256": round(
            1.0 - bis_work[256] / base_work[256], 4),
    }
    res_path = os.path.join(ROOT, "benchmarks", "results_r5.json")
    d = json.load(open(res_path)) if os.path.exists(res_path) else {}
    d["cluster_quality"] = rec
    json.dump(d, open(res_path, "w"), indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
