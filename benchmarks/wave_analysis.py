#!/usr/bin/env python
"""Offline divergence analysis of captured room bounce waves (CPU).

For a subsample of a bounce wave, computes the ORACLE near-first visit set
(boxes with tlo <= true closest t) at cluster/sup/leaf granularity, then the
per-block union cost under different ray orderings — quantifying how much of
the incoherent-wave tax is recoverable by binning vs design. Reads
/tmp/room_waves.npz.
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from take_tpu.scene.parse_xml import parse_scene_file  # noqa: E402
from take_tpu.geometry.traverse import _traverse, _morton8  # noqa: E402

M = 16384  # subsample size


def slab_np(lo, hi, ro, inv, tmin, tmax):
    """lo/hi [C, 3], ro/inv [M, 3] -> hit [M, C], tlo [M, C]."""
    t0 = (lo[None, :, :] - ro[:, None, :]) * inv[:, None, :]
    t1 = (hi[None, :, :] - ro[:, None, :]) * inv[:, None, :]
    tlo = np.minimum(t0, t1).max(-1)
    thi = np.maximum(t0, t1).min(-1)
    hit = (tlo <= thi) & (thi >= tmin[:, None]) & (tlo <= tmax[:, None])
    return hit, tlo


def union_stats(visit, order, blocks):
    """visit [M, C] bool, order [M] permutation -> mean block-union size and
    total block work (union * B) for each block size."""
    v = visit[order]
    out = {}
    for B in blocks:
        nb = v.shape[0] // B
        u = v[: nb * B].reshape(nb, B, -1).any(1).sum(1)  # [nb]
        out[B] = (float(u.mean()), float(u.sum() * B))
    return out


def main():
    scene = parse_scene_file(os.path.join(ROOT, "scenes/room/room.xml"))
    waves = np.load("/tmp/room_waves.npz")
    g = scene.geometry
    bvh = scene.bvh

    name = sys.argv[1] if len(sys.argv) > 1 else "b2"
    act = waves.get(f"{name}_act")
    ro_all = waves[f"{name}_ro"]
    rd_all = waves[f"{name}_rd"]
    if act is not None:
        ro_all, rd_all = ro_all[act], rd_all[act]
    rng = np.random.default_rng(0)
    # keep original order for locality studies: subsample a contiguous run
    s0 = rng.integers(0, ro_all.shape[0] - M)
    ro, rd = ro_all[s0 : s0 + M], rd_all[s0 : s0 + M]
    tmin = np.full(M, 1e-4, np.float32)
    tmax = np.full(M, np.inf, np.float32)

    t0 = time.time()
    t_true, *_ = jax.jit(
        lambda *a: _traverse(scene, *a, any_hit=False)
    )(jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(tmin), jnp.asarray(tmax))
    t_true = np.asarray(t_true)
    print(f"true t via jnp traversal in {time.time()-t0:.1f}s "
          f"(hit rate {(t_true < 3e38).mean():.3f})", flush=True)
    tcap = np.where(t_true < 3e38, t_true, np.inf).astype(np.float32)

    inv = 1.0 / np.where(np.abs(rd) < 1e-20, 1e-20, rd)

    # --- cluster / sup tables ---
    cl = np.asarray(bvh.cl_aabb)
    sup = np.asarray(bvh.sup_aabb)
    valid_cl = ~np.isnan(cl[:, 0])
    valid_sup = ~np.isnan(sup[:, 0])

    results = {}
    for label, table, valid in [
        ("cluster64", cl, valid_cl),
        ("sup512", sup, valid_sup),
    ]:
        lo, hi = table[:, 0:3], table[:, 3:6]
        lo = np.where(valid[:, None], lo, 1e30)
        hi = np.where(valid[:, None], hi, -1e30)
        hit, tlo = slab_np(lo, hi, ro, inv, tmin, tcap)
        per_ray = hit.sum(1)
        results[label] = (hit, tlo, per_ray)
        print(f"{label}: per-ray oracle visits mean {per_ray.mean():.1f} "
              f"p50 {np.percentile(per_ray, 50):.0f} "
              f"p95 {np.percentile(per_ray, 95):.0f} "
              f"max {per_ray.max()}", flush=True)

    # --- leaf granularity (packet kernel model) ---
    nm = np.asarray(bvh.node_min).reshape(-1, 3)
    nx = np.asarray(bvh.node_max).reshape(-1, 3)
    ch = np.asarray(bvh.node_child).reshape(-1)
    ct = np.asarray(bvh.node_count).reshape(-1)
    leaf_mask = (ch < 0) & (ct > 0)
    lo, hi = nm[leaf_mask], nx[leaf_mask]
    print(f"leaves: {leaf_mask.sum()} runs, mean size "
          f"{ct[leaf_mask].mean():.1f}", flush=True)
    # chunk rays to bound memory
    hits = []
    for i in range(0, M, 4096):
        h, _ = slab_np(lo, hi, ro[i : i + 4096], inv[i : i + 4096],
                       tmin[i : i + 4096], tcap[i : i + 4096])
        hits.append(h)
    leaf_hit = np.concatenate(hits, 0)
    per_ray_leaf = leaf_hit.sum(1)
    print(f"leaf: per-ray oracle visits mean {per_ray_leaf.mean():.1f} "
          f"p95 {np.percentile(per_ray_leaf, 95):.0f}", flush=True)
    results["leaf"] = (leaf_hit, None, per_ray_leaf)

    # --- orderings ---
    bmin = np.asarray(jnp.min(bvh.node_min[0], axis=0))
    bmax = np.asarray(jnp.max(bvh.node_max[0], axis=0))
    ext = np.maximum(bmax - bmin, 1e-12)
    oq = np.clip((ro - bmin) / ext * 256.0, 0, 255).astype(np.int32)
    om = np.asarray(_morton8(jnp.asarray(oq)))
    octant = ((rd[:, 0] < 0) << 2) | ((rd[:, 1] < 0) << 1) | (rd[:, 2] < 0)
    dq = np.clip(np.abs(rd) * 4.0, 0, 3).astype(np.int32)
    dm = np.asarray(_morton8(jnp.asarray(dq)))

    orders = {
        "as_captured": np.arange(M),
        "octant_then_origin24": np.lexsort((om, octant)),
        "origin24_only": np.argsort(om),
        "origin12_then_octant": np.lexsort((octant, om >> 12)),
        "octant_dir2_origin": np.lexsort((om, dm, octant)),
    }
    # first-candidate ordering: nearest hit cluster id
    hit_c, tlo_c, _ = results["cluster64"]
    tlo_m = np.where(hit_c, tlo_c, np.inf)
    first_cl = tlo_m.argmin(1)
    orders["first_cluster"] = np.lexsort((om, first_cl))

    for label in ["cluster64", "sup512", "leaf"]:
        visit, _, per_ray = results[label]
        ideal = float(per_ray.sum())
        print(f"--- {label}: block work = union*B; tax = work/ideal "
              f"(ideal={ideal:.0f}) ---", flush=True)
        for oname, order in orders.items():
            st = union_stats(visit, order, [64, 128, 256])
            line = "  ".join(
                f"B{B}: u={u:6.1f} tax={w / ideal:5.1f}x"
                for B, (u, w) in st.items()
            )
            print(f"  {oname:22s} {line}", flush=True)


if __name__ == "__main__":
    main()
