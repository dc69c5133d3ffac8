#!/usr/bin/env python
"""Serial on-TPU measurement session (one TPU client, guarded steps).

Usage: python benchmarks/tpu_session.py [step ...]
Steps: room_profile textured cbox room_render
"""

import dataclasses
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _step(name):
    wanted = sys.argv[1:]
    return not wanted or name in wanted


def main():
    import jax
    import jax.numpy as jnp

    from take_tpu.config import enable_compile_cache

    enable_compile_cache()
    from take_tpu.render import render_image, render_pass
    from take_tpu.scene.parse_xml import parse_scene_file
    from take_tpu.scene.types import RenderOptions

    print("devices:", jax.devices(), flush=True)

    def timed(fn, *a, reps=3, **kw):
        out = jax.block_until_ready(fn(*a, **kw))  # compile
        t0 = time.time()
        for _ in range(reps):
            out = fn(*a, **kw)
        jax.block_until_ready(out)
        return (time.time() - t0) / reps, out

    if _step("room_profile"):
        try:
            from take_tpu.geometry.intersect import intersect_scene, occluded

            scene = parse_scene_file(os.path.join(ROOT, "scenes/room/room.xml"))
            print("room tris:", scene.meta.n_tri, flush=True)
            N = 1 << 18
            rng = np.random.default_rng(3)
            # primary-like rays from the camera region
            cam = scene.meta.camera
            ro0 = np.asarray(cam.lookfrom, np.float32)
            d = rng.normal(size=(N, 3)).astype(np.float32)
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            ro = jnp.asarray(np.tile(ro0, (N, 1)))
            rd = jnp.asarray(d)
            tmin = jnp.full(N, 1e-3)
            tmax = jnp.full(N, jnp.inf)
            f_int = jax.jit(lambda *a: intersect_scene(scene, *a).t)
            dt, tvals = timed(f_int, ro, rd, tmin, tmax)
            print(f"[room] intersect fan-out rays: {N/dt/1e6:.1f} Mrays/s "
                  f"({dt*1e3:.0f} ms)", flush=True)
            # incoherent bounce-like rays: random origins inside the room
            lo = np.asarray(jnp.nanmin(scene.bvh.sup_aabb[:, 0:3], axis=0))
            hi = np.asarray(jnp.nanmax(scene.bvh.sup_aabb[:, 3:6], axis=0))
            ro_i = jnp.asarray(
                rng.uniform(lo, hi, (N, 3)).astype(np.float32))
            rd_i = jnp.asarray(
                (lambda v: v / np.linalg.norm(v, axis=1, keepdims=True))(
                    rng.normal(size=(N, 3)).astype(np.float32)))
            dt, _ = timed(f_int, ro_i, rd_i, tmin, tmax)
            print(f"[room] intersect incoherent: {N/dt/1e6:.1f} Mrays/s",
                  flush=True)
            # shadow-like rays: short tmax toward a fixed point
            f_occ = jax.jit(lambda *a: occluded(scene, *a))
            tgt = 0.5 * (lo + hi)
            delta = tgt[None, :] - np.asarray(ro_i)
            dist = np.linalg.norm(delta, axis=1, keepdims=True)
            rd_s = jnp.asarray((delta / dist).astype(np.float32))
            tmax_s = jnp.asarray((dist[:, 0] * 0.3).astype(np.float32))
            dt, _ = timed(f_occ, ro_i, rd_s, tmin, tmax_s)
            print(f"[room] occluded short-tmax: {N/dt/1e6:.1f} Mrays/s",
                  flush=True)
            # one full render pass band
            opts = RenderOptions(spp=8, max_depth=6, seed=0)
            pix = jnp.arange(1 << 18, dtype=jnp.int32)
            dt, _ = timed(
                lambda s: render_pass(scene, opts, pix, s, 1920, 1),
                jnp.int32(0), reps=2,
            )
            q = (1 << 18) * 15
            print(f"[room] render_pass 256k paths depth6: {dt:.2f}s "
                  f"{q/dt/1e6:.1f} Mrays/s nominal", flush=True)
        except Exception as e:
            print("[room_profile] FAIL", type(e).__name__, str(e)[:300],
                  flush=True)

    if _step("room_stages"):
        try:
            from take_tpu.geometry.intersect import intersect_scene
            from take_tpu.geometry.pallas_traverse import (
                packet_traverse, prep_tables,
            )
            from take_tpu.geometry.traverse import _coherence_perm

            scene = parse_scene_file(os.path.join(ROOT, "scenes/room/room.xml"))
            N = 1 << 18
            rng = np.random.default_rng(3)
            lo = np.asarray(jnp.nanmin(scene.bvh.sup_aabb[:, 0:3], axis=0))
            hi = np.asarray(jnp.nanmax(scene.bvh.sup_aabb[:, 3:6], axis=0))
            ro = jnp.asarray(rng.uniform(lo, hi, (N, 3)).astype(np.float32))
            d = rng.normal(size=(N, 3)).astype(np.float32)
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            rd = jnp.asarray(d)
            tmin = jnp.full(N, 1e-3)
            tmax = jnp.full(N, jnp.inf)

            # (a) raw binned packet traversal, no shading
            nodes, tris = prep_tables(scene)

            def raw(ro_q, rd_q, tmin_q, tmax_q):
                perm, inv = _coherence_perm(scene, ro_q, rd_q)
                t, u, v, p = packet_traverse(
                    nodes, tris, ro_q[perm], rd_q[perm],
                    tmin_q[perm], tmax_q[perm],
                )
                return t[inv]

            dt, _ = timed(jax.jit(raw), ro, rd, tmin, tmax)
            print(f"[stages] raw binned packet: {N/dt/1e6:.1f} Mrays/s "
                  f"({dt*1e3:.0f} ms)", flush=True)
            # (b) full intersect_scene (traversal + merge/shade attributes)
            f_int = jax.jit(lambda *a: intersect_scene(scene, *a).t)
            dt, _ = timed(f_int, ro, rd, tmin, tmax)
            print(f"[stages] intersect_scene: {N/dt/1e6:.1f} Mrays/s "
                  f"({dt*1e3:.0f} ms)", flush=True)
        except Exception as e:
            print("[room_stages] FAIL", type(e).__name__, str(e)[:300],
                  flush=True)

    if _step("room_keys"):
        try:
            from take_tpu import config as _config
            from take_tpu.geometry.pallas_traverse import (
                packet_traverse, prep_tables,
            )
            import take_tpu.geometry.traverse as TR

            scene = parse_scene_file(os.path.join(ROOT, "scenes/room/room.xml"))
            N = 1 << 18
            rng = np.random.default_rng(3)
            lo = np.asarray(jnp.nanmin(scene.bvh.sup_aabb[:, 0:3], axis=0))
            hi = np.asarray(jnp.nanmax(scene.bvh.sup_aabb[:, 3:6], axis=0))
            ro = jnp.asarray(rng.uniform(lo, hi, (N, 3)).astype(np.float32))
            d = rng.normal(size=(N, 3)).astype(np.float32)
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            rd = jnp.asarray(d)
            tmin = jnp.full(N, 1e-3)
            tmax = jnp.full(N, jnp.inf)
            nodes, tris = prep_tables(scene)

            for db in [0, 1, 2]:
                _config.SORT_DIR_BITS = db

                def raw(ro_q, rd_q, tmin_q, tmax_q):
                    perm, inv = TR._coherence_perm(scene, ro_q, rd_q)
                    t, *_ = packet_traverse(
                        nodes, tris, ro_q[perm], rd_q[perm],
                        tmin_q[perm], tmax_q[perm],
                    )
                    return t[inv]

                dt, _ = timed(jax.jit(raw), ro, rd, tmin, tmax)
                print(f"[keys] dir_bits={db}: incoherent "
                      f"{N/dt/1e6:.1f} Mrays/s", flush=True)
            _config.SORT_DIR_BITS = 0
        except Exception as e:
            print("[room_keys] FAIL", type(e).__name__, str(e)[:300],
                  flush=True)

    if _step("room_leaf32"):
        try:
            # experiment: LEAF_SIZE=32 (fewer, fatter leaves) — monkeypatch
            # the build constants before the scene builds
            import take_tpu.geometry.bvh as B
            import take_tpu.geometry.pallas_traverse as PT

            B.LEAF_SIZE = 32
            PT.WINDOW = 40
            from take_tpu.geometry.pallas_traverse import (
                packet_traverse, prep_tables,
            )
            from take_tpu.geometry.traverse import _coherence_perm

            scene = parse_scene_file(os.path.join(ROOT, "scenes/room/room.xml"))
            N = 1 << 18
            rng = np.random.default_rng(3)
            lo = np.asarray(jnp.nanmin(scene.bvh.sup_aabb[:, 0:3], axis=0))
            hi = np.asarray(jnp.nanmax(scene.bvh.sup_aabb[:, 3:6], axis=0))
            ro = jnp.asarray(rng.uniform(lo, hi, (N, 3)).astype(np.float32))
            d = rng.normal(size=(N, 3)).astype(np.float32)
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            rd = jnp.asarray(d)
            tmin = jnp.full(N, 1e-3)
            tmax = jnp.full(N, jnp.inf)
            nodes, tris = prep_tables(scene)

            def raw(ro_q, rd_q, tmin_q, tmax_q):
                perm, inv = _coherence_perm(scene, ro_q, rd_q)
                t, *_ = packet_traverse(
                    nodes, tris, ro_q[perm], rd_q[perm],
                    tmin_q[perm], tmax_q[perm],
                )
                return t[inv]

            dt, tvals = timed(jax.jit(raw), ro, rd, tmin, tmax)
            print(f"[leaf32] incoherent {N/dt/1e6:.1f} Mrays/s "
                  f"(hit {float((np.asarray(tvals) < 1e37).mean()):.2f})",
                  flush=True)
        except Exception as e:
            print("[room_leaf32] FAIL", type(e).__name__, str(e)[:300],
                  flush=True)

    if _step("room_tune"):
        try:
            from take_tpu.geometry.pallas_traverse import (
                packet_traverse, prep_tables,
            )
            from take_tpu.geometry.traverse import _coherence_perm

            scene = parse_scene_file(os.path.join(ROOT, "scenes/room/room.xml"))
            N = 1 << 18
            rng = np.random.default_rng(3)
            lo = np.asarray(jnp.nanmin(scene.bvh.sup_aabb[:, 0:3], axis=0))
            hi = np.asarray(jnp.nanmax(scene.bvh.sup_aabb[:, 3:6], axis=0))
            ro = jnp.asarray(rng.uniform(lo, hi, (N, 3)).astype(np.float32))
            d = rng.normal(size=(N, 3)).astype(np.float32)
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            rd = jnp.asarray(d)
            tmin = jnp.full(N, 1e-3)
            tmax = jnp.full(N, jnp.inf)
            nodes, tris = prep_tables(scene)

            for blk in [64, 128, 256]:
                def raw(ro_q, rd_q, tmin_q, tmax_q, blk=blk):
                    perm, inv = _coherence_perm(scene, ro_q, rd_q)
                    t, *_ = packet_traverse(
                        nodes, tris, ro_q[perm], rd_q[perm],
                        tmin_q[perm], tmax_q[perm], block=blk,
                    )
                    return t[inv]

                dt, _ = timed(jax.jit(raw), ro, rd, tmin, tmax)
                print(f"[tune] block={blk}: incoherent "
                      f"{N/dt/1e6:.1f} Mrays/s", flush=True)
        except Exception as e:
            print("[room_tune] FAIL", type(e).__name__, str(e)[:300],
                  flush=True)

    if _step("room_cluster"):
        try:
            from take_tpu import config as _config

            _config.FORCE_CLUSTER = True
            from take_tpu.geometry.intersect import intersect_scene

            scene = parse_scene_file(os.path.join(ROOT, "scenes/room/room.xml"))
            N = 1 << 18
            rng = np.random.default_rng(3)
            cam = scene.meta.camera
            ro = jnp.asarray(np.tile(np.asarray(cam.lookfrom, np.float32),
                                     (N, 1)))
            d = rng.normal(size=(N, 3)).astype(np.float32)
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            rd = jnp.asarray(d)
            tmin = jnp.full(N, 1e-3)
            tmax = jnp.full(N, jnp.inf)
            f_int = jax.jit(lambda *a: intersect_scene(scene, *a).t)
            dt, _ = timed(f_int, ro, rd, tmin, tmax)
            print(f"[room/cluster] intersect fan-out: {N/dt/1e6:.1f} Mrays/s",
                  flush=True)
            lo = np.asarray(jnp.nanmin(scene.bvh.sup_aabb[:, 0:3], axis=0))
            hi = np.asarray(jnp.nanmax(scene.bvh.sup_aabb[:, 3:6], axis=0))
            ro_i = jnp.asarray(rng.uniform(lo, hi, (N, 3)).astype(np.float32))
            rd_i = jnp.asarray(
                (lambda v: v / np.linalg.norm(v, axis=1, keepdims=True))(
                    rng.normal(size=(N, 3)).astype(np.float32)))
            dt, _ = timed(f_int, ro_i, rd_i, tmin, tmax)
            print(f"[room/cluster] intersect incoherent: {N/dt/1e6:.1f} "
                  f"Mrays/s", flush=True)
            _config.FORCE_CLUSTER = False
        except Exception as e:
            print("[room_cluster] FAIL", type(e).__name__, str(e)[:300],
                  flush=True)

    if _step("textured"):
        try:
            scene = parse_scene_file(
                os.path.join(ROOT, "scenes/textured/textured.xml"))
            opts = RenderOptions(spp=64, max_depth=6, seed=0)
            t0 = time.time()
            img = render_image(scene, dataclasses.replace(opts, spp=1))
            print(f"[textured] first 1spp: {time.time()-t0:.1f}s "
                  f"mean {img.mean():.4f}", flush=True)
            t0 = time.time()
            img = render_image(scene, opts)
            dt = time.time() - t0
            paths = 512 * 512 * 64
            print(f"[textured] full 512x512x64spp: {dt:.1f}s "
                  f"{paths*13/dt/1e6:.1f} Mrays/s nominal "
                  f"finite={np.isfinite(img).all()}", flush=True)
        except Exception as e:
            print("[textured] FAIL", type(e).__name__, str(e)[:300],
                  flush=True)

    if _step("cbox"):
        try:
            from take_tpu.core.camera import Camera

            scene = parse_scene_file(os.path.join(ROOT, "scenes/cbox/cbox.xml"))
            cam = scene.meta.camera
            scene = dataclasses.replace(
                scene,
                meta=dataclasses.replace(
                    scene.meta,
                    camera=Camera(1024, 1024, cam.lookfrom, cam.lookat,
                                  cam.up, cam.vfov),
                ),
            )
            opts = RenderOptions(spp=16, max_depth=4, seed=0)
            t0 = time.time()
            render_image(scene, dataclasses.replace(opts, spp=1))
            print(f"[cbox] first 1spp (compile): {time.time()-t0:.1f}s",
                  flush=True)
            t0 = time.time()
            img = render_image(scene, opts)
            dt = time.time() - t0
            rays = 1024 * 1024 * 16 * 11
            print(f"[cbox] 1024^2 x16spp: {dt:.2f}s {rays/dt/1e6:.1f} "
                  f"Mrays/s", flush=True)
        except Exception as e:
            print("[cbox] FAIL", type(e).__name__, str(e)[:300], flush=True)

    if _step("cbox_mrp"):
        try:
            from take_tpu.core.camera import Camera

            scene = parse_scene_file(os.path.join(ROOT, "scenes/cbox/cbox.xml"))
            cam = scene.meta.camera
            scene = dataclasses.replace(
                scene,
                meta=dataclasses.replace(
                    scene.meta,
                    camera=Camera(1024, 1024, cam.lookfrom, cam.lookat,
                                  cam.up, cam.vfov),
                ),
            )
            rays = 1024 * 1024 * 16 * 11
            for mrp in [1 << 20, 1 << 22, 1 << 23]:
                opts = RenderOptions(spp=16, max_depth=4, seed=0,
                                     max_rays_per_pass=mrp)
                render_image(scene, dataclasses.replace(
                    opts, spp=max(1, mrp // (1 << 20))))
                t0 = time.time()
                render_image(scene, opts)
                dt = time.time() - t0
                print(f"[cbox] mrp=2^{mrp.bit_length()-1}: {dt:.2f}s "
                      f"{rays/dt/1e6:.1f} Mrays/s", flush=True)
        except Exception as e:
            print("[cbox_mrp] FAIL", type(e).__name__, str(e)[:300],
                  flush=True)

    if _step("room_render"):
        try:
            from take_tpu.io.exr import write_exr

            scene = parse_scene_file(os.path.join(ROOT, "scenes/room/room.xml"))
            opts = RenderOptions(spp=16, max_depth=6, seed=0)
            t0 = time.time()
            img = render_image(scene, opts)
            dt = time.time() - t0
            paths = 1920 * 1080 * 16
            print(f"[room] 1080p x16spp: {dt:.1f}s "
                  f"{paths*15/dt/1e6:.1f} Mrays/s nominal "
                  f"finite={np.isfinite(img).all()}", flush=True)
            write_exr("/tmp/room_16spp.exr", img)
        except Exception as e:
            print("[room_render] FAIL", type(e).__name__, str(e)[:300],
                  flush=True)

    print("session done", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
