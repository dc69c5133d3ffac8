"""Streaming two-level cull+sweep traversal for beyond-VMEM scenes (TPU).

This is the any-scene-size traversal path — the capability match for the
reference's recursive BVH (bvh.cpp:86-109) — designed around what the TPU
does well (dense [rows, lanes] VPU sweeps, large contiguous DMA) and what it
cannot do (per-lane pointer chasing). Triangle data stays in HBM; scene size
is bounded by HBM, not VMEM. Compared to the packet kernel
(pallas_traverse.py), which collapses ~1000x on direction-incoherent bounce
waves (any-hit-pushes make every 256-ray packet traverse the whole tree),
work here is bounded per 128-ray block at CLUSTER granularity:

  1. CULL kernel — every 128-ray block slab-tests all SUPERCLUSTER AABBs
     (a supercluster = SUP consecutive Morton-ordered clusters = SUP*K
     triangles). Output: dense [nb, Csup] hit mask. Small table, pure VPU.
  2. XLA glue — each mask row is turned into an ascending hit-index list
     (one lax.sort along the tiny supercluster axis) + count: a fixed-shape
     [nb, 1 + CsupP] int32 "suplist". No dynamic grids anywhere.
  3. SWEEP kernel — grid over ray blocks (static). Each block loops over
     its listed superclusters: the supercluster's triangle rows stream
     HBM->VMEM through a manually double-buffered async copy (48KB
     contiguous per supercluster), its SUP cluster boxes are re-tested
     against the block from the VMEM-resident cluster-AABB table, and only
     clusters some ray hits run the dense [K, 128] Moeller-Trumbore sweep
     (lax.cond-skipped otherwise). best-t shrinks as hits land, culling
     later boxes.

Every Mosaic feature used here (SMEM scalar lists, lax.cond predication,
dynamic sublane slices with multiple-of-8 starts, async HBM DMA) is the
conservative, long-supported subset; the previous revision of this file
used dynamic grids + scalar prefetch windows, which compiled standalone but
aborted the TPU backend when embedded in the integrator's bounce loop.

Determinism: the winner is the lowest-t hit with ties broken toward the
lowest primitive index (superclusters ascend, clusters within a
supercluster ascend, per-cluster argmin takes the first row, cross-cluster
merges use strict `<`), so results are independent of block grouping and
device count.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from take_tpu.geometry.bvh import CLUSTER_K, SUP

BLOCK = 128  # rays per block: one lane tile; small blocks keep the
# per-block cluster union close to the per-ray average on incoherent waves
SUPT = SUP * CLUSTER_K  # triangles per supercluster (DMA granule)
_BIG = 3.4e38
_DW_EPS = 1e-12  # parallel-ray reject, matches intersect.py


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _ray_components(rays_ref):
    """Unpack a [1, 8, B] ray block into [1, B] component rows."""
    ox = rays_ref[0, 0:1, :]
    oy = rays_ref[0, 1:2, :]
    oz = rays_ref[0, 2:3, :]
    dx = rays_ref[0, 3:4, :]
    dy = rays_ref[0, 4:5, :]
    dz = rays_ref[0, 5:6, :]
    tmin = rays_ref[0, 6:7, :]
    tmax = rays_ref[0, 7:8, :]
    return ox, oy, oz, dx, dy, dz, tmin, tmax


def _inv_dir(dx, dy, dz):
    ix = 1.0 / jnp.where(jnp.abs(dx) < 1e-20, 1e-20, dx)
    iy = 1.0 / jnp.where(jnp.abs(dy) < 1e-20, 1e-20, dy)
    iz = 1.0 / jnp.where(jnp.abs(dz) < 1e-20, 1e-20, dz)
    return ix, iy, iz


def _slab_rows(boxes, ox, oy, oz, ix, iy, iz, tmin, tcap):
    """Slab-test box rows [R, 8] against a ray block -> [R, B] hit mask.

    Inclusive-range semantics match bbox.h:18-32 / traverse.py::_slab_test.
    """

    def axis(lo_col, hi_col, o, inv):
        a = (lo_col - o) * inv  # [R, B]
        b = (hi_col - o) * inv
        return jnp.minimum(a, b), jnp.maximum(a, b)

    l0, h0 = axis(boxes[:, 0:1], boxes[:, 3:4], ox, ix)
    l1, h1 = axis(boxes[:, 1:2], boxes[:, 4:5], oy, iy)
    l2, h2 = axis(boxes[:, 2:3], boxes[:, 5:6], oz, iz)
    tlo = jnp.maximum(jnp.maximum(l0, l1), l2)
    thi = jnp.minimum(jnp.minimum(h0, h1), h2)
    return (tlo <= thi) & (thi >= tmin) & (tlo <= tcap)


def _cull_kernel(rays_ref, boxes_ref, mask_ref):
    """One ray block vs one chunk of supercluster AABBs -> any-ray hit mask.

    rays [1, 8, B]; boxes [CC, 8] = (min.xyz, max.xyz, 0, 0);
    mask out [1, CC, 1] = 1.0 where ANY ray in the block hits the box.
    """
    ox, oy, oz, dx, dy, dz, tmin, tmax = _ray_components(rays_ref)
    ix, iy, iz = _inv_dir(dx, dy, dz)
    hit = _slab_rows(boxes_ref[:], ox, oy, oz, ix, iy, iz, tmin, tmax)
    mask_ref[0, :, :] = jnp.any(hit, axis=1, keepdims=True).astype(jnp.float32)


def _mt_cluster(blk, ox, oy, oz, dx, dy, dz, tmin, tcap):
    """Dense [K, B] Moeller-Trumbore over one cluster's affine operands.

    VPU component form (the contraction depth is 3-4 — matmul form would run
    the MXU at ~3% utilization; broadcast-FMA chains win). Exact f32 —
    identical semantics to intersect.py::_tri_uvt. Returns (t, u, v, ok).
    """
    su = blk[:, 0:1] * ox + blk[:, 1:2] * oy + blk[:, 2:3] * oz + blk[:, 3:4]
    sv = blk[:, 4:5] * ox + blk[:, 5:6] * oy + blk[:, 6:7] * oz + blk[:, 7:8]
    sw = blk[:, 8:9] * ox + blk[:, 9:10] * oy + blk[:, 10:11] * oz + blk[:, 11:12]
    du = blk[:, 12:13] * dx + blk[:, 13:14] * dy + blk[:, 14:15] * dz
    dv = blk[:, 15:16] * dx + blk[:, 16:17] * dy + blk[:, 17:18] * dz
    dw = blk[:, 18:19] * dx + blk[:, 19:20] * dy + blk[:, 20:21] * dz

    parallel = jnp.abs(dw) < _DW_EPS
    inv_dw = 1.0 / jnp.where(parallel, 1.0, dw)
    t = -sw * inv_dw
    u = su + t * du
    v = sv + t * dv
    ok = (
        (~parallel)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= tmin)
        & (t <= tcap)
    )
    return t, u, v, ok


def _sweep_kernel(
    suplist_ref,  # SMEM [1, 1 + CsupP] int32: (count, ascending sup ids...)
    rays_ref,  # VMEM [1, 8, B]
    cl_ref,  # VMEM [Cpad, 8] cluster AABBs (whole table resident)
    tri_hbm,  # ANY  [Tsw, 24] triangle affine operands (stays in HBM)
    t_ref,  # out [1, 1, B]
    u_ref,
    v_ref,
    p_ref,  # out [1, 1, B] int32
    tris,  # VMEM scratch [2, SUPT, 24] — double-buffered DMA landing
    sem,  # DMA semaphores (2,)
):
    ox, oy, oz, dx, dy, dz, tmin, tmax = _ray_components(rays_ref)
    ix, iy, iz = _inv_dir(dx, dy, dz)
    cnt = suplist_ref[0, 0]

    def get_dma(slot, j):
        sup = suplist_ref[0, 1 + j]
        return pltpu.make_async_copy(
            tri_hbm.at[pl.ds(sup * SUPT, SUPT), :],
            tris.at[slot],
            sem.at[slot],
        )

    @pl.when(cnt > 0)
    def _():
        get_dma(0, 0).start()

    def sup_body(j, carry):
        t_best, u_best, v_best, p_best = carry
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < cnt)
        def _():
            get_dma(jax.lax.rem(j + 1, 2), j + 1).start()

        get_dma(slot, j).wait()
        sup = suplist_ref[0, 1 + j]

        # refine: this supercluster's SUP cluster boxes vs the block,
        # capped by the current best t (progressive culling)
        boxes = cl_ref[pl.ds(pl.multiple_of(sup * SUP, SUP), SUP), :]
        hit = _slab_rows(boxes, ox, oy, oz, ix, iy, iz, tmin, t_best)
        anyhit = jnp.any(hit, axis=1, keepdims=True).astype(jnp.int32)

        # static unroll over the SUP clusters; non-hit clusters cost one
        # scalar test (lax.cond — the packet kernel's proven pattern)
        for k in range(SUP):
            def sweep(c, k=k):
                t_b, u_b, v_b, p_b = c
                blk = tris[slot, k * CLUSTER_K : (k + 1) * CLUSTER_K, :]
                t, u, v, ok = _mt_cluster(
                    blk, ox, oy, oz, dx, dy, dz, tmin, t_b
                )
                tm = jnp.where(ok, t, _BIG)
                row = jnp.argmin(tm, axis=0)  # first (lowest) row on ties
                tnew = jnp.min(tm, axis=0)[None, :]
                lane = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 0)
                onehot = (lane == row[None, :]).astype(tm.dtype)
                unew = jnp.sum(u * onehot, axis=0)[None, :]
                vnew = jnp.sum(v * onehot, axis=0)[None, :]
                better = tnew < t_b  # strict: earlier cluster keeps ties
                prim = (sup * SUP + k) * CLUSTER_K + row[None, :]
                return (
                    jnp.where(better, tnew, t_b),
                    jnp.where(better, unew, u_b),
                    jnp.where(better, vnew, v_b),
                    jnp.where(better, prim, p_b),
                )

            carry2 = (t_best, u_best, v_best, p_best)
            t_best, u_best, v_best, p_best = jax.lax.cond(
                anyhit[k, 0] > 0, sweep, lambda c: c, carry2
            )
        return (t_best, u_best, v_best, p_best)

    init = (
        jnp.full(tmin.shape, _BIG),
        jnp.zeros(tmin.shape),
        jnp.zeros(tmin.shape),
        jnp.full(tmin.shape, -1, jnp.int32),
    )
    t_best, u_best, v_best, p_best = jax.lax.fori_loop(
        0, cnt, sup_body, init
    )
    ok = t_best <= tmax
    t_ref[0, :, :] = jnp.where(ok, t_best, _BIG)
    u_ref[0, :, :] = u_best
    v_ref[0, :, :] = v_best
    p_ref[0, :, :] = jnp.where(ok, p_best, -1)


def _occluded_kernel(
    suplist_ref, rays_ref, cl_ref, tri_hbm, occ_ref, tris, sem
):
    """TRUE any-hit sweep (the kernel the reference lacks — its
    scene_occluded is a full closest-hit, scene.cpp:49-63 ⚠): no best-hit
    bookkeeping, and the supercluster loop exits as soon as every live ray
    in the block is occluded."""
    ox, oy, oz, dx, dy, dz, tmin, tmax = _ray_components(rays_ref)
    ix, iy, iz = _inv_dir(dx, dy, dz)
    cnt = suplist_ref[0, 0]

    def get_dma(slot, j):
        sup = suplist_ref[0, 1 + j]
        return pltpu.make_async_copy(
            tri_hbm.at[pl.ds(sup * SUPT, SUPT), :],
            tris.at[slot],
            sem.at[slot],
        )

    @pl.when(cnt > 0)
    def _():
        get_dma(0, 0).start()

    # live = rays that can still be hit (padding has tmax < tmin => dead)
    live0 = (tmax >= tmin).astype(jnp.int32)

    def cond(state):
        j, occ, started_next = state
        done = jnp.sum((occ == 0) & (live0 > 0)) == 0
        return (j < cnt) & ~done

    def body(state):
        j, occ, started_next = state
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < cnt)
        def _():
            get_dma(jax.lax.rem(j + 1, 2), j + 1).start()

        get_dma(slot, j).wait()
        sup = suplist_ref[0, 1 + j]
        boxes = cl_ref[pl.ds(pl.multiple_of(sup * SUP, SUP), SUP), :]
        # only unoccluded rays keep testing (tcap stays tmax: any hit counts)
        pend = (occ == 0) & (live0 > 0)
        hit = _slab_rows(boxes, ox, oy, oz, ix, iy, iz, tmin, tmax) & pend
        anyhit = jnp.any(hit, axis=1, keepdims=True).astype(jnp.int32)

        for k in range(SUP):
            def sweep(o, k=k):
                blk = tris[slot, k * CLUSTER_K : (k + 1) * CLUSTER_K, :]
                _, _, _, ok = _mt_cluster(
                    blk, ox, oy, oz, dx, dy, dz, tmin, tmax
                )
                return o | jnp.any(ok, axis=0, keepdims=True).astype(jnp.int32)

            occ = jax.lax.cond(anyhit[k, 0] > 0, sweep, lambda o: o, occ)
        return (j + 1, occ, started_next)

    # NOTE on the early exit + prefetch interaction: when the loop exits
    # early, the prefetched next-supercluster DMA may still be in flight
    # into the other slot; it targets scratch only and pallas waits for
    # outstanding DMAs at kernel end, so this is benign.
    state = (jnp.int32(0), jnp.zeros(tmin.shape, jnp.int32), jnp.int32(0))
    _, occ, _ = jax.lax.while_loop(cond, body, state)
    occ_ref[0, :, :] = occ


# ---------------------------------------------------------------------------
# host-level glue (all inside jit; every shape static)
# ---------------------------------------------------------------------------


def _ray_blocks(ro, rd, tmin, tmax):
    """Pack padded ray SoA [Np] into [nb, 8, BLOCK] component blocks."""
    Np = ro.shape[0]
    nb = Np // BLOCK
    rows = jnp.concatenate(
        [ro.T, rd.T, tmin[None, :], tmax[None, :]], axis=0
    )  # [8, Np]
    return rows.reshape(8, nb, BLOCK).transpose(1, 0, 2)


def _cull(rays, sup_aabb, interpret):
    """[nb, CsupP] f32 block-level supercluster hit mask."""
    nb = rays.shape[0]
    Csup = sup_aabb.shape[0]
    return pl.pallas_call(
        _cull_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 8, BLOCK), lambda b: (b, 0, 0)),
            pl.BlockSpec((Csup, 8), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Csup, 1), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, Csup, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
        interpret=interpret,
    )(rays, sup_aabb)[:, :, 0]


def _suplists(mask):
    """[nb, Csup] mask -> [nb, 1 + Csup] int32 rows of
    (count, ascending hit supercluster ids, padding).

    Padding entries are 0 (a valid id) but never read: the kernel loops
    exactly `count` superclusters."""
    nb, Csup = mask.shape
    hit = mask > 0.5
    ids = jnp.broadcast_to(
        jnp.arange(Csup, dtype=jnp.int32)[None, :], (nb, Csup)
    )
    keyed = jnp.where(hit, ids, jnp.int32(Csup))  # misses sort to the tail
    ordered = jax.lax.sort(keyed, dimension=1)
    ordered = jnp.where(ordered == Csup, 0, ordered)
    count = jnp.sum(hit, axis=1, dtype=jnp.int32)
    return jnp.concatenate([count[:, None], ordered], axis=1)


def _sweep(rays, suplist, cl_aabb, tri_sweep, any_hit, interpret):
    nb = rays.shape[0]
    Cpad = cl_aabb.shape[0]
    W = suplist.shape[1]
    if any_hit:
        kernel = _occluded_kernel
        out_shape = [jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.int32)]
    else:
        kernel = _sweep_kernel
        out_shape = [
            jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.int32),
        ]
    out_spec = pl.BlockSpec((1, 1, BLOCK), lambda b: (b, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, W), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, BLOCK), lambda b: (b, 0, 0)),
            pl.BlockSpec((Cpad, 8), lambda b: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # triangles stay in HBM
        ],
        out_specs=[out_spec] * len(out_shape),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, SUPT, 24), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
        interpret=interpret,
    )(suplist, rays, cl_aabb, tri_sweep)


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def cluster_traverse(
    cl_aabb,
    sup_aabb,
    tri_sweep,
    ro,
    rd,
    tmin,
    tmax,
    any_hit: bool = False,
    interpret: bool = False,
):
    """Traverse rays against the clustered triangle soup.

    Args:
        cl_aabb: [Cpad, 8] cluster AABB table (BVHArrays.cl_aabb).
        sup_aabb: [Cpad/SUP, 8] supercluster AABB table (BVHArrays.sup_aabb).
        tri_sweep: [Cpad*K, 24] row-major triangle affine operands
            (GeometryArrays.tri_sweep).
        ro, rd, tmin, tmax: padded ray SoA; N must be a multiple of BLOCK
            (callers pad with tmax < tmin rays).
    Returns:
        any_hit=False: (t, u, v, prim) [N]; prim == -1 marks a miss
            (t is _BIG there).
        any_hit=True: occluded bool [N].
    """
    N = ro.shape[0]
    rays = _ray_blocks(ro, rd, tmin, tmax)
    mask = _cull(rays, sup_aabb, interpret)
    suplist = _suplists(mask)
    outs = _sweep(rays, suplist, cl_aabb, tri_sweep, any_hit, interpret)

    def unblock(x):
        return x[:, 0, :].reshape(N)

    if any_hit:
        return unblock(outs[0]) > 0
    t = unblock(outs[0])
    u = unblock(outs[1])
    v = unblock(outs[2])
    prim = unblock(outs[3])
    return t, u, v, prim
