"""Streaming supercluster-sweep traversal for beyond-VMEM scenes (TPU).

This is the any-scene-size traversal path — the capability match for the
reference's recursive BVH (bvh.cpp:86-109) — designed around what the TPU
does well (MXU contractions, dense [rows, lanes] VPU ops, large contiguous
DMA) and what it cannot do (per-lane pointer chasing). Triangle data stays
in HBM; scene size is bounded by HBM, not VMEM. Compared to the packet
kernel (pallas_traverse.py), which collapses ~1000x on direction-incoherent
bounce waves (any-hit pushes make every packet traverse the whole tree),
work here is bounded per 128-ray block at SUPERCLUSTER granularity
(SUP*K = 512 Morton-ordered triangles).

ONE kernel, grid = ray blocks, fully self-contained. This is the fourth
revision; the earlier ones all passed interpret mode and failed the real
Mosaic backend, which is why their constraints are recorded here:
  r2a  dynamic grids + scalar-prefetch windows — backend abort inside the
       bounce loop;
  r2b  cull kernel + (1, W) SMEM suplist BlockSpec — illegal block shape
       at any nb;
  r3a  row-major [SUPT, 24] triangle DMA — memref slices must be 128-lane
       aligned, so a 24-lane-wide DMA (src or dst) can never compile.
The layout that satisfies every rule: per-supercluster TRANSPOSED granules.
tri_sweep is [n_sup * 24, SUPT]: rows (sup*24 + j) hold operand j of the
sup's SUPT triangles on lanes. A granule slice [24, SUPT] starts at a
multiple of 24 (divisible by 8) and spans full 128-aligned lanes — legal
DMA both ways — and the Moeller-Trumbore contraction becomes an MXU
dot_general over the 3/4-length operand axis, the exact pattern the packet
kernel already proves on hardware.

Kernel loop, per GROUP of 8 consecutive superclusters (their AABB rows are
VMEM-resident):
  1. slab-test the 8 supercluster boxes against the whole ray block,
     capped at the block's current best t — one [8, B] VPU op;
  2. start async HBM->VMEM copies of every HIT supercluster's granule
     (48KB contiguous each) into that slot's OWN scratch buffer — the
     copies for the whole group overlap the sweeps below;
  3. for each hit supercluster (lax.cond per slot): dense [SUPT, B]
     Moeller-Trumbore sweep; best-t shrinks as hits land, culling later
     groups.

The supercluster table is padded to a GROUP multiple with NaN boxes: every
slab comparison against NaN is false, so padding can never hit (and never
DMAs). This is deliberate — INVERTED boxes (min=+big, max=-big) do NOT
miss under min/max slab semantics (they become all-space boxes). The
second line of defense is that padded tri_sweep entries are all-zero,
which the sweep rejects as parallel (dw == 0).

Determinism: the winner is the lowest-t hit with ties broken toward the
lowest primitive index (groups ascend, superclusters within a group
ascend, per-sweep argmin takes the first row, cross-sweep merges use
strict `<`), so results are independent of block grouping and device
count.

Practical scene-size ceiling: triangle granules live in HBM (16 GB on v5e
-> ~400M triangles at 40 B/tri), and the only VMEM-resident per-scene
state is the supercluster AABB table at 512 B/row (one row per 512
triangles) — ~100M triangles inside a 100 MB VMEM budget. The group loop
is linear in supercluster count, so beyond ~10M triangles a third
hierarchy level over the sup table would be the next step.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from take_tpu.geometry.bvh import CLUSTER_K, GROUP, SUP

BLOCK = 128  # rays per block: one lane tile; small blocks keep the
# per-block supercluster union close to the per-ray average on incoherent
# waves
SUPT = SUP * CLUSTER_K  # triangles per supercluster (DMA granule lanes)
OPS = 24  # operand rows per granule: o_u[4], o_v[4], o_w[4], d_u[3],
# d_v[3], d_w[3], pad[3]
_BIG = 3.4e38
_DW_EPS = 1e-12  # parallel-ray reject, matches intersect.py
_HI = jax.lax.Precision.HIGHEST  # Mosaic's default f32 dot is one bf16
# pass (~1e-3 rel) — unusable for world-space geometry


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
    NaN rows (table padding) always produce False: every lane of tlo/thi is
    NaN, and NaN comparisons are false.
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


def _mt_sup(tbuf, oh, rdm, tmin, tcap):
    """Dense [SUPT, B] Moeller-Trumbore over one supercluster granule.

    tbuf [OPS, SUPT]: transposed affine operands (module docstring); the
    contraction runs on the MXU (dot_general over the operand axis, lhs
    transposed — same pattern/precision as pallas_traverse.py). Identical
    f32 semantics to intersect.py::_tri_uvt. Returns (t, u, v, ok); all-
    zero padding columns reject as parallel (dw == 0).
    """

    def dotT(a, b):
        # [k, SUPT] x [k, B] -> [SUPT, B]
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )

    su = dotT(tbuf[0:4, :], oh)  # [SUPT, B]
    sv = dotT(tbuf[4:8, :], oh)
    sw = dotT(tbuf[8:12, :], oh)
    du = dotT(tbuf[12:15, :], rdm)
    dv = dotT(tbuf[15:18, :], rdm)
    dw = dotT(tbuf[18:21, :], rdm)

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


def _group_dma(tri_hbm, tbuf, sem, sup, slot):
    """Async copy of one supercluster granule HBM -> its slot buffer.

    Each slot is a SEPARATE whole VMEM ref (not a slice of one bigger
    scratch): Mosaic requires memref slices to be 128-lane aligned, and
    slot choice is static anyway, so separate refs cost nothing.
    """
    return pltpu.make_async_copy(
        tri_hbm.at[pl.ds(pl.multiple_of(sup * OPS, 8), OPS), :],
        tbuf,
        sem.at[slot],
    )


def _sweep_sup(tbuf, sup, oh, rdm, tmin, tmax, carry):
    """Closest-hit sweep of one DMA'd supercluster; returns updated carry."""
    t_best, u_best, v_best, p_best = carry
    t, u, v, ok = _mt_sup(tbuf, oh, rdm, tmin, jnp.minimum(t_best, tmax))
    tm = jnp.where(ok, t, _BIG)
    row = jnp.argmin(tm, axis=0)  # first (lowest) row on ties
    tnew = jnp.min(tm, axis=0)[None, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 0)
    onehot = (lane == row[None, :]).astype(tm.dtype)
    unew = jnp.sum(u * onehot, axis=0)[None, :]
    vnew = jnp.sum(v * onehot, axis=0)[None, :]
    better = tnew < t_best  # strict: earlier supercluster keeps ties
    prim = sup * SUPT + row[None, :]
    return (
        jnp.where(better, tnew, t_best),
        jnp.where(better, unew, u_best),
        jnp.where(better, vnew, v_best),
        jnp.where(better, prim, p_best),
    )


def _sweep_kernel(
    rays_ref,  # VMEM [1, 8, B]
    sup_ref,  # VMEM [SupP, 8] supercluster AABBs (whole table resident)
    tri_hbm,  # ANY  [SupP*OPS, SUPT] transposed operand granules (HBM)
    t_ref,  # out [1, 1, B]
    u_ref,
    v_ref,
    p_ref,  # out [1, 1, B] int32
    *scratch,  # GROUP separate VMEM [OPS, SUPT] DMA buffers + sem (GROUP,)
):
    tbufs, sem = scratch[:-1], scratch[-1]
    ox, oy, oz, dx, dy, dz, tmin, tmax = _ray_components(rays_ref)
    ix, iy, iz = _inv_dir(dx, dy, dz)
    B = ox.shape[1]
    oh = jnp.concatenate([ox, oy, oz, jnp.ones((1, B))], axis=0)  # [4, B]
    rdm = jnp.concatenate([dx, dy, dz], axis=0)  # [3, B]
    n_groups = sup_ref.shape[0] // GROUP  # static

    def group_body(g, carry):
        t_best = carry[0]
        boxes = sup_ref[pl.ds(pl.multiple_of(g * GROUP, GROUP), GROUP), :]
        # cap at per-lane tmax too: shadow rays stop at the light distance
        # and dead lanes (tmax = -BIG) never DMA anything
        hit = _slab_rows(
            boxes, ox, oy, oz, ix, iy, iz, tmin,
            jnp.minimum(t_best, tmax),
        )
        any8 = jnp.any(hit, axis=1, keepdims=True).astype(jnp.int32)

        # start every hit supercluster's copy first: they overlap the sweeps
        for w in range(GROUP):

            @pl.when(any8[w, 0] > 0)
            def _(w=w):
                _group_dma(tri_hbm, tbufs[w], sem, g * GROUP + w, w).start()

        for w in range(GROUP):

            def sweep(c, w=w):
                _group_dma(tri_hbm, tbufs[w], sem, g * GROUP + w, w).wait()
                return _sweep_sup(
                    tbufs[w], g * GROUP + w, oh, rdm, tmin, tmax, c
                )

            carry = jax.lax.cond(any8[w, 0] > 0, sweep, lambda c: c, carry)
        return carry

    init = (
        jnp.full(tmin.shape, _BIG),
        jnp.zeros(tmin.shape),
        jnp.zeros(tmin.shape),
        jnp.full(tmin.shape, -1, jnp.int32),
    )
    t_best, u_best, v_best, p_best = jax.lax.fori_loop(
        0, n_groups, group_body, init
    )
    ok = t_best <= tmax
    t_ref[0, :, :] = jnp.where(ok, t_best, _BIG)
    u_ref[0, :, :] = u_best
    v_ref[0, :, :] = v_best
    p_ref[0, :, :] = jnp.where(ok, p_best, -1)


def _occluded_kernel(rays_ref, sup_ref, tri_hbm, occ_ref, *scratch):
    """TRUE any-hit sweep (the kernel the reference lacks — its
    scene_occluded is a full closest-hit, scene.cpp:49-63 ⚠): no best-hit
    bookkeeping, and the group loop exits as soon as every live ray in the
    block is occluded."""
    tbufs, sem = scratch[:-1], scratch[-1]
    ox, oy, oz, dx, dy, dz, tmin, tmax = _ray_components(rays_ref)
    ix, iy, iz = _inv_dir(dx, dy, dz)
    B = ox.shape[1]
    oh = jnp.concatenate([ox, oy, oz, jnp.ones((1, B))], axis=0)
    rdm = jnp.concatenate([dx, dy, dz], axis=0)
    n_groups = sup_ref.shape[0] // GROUP  # static

    # live = rays that can still be hit (padding has tmax < tmin => dead)
    live0 = (tmax >= tmin).astype(jnp.int32)

    def cond(state):
        g, occ = state
        done = jnp.sum((occ == 0) & (live0 > 0)) == 0
        return (g < n_groups) & ~done

    def body(state):
        g, occ = state
        pend = (occ == 0) & (live0 > 0)
        boxes = sup_ref[pl.ds(pl.multiple_of(g * GROUP, GROUP), GROUP), :]
        # tcap stays tmax: any hit in range counts
        hit = _slab_rows(boxes, ox, oy, oz, ix, iy, iz, tmin, tmax) & pend
        any8 = jnp.any(hit, axis=1, keepdims=True).astype(jnp.int32)

        for w in range(GROUP):

            @pl.when(any8[w, 0] > 0)
            def _(w=w):
                _group_dma(tri_hbm, tbufs[w], sem, g * GROUP + w, w).start()

        for w in range(GROUP):

            def sweep(o, w=w):
                _group_dma(tri_hbm, tbufs[w], sem, g * GROUP + w, w).wait()
                _, _, _, ok = _mt_sup(tbufs[w], oh, rdm, tmin, tmax)
                return o | jnp.any(ok, axis=0, keepdims=True).astype(
                    jnp.int32
                )

            occ = jax.lax.cond(any8[w, 0] > 0, sweep, lambda o: o, occ)
        return (g + 1, occ)

    # NOTE on the early exit + DMA interaction: when the loop exits early, a
    # started copy may still be in flight into scratch; it targets scratch
    # only and pallas waits for outstanding DMAs at kernel end, so this is
    # benign.
    state = (jnp.int32(0), jnp.zeros(tmin.shape, jnp.int32))
    _, occ = jax.lax.while_loop(cond, body, state)
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


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def cluster_traverse(
    sup_aabb,
    tri_sweep,
    ro,
    rd,
    tmin,
    tmax,
    any_hit: bool = False,
    interpret: bool = False,
):
    """Traverse rays against the supercluster-granular triangle soup.

    Args:
        sup_aabb: [SupP, 8] supercluster AABB table (BVHArrays.sup_aabb),
            SupP a multiple of GROUP (NaN rows pad).
        tri_sweep: [SupP*OPS, SUPT] transposed triangle affine operand
            granules (GeometryArrays.tri_sweep) — the table covers every
            row of every padded supercluster (whole-granule DMA).
        ro, rd, tmin, tmax: padded ray SoA; N must be a multiple of BLOCK
            (callers pad with tmax < tmin rows).
    Returns:
        any_hit=False: (t, u, v, prim) [N]; prim == -1 marks a miss
            (t is _BIG there).
        any_hit=True: occluded bool [N].
    """
    N = ro.shape[0]
    rays = _ray_blocks(ro, rd, tmin, tmax)
    nb = rays.shape[0]
    SupP = sup_aabb.shape[0]
    # whole-table guarantee: a granule DMA must be in bounds for every sup
    # id in the AABB table, even NaN-padded ones (build.py pads tri_sweep
    # to the same GROUP multiple; this catches any drift)
    assert tri_sweep.shape[0] >= SupP * OPS, (
        f"tri_sweep covers {tri_sweep.shape[0] // OPS} sups < {SupP}"
    )

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
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 8, BLOCK), lambda b: (b, 0, 0)),
            pl.BlockSpec((SupP, 8), lambda b: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # triangles stay in HBM
        ],
        out_specs=[out_spec] * len(out_shape),
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((OPS, SUPT), jnp.float32) for _ in range(GROUP)]
            + [pltpu.SemaphoreType.DMA((GROUP,))]
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
        interpret=interpret,
    )(rays, sup_aabb, tri_sweep)

    def unblock(x):
        return x[:, 0, :].reshape(N)

    if any_hit:
        return unblock(outs[0]) > 0
    t = unblock(outs[0])
    u = unblock(outs[1])
    v = unblock(outs[2])
    prim = unblock(outs[3])
    return t, u, v, prim
