"""List-free cluster-sweep traversal: the incoherent-wave kernel (TPU).

Why a third backend (measured on room, round 4, benchmarks/traverse_ablate +
sweep_bench): the packet kernel (pallas_traverse.py) is SCALAR-bound on big
scenes — every node pop runs a 19-comparator sorting network + 16 lax.conds,
and a room bounce wave visits hundreds of union-nodes per block (8.8 Mrays/s
even on coherent primaries, ~3 on bounce waves). The streaming cluster
kernel (pallas_cluster.py) sweeps 512-triangle supercluster granules — 19k
triangle tests per incoherent ray. And the upstream coherence argsort both
rely on costs 22-27 ms per 2^18-ray wave on its own.

This kernel replaces tree traversal with a dense two-phase program over the
64-triangle Morton cluster table, exploiting the measured shape of room
bounce waves (benchmarks/wave_analysis.py): a ray's oracle visit set is
~10 clusters, and capping at the true hit distance barely shrinks it
(10.9 uncapped -> 10.1), so no tree and no sort are needed — just a flat
cull plus near-first consumption:

  1. CULL: slab-test ALL Cpad cluster AABBs against the whole ray block in
     one broadcast [Cpad, B] VPU expression (no loop, no pops, no conds).
     Per-cluster pending metric dmin = min entry distance over hitting
     lanes, stored LANE-MAJOR [Cpad/128, 128] (a [Cpad, 1] column spreads
     over Cpad/8 nearly-empty sublane tiles and cost ~1 us per reduction,
     measured — the packed layout is 2 tiles for room-sized tables).
  2. SWEEP loop: per iteration, extract the G nearest pending clusters
     (min + masked-min index over the packed dmin — no scalar sort), stack
     their 64-row windows into one [G*64, 24] operand block and run ONE
     block-diagonal MXU contraction [G*64, 24] @ [24, 6*B] for all six
     Moeller-Trumbore operands (six separate K=4 dots were latency-bound
     at ~0.8 us/sweep, measured). Only (t, prim) are tracked in the loop;
     u/v of the winner are recomputed post-kernel in XLA from the same
     operands (bitwise identical). The loop stops when the nearest
     remaining cluster is farther than every lane's current best, so sweep
     count approaches the ORACLE block union.

Tables are VMEM-resident: triangles reuse the packet kernel's [Tpad, 24]
affine-row layout (prep_tables) and clusters the build's cl_aabb [Cpad, 8]
(NaN padding rows can never hit: NaN slab comparisons are all false).
Scene-size ceiling = the packet kernel's VMEM budget; beyond it the
HBM-streaming cluster kernel takes over.

Determinism: near-first consumption makes sweep ORDER depend on block
composition, but exact-t ties break toward the LOWER primitive index (the
stacked-window merge takes min prim over equal-t rows), so results are
block-order independent — same rule as every other backend.

Capability match: bvh.cpp:86-109 (recursive traversal) + scene.cpp:49-63
(occlusion; here a true any-hit with early block exit).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from take_tpu.geometry.bvh import CLUSTER_K

BLOCK = 128  # rays per block (lane dimension)
WIN = CLUSTER_K  # cluster window: 64 triangle rows per sweep
GSWEEP = 4  # clusters swept per loop iteration (one fat MXU contraction)

_BIG = 3.4e38
_IBIG = 0x7FFFFFFF
_HI = jax.lax.Precision.HIGHEST


def _sweep_kernel(
    cl_ref,  # [Cpad, 8] cluster AABBs (min.xyz, max.xyz, 0, 0); NaN pad
    tris_ref,  # [Tpad, 24] affine operand rows (pallas_traverse layout)
    ro_ref,  # [1, 3, B]
    rd_ref,  # [1, 3, B]
    tmin_ref,  # [1, 1, B]
    tmax_ref,  # [1, 1, B]
    t_out,  # [1, 1, B]
    prim_out,  # [1, 1, B] int32
    any_hit: bool = False,
    n_tri: int = 0,  # static: valid triangle count (tail-cluster mask)
    stage: str = "full",  # profiling: "cull" or "loop_nosweep" skip stages
):
    Cpad = cl_ref.shape[0]
    Tpad = tris_ref.shape[0]
    B = ro_ref.shape[2]
    R = Cpad // 128  # dmin rows in lane-major [R, 128] layout

    rox = ro_ref[0, 0:1, :]  # [1, B]
    roy = ro_ref[0, 1:2, :]
    roz = ro_ref[0, 2:3, :]
    rdx = rd_ref[0, 0:1, :]
    rdy = rd_ref[0, 1:2, :]
    rdz = rd_ref[0, 2:3, :]
    inv_x = 1.0 / jnp.where(jnp.abs(rdx) < 1e-20, 1e-20, rdx)
    inv_y = 1.0 / jnp.where(jnp.abs(rdy) < 1e-20, 1e-20, rdy)
    inv_z = 1.0 / jnp.where(jnp.abs(rdz) < 1e-20, 1e-20, rdz)
    tmin = tmin_ref[0, :, :]  # [1, B]
    tmax = tmax_ref[0, :, :]  # [1, B]; dead lanes carry -BIG => no hits

    # combined rhs for the block-diagonal contraction: rows 0:4 / 4:8 /
    # 8:12 carry the homogeneous origin (su, sv, sw outputs), rows 12:15 /
    # 15:18 / 18:21 the direction (du, dv, dw outputs), each in its own
    # 128-lane output segment
    oh = jnp.concatenate([rox, roy, roz, jnp.ones((1, B))], axis=0)  # [4,B]
    rdm = jnp.concatenate([rdx, rdy, rdz], axis=0)  # [3, B]
    # rhs column-segment k (k = 0..5) carries oh in rows 4k:4k+4 (k < 3)
    # or rdm in rows 12+3(k-3):15+3(k-3), zeros elsewhere — so one
    # contraction produces (su, sv, sw, du, dv, dw) side by side
    z = lambda r: jnp.zeros((r, B))
    rhs = jnp.concatenate(
        [
            jnp.concatenate([oh, z(20)], axis=0),
            jnp.concatenate([z(4), oh, z(16)], axis=0),
            jnp.concatenate([z(8), oh, z(12)], axis=0),
            jnp.concatenate([z(12), rdm, z(9)], axis=0),
            jnp.concatenate([z(15), rdm, z(6)], axis=0),
            jnp.concatenate([z(18), rdm, z(3)], axis=0),
        ],
        axis=1,
    )  # [24, 6B]

    # ---- phase 1: dense cull — slab ALL clusters vs ALL lanes at once ----
    def axis(lo_col, hi_col, o_row, inv_row):
        a = (lo_col - o_row) * inv_row  # [Cpad, B]
        b = (hi_col - o_row) * inv_row
        return jnp.minimum(a, b), jnp.maximum(a, b)

    l0, h0 = axis(cl_ref[:, 0:1], cl_ref[:, 3:4], rox, inv_x)
    l1, h1 = axis(cl_ref[:, 1:2], cl_ref[:, 4:5], roy, inv_y)
    l2, h2 = axis(cl_ref[:, 2:3], cl_ref[:, 5:6], roz, inv_z)
    tlo = jnp.maximum(jnp.maximum(l0, l1), l2)  # [Cpad, B]
    thi = jnp.minimum(jnp.minimum(h0, h1), h2)
    hit = (tlo <= thi) & (thi >= tmin) & (tlo <= tmax)  # NaN rows: False
    dcol = jnp.min(jnp.where(hit, tlo, _BIG), axis=1, keepdims=True)
    dmin0 = dcol.reshape(R, 128)
    cid = jax.lax.broadcasted_iota(
        jnp.int32, (R, 128), 0) * 128 + jax.lax.broadcasted_iota(
        jnp.int32, (R, 128), 1)

    SW = GSWEEP * WIN
    lane = jax.lax.broadcasted_iota(jnp.int32, (SW, B), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (SW, 1), 0) // WIN  # [SW,1]
    loc = jax.lax.broadcasted_iota(jnp.int32, (SW, 1), 0) % WIN

    def group_sweep(w0s, valid, best):
        """One contraction over GSWEEP stacked 64-row windows.

        w0s: list of GSWEEP scalar window starts (8-aligned); valid: list
        of GSWEEP scalar bools (False => window is a don't-care repeat).
        """
        t_best, p_best = best
        blk = jnp.concatenate(
            [tris_ref[pl.ds(w, WIN), :] for w in w0s], axis=0
        )  # [SW, 24]
        out = jnp.dot(
            blk, rhs, preferred_element_type=jnp.float32, precision=_HI
        )  # [SW, 6B]
        su = out[:, 0 * B : 1 * B]
        sv = out[:, 1 * B : 2 * B]
        sw = out[:, 2 * B : 3 * B]
        du = out[:, 3 * B : 4 * B]
        dv = out[:, 4 * B : 5 * B]
        dw = out[:, 5 * B : 6 * B]

        parallel = jnp.abs(dw) < 1e-12
        inv_dw = 1.0 / jnp.where(parallel, 1.0, dw)
        t = -sw * inv_dw
        u = su + t * du
        v = sv + t * dv
        # per-row prim id; invalid (don't-care) windows get w0 = Tpad so
        # the prim_row < n_tri test masks them (Mosaic cannot select i1
        # VALUES in a column vector, so validity rides in the int id)
        w0col = jnp.zeros((SW, 1), jnp.int32)
        for g in range(GSWEEP):
            w0g = jnp.where(valid[g], w0s[g], Tpad)  # scalar select
            w0col = jnp.where(grp == g, w0g, w0col)
        prim_row = w0col + loc  # [SW, 1]
        ok = (
            (~parallel)
            & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t >= tmin) & (t <= t_best) & (t <= tmax)
            & (prim_row < n_tri)
        )
        t_m = jnp.where(ok, t, _BIG)
        t_new = jnp.min(t_m, axis=0)[None, :]  # [1, B]
        # lowest-prim tie-break among equal-t rows (stacked windows are in
        # near-first order, not id order, so argmin-first is not enough)
        p_new = jnp.min(
            jnp.where(t_m == t_new, prim_row, _IBIG), axis=0
        )[None, :]
        better = (t_new < t_best) | (
            (t_new == t_best) & (t_new < _BIG) & (p_new < p_best)
        )
        return (
            jnp.where(better, t_new, t_best),
            jnp.where(better, p_new, p_best),
        )

    # carry holds the running min of dmin (mstar) so cond is scalar-only
    if any_hit:
        live0 = tmax >= tmin  # [1, B]

        def cond(state):
            dmin, mstar, best = state
            p_best = best[1]
            pending = jnp.sum(((p_best < 0) & live0).astype(jnp.int32)) > 0
            return (mstar < _BIG) & pending
    else:

        def cond(state):
            dmin, mstar, best = state
            # near-first early stop: nothing pending can beat the block's
            # worst live cap (lanes with no hit keep t_best = BIG via tmax
            # = +inf, so only capped/satisfied blocks stop early)
            cap = jnp.max(jnp.minimum(best[0], tmax))
            return mstar < jnp.minimum(cap, _BIG)

    def body(state):
        dmin, mstar, best = state
        w0s, valid = [], []
        for _ in range(GSWEEP):
            # nearest pending cluster; ties -> lowest id (deterministic)
            c = jnp.min(jnp.where(dmin == mstar, cid, _IBIG))
            ok_c = mstar < _BIG
            valid.append(ok_c)
            w0s.append(
                pl.multiple_of(
                    jnp.minimum(
                        jnp.where(ok_c, c, 0) * WIN, Tpad - WIN
                    ),
                    8,
                )
            )
            dmin = jnp.where(cid == c, _BIG, dmin)
            mstar = jnp.min(dmin)
        if stage != "loop_nosweep":
            best = group_sweep(w0s, valid, best)
        return (dmin, mstar, best)

    best0 = (
        jnp.full((1, B), _BIG),
        jnp.full((1, B), -1, jnp.int32),
    )
    if stage == "cull":
        best = (dmin0[0:1, 0:B] * 0 + jnp.min(dmin0), best0[1])
    else:
        _, _, best = jax.lax.while_loop(
            cond, body, (dmin0, jnp.min(dmin0), best0)
        )
    t_best, p_best = best
    ok = t_best <= tmax
    t_out[0, :, :] = jnp.where(ok, t_best, _BIG)
    prim_out[0, :, :] = jnp.where(ok, p_best, -1)


@functools.partial(
    jax.jit,
    static_argnames=("n_tri", "any_hit", "interpret", "block", "stage"),
)
def sweep_traverse(cl_aabb, tris, ro, rd, tmin, tmax, n_tri: int,
                   any_hit: bool = False, interpret: bool = False,
                   block: int = BLOCK, stage: str = "full"):
    """Traverse rays [N, 3] against the VMEM-resident cluster table.

    Args:
        cl_aabb: [Cpad, 8] c64 cluster AABBs (BVHArrays.cl_aabb).
        tris: [Tpad, 24] affine operand rows (pallas_traverse.prep_tables).
        ro, rd, tmin, tmax: ray SoA, N a multiple of `block` (caller pads
            with tmax < tmin rows).
        n_tri: static valid triangle count.
    Returns:
        (t, u, v, prim) [N] — t == 3.4e38 and prim == -1 mark a miss.
        With any_hit=True the outputs are the same shape but the loop
        stops once every live lane has some occluder (check prim >= 0).
    """
    N = ro.shape[0]
    n_blocks = N // block

    # pad the cluster table to a 128-row multiple (NaN rows never hit) so
    # the kernel's lane-major [R, 128] dmin reshape is exact
    Cpad = cl_aabb.shape[0]
    C128 = -(-Cpad // 128) * 128
    if C128 != Cpad:
        cl_aabb = jnp.concatenate(
            [cl_aabb, jnp.full((C128 - Cpad, 8), jnp.nan, cl_aabb.dtype)],
            axis=0,
        )

    ro_t = ro.T.reshape(3, n_blocks, block).transpose(1, 0, 2)
    rd_t = rd.T.reshape(3, n_blocks, block).transpose(1, 0, 2)
    tmin_t = tmin.reshape(n_blocks, 1, block)
    tmax_t = tmax.reshape(n_blocks, 1, block)

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    per3 = pl.BlockSpec((1, 3, block), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    per1 = pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)

    t, prim = pl.pallas_call(
        functools.partial(
            _sweep_kernel, any_hit=any_hit, n_tri=n_tri, stage=stage
        ),
        grid=(n_blocks,),
        in_specs=[
            full(cl_aabb.shape), full(tris.shape),
            per3, per3, per1, per1,
        ],
        out_specs=[per1, per1],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, 1, block), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 1, block), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
        interpret=interpret,
    )(cl_aabb, tris, ro_t, rd_t, tmin_t, tmax_t)

    t = t.reshape(N)
    prim = prim.reshape(N)

    # u/v recovery for winners: one gathered [N] evaluation of the same
    # affine operands the kernel contracted — bitwise identical results
    # (t = -sw/dw, u = su + t*du, v = sv + t*dv over the same f32 inputs).
    psafe = jnp.maximum(prim, 0)
    Tpad = tris.shape[0]
    rows = tris[psafe]  # [N, 24]
    oh_n = jnp.concatenate([ro, jnp.ones((N, 1))], axis=1)  # [N, 4]
    su = jnp.sum(rows[:, 0:4] * oh_n, axis=1)
    sv = jnp.sum(rows[:, 4:8] * oh_n, axis=1)
    sw = jnp.sum(rows[:, 8:12] * oh_n, axis=1)
    du = jnp.sum(rows[:, 12:15] * rd, axis=1)
    dv = jnp.sum(rows[:, 15:18] * rd, axis=1)
    dw = jnp.sum(rows[:, 18:21] * rd, axis=1)
    inv_dw = 1.0 / jnp.where(jnp.abs(dw) < 1e-12, 1.0, dw)
    t_uv = -sw * inv_dw
    u = jnp.where(prim >= 0, su + t_uv * du, 0.0)
    v = jnp.where(prim >= 0, sv + t_uv * dv, 0.0)
    return t, u, v, prim
