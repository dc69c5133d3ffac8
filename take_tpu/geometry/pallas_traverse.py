"""Pallas packet BVH traversal (TPU kernel).

Design: *packet* (block-coherent) traversal — the classic SIMD technique
re-mapped to TPU strengths. Each grid cell owns a block of B rays:

  * the node table + triangle operands live wholly in VMEM for the whole
    grid (gated by a VMEM budget in geometry/traverse.py),
  * the traversal stack is SCALAR and shared per block: one node pops per
    iteration and its WIDTH child boxes are slab-tested against ALL B rays
    at once — [W, B] vector ops with the ray axis on lanes,
  * a child is pushed if ANY ray in the block hits it; leaves run a dense
    MXU Möller–Trumbore over their contiguous triangle run (the BVH build
    reorders triangles, so the kernel contains zero gathers),
  * per-ray best (t, u, v, prim) accumulates in the while-loop carry.

Mosaic layout rules (hard-won): dynamic indexing of the LANE dimension must
be provably 128-aligned, so every dynamically-indexed table here is
SUBLANE-major instead:

  * node table [M*WIDTH, 8]: row m*W+w = child w of node m, lanes =
    (min.xyz, max.xyz, child, count) with child/count stored as f32
    (exact below 2^24). A node pop loads rows [node*W : node*W+W] — a
    dynamic sublane start that is a provable multiple of 8.
  * triangle operands [Tpad, 24]: row t = (o_u[4], o_v[4], o_w[4], d_u[3],
    d_v[3], d_w[3], pad) — the affine maps of intersect.py::_tri_uvt in
    row form. Leaf runs start at arbitrary offsets, so the kernel loads an
    8-ALIGNED WINDOW of LEAF_SIZE+8 rows around the run and masks the
    overhang (keeps the BVH build free of alignment constraints).

Matmul precision is HIGHEST: Mosaic's default f32 dot is one bf16 pass
(~1e-3 rel error, measured) — unusable for world-space geometry.

Packets are coherent for primary rays; bounce batches lose coherence
(future: per-bounce ray binning). The jnp while_loop traversal
(traverse.py) remains the fallback for scenes larger than VMEM.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from take_tpu.geometry.bvh import LEAF_SIZE, WIDTH

BLOCK = 256  # rays per packet
STACK = 160  # worst-case pushes ~ (WIDTH-1) x wide-depth; SAH trees run deeper than median splits
WINDOW = LEAF_SIZE + 8  # aligned leaf window (see module docstring)

_BIG = 3.4e38
_HI = jax.lax.Precision.HIGHEST


def prep_tables(scene):
    """Kernel-layout views of the BVH + triangle tables (cacheable under jit).

    Returns (nodes [M*W, 8] f32, tris [Tpad, 24] f32).
    """
    bvh = scene.bvh
    g = scene.geometry
    M = bvh.node_child.shape[0]
    nodes = jnp.concatenate(
        [
            bvh.node_min,  # [M, W, 3]
            bvh.node_max,
            bvh.node_child.astype(jnp.float32)[..., None],
            bvh.node_count.astype(jnp.float32)[..., None],
        ],
        axis=2,
    ).reshape(M * WIDTH, 8)

    Tpad = g.tri_attr.shape[0]
    # axis-major [4, 3T] / [3, 3T] -> row-major [T, 21] (pad to 24 lanes)
    o = g.tri_affine_o.reshape(4, 3, Tpad)  # [4, uvw, T]
    d = g.tri_affine_d.reshape(3, 3, Tpad)
    rows = jnp.concatenate(
        [
            o.transpose(2, 1, 0).reshape(Tpad, 12),  # o_u[4], o_v[4], o_w[4]
            d.transpose(2, 1, 0).reshape(Tpad, 9),  # d_u[3], d_v[3], d_w[3]
            jnp.zeros((Tpad, 3), jnp.float32),
        ],
        axis=1,
    )
    return nodes, rows


def _kernel(
    nodes_ref,  # [M*W, 8] f32
    tris_ref,  # [Tpad, 24] f32
    ro_ref,  # [1, 3, B]
    rd_ref,  # [1, 3, B]
    tmin_ref,  # [1, 1, B]
    tmax_ref,  # [1, 1, B]
    t_out,  # [1, 1, B]
    u_out,
    v_out,
    prim_out,  # [1, 1, B] int32
    stack_ref,  # SMEM [STACK] int32 scratch — the shared packet stack
    any_hit: bool = False,  # static: stop once every live lane is occluded
):
    B = ro_ref.shape[2]
    Tpad = tris_ref.shape[0]

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
    tmax = tmax_ref[0, :, :]  # [1, B] — honored DURING traversal: shadow
    # rays stop at the light distance instead of sweeping the whole scene,
    # and dead integrator lanes (tmax = -BIG) cull every box instantly
    oh = jnp.concatenate([rox, roy, roz, jnp.ones((1, B))], axis=0)  # [4, B]
    rdm = jnp.concatenate([rdx, rdy, rdz], axis=0)  # [3, B]

    def leaf_sweep(start, cnt, best):
        """Dense Möller–Trumbore over an 8-aligned window covering the run."""
        t_best, u_best, v_best, p_best = best
        w0 = pl.multiple_of(
            jnp.minimum((start // 8) * 8, Tpad - WINDOW), 8
        )
        blk = tris_ref[pl.ds(w0, WINDOW), :]  # [Wd, 24]

        dot = lambda a, b: jnp.dot(
            a, b, preferred_element_type=jnp.float32, precision=_HI
        )
        su = dot(blk[:, 0:4], oh)  # [Wd, B]
        sv = dot(blk[:, 4:8], oh)
        sw = dot(blk[:, 8:12], oh)
        du = dot(blk[:, 12:15], rdm)
        dv = dot(blk[:, 15:18], rdm)
        dw = dot(blk[:, 18:21], rdm)

        parallel = jnp.abs(dw) < 1e-12
        inv_dw = 1.0 / jnp.where(parallel, 1.0, dw)
        t = -sw * inv_dw  # [Wd, B]
        u = su + t * du
        v = sv + t * dv
        lane = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, B), 0)
        rel = lane + (w0 - start)  # 0.. for rows inside the run
        ok = (
            (~parallel)
            & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t >= tmin) & (t <= t_best) & (t <= tmax)
            & (rel >= 0) & (rel < cnt)
        )
        t_m = jnp.where(ok, t, _BIG)
        best_l = jnp.argmin(t_m, axis=0)  # [B]; first row wins ties ->
        # lowest prim index within the window
        t_new = jnp.min(t_m, axis=0)[None, :]  # [1, B]
        onehot = (lane == best_l[None, :]).astype(jnp.float32)
        u_new = jnp.sum(u * onehot, axis=0)[None, :]
        v_new = jnp.sum(v * onehot, axis=0)[None, :]
        p_new = (w0 + best_l[None, :]).astype(jnp.int32)
        # exact-t ties break toward the LOWER primitive index so results are
        # independent of leaf sweep order (near-first ordering makes sweep
        # order depend on block composition; ADVICE r3)
        better = (t_new < t_best) | (
            (t_new == t_best) & (t_new < _BIG) & (p_new < p_best)
        )
        return (
            jnp.where(better, t_new, t_best),
            jnp.where(better, u_new, u_best),
            jnp.where(better, v_new, v_best),
            jnp.where(better, p_new, p_best),
        )

    if any_hit:
        live = tmax >= tmin  # [1, B]; padding/dead lanes are never pending

        def cond(state):
            sp, _, _, _, p_best = state
            pending = jnp.sum(((p_best < 0) & live).astype(jnp.int32)) > 0
            return (sp > 0) & pending
    else:

        def cond(state):
            sp, *_ = state
            return sp > 0

    def body(state):
        sp, t_best, u_best, v_best, p_best = state
        node = stack_ref[sp - 1]  # scalar SMEM read at dynamic index
        sp = sp - 1

        base = pl.multiple_of(node * WIDTH, 8)
        blk = nodes_ref[pl.ds(base, WIDTH), :]  # [W, 8]
        bx, by, bz = blk[:, 0:1], blk[:, 1:2], blk[:, 2:3]  # [W, 1]
        BX, BY, BZ = blk[:, 3:4], blk[:, 4:5], blk[:, 5:6]
        child_f = blk[:, 6:7]  # [W, 1] f32-encoded int
        count_f = blk[:, 7:8]

        def slab(lo_c, hi_c, ro_c, inv_c):
            t0 = (lo_c - ro_c) * inv_c  # [W, B]
            t1 = (hi_c - ro_c) * inv_c
            return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

        lo_x, hi_x = slab(bx, BX, rox, inv_x)
        lo_y, hi_y = slab(by, BY, roy, inv_y)
        lo_z, hi_z = slab(bz, BZ, roz, inv_z)
        tlo = jnp.maximum(jnp.maximum(lo_x, lo_y), lo_z)
        thi = jnp.minimum(jnp.minimum(hi_x, hi_y), hi_z)
        hit = (
            (tlo <= thi)
            & (thi >= tmin)
            & (tlo <= jnp.minimum(t_best, tmax))
        )  # [W, B]
        # per-child ordering key: the nearest entry distance over the
        # block's hitting lanes (+BIG where no lane hits)
        dmin = jnp.min(jnp.where(hit, tlo, _BIG), axis=1, keepdims=True)

        # NEAR-FIRST ordered traversal: sort the <=8 hit children by dmin
        # with a scalar sorting network (19 comparators, Batcher), then
        # sweep leaves nearest-first (t_best tightens as early as possible)
        # and push internal children farthest-first (stack pops nearest
        # first). Cuts visited leaves substantially on closest-hit; ties in
        # dmin keep slot order, so traversal stays deterministic for a
        # given block (exact-t ties across blocks may resolve differently
        # than slot order — measure-zero on real geometry).
        ds = [dmin[w, 0] for w in range(WIDTH)]
        cs = [child_f[w, 0].astype(jnp.int32) for w in range(WIDTH)]
        ns = [count_f[w, 0].astype(jnp.int32) for w in range(WIDTH)]
        pairs = [
            (0, 1), (2, 3), (4, 5), (6, 7),
            (0, 2), (1, 3), (4, 6), (5, 7),
            (1, 2), (5, 6), (0, 4), (1, 5),
            (2, 6), (3, 7), (2, 4), (3, 5),
            (1, 2), (3, 4), (5, 6),
        ]
        for i, j in pairs:
            sw = ds[i] > ds[j]
            ds[i], ds[j] = (
                jnp.where(sw, ds[j], ds[i]),
                jnp.where(sw, ds[i], ds[j]),
            )
            cs[i], cs[j] = (
                jnp.where(sw, cs[j], cs[i]),
                jnp.where(sw, cs[i], cs[j]),
            )
            ns[i], ns[j] = (
                jnp.where(sw, ns[j], ns[i]),
                jnp.where(sw, ns[i], ns[j]),
            )

        best = (t_best, u_best, v_best, p_best)
        for w in range(WIDTH):  # leaves, nearest first
            leaf_w = (ds[w] < _BIG) & (cs[w] < 0) & (ns[w] > 0)
            best = jax.lax.cond(
                leaf_w,
                lambda b, c=cs[w], cnt=ns[w]: leaf_sweep(-(c + 1), cnt, b),
                lambda b: b,
                best,
            )
        for w in reversed(range(WIDTH)):  # pushes, farthest first
            push_w = (ds[w] < _BIG) & (cs[w] >= 0)
            # masked scalar push: the slot above the top is free space, so
            # an un-pushed write just rewrites garbage with garbage
            slot = jnp.minimum(sp, STACK - 1)
            cur = stack_ref[slot]
            stack_ref[slot] = jnp.where(push_w, cs[w], cur)
            sp = sp + push_w.astype(jnp.int32)
        return (sp,) + best

    state = (
        jnp.int32(1),
        jnp.full((1, B), _BIG),
        jnp.zeros((1, B)),
        jnp.zeros((1, B)),
        jnp.full((1, B), -1, jnp.int32),
    )
    stack_ref[0] = 0  # root
    state = jax.lax.while_loop(cond, body, state)
    _, t_best, u_best, v_best, p_best = state
    ok = t_best <= tmax_ref[0, :, :]
    t_out[0, :, :] = jnp.where(ok, t_best, _BIG)
    u_out[0, :, :] = u_best
    v_out[0, :, :] = v_best
    prim_out[0, :, :] = jnp.where(ok, p_best, -1)


@functools.partial(
    jax.jit, static_argnames=("interpret", "any_hit", "block")
)
def packet_traverse(nodes, tris, ro, rd, tmin, tmax, interpret: bool = False,
                    any_hit: bool = False, block: int = BLOCK):
    """Traverse rays [N, 3] against the VMEM-resident wide BVH.

    Args are the prep_tables views + flat ray SoA. Returns (t [N], u [N],
    v [N], prim [N]); t == 3.4e38 marks a miss. N must be a multiple of
    BLOCK (caller pads). any_hit=True keeps the same outputs but lets a
    block stop as soon as every live lane found SOME occluder — the true
    any-hit query the reference lacks (scene_occluded is a closest-hit,
    scene.cpp:49-63 ⚠).
    """
    N = ro.shape[0]
    n_blocks = N // block

    ro_t = ro.T.reshape(3, n_blocks, block).transpose(1, 0, 2)  # [nb, 3, B]
    rd_t = rd.T.reshape(3, n_blocks, block).transpose(1, 0, 2)
    tmin_t = tmin.reshape(n_blocks, 1, block)
    tmax_t = tmax.reshape(n_blocks, 1, block)

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    per_block = lambda: pl.BlockSpec(
        (1, ro_t.shape[1], block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    per_block1 = lambda: pl.BlockSpec(
        (1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    t, u, v, prim = pl.pallas_call(
        functools.partial(_kernel, any_hit=any_hit),
        grid=(n_blocks,),
        in_specs=[
            full(nodes.shape), full(tris.shape),
            per_block(), per_block(), per_block1(), per_block1(),
        ],
        out_specs=[per_block1(), per_block1(), per_block1(), per_block1()],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, 1, block), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 1, block), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 1, block), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 1, block), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32)],
        # resident tables are gated at 88MB physical (traverse.py); the
        # default 16MB scoped-VMEM budget is far too small for them
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
        interpret=interpret,
    )(nodes, tris, ro_t, rd_t, tmin_t, tmax_t)

    return t.reshape(N), u.reshape(N), v.reshape(N), prim.reshape(N)
