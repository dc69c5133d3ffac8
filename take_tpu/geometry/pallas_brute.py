"""Fused Pallas brute-force ray/triangle sweep (TPU kernel).

Why this exists: for VMEM-resident scenes (cbox-class, T <= a few thousand
triangles) the XLA brute-force sweep (intersect.py::_tri_uvt) is HBM-bound —
every [N_rays, T] temporary (t/u/v/valid + the [N, 3T] matmul outputs) round
-trips HBM, ~15 GB of traffic per 1M-ray query. This kernel fuses the whole
query per ray block: the affine triangle operands and the packed attribute
table live in VMEM for the entire grid, each grid step streams one block of
B rays through [T, B] registers/VMEM values, reduces to the winning hit
in-kernel, and fetches its attribute row with an MXU one-hot matmul. HBM
traffic drops to the rays in + Hit columns out (~100x less).

Matmul precision is HIGHEST throughout: Mosaic's default f32 dot is a
single bf16 pass (~1e-3 rel error — measured), catastrophic for world-space
geometry; the 6-pass HIGHEST mode matches the XLA brute path bit-for-bit in
practice.

Differentiation: the kernel is primal-only. `brute_intersect` is a
custom_vjp whose backward runs the VJP of the XLA brute path
(intersect.py::_brute_force_intersect) — forward renders get kernel speed,
gradients stay exactly the AD-of-XLA gradients (emission flows through
Hit.emit; geometry is stop-gradded there, matching the north-star scope).
Occlusion is boolean (visibility treated as constant under AD, as in
grad.py), so the any-hit kernel takes stop_gradient inputs and needs no vjp.

Reference crosswalk: same query semantics as scene_intersect /
scene_occluded (reference scene.cpp:25-64) restricted to the triangle soup;
sphere merging stays in geometry/intersect.py.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from take_tpu.scene.types import ATTR_DIM

BLOCK = 1024  # rays per grid step
# Above this padded triangle count the [T, B] working set outgrows VMEM and
# the O(N*T) sweep loses to BVH traversal anyway.
MAX_TRIS = 2048

_BIG = 3.4e38
_HI = jax.lax.Precision.HIGHEST


def _prologue(tri_ot_ref, tri_dt_ref, ro_ref, rd_ref, tmin_ref, tmax_ref):
    """Shared sweep: all T triangles x B rays -> (t, u, v, ok) [T, B]."""
    B = ro_ref.shape[2]
    T = tri_dt_ref.shape[0] // 3

    ro = ro_ref[0]  # [3, B]
    rd = rd_ref[0]
    oh = jnp.concatenate([ro, jnp.ones((1, B), ro.dtype)], axis=0)  # [4, B]

    s = jnp.dot(tri_ot_ref[:], oh, preferred_element_type=jnp.float32,
                precision=_HI)  # [3T, B]
    dd = jnp.dot(tri_dt_ref[:], rd, preferred_element_type=jnp.float32,
                 precision=_HI)  # [3T, B]
    su, sw = s[0:T], s[2 * T : 3 * T]
    sv = s[T : 2 * T]
    du, dv, dw = dd[0:T], dd[T : 2 * T], dd[2 * T : 3 * T]

    parallel = jnp.abs(dw) < 1e-12
    inv_dw = 1.0 / jnp.where(parallel, 1.0, dw)
    t = -sw * inv_dw
    u = su + t * du
    v = sv + t * dv
    # u <= 1 / v <= 1 are implied by u,v >= 0 & u+v <= 1 (the XLA path keeps
    # them for reference fidelity; results are identical)
    inside = jnp.minimum(jnp.minimum(u, v), 1.0 - (u + v))
    trange = jnp.minimum(t - tmin_ref[0], tmax_ref[0] - t)
    ok = (~parallel) & (jnp.minimum(inside, trange) >= 0.0)
    return t, u, v, ok


def _closest_kernel(tri_ot_ref, tri_dt_ref, attr_t_ref,
                    ro_ref, rd_ref, tmin_ref, tmax_ref,
                    attr_out, aux_out):
    # DEAD-BLOCK SKIP: the scan driver marks terminated lanes with
    # tmax = -BIG; a block with no live interval can produce only misses —
    # emit them without the [T, B] sweep. Downstream consumers mask
    # everything by Hit.valid, so the (different) garbage attrs on skipped
    # lanes never reach radiance (verified bit-identical on chip).
    # HONEST MEASUREMENT (round 5, interleaved A/B at cbox 1024^2 d4):
    # NEUTRAL there — deaths are too scattered at 1-spp-per-pass pixel
    # blocks (bench swept_fraction 0.965, i.e. only ~3.5% of launches sit
    # in skippable blocks; an earlier 1.4x reading was hypervisor drift).
    # Kept ON: free when blocks are live, and it pays exactly when deaths
    # are block-coherent (deep renders, k-samples-per-pixel layouts).
    B = ro_ref.shape[2]
    from take_tpu import config as _cfg

    if not getattr(_cfg, "DEAD_BLOCK_SKIP", True):
        any_live = jnp.bool_(True)  # A/B toggle (trace-time)
    else:
        any_live = jnp.max(tmax_ref[0]) > 0.0

    @pl.when(any_live)
    def _sweep():
        t, u, v, ok = _prologue(
            tri_ot_ref, tri_dt_ref, ro_ref, rd_ref, tmin_ref, tmax_ref
        )
        T, _ = t.shape
        t_m = jnp.where(ok, t, _BIG)
        best = jnp.argmin(t_m, axis=0)  # [B]
        tbest = jnp.min(t_m, axis=0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (T, B), 0)
        onehot = (lane == best[None, :]).astype(jnp.float32)
        # winner attribute row: [A, T] @ [T, B]. HIGHEST is required — a
        # bf16 pass would round ids/flags stored as f32 columns.
        attr_out[0] = jnp.dot(
            attr_t_ref[:], onehot,
            preferred_element_type=jnp.float32, precision=_HI)
        found = tbest < _BIG
        aux_out[0, 0, :] = jnp.where(found, tbest, _BIG)
        aux_out[0, 1, :] = jnp.sum(u * onehot, axis=0)
        aux_out[0, 2, :] = jnp.sum(v * onehot, axis=0)
        aux_out[0, 3, :] = found.astype(jnp.float32)
        aux_out[0, 4:8, :] = jnp.zeros((4, B), jnp.float32)

    @pl.when(~any_live)
    def _all_dead():
        attr_out[0] = jnp.zeros_like(attr_out[0])
        aux_out[0] = jnp.zeros_like(aux_out[0])
        aux_out[0, 0, :] = jnp.full((B,), _BIG, jnp.float32)


def _anyhit_kernel(tri_ot_ref, tri_dt_ref,
                   ro_ref, rd_ref, tmin_ref, tmax_ref, occ_out):
    # same dead-block skip as the closest-hit kernel: NEE marks dead /
    # specular / zero-contribution lanes with tmax = -BIG
    from take_tpu import config as _cfg

    if not getattr(_cfg, "DEAD_BLOCK_SKIP", True):
        any_live = jnp.bool_(True)  # A/B toggle (trace-time)
    else:
        any_live = jnp.max(tmax_ref[0]) > 0.0

    @pl.when(any_live)
    def _sweep():
        _, _, _, ok = _prologue(
            tri_ot_ref, tri_dt_ref, ro_ref, rd_ref, tmin_ref, tmax_ref
        )
        B = ok.shape[1]
        occ_out[0, 0, :] = jnp.any(ok, axis=0).astype(jnp.float32)
        occ_out[0, 1:8, :] = jnp.zeros((7, B), jnp.float32)

    @pl.when(~any_live)
    def _all_dead():
        occ_out[0] = jnp.zeros_like(occ_out[0])


def _block_rays(ro, rd, tmin, tmax):
    """[N, 3] rays -> per-grid-step [nb, ., BLOCK] operands (N % BLOCK == 0)."""
    N = ro.shape[0]
    nb = N // BLOCK
    ro_t = ro.T.reshape(3, nb, BLOCK).transpose(1, 0, 2)
    rd_t = rd.T.reshape(3, nb, BLOCK).transpose(1, 0, 2)
    tmin_t = tmin.reshape(nb, 1, BLOCK)
    tmax_t = tmax.reshape(nb, 1, BLOCK)
    return nb, ro_t, rd_t, tmin_t, tmax_t


def _full(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _per_block(rows):
    return pl.BlockSpec((1, rows, BLOCK), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _compact_tables(geometry, n_tri: int):
    """Kernel views of the triangle tables, shrunk from the XLA padding
    (multiple of 128 lanes) to a multiple of 8 sublanes: the kernel lays the
    triangle axis on SUBLANES ([T, B] values), so a 36-triangle scene costs
    5 sublane tiles instead of 16 — VPU time scales with ceil(T/8).
    Pure slices/reshapes; cached under jit."""
    Tpad = geometry.tri_attr.shape[0]
    Tk = min(Tpad, max(8, -(-n_tri // 8) * 8))
    aff_o = geometry.tri_affine_o  # [4, 3*Tpad], axis-major
    aff_d = geometry.tri_affine_d
    cols = lambda a: jnp.concatenate(
        [a[:, k * Tpad : k * Tpad + Tk] for k in range(3)], axis=1
    )
    tri_ot = cols(aff_o).T  # [3*Tk, 4]
    tri_dt = cols(aff_d).T  # [3*Tk, 3]
    attr_t = geometry.tri_attr[:Tk].T  # [A, Tk]
    return tri_ot, tri_dt, attr_t


def pallas_tri_sweep(geometry, n_tri: int, ro, rd, tmin, tmax,
                     interpret: bool = False):
    """Closest-hit over the triangle soup.

    Returns (attrs [N, ATTR_DIM], t [N], u [N], v [N], found [N] bool);
    t == 3.4e38 on miss. N must be a multiple of BLOCK; n_tri is the static
    true triangle count (padded rows have all-zero affine maps and are
    rejected by the parallel test).
    """
    tri_ot, tri_dt, attr_t = _compact_tables(geometry, n_tri)
    nb, ro_t, rd_t, tmin_t, tmax_t = _block_rays(ro, rd, tmin, tmax)

    attrs, aux = pl.pallas_call(
        _closest_kernel,
        grid=(nb,),
        in_specs=[
            _full(tri_ot.shape), _full(tri_dt.shape), _full(attr_t.shape),
            _per_block(3), _per_block(3), _per_block(1), _per_block(1),
        ],
        out_specs=[_per_block(ATTR_DIM), _per_block(8)],
        out_shape=[
            jax.ShapeDtypeStruct((nb, ATTR_DIM, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((nb, 8, BLOCK), jnp.float32),
        ],
        interpret=interpret,
    )(tri_ot, tri_dt, attr_t, ro_t, rd_t, tmin_t, tmax_t)

    N = ro.shape[0]
    attrs = attrs.transpose(0, 2, 1).reshape(N, ATTR_DIM)
    aux = aux.transpose(0, 2, 1).reshape(N, 8)
    return attrs, aux[:, 0], aux[:, 1], aux[:, 2], aux[:, 3] > 0.5


def pallas_tri_occluded(geometry, n_tri: int, ro, rd, tmin, tmax,
                        interpret: bool = False):
    """Any-hit over the triangle soup -> [N] bool. Visibility is constant
    under AD (callers pass stop_gradient inputs)."""
    tri_ot, tri_dt, _ = _compact_tables(geometry, n_tri)
    nb, ro_t, rd_t, tmin_t, tmax_t = _block_rays(ro, rd, tmin, tmax)

    occ = pl.pallas_call(
        _anyhit_kernel,
        grid=(nb,),
        in_specs=[
            _full(tri_ot.shape), _full(tri_dt.shape),
            _per_block(3), _per_block(3), _per_block(1), _per_block(1),
        ],
        out_specs=_per_block(8),
        out_shape=jax.ShapeDtypeStruct((nb, 8, BLOCK), jnp.float32),
        interpret=interpret,
    )(tri_ot, tri_dt, ro_t, rd_t, tmin_t, tmax_t)
    return occ[:, 0, :].reshape(ro.shape[0]) > 0.5
