"""Real Disney BSDF lobes (Burley 2012/2015 principled BSDF).

The reference *stubs* these: DisneyMetal/Glass/Sheen/BSDF sample/eval/pdf
are verbatim Lambertian copies and DisneyClearcoat's eval returns zero
(materials/disney_*.inl ⚠, e.g. disney_metal.inl:22-28 ≡ diffuse.inl). The
parameter set it parses (parse_scene.cpp:578-694) is the standard principled
set, so we implement the real lobes it clearly intended:

  * Metal: anisotropic GGX (Trowbridge-Reitz) with Smith masking and
    Schlick-toward-baseColor Fresnel; VNDF-free D*cos sampling with the
    Jacobian 1/(4 (h.out)).
  * Clearcoat: the Burley clearcoat D (alpha interpolated by gloss),
    fixed-roughness-0.25 Smith G, F = Schlick(0.04).
  * Glass: rough dielectric — GGX half-vector sampling, exact dielectric
    Fresnel, reflection + refraction branches; uses Hit.front for the eta
    orientation (the reference destroys that bit, which is *why* its glass
    could never work).
  * Sheen: tint-blended retro term (1 - h.out)^5.
  * DisneyBSDF: the weighted composite (diffuse/sheen/metal/clearcoat/glass)
    with lobe-probability sampling and a blended pdf.

Conventions follow this codebase (= the reference): eval returns BRDF * cos
folded together; pdfs are solid-angle; dir_in points away from the surface.
All functions are batched [N] and branch-free (jnp.where).
"""

import jax.numpy as jnp

from take_tpu.core.math import (
    C_INVPI,
    C_PI,
    C_TWOPI,
    dot,
    face_forward,
    normalize,
    reflect,
    to_world,
)
from take_tpu.core.sampling import sample_hemisphere_cos
from take_tpu.scene.types import (
    MAT_DISNEY_BSDF,
    MAT_DISNEY_CLEARCOAT,
    MAT_DISNEY_GLASS,
    MAT_DISNEY_METAL,
    MAT_DISNEY_SHEEN,
)

FULL_SAMPLE_TAGS = (
    MAT_DISNEY_METAL,
    MAT_DISNEY_GLASS,
    MAT_DISNEY_CLEARCOAT,
    MAT_DISNEY_SHEEN,
    MAT_DISNEY_BSDF,
)
FULL_EVAL_TAGS = FULL_SAMPLE_TAGS
FULL_PDF_TAGS = FULL_SAMPLE_TAGS

_MIN_ALPHA = 1e-4


def _luminance(c):
    return c[..., 0] * 0.212671 + c[..., 1] * 0.715160 + c[..., 2] * 0.072169


def _alphas(roughness, anisotropic):
    """Anisotropic GGX alphas (Burley): aspect from anisotropic."""
    aspect = jnp.sqrt(jnp.maximum(1.0 - 0.9 * anisotropic, 1e-4))
    a2 = jnp.maximum(roughness * roughness, _MIN_ALPHA)
    return a2 / aspect, a2 * aspect  # (alpha_x, alpha_y)


def _frame(sp, dir_in):
    """Shading frame (n flipped toward dir_in) + tangent basis via to_world."""
    n = face_forward(sp.sh_n, dir_in)
    ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype), n.shape)
    ey = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], n.dtype), n.shape)
    tx = to_world(n, ex)
    ty = to_world(n, ey)
    return n, tx, ty


def _to_local(n, tx, ty, w):
    return jnp.stack([dot(tx, w), dot(ty, w), dot(n, w)], axis=-1)


def _ggx_D(hl, ax, ay):
    """Anisotropic GGX NDF in local frame; hl [N,3].

    Factored as (1/k)^2 * 1/(pi ax ay): the naive 1/(pi ax ay k^2) forms
    products that UNDERFLOW f32 at small alpha x small k, whose reciprocal
    is inf and whose VJP is 0*inf = NaN on masked lanes (round-4 fix).
    Every factor here is individually bounded (<= ~1e7 each)."""
    hx, hy, hz = hl[..., 0], hl[..., 1], hl[..., 2]
    k = hx * hx / (ax * ax) + hy * hy / (ay * ay) + hz * hz
    ik = 1.0 / jnp.maximum(k, 1e-7)
    return jnp.where(hz > 0.0, ik * ik / (C_PI * ax * ay), 0.0)


def _sqrt0(x):
    """sqrt clamped at 0 with ZERO gradient at the boundary.

    Plain sqrt has an infinite derivative at 0; wherever a clipped
    quantity legitimately reaches 0 (TIR, horizon, sampling-disc edges)
    the chain rule turns a masked lane into NaN even under zero
    cotangents (round-4 fix: Disney roughness gradients NaN'd on any
    scene with grazing/TIR configurations). Primal values are bitwise
    unchanged."""
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def _smith_lambda(wl, ax, ay):
    wx, wy, wz = wl[..., 0], wl[..., 1], wl[..., 2]
    wz2 = jnp.maximum(wz * wz, 1e-12)
    a = (ax * ax * wx * wx + ay * ay * wy * wy) / wz2
    return 0.5 * (jnp.sqrt(1.0 + a) - 1.0)


def _smith_G1(wl, ax, ay):
    return 1.0 / (1.0 + _smith_lambda(wl, ax, ay))


def _sample_ggx_vndf(wl, ax, ay, u1, u2):
    """Heitz 2018 visible-normal sampling in local frame; wl must have z>0."""
    vx = wl[..., 0] * ax
    vy = wl[..., 1] * ay
    vz = wl[..., 2]
    v = normalize(jnp.stack([vx, vy, vz], axis=-1), eps=1e-20)
    lensq = v[..., 0] ** 2 + v[..., 1] ** 2
    inv = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where(
        (lensq > 1e-12)[..., None],
        jnp.stack([-v[..., 1] * inv, v[..., 0] * inv, jnp.zeros_like(inv)], -1),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], v.dtype), v.shape),
    )
    t2 = jnp.cross(v, t1)
    r = _sqrt0(jnp.clip(u1, 0.0, 1.0))
    phi = C_TWOPI * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + v[..., 2])
    p2 = (1.0 - s) * _sqrt0(jnp.clip(1.0 - p1 * p1, 0.0, 1.0)) + s * p2
    p3 = _sqrt0(jnp.clip(1.0 - p1 * p1 - p2 * p2, 0.0, 1.0))
    nh = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * v
    h = jnp.stack(
        [nh[..., 0] * ax, nh[..., 1] * ay, jnp.maximum(nh[..., 2], 1e-6)], -1
    )
    return normalize(h, eps=1e-20)


def _vndf_pdf(wl_in, hl, ax, ay):
    """pdf of _sample_ggx_vndf in half-vector measure: G1 D max(0,w.h)/w.z."""
    D = _ggx_D(hl, ax, ay)
    G1 = _smith_G1(wl_in, ax, ay)
    wh = jnp.maximum(jnp.sum(wl_in * hl, axis=-1), 0.0)
    wz = jnp.maximum(wl_in[..., 2], 1e-6)
    return G1 * D * wh / wz


def _schlick_w(cos_t):
    return jnp.clip(1.0 - cos_t, 0.0, 1.0) ** 5


def _fresnel_dielectric(cos_i, eta):
    """Exact dielectric Fresnel; cos_i >= 0, eta = n_transmitted/n_incident."""
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin2_t = (1.0 - cos_i * cos_i) / (eta * eta)
    tir = sin2_t >= 1.0
    cos_t = _sqrt0(jnp.clip(1.0 - sin2_t, 0.0, 1.0))
    rs = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-12)
    rp = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-12)
    F = 0.5 * (rs * rs + rp * rp)
    return jnp.where(tir, 1.0, F)


# ===========================================================================
# Metal
# ===========================================================================


def _metal_eval(sp, dir_in, dir_out):
    n, tx, ty = _frame(sp, dir_in)
    il = _to_local(n, tx, ty, dir_in)
    ol = _to_local(n, tx, ty, dir_out)
    h = normalize(dir_in + dir_out, eps=1e-20)
    hl = _to_local(n, tx, ty, h)
    ax, ay = _alphas(sp.roughness, sp.anisotropic)
    D = _ggx_D(hl, ax, ay)
    G = _smith_G1(il, ax, ay) * _smith_G1(ol, ax, ay)
    F = sp.refl + (1.0 - sp.refl) * _schlick_w(jnp.sum(h * dir_out, -1))[..., None]
    niz = jnp.maximum(il[..., 2], 1e-6)
    f = F * (D * G / (4.0 * niz))[..., None]  # includes cos_out via G D form
    ok = (il[..., 2] > 0.0) & (ol[..., 2] > 0.0) & (dot(sp.geo_n, dir_out) > 0.0)
    return jnp.where(ok[..., None], f, 0.0)


def _metal_pdf(sp, dir_in, dir_out):
    n, tx, ty = _frame(sp, dir_in)
    il = _to_local(n, tx, ty, dir_in)
    h = normalize(dir_in + dir_out, eps=1e-20)
    hl = _to_local(n, tx, ty, h)
    ol = _to_local(n, tx, ty, dir_out)
    ax, ay = _alphas(sp.roughness, sp.anisotropic)
    hdo = jnp.maximum(jnp.sum(h * dir_out, -1), 1e-8)
    pdf = _vndf_pdf(il, hl, ax, ay) / (4.0 * hdo)
    ok = (il[..., 2] > 0.0) & (ol[..., 2] > 0.0) & (dot(sp.geo_n, dir_out) > 0.0)
    return jnp.where(ok, pdf, 0.0)


def _metal_sample(sp, dir_in, u1, u2):
    n, tx, ty = _frame(sp, dir_in)
    il = _to_local(n, tx, ty, dir_in)
    ax, ay = _alphas(sp.roughness, sp.anisotropic)
    hl = _sample_ggx_vndf(il, ax, ay, u1, u2)
    h = hl[..., 0:1] * tx + hl[..., 1:2] * ty + hl[..., 2:3] * n
    dir_out = reflect(dir_in, h)
    pdf = _metal_pdf(sp, dir_in, dir_out)
    pdf = jnp.where(dot(sp.geo_n, dir_in) < 0.0, 0.0, pdf)
    return dir_out, pdf


# ===========================================================================
# Clearcoat
# ===========================================================================


def _cc_alpha(sp):
    return (1.0 - sp.clearcoat_gloss) * 0.1 + sp.clearcoat_gloss * 0.001


def _cc_D(hz, alpha):
    a2 = alpha * alpha
    denom = C_PI * jnp.log(jnp.maximum(a2, 1e-12)) * (
        1.0 + (a2 - 1.0) * hz * hz
    )
    return (a2 - 1.0) / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)


def _clearcoat_eval(sp, dir_in, dir_out):
    n, tx, ty = _frame(sp, dir_in)
    il = _to_local(n, tx, ty, dir_in)
    ol = _to_local(n, tx, ty, dir_out)
    h = normalize(dir_in + dir_out, eps=1e-20)
    hl = _to_local(n, tx, ty, h)
    D = _cc_D(hl[..., 2], _cc_alpha(sp))
    F = 0.04 + 0.96 * _schlick_w(jnp.sum(h * dir_out, -1))
    G = _smith_G1(il, 0.25, 0.25) * _smith_G1(ol, 0.25, 0.25)
    niz = jnp.maximum(il[..., 2], 1e-6)
    f = F * D * G / (4.0 * niz)
    ok = (il[..., 2] > 0.0) & (ol[..., 2] > 0.0) & (dot(sp.geo_n, dir_out) > 0.0)
    return jnp.where(ok, f, 0.0)[..., None] * jnp.ones_like(dir_in)


def _clearcoat_pdf(sp, dir_in, dir_out):
    n, tx, ty = _frame(sp, dir_in)
    ol = _to_local(n, tx, ty, dir_out)
    il = _to_local(n, tx, ty, dir_in)
    h = normalize(dir_in + dir_out, eps=1e-20)
    hl = _to_local(n, tx, ty, h)
    D = _cc_D(hl[..., 2], _cc_alpha(sp))
    hdo = jnp.maximum(jnp.sum(h * dir_out, -1), 1e-8)
    # D-sampling pdf: D * cos_h / (4 h.out)
    pdf = D * jnp.maximum(hl[..., 2], 0.0) / (4.0 * hdo)
    ok = (il[..., 2] > 0.0) & (ol[..., 2] > 0.0) & (dot(sp.geo_n, dir_out) > 0.0)
    return jnp.where(ok, pdf, 0.0)


def _clearcoat_sample(sp, dir_in, u1, u2):
    n, tx, ty = _frame(sp, dir_in)
    alpha = _cc_alpha(sp)
    a2 = jnp.maximum(alpha * alpha, 1e-12)
    cos2 = (1.0 - a2 ** (1.0 - u1)) / (1.0 - a2)
    cos_h = _sqrt0(jnp.clip(cos2, 0.0, 1.0))
    sin_h = _sqrt0(jnp.clip(1.0 - cos2, 0.0, 1.0))
    phi = C_TWOPI * u2
    hl = jnp.stack([sin_h * jnp.cos(phi), sin_h * jnp.sin(phi), cos_h], -1)
    h = hl[..., 0:1] * tx + hl[..., 1:2] * ty + cos_h[..., None] * n
    dir_out = reflect(dir_in, h)
    pdf = _clearcoat_pdf(sp, dir_in, dir_out)
    pdf = jnp.where(dot(sp.geo_n, dir_in) < 0.0, 0.0, pdf)
    return dir_out, pdf


# ===========================================================================
# Sheen
# ===========================================================================


def _sheen_color(sp):
    lum = jnp.maximum(_luminance(sp.refl), 1e-8)
    tint = sp.refl / lum[..., None]
    return (1.0 - sp.sheen_tint)[..., None] + sp.sheen_tint[..., None] * tint


def _sheen_eval(sp, dir_in, dir_out):
    n, _, _ = _frame(sp, dir_in)
    h = normalize(dir_in + dir_out, eps=1e-20)
    hdo = jnp.sum(h * dir_out, -1)
    ndo = dot(n, dir_out)
    f = _sheen_color(sp) * (_schlick_w(hdo) * jnp.maximum(ndo, 0.0))[..., None]
    ok = (dot(n, dir_out) > 0.0) & (dot(sp.geo_n, dir_out) > 0.0)
    return jnp.where(ok[..., None], f, 0.0)


def _sheen_sample(sp, dir_in, u1, u2):
    n = face_forward(sp.sh_n, dir_in)
    dir_out = to_world(n, sample_hemisphere_cos(u1, u2))
    pdf = jnp.maximum(dot(n, dir_out), 0.0) * C_INVPI
    pdf = jnp.where(
        (dot(sp.geo_n, dir_out) < 0.0) | (dot(sp.geo_n, dir_in) < 0.0), 0.0, pdf
    )
    return dir_out, pdf


def _sheen_pdf(sp, dir_in, dir_out):
    n = face_forward(sp.sh_n, dir_in)
    pdf = jnp.maximum(dot(n, dir_out), 0.0) * C_INVPI
    return jnp.where(dot(sp.geo_n, dir_out) < 0.0, 0.0, pdf)


# ===========================================================================
# Glass (rough dielectric)
# ===========================================================================


def _glass_eta(sp):
    """eta = n_inside/n_outside oriented by which side the ray came from."""
    return jnp.where(sp.front, sp.eta, 1.0 / jnp.maximum(sp.eta, 1e-6))


def _glass_eval(sp, dir_in, dir_out):
    n, tx, ty = _frame(sp, dir_in)
    eta = _glass_eta(sp)
    il = _to_local(n, tx, ty, dir_in)
    ol = _to_local(n, tx, ty, dir_out)
    ax, ay = _alphas(sp.roughness, sp.anisotropic)
    reflecting = ol[..., 2] > 0.0

    # half vectors for both branches
    h_r = normalize(dir_in + dir_out, eps=1e-20)
    h_t = normalize(dir_in + dir_out * eta[..., None], eps=1e-20)
    h = jnp.where(reflecting[..., None], h_r, h_t)
    hl = _to_local(n, tx, ty, h)
    flip = (hl[..., 2] < 0.0)[..., None]
    hl = jnp.where(flip, -hl, hl)
    h = jnp.where(flip, -h, h)

    hdi = jnp.sum(h * dir_in, -1)
    hdo = jnp.sum(h * dir_out, -1)
    F = _fresnel_dielectric(jnp.abs(hdi), eta)
    D = _ggx_D(hl, ax, ay)
    # Smith lambda only uses squared components, so ol works on both sides
    G = _smith_G1(il, ax, ay) * _smith_G1(ol, ax, ay)
    niz = jnp.maximum(jnp.abs(il[..., 2]), 1e-6)

    f_refl = (F * D * G / (4.0 * niz))[..., None] * jnp.ones_like(sp.refl)
    denom = hdi + eta * hdo
    denom2 = jnp.maximum(denom * denom, 1e-12)
    f_trans = (
        _sqrt0(jnp.maximum(sp.refl, 0.0))
        * (
            (1.0 - F)
            * D
            * G
            * jnp.abs(hdo * hdi)
            / (niz * denom2)
        )[..., None]
    )
    f = jnp.where(reflecting[..., None], f_refl, f_trans)
    return jnp.where((jnp.abs(ol[..., 2]) > 1e-7)[..., None], f, 0.0)


def _glass_pdf(sp, dir_in, dir_out):
    n, tx, ty = _frame(sp, dir_in)
    eta = _glass_eta(sp)
    il = _to_local(n, tx, ty, dir_in)
    ol = _to_local(n, tx, ty, dir_out)
    ax, ay = _alphas(sp.roughness, sp.anisotropic)
    reflecting = ol[..., 2] > 0.0

    h_r = normalize(dir_in + dir_out, eps=1e-20)
    h_t = normalize(dir_in + dir_out * eta[..., None], eps=1e-20)
    h = jnp.where(reflecting[..., None], h_r, h_t)
    hl = _to_local(n, tx, ty, h)
    flip = (hl[..., 2] < 0.0)[..., None]
    hl = jnp.where(flip, -hl, hl)
    h = jnp.where(flip, -h, h)

    hdi = jnp.sum(h * dir_in, -1)
    hdo = jnp.sum(h * dir_out, -1)
    F = _fresnel_dielectric(jnp.abs(hdi), eta)
    ph = _vndf_pdf(il, hl, ax, ay)
    pdf_refl = F * ph / jnp.maximum(4.0 * jnp.abs(hdo), 1e-12)
    denom = hdi + eta * hdo
    denom2 = jnp.maximum(denom * denom, 1e-12)
    jac_t = eta * eta * jnp.abs(hdo) / denom2
    pdf_trans = (1.0 - F) * ph * jac_t
    pdf = jnp.where(reflecting, pdf_refl, pdf_trans)
    return jnp.where(jnp.abs(ol[..., 2]) > 1e-7, pdf, 0.0)


def _glass_sample(sp, dir_in, u_lobe, u1, u2):
    n, tx, ty = _frame(sp, dir_in)
    eta = _glass_eta(sp)
    il = _to_local(n, tx, ty, dir_in)
    ax, ay = _alphas(sp.roughness, sp.anisotropic)
    hl = _sample_ggx_vndf(il, ax, ay, u1, u2)
    h = hl[..., 0:1] * tx + hl[..., 1:2] * ty + hl[..., 2:3] * n

    hdi = jnp.sum(h * dir_in, -1)
    F = _fresnel_dielectric(jnp.abs(hdi), eta)

    # reflection
    d_refl = reflect(dir_in, h)
    # refraction (Snell through h)
    cos_i = hdi
    sin2_t = (1.0 - cos_i * cos_i) / (eta * eta)
    tir = sin2_t >= 1.0
    cos_t = _sqrt0(jnp.clip(1.0 - sin2_t, 0.0, 1.0))
    d_trans = normalize(
        -dir_in / eta[..., None]
        + (jnp.abs(cos_i) / eta - cos_t)[..., None] * jnp.sign(cos_i)[..., None] * h,
        eps=1e-20,
    )
    take_refl = (u_lobe <= F) | tir
    dir_out = jnp.where(take_refl[..., None], d_refl, d_trans)
    pdf = _glass_pdf(sp, dir_in, dir_out)
    return dir_out, pdf


# ===========================================================================
# DisneyBSDF composite
# ===========================================================================


def _bsdf_weights(sp):
    """Lobe mixture weights (Burley 2015 coefficients)."""
    diffuse_w = (1.0 - sp.metallic) * (1.0 - sp.spec_trans)
    metal_w = 1.0 - sp.spec_trans * (1.0 - sp.metallic)
    glass_w = (1.0 - sp.metallic) * sp.spec_trans
    clearcoat_w = 0.25 * sp.clearcoat
    return diffuse_w, metal_w, glass_w, clearcoat_w


def _disney_diffuse_lobe_eval(sp, dir_in, dir_out):
    """Burley diffuse (base + subsurface mix), as in _disney_diffuse_eval."""
    from take_tpu.materials.bsdf import _disney_diffuse_eval

    return _disney_diffuse_eval(sp, dir_in, dir_out, None)


def _bsdf_metal_fresnel(sp, h, dir_out, eta):
    """Metal lobe Fresnel with specular/specular_tint/eta modulation."""
    lum = jnp.maximum(_luminance(sp.refl), 1e-8)
    tint = sp.refl / lum[..., None]
    ks = (1.0 - sp.specular_tint)[..., None] + sp.specular_tint[..., None] * tint
    r0 = ((eta - 1.0) / (eta + 1.0)) ** 2
    c0 = (
        sp.specular[..., None] * r0[..., None] * (1.0 - sp.metallic)[..., None] * ks
        + sp.metallic[..., None] * sp.refl
    )
    hdo = jnp.sum(h * dir_out, -1)
    return c0 + (1.0 - c0) * _schlick_w(hdo)[..., None]


def _disney_bsdf_eval(sp, dir_in, dir_out):
    n, tx, ty = _frame(sp, dir_in)
    il = _to_local(n, tx, ty, dir_in)
    ol = _to_local(n, tx, ty, dir_out)
    dw, mw, gw, cw = _bsdf_weights(sp)
    eta = _glass_eta(sp)

    reflecting = (il[..., 2] > 0.0) & (ol[..., 2] > 0.0)

    f = jnp.zeros_like(dir_in)
    # diffuse + sheen + metal + clearcoat only on the reflection side
    f_diff = _disney_diffuse_lobe_eval(sp, dir_in, dir_out)
    f_sheen = _sheen_eval(sp, dir_in, dir_out) * sp.sheen[..., None] * (
        1.0 - sp.metallic
    )[..., None]
    # metal with modified fresnel
    h = normalize(dir_in + dir_out, eps=1e-20)
    hl = _to_local(n, tx, ty, h)
    ax, ay = _alphas(sp.roughness, sp.anisotropic)
    D = _ggx_D(hl, ax, ay)
    G = _smith_G1(il, ax, ay) * _smith_G1(ol, ax, ay)
    Fm = _bsdf_metal_fresnel(sp, h, dir_out, eta)
    niz = jnp.maximum(il[..., 2], 1e-6)
    f_metal = Fm * (D * G / (4.0 * niz))[..., None]
    f_cc = _clearcoat_eval(sp, dir_in, dir_out)
    f_glass = _glass_eval(sp, dir_in, dir_out)

    f = jnp.where(
        reflecting[..., None],
        dw[..., None] * f_diff
        + f_sheen
        + mw[..., None] * f_metal
        + cw[..., None] * f_cc
        + gw[..., None] * f_glass,
        gw[..., None] * f_glass,
    )
    return f


def _bsdf_lobe_probs(sp):
    dw, mw, gw, cw = _bsdf_weights(sp)
    total = jnp.maximum(dw + mw + gw + cw, 1e-8)
    return dw / total, mw / total, gw / total, cw / total


def _disney_bsdf_pdf(sp, dir_in, dir_out):
    pd, pm, pg, pc = _bsdf_lobe_probs(sp)
    from take_tpu.materials.bsdf import _cosine_pdf

    p = (
        pd * _cosine_pdf(sp, dir_in, dir_out)
        + pm * _metal_pdf(sp, dir_in, dir_out)
        + pg * _glass_pdf(sp, dir_in, dir_out)
        + pc * _clearcoat_pdf(sp, dir_in, dir_out)
    )
    return p


def _disney_bsdf_sample(sp, dir_in, u_lobe, u1, u2, u3):
    from take_tpu.materials.bsdf import _cosine_sample

    pd, pm, pg, pc = _bsdf_lobe_probs(sp)
    d_d, _ = _cosine_sample(sp, dir_in, u1, u2)
    d_m, _ = _metal_sample(sp, dir_in, u1, u2)
    d_g, _ = _glass_sample(sp, dir_in, u3, u1, u2)
    d_c, _ = _clearcoat_sample(sp, dir_in, u1, u2)
    c1 = pd
    c2 = pd + pm
    c3 = pd + pm + pg
    dir_out = jnp.where(
        (u_lobe < c1)[..., None],
        d_d,
        jnp.where(
            (u_lobe < c2)[..., None],
            d_m,
            jnp.where((u_lobe < c3)[..., None], d_g, d_c),
        ),
    )
    pdf = _disney_bsdf_pdf(sp, dir_in, dir_out)
    return dir_out, pdf


# ===========================================================================
# Dispatch API used by materials/bsdf.py
# ===========================================================================


def sample(tag, sp, dir_in, u_lobe, u1, u2, u3=None):
    if u3 is None:
        u3 = u_lobe
    if tag == MAT_DISNEY_METAL:
        return _metal_sample(sp, dir_in, u1, u2)
    if tag == MAT_DISNEY_GLASS:
        return _glass_sample(sp, dir_in, u_lobe, u1, u2)
    if tag == MAT_DISNEY_CLEARCOAT:
        return _clearcoat_sample(sp, dir_in, u1, u2)
    if tag == MAT_DISNEY_SHEEN:
        return _sheen_sample(sp, dir_in, u1, u2)
    if tag == MAT_DISNEY_BSDF:
        return _disney_bsdf_sample(sp, dir_in, u_lobe, u1, u2, u3)
    raise NotImplementedError(tag)


def eval(tag, sp, dir_in, dir_out, sample_pdf):
    if tag == MAT_DISNEY_METAL:
        return _metal_eval(sp, dir_in, dir_out)
    if tag == MAT_DISNEY_GLASS:
        return _glass_eval(sp, dir_in, dir_out)
    if tag == MAT_DISNEY_CLEARCOAT:
        return _clearcoat_eval(sp, dir_in, dir_out)
    if tag == MAT_DISNEY_SHEEN:
        return _sheen_eval(sp, dir_in, dir_out) * sp.sheen[..., None]
    if tag == MAT_DISNEY_BSDF:
        return _disney_bsdf_eval(sp, dir_in, dir_out)
    raise NotImplementedError(tag)


def pdf(tag, sp, dir_in, dir_out):
    if tag == MAT_DISNEY_METAL:
        return _metal_pdf(sp, dir_in, dir_out)
    if tag == MAT_DISNEY_GLASS:
        return _glass_pdf(sp, dir_in, dir_out)
    if tag == MAT_DISNEY_CLEARCOAT:
        return _clearcoat_pdf(sp, dir_in, dir_out)
    if tag == MAT_DISNEY_SHEEN:
        return _sheen_pdf(sp, dir_in, dir_out)
    if tag == MAT_DISNEY_BSDF:
        return _disney_bsdf_pdf(sp, dir_in, dir_out)
    raise NotImplementedError(tag)
