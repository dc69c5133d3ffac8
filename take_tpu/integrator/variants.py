"""Integrator variants: one-sample MIS and no-MIS ("raw").

Counterparts of path_tracing_one_sample_MIS (path_tracing.h:161-271) and
path_tracing_raw (path_tracing.h:114-157), wavefront-translated like
trace_mis. Key structural differences from the multi-sample integrator,
preserved exactly:

  * both variants ADD EMISSION AT LOOP TOP when standing on an emitter and
    then terminate (path_tracing.h:122-128, :170-177),
  * one-sample MIS flips a 50/50 coin between NEE and BSDF sampling
    (path_tracing.h:187); an NEE step *traces a ray to the light* and lets
    the next loop-top emission test collect the contribution, with
    throughput /= (0.5 lp + 0.5 bp) (path_tracing.h:212-226),
  * a BSDF step divides by (0.5 bp + 0.5 lp) when it lands on a light
    (path_tracing.h:247-266), by bp alone when specular or lightless.
"""

import jax
import jax.numpy as jnp

from take_tpu import config
from take_tpu.core import rng
from take_tpu.core.math import dot, normalize, safe_div
from take_tpu.geometry.intersect import intersect_scene
from take_tpu.integrator.path_tracer import _background, _emitted, offset_origin
from take_tpu.lights.lights import area_pdf, sample_on_light, select_uniform
from take_tpu.materials.bsdf import (
    bsdf_eval,
    bsdf_pdf,
    bsdf_sample,
    is_specular,
    make_shade_point,
)
from take_tpu.scene.types import LIGHT_AREA, RenderOptions, Scene


def trace_raw(scene: Scene, options: RenderOptions, ro, rd, streams):
    """Path tracing without MIS (path_tracing.h:114-157)."""
    eps = jnp.asarray(config.C_EPSILON, ro.dtype)
    N = ro.shape[0]
    tmin0 = jnp.full(N, eps)
    tmax0 = jnp.full(N, jnp.inf)

    hit = intersect_scene(scene, ro, rd, tmin0, tmax0)
    radiance = jnp.where(hit.valid[:, None], 0.0, _background(scene, rd))
    throughput = jnp.ones_like(ro)
    active = hit.valid

    def bounce(carry, i):
        ro, rd, hit, throughput, radiance, active = carry

        # loop-top emission + terminate (path_tracing.h:123-128)
        on_light = hit.light_id >= 0
        radiance = radiance + jnp.where(
            (active & on_light)[:, None], throughput * _emitted(scene, hit), 0.0
        )
        active = active & ~on_light

        dir_in = -rd
        sp = make_shade_point(scene, hit)
        u_lobe = rng.uniform(streams, rng.bounce_counter(i, rng.DIM_LOBE_SELECT))
        ub1 = rng.uniform(streams, rng.bounce_counter(i, rng.DIM_BSDF_U1))
        ub2 = rng.uniform(streams, rng.bounce_counter(i, rng.DIM_BSDF_U2))
        ub3 = rng.uniform(streams, rng.bounce_counter(i, rng.DIM_AUX))
        dir_out, bpdf = bsdf_sample(scene, sp, dir_in, u_lobe, ub1, ub2, ub3)
        FG = bsdf_eval(scene, sp, dir_in, dir_out, sample_pdf=bpdf)
        dir_out = normalize(dir_out, eps=1e-30)
        sample_ok = bpdf > 0.0
        contrib = safe_div(FG, bpdf[:, None], 0.0)
        new_throughput = jnp.where(
            (active & sample_ok)[:, None], throughput * contrib, throughput
        )

        new_ro = offset_origin(hit.pos, hit.geo_n, dir_out)
        new_hit = intersect_scene(scene, new_ro, dir_out, tmin0, tmax0)
        miss = sample_ok & ~new_hit.valid
        radiance = radiance + jnp.where(
            (active & miss)[:, None],
            new_throughput * _background(scene, dir_out),
            0.0,
        )
        new_active = active & sample_ok & new_hit.valid

        keep = active[:, None]
        ro_n = jnp.where(keep, new_ro, ro)
        rd_n = jnp.where(keep, dir_out, rd)
        hit_n = jax.tree_util.tree_map(
            lambda new, old: jnp.where(keep if new.ndim == 2 else active, new, old),
            new_hit, hit,
        )
        return (ro_n, rd_n, hit_n, new_throughput, radiance, new_active), None

    carry = (ro, rd, hit, throughput, radiance, active)
    carry, _ = jax.lax.scan(
        bounce, carry, jnp.arange(options.max_depth + 1, dtype=jnp.uint32)
    )
    return carry[4]


def trace_one_sample_mis_power(scene, options, ro, rd, streams):
    """One-sample MIS with power-proportional light picking
    (path_tracing_one_sample_MIS_power, path_tracing.h:274-380).

    In the reference this variant is DEAD CODE: it reads
    scene.lights_power_pmf/cdf which nothing ever populates (scene.h:28-29
    ⚠) and asserts at runtime. Our light table carries a real power
    CDF/PMF (build.py), so this works; implemented as the one-sample
    integrator with select_power + pmf-weighted light pdfs.
    """
    return trace_one_sample_mis(
        scene, options, ro, rd, streams, light_select="power"
    )


def trace_one_sample_mis(scene: Scene, options: RenderOptions, ro, rd, streams,
                         light_select="uniform"):
    """One-sample MIS (path_tracing.h:161-271)."""
    n_lights = scene.meta.n_lights
    eps = jnp.asarray(config.C_EPSILON, ro.dtype)
    N = ro.shape[0]
    tmin0 = jnp.full(N, eps)
    tmax0 = jnp.full(N, jnp.inf)

    hit = intersect_scene(scene, ro, rd, tmin0, tmax0)
    radiance = jnp.where(hit.valid[:, None], 0.0, _background(scene, rd))
    throughput = jnp.ones_like(ro)
    active = hit.valid

    def bounce(carry, i):
        ro, rd, hit, throughput, radiance, active = carry

        # loop-top emission + terminate (path_tracing.h:170-177)
        on_light = hit.light_id >= 0
        radiance = radiance + jnp.where(
            (active & on_light)[:, None], throughput * _emitted(scene, hit), 0.0
        )
        active = active & ~on_light

        dir_in = -rd
        sp = make_shade_point(scene, hit)
        spec = is_specular(sp)

        u_tech = rng.uniform(streams, rng.bounce_counter(i, rng.DIM_MIS_TECH))
        take_nee = (
            jnp.zeros(N, bool)
            if n_lights == 0
            else (~spec) & (u_tech <= 0.5)
        )

        # ---- NEE arm: trace a ray TO the light sample; emission collected
        # next bounce-top (path_tracing.h:188-227)
        if n_lights > 0:
            u_sel = rng.uniform(streams, rng.bounce_counter(i, rng.DIM_LIGHT_SELECT))
            u1 = rng.uniform(streams, rng.bounce_counter(i, rng.DIM_LIGHT_U1))
            u2 = rng.uniform(streams, rng.bounce_counter(i, rng.DIM_LIGHT_U2))
            if light_select == "power":
                from take_tpu.lights.lights import power_pmf, select_power

                light_id = select_power(scene, u_sel)
                sel_pmf = power_pmf(scene, light_id)
            else:
                light_id = select_uniform(scene, u_sel)
                sel_pmf = jnp.full(N, 1.0 / n_lights)
            ls = sample_on_light(scene, light_id, hit.pos, u1, u2)
            delta = ls.position - hit.pos
            d = jnp.linalg.norm(delta, axis=-1)
            nee_dir = delta / jnp.maximum(d, 1e-30)[:, None]
            cos_l = jnp.maximum(dot(-ls.normal, nee_dir), 0.0)
            apdf = area_pdf(scene, light_id, ls.position, hit.pos)
            # solid-angle pdf x selection pmf (path_tracing.h:309 semantics)
            lp_nee = safe_div(apdf * d * d * sel_pmf, cos_l, 0.0)
            bp_nee = bsdf_pdf(scene, sp, dir_in, nee_dir)
            FG_nee = bsdf_eval(scene, sp, dir_in, nee_dir)
            nee_ok = ls.is_area & (lp_nee > 0.0) & (bp_nee > 0.0)
            w_nee = safe_div(
                jnp.ones_like(lp_nee), 0.5 * lp_nee + 0.5 * bp_nee, 0.0
            )
        else:
            nee_dir = rd
            FG_nee = jnp.zeros_like(throughput)
            w_nee = jnp.zeros(N)
            nee_ok = jnp.zeros(N, bool)

        # ---- BSDF arm (path_tracing.h:229-267)
        u_lobe = rng.uniform(streams, rng.bounce_counter(i, rng.DIM_LOBE_SELECT))
        ub1 = rng.uniform(streams, rng.bounce_counter(i, rng.DIM_BSDF_U1))
        ub2 = rng.uniform(streams, rng.bounce_counter(i, rng.DIM_BSDF_U2))
        ub3 = rng.uniform(streams, rng.bounce_counter(i, rng.DIM_AUX))
        bs_dir, bpdf = bsdf_sample(scene, sp, dir_in, u_lobe, ub1, ub2, ub3)
        FG_bs = bsdf_eval(scene, sp, dir_in, bs_dir, sample_pdf=bpdf)
        bs_dir = normalize(bs_dir, eps=1e-30)
        bs_ok = bpdf > 0.0

        # chosen direction
        dir_out = jnp.where(take_nee[:, None], nee_dir, bs_dir)
        new_ro = offset_origin(hit.pos, hit.geo_n, dir_out)
        new_hit = intersect_scene(scene, new_ro, dir_out, tmin0, tmax0)

        # ---- pdf for the BSDF arm depends on what it hit
        if n_lights > 0:
            hit_em = new_hit.valid & (new_hit.light_id >= 0)
            lid = jnp.maximum(new_hit.light_id, 0)
            d2 = jnp.linalg.norm(new_hit.pos - hit.pos, axis=-1)
            cos2 = jnp.maximum(dot(-new_hit.geo_n, dir_out), 0.0)
            apdf2 = area_pdf(scene, lid, new_hit.pos, hit.pos)
            if light_select == "power":
                from take_tpu.lights.lights import power_pmf

                hit_pmf = power_pmf(scene, lid)
            else:
                hit_pmf = jnp.full(N, 1.0 / n_lights)
            lp_bs = safe_div(apdf2 * d2 * d2 * hit_pmf, cos2, 0.0)
            is_area_l = scene.lights.tag[lid] == LIGHT_AREA
            add_lp = (~spec) & hit_em & is_area_l
            pdf_bs = jnp.where(
                spec | (n_lights == 0), bpdf, 0.5 * bpdf
            ) + jnp.where(add_lp, 0.5 * lp_bs, 0.0)
        else:
            pdf_bs = bpdf

        # ---- throughput update for both arms
        contrib_nee = FG_nee * w_nee[:, None]
        contrib_bs = safe_div(FG_bs, pdf_bs[:, None], 0.0)
        contrib = jnp.where(take_nee[:, None], contrib_nee, contrib_bs)
        step_ok = jnp.where(take_nee, nee_ok, bs_ok)
        new_throughput = jnp.where(
            (active & step_ok)[:, None], throughput * contrib, throughput
        )

        # miss -> background (only meaningful for the BSDF arm; an NEE ray
        # always hits the light or an occluder, path_tracing.h:214-219)
        miss = step_ok & ~new_hit.valid
        radiance = radiance + jnp.where(
            (active & miss & ~take_nee)[:, None],
            new_throughput * _background(scene, dir_out),
            0.0,
        )

        new_active = active & step_ok & new_hit.valid

        keep = active[:, None]
        ro_n = jnp.where(keep, new_ro, ro)
        rd_n = jnp.where(keep, dir_out, rd)
        hit_n = jax.tree_util.tree_map(
            lambda new, old: jnp.where(keep if new.ndim == 2 else active, new, old),
            new_hit, hit,
        )
        return (ro_n, rd_n, hit_n, new_throughput, radiance, new_active), None

    carry = (ro, rd, hit, throughput, radiance, active)
    carry, _ = jax.lax.scan(
        bounce, carry, jnp.arange(options.max_depth + 1, dtype=jnp.uint32)
    )
    return carry[4]
