"""Wavefront volumetric path integrator
(csrt src/renderer/integrators/volpath.cpp).

Same skeleton as :mod:`mcpt_tpu.integrators.path` with a medium
interleave: after every traced segment the active medium (chosen from
the destination hit's interior/exterior binding by side,
volpath.cpp:44-62,162-183) samples a free-flight distance; lanes whose
flight terminates early become *medium vertices* — they scatter by the
phase function instead of a BSDF and carry no shading frame.  A per-lane
`scattering` bool selects between the two vertex kinds; both NEE paths
multiply the transmittance weight along the shadow ray
(volpath.cpp:247-485).

Documented deviation: when the free-flight transmittance underflows in
every channel the reference leaves the throughput UNATTENUATED and
shades the surface anyway (volpath.cpp:117-137 `medium_rec.valid`
guard); we kill the lane, which is the correct limit (weight -> 0).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from mcpt_tpu.integrators.path import (
    HitAttrs,
    _stex,
    _escape_pdf,
    _escape_radiance,
    _sample_area_light,
    _shadow_ok,
    apply_opacity,
    interpolate_hit,
    nee_draw_count,
)
from mcpt_tpu.models import bsdf as bsdfs
from mcpt_tpu.models import emitter as emitters
from mcpt_tpu.models import medium as media
from mcpt_tpu.ops import rng
from mcpt_tpu.ops.math import (
    EPSILON,
    EPSILON_DISTANCE,
    EPSILON_FLOAT,
    MAX_FLOAT,
    dot,
    mis_weight,
)
from mcpt_tpu.ops.scene_intersect import scene_any, scene_closest
from mcpt_tpu.scene.compile import SceneData
from mcpt_tpu.scene.ir import EmitterType


def segment_medium(scene: SceneData, hit: HitAttrs, dir_along):
    """Medium on the `dir_along` side of the hit (volpath.cpp:44-46):
    inside = dot(dir, n) > 0 ? hit.inside : !hit.inside."""
    inside = jnp.where(dot(dir_along, hit.normal) > 0.0, hit.inside, ~hit.inside)
    inst = jnp.maximum(hit.inst_id, 0)
    mid = jnp.where(
        inside,
        scene.map_inst_medium_int[inst],
        scene.map_inst_medium_ext[inst],
    )
    return jnp.where(hit.valid, mid, -1)


def _eval_vertex(scene, hit, scattering, cur_mid, wi, wo):
    """f and pdf of `wi` at a mixed surface/medium wavefront:
    BSDF eval on surface lanes, phase eval on medium lanes."""
    pdf_b, f_b, v_b = bsdfs.bsdf_evaluate(
        scene.bsdf,
        _stex(scene),
        scene.present_types,
        hit.bsdf_id,
        wi,
        wo,
        hit.normal,
        hit.tangent,
        hit.bitangent,
        hit.inside,
        hit.uv,
        kc=(scene.brdf_avg, scene.albedo_avg),
    )
    pdf_p, f_p, v_p = media.eval_phase(scene.media, cur_mid, wi, wo)
    pdf = jnp.where(scattering, pdf_p, pdf_b)
    f = jnp.where(scattering[..., None], f_p, f_b)
    valid = jnp.where(scattering, v_p, v_b)
    return pdf, f, valid


def _direct_lighting_vol(scene, hit, pos_m, scattering, cur_mid, wo, alive, xi):
    """All-emitter NEE with transmittance along every shadow ray
    (EvaluateDirectLightVolPath, volpath.cpp:247-485)."""
    n = wo.shape[0]
    L = jnp.zeros((n, 3), jnp.float32)
    origin = jnp.where(scattering[..., None], pos_m, hit.position)
    # medium along the shadow rays: the lane's own medium (medium lanes)
    # or the wo-side medium of the surface (volpath.cpp:253-257)
    mid_surf = segment_medium(scene, hit, wo)
    mid = jnp.where(scattering, cur_mid, mid_surf)
    cursor = 0
    # stochastic-alpha shadow draws at the xi tail (see path.nee_draw_count)
    from mcpt_tpu.integrators.path import (
        SHADOW_ALPHA_K,
        _nee_query_count,
        _nee_rr_tau,
        nee_draw_count as _ndc,
        shadow_occluded,
    )

    # the xi tail is [opacity-alpha draws, RR coins]; volpath doesn't
    # apply shadow-ray RR (media contributions are rarely near-delta)
    # but must skip past the coins to find its alpha draws
    s_base = _ndc(scene) - (
        _nee_query_count(scene) if _nee_rr_tau() > 0.0 else 0
    ) - (
        SHADOW_ALPHA_K * _nee_query_count(scene) if scene.has_opacity else 0
    )
    s_query = 0

    def xi_shadow():
        nonlocal s_query
        if not scene.has_opacity:
            return None
        lo = s_base + s_query * SHADOW_ALPHA_K
        s_query += 1
        return xi[lo : lo + SHADOW_ALPHA_K]

    def surface_cos_ok(wi):
        # surfaces require light above the shading plane; medium vertices
        # scatter from any direction
        return jnp.where(
            scattering, True, dot(-wi, hit.normal) >= EPSILON_FLOAT
        )

    if scene.n_emissive:
        pos_l, n_l, radiance, pdf_area = _sample_area_light(
            scene, xi[0], xi[1], xi[2]
        )
        cursor = 3
        d_vec = origin - pos_l
        dist = jnp.sqrt(jnp.maximum(dot(d_vec, d_vec), 1e-20))
        wi = d_vec / dist[..., None]
        cos_prime = dot(wi, n_l)
        geo_ok = (cos_prime >= EPSILON_FLOAT) & surface_cos_ok(wi) & alive
        # surface -> light for march-block coherence (see path._nee_area)
        occluded = shadow_occluded(scene, origin, -wi, geo_ok, dist,
                                   xi_shadow())
        ok = geo_ok & ~occluded
        w_med, ok_med = media.eval_transmittance(scene.media, mid, dist)
        pdf_eval, f, f_valid = _eval_vertex(scene, hit, scattering, cur_mid, wi, wo)
        ok = ok & ok_med & f_valid
        pdf_direct = pdf_area * (dist * dist) / jnp.maximum(cos_prime, 1e-12)
        w_mis = mis_weight(pdf_direct, pdf_eval)
        contrib = (
            w_mis[..., None]
            * radiance
            * w_med
            * f
            / jnp.maximum(pdf_direct, 1e-12)[..., None]
        )
        L = L + jnp.where(ok[..., None], contrib, 0.0)

    for row, etype in scene.emitter_rows:
        xi0, xi1 = xi[cursor], xi[cursor + 1]
        cursor += 2
        if etype == EmitterType.POINT:
            wi, dist, rad, valid = emitters.sample_point(
                scene.emitters, row, origin
            )
        elif etype == EmitterType.SPOT:
            wi, dist, rad, valid = emitters.sample_spot(
                scene.emitters, scene.tex, row, origin
            )
        elif etype == EmitterType.DIRECTIONAL:
            wi, dist, rad, valid = emitters.sample_directional(
                scene.emitters, row, origin
            )
        elif etype == EmitterType.SUN:
            wi, dist, rad, valid = emitters.sample_sun(
                scene.emitters, row, origin, xi0, xi1
            )
        else:
            continue
        geo_ok = valid & alive & surface_cos_ok(wi)
        occluded = shadow_occluded(scene, origin, -wi, geo_ok, dist,
                                   xi_shadow())
        ok = geo_ok & ~occluded
        w_med, ok_med = media.eval_transmittance(scene.media, mid, dist)
        pdf_eval, f, f_valid = _eval_vertex(scene, hit, scattering, cur_mid, wi, wo)
        L = L + jnp.where(
            (ok & ok_med & f_valid)[..., None], rad * w_med * f, 0.0
        )

    if scene.env_kind != "none":
        if scene.env_kind == "envmap":
            wi, dist, rad, pdf, valid = emitters.sample_envmap(
                scene.env, scene.tex, origin,
                xi[cursor], xi[cursor + 1], xi[cursor + 2]
            )
        else:
            wi, dist, rad, pdf, valid = emitters.sample_constant(
                scene.emitters, scene.env_row, origin,
                xi[cursor], xi[cursor + 1]
            )
        geo_ok = valid & alive & surface_cos_ok(wi)
        occluded = shadow_occluded(scene, origin, -wi, geo_ok, dist,
                                   xi_shadow())
        ok = geo_ok & ~occluded
        w_med, ok_med = media.eval_transmittance(scene.media, mid, dist)
        pdf_eval, f, f_valid = _eval_vertex(scene, hit, scattering, cur_mid, wi, wo)
        w_mis = mis_weight(pdf, pdf_eval)
        contrib = (
            w_mis[..., None] * rad * w_med * f
            / jnp.maximum(pdf, 1e-12)[..., None]
        )
        L = L + jnp.where((ok & ok_med & f_valid)[..., None], contrib, 0.0)

    return L


def shade(scene: SceneData, integ, o, d, seed, differentiable: bool = False):
    """Shade a ray batch through media; returns (L [N,3], seed)."""
    n = o.shape[0]

    ghit = scene_closest(scene, o, d)
    hit = interpolate_hit(scene, ghit, o, d)
    hit, seed = apply_opacity(scene, hit, seed)

    L = jnp.zeros((n, 3), jnp.float32)
    if scene.env_kind != "none":
        L = L + jnp.where(~hit.valid[..., None], _escape_radiance(scene, d), 0.0)
    if scene.sun_row >= 0:
        L = L + jnp.where(
            ~hit.valid[..., None],
            emitters.eval_sun_escape(scene.emitters, scene.tex, scene.sun_row, d),
            0.0,
        )

    wo = -d
    beta = jnp.ones((n, 3), jnp.float32)

    # primary free flight (volpath.cpp:44-62)
    seed, xi_m = rng.random_floats(seed, media.N_FLIGHT_DRAWS)
    mid0 = segment_medium(scene, hit, wo)
    t_seg = jnp.where(hit.valid, hit.t, MAX_FLOAT)
    scattered0, t0, w_med0, ok_m0 = media.sample_flight(
        scene.media, mid0, t_seg, xi_m[0], xi_m[1]
    )
    beta = beta * w_med0
    pos_m0 = o + jnp.minimum(t0, 1e8)[..., None] * d
    cur_mid0 = jnp.where(scattered0, mid0, -1)

    has_bsdf = hit.bsdf_id >= 0
    emitter0 = (
        bsdfs.is_emitter(scene.bsdf, hit.bsdf_id)
        & has_bsdf & hit.valid & ~scattered0
    )
    backface0 = (
        hit.inside
        & ~bsdfs.is_twosided(scene.bsdf, hit.bsdf_id)
        & has_bsdf & hit.valid & ~scattered0
    )
    if not integ.hide_emitters:
        L = L + jnp.where(
            (emitter0 & ~backface0)[..., None],
            bsdfs.get_radiance(scene.bsdf, _stex(scene), hit.bsdf_id, hit.uv),
            0.0,
        )

    alive0 = (hit.valid | scattered0) & ~emitter0 & ~backface0 & ok_m0

    no_lights = (
        scene.n_emissive == 0
        and not scene.emitter_rows
        and scene.env_kind == "none"
    )
    if no_lights or integ.depth_max <= 1:
        return L, seed

    n_nee = nee_draw_count(scene)
    pdf_rr_rcp = 1.0 / integ.pdf_rr

    def cond(state):
        dep = state[0]
        alive = state[-1]
        return (dep < integ.depth_max) & jnp.any(alive)

    def body(state):
        (dep, L, beta, wo, hit, pos_m, scattering, cur_mid, pdf_mis, seed,
         alive) = state

        # --- 1. Russian roulette with immediate compensation
        seed, rr_u = rng.random_float(seed)
        need_rr = dep >= integ.depth_rr
        alive = alive & (~need_rr | (rr_u < integ.pdf_rr))
        beta = jnp.where((alive & need_rr)[..., None], beta * pdf_rr_rcp, beta)

        # --- 2. NEE at surface OR medium vertex
        seed, xi_nee = rng.random_floats(seed, n_nee)
        L = L + beta * _direct_lighting_vol(
            scene, hit, pos_m, scattering, cur_mid, wo, alive, xi_nee
        )

        # --- 3. continuation: BSDF sample or phase sample
        seed, xi_b = rng.random_floats(seed, bsdfs.N_SAMPLE_DRAWS)
        wi_s, pdf_s, f_s, v_s = bsdfs.bsdf_sample(
            scene.bsdf,
            _stex(scene),
            scene.present_types,
            hit.bsdf_id,
            wo,
            hit.normal,
            hit.tangent,
            hit.bitangent,
            hit.inside,
            hit.uv,
            xi_b,
            kc=(scene.brdf_avg, scene.albedo_avg),
        )
        wi_p, pdf_p, f_p, v_p = media.sample_phase(
            scene.media, cur_mid, wo, xi_b[0], xi_b[1], xi_b[2]
        )
        wi = jnp.where(scattering[..., None], wi_p, wi_s)
        pdf_b = jnp.where(scattering, pdf_p, pdf_s)
        f = jnp.where(scattering[..., None], f_p, f_s)
        valid_b = jnp.where(scattering, v_p, v_s)

        beta_new = beta * f / jnp.maximum(pdf_b, 1e-12)[..., None]
        alive = alive & valid_b & (jnp.max(beta_new, axis=-1) >= EPSILON)
        beta = jnp.where(alive[..., None], beta_new, beta)
        # null boundaries are delta pass-throughs: keep the last real pdf
        null_vertex = ~scattering & (hit.bsdf_id < 0)
        pdf_mis = jnp.where(null_vertex, pdf_mis, pdf_b)

        # --- 4. trace the continuation segment
        origin = jnp.where(scattering[..., None], pos_m, hit.position)
        d2 = -wi
        ghit2 = scene_closest(
            scene, origin, d2, t_max=jnp.where(alive, MAX_FLOAT, 0.0)
        )
        hit2 = interpolate_hit(scene, ghit2, origin, d2)
        hit2, seed = apply_opacity(scene, hit2, seed)

        # --- 5. free flight along the segment (volpath.cpp:117-137,162-183)
        seed, xi_m = rng.random_floats(seed, media.N_FLIGHT_DRAWS)
        mid_seg = jnp.where(scattering, cur_mid, segment_medium(scene, hit2, wi))
        t_seg = jnp.where(hit2.valid, hit2.t, MAX_FLOAT)
        scattered2, t2, w_med, ok_m = media.sample_flight(
            scene.media, mid_seg, t_seg, xi_m[0], xi_m[1]
        )
        beta = jnp.where(alive[..., None], beta * w_med, beta)
        alive = alive & ok_m
        pos_m2 = origin + jnp.minimum(t2, 1e8)[..., None] * d2
        cur_mid2 = jnp.where(scattered2, mid_seg, cur_mid)

        surf = alive & ~scattered2

        # --- escape -> envmap/constant with MIS (volpath.cpp:189-203)
        if scene.env_kind != "none":
            esc = surf & ~hit2.valid
            rad_esc = _escape_radiance(scene, d2)
            pdf_esc = _escape_pdf(scene, d2)
            w_esc = mis_weight(pdf_mis, pdf_esc)
            L = L + jnp.where(
                esc[..., None], w_esc[..., None] * beta * rad_esc, 0.0
            )
        alive = alive & (scattered2 | hit2.valid)
        surf = alive & ~scattered2

        # --- emitter hit with MIS (volpath.cpp:205-238)
        has_b = hit2.bsdf_id >= 0
        emitter = bsdfs.is_emitter(scene.bsdf, hit2.bsdf_id) & has_b
        cos_prime = dot(wi, hit2.normal)
        pdf_area_hit = scene.map_inst_light_pdf[jnp.maximum(hit2.inst_id, 0)]
        t_safe = jnp.where(hit2.valid, jnp.minimum(hit2.t, 1e8), 1.0)
        pdf_direct = (
            pdf_area_hit * (t_safe * t_safe) / jnp.maximum(cos_prime, 1e-12)
        )
        w_bsdf = mis_weight(pdf_mis, pdf_direct)
        rad = bsdfs.get_radiance(scene.bsdf, _stex(scene), hit2.bsdf_id, hit2.uv)
        backface2 = (
            hit2.inside & ~bsdfs.is_twosided(scene.bsdf, hit2.bsdf_id) & has_b
        )
        take_em = surf & emitter & ~backface2 & (cos_prime >= EPSILON_FLOAT)
        L = L + jnp.where(take_em[..., None], w_bsdf[..., None] * beta * rad, 0.0)
        alive = alive & (scattered2 | ~emitter)

        # --- one-sided backface absorbs
        alive = alive & (scattered2 | ~backface2)

        return (
            dep + 1, L, beta, wi, hit2, pos_m2, scattered2, cur_mid2, pdf_mis,
            seed, alive,
        )

    pdf_mis0 = jnp.full((n,), 1e12, jnp.float32)
    state = (
        jnp.int32(1), L, beta, wo, hit, pos_m0, scattered0, cur_mid0, pdf_mis0,
        seed, alive0,
    )
    if differentiable:
        def scan_body(state, _):
            return body(state), None

        state, _ = lax.scan(scan_body, state, None, length=integ.depth_max - 1)
    else:
        state = lax.while_loop(cond, body, state)
    return state[1], state[-2]


def shade_regen(scene: SceneData, integ, camera, pixel_idx, spp: int,
                frame_base=0, spp_total: int | None = None,
                sample_offset=0):
    """Fused spp x depth volumetric wavefront with ray regeneration —
    the volpath counterpart of :func:`mcpt_tpu.integrators.path.
    shade_regen` (see its docstring for the scheduling rationale; the
    reference instead parks one CUDA thread per pixel for the full spp
    loop, renderer.cpp:62-79).  Each iteration: refill dead lanes with
    their next camera sample, trace, free-flight through the segment's
    medium (volpath.cpp:44-62,117-183), then shade either the surface
    or the medium vertex.  Estimator identical to :func:`shade` (same
    per-vertex draw budget; per-sample Tea seeds, so images agree
    statistically, not bitwise).  One deliberate deviation from
    :func:`shade`: a primary segment that scatters in a medium before
    escaping no longer ALSO adds the unattenuated escape radiance
    (shade inherits that double-count from the reference's pre-flight
    escape add, volpath.cpp:24-35 — unreachable in every shipped scene
    since no camera sits inside a medium).

    Returns (film [N, 3] = mean over spp, final seed)."""
    from mcpt_tpu.render.camera import generate_rays

    n = pixel_idx.shape[0]
    if spp_total is None:
        spp_total = spp
    base = jnp.asarray(frame_base, jnp.uint32) + jnp.asarray(
        sample_offset, jnp.uint32
    )
    n_nee = nee_draw_count(scene)
    pdf_rr_rcp = 1.0 / integ.pdf_rr
    no_lights = (
        scene.n_emissive == 0
        and not scene.emitter_rows
        and scene.env_kind == "none"
    )
    depth_cut = 1 if (no_lights or integ.depth_max <= 1) else integ.depth_max

    def fold(L, L_samp, mask):
        Ls = L_samp
        if integ.sample_clamp > 0:
            Ls = jnp.minimum(Ls, integ.sample_clamp)
        return L + jnp.where(mask[..., None], Ls, 0.0)

    state0 = (
        jnp.zeros((n,), jnp.int32),            # work_k: next sample index
        jnp.zeros((n, 3), jnp.float32),        # L (sum over folded samples)
        jnp.zeros((n, 3), jnp.float32),        # L_samp (current sample)
        jnp.ones((n, 3), jnp.float32),         # beta
        jnp.zeros((n, 3), jnp.float32),        # ray origin
        jnp.zeros((n, 3), jnp.float32).at[:, 2].set(1.0),  # ray dir
        jnp.full((n,), 1e12, jnp.float32),     # pdf_mis
        rng.pixel_seed(pixel_idx, base),       # seed (replaced at regen)
        jnp.zeros((n,), jnp.bool_),            # alive
        jnp.zeros((n,), jnp.int32),            # vert: vertices so far
        jnp.zeros((n,), jnp.bool_),            # scattering: medium vertex
        jnp.full((n,), -1, jnp.int32),         # cur_mid: active medium id
    )

    def cond(st):
        work_k, alive = st[0], st[8]
        return jnp.any(alive | (work_k < spp))

    def body(st):
        (work_k, L, L_samp, beta, o, d, pdf_mis, seed, alive, vert,
         scattering, cur_mid) = st

        # --- regenerate: dead lanes with samples left start the next one
        fresh = ~alive & (work_k < spp)
        L = fold(L, L_samp, fresh)
        L_samp = jnp.where(fresh[..., None], 0.0, L_samp)
        k = jnp.where(fresh, work_k, 0)
        ku = k.astype(jnp.uint32)
        u = (jnp.asarray(sample_offset, jnp.float32) + k.astype(jnp.float32)
             ) / spp_total
        v = rng.van_der_corput_base2(base + ku + jnp.uint32(1))
        o_new, d_new = generate_rays(camera, pixel_idx, u, v)
        fm = fresh[..., None]
        o = jnp.where(fm, o_new, o)
        d = jnp.where(fm, d_new, d)
        seed = jnp.where(fresh, rng.pixel_seed(pixel_idx, base + ku), seed)
        beta = jnp.where(fm, 1.0, beta)
        pdf_mis = jnp.where(fresh, 1e12, pdf_mis)
        vert = jnp.where(fresh, 0, vert)
        scattering = jnp.where(fresh, False, scattering)
        cur_mid = jnp.where(fresh, -1, cur_mid)
        alive = alive | fresh
        work_k = work_k + fresh.astype(jnp.int32)

        # --- trace (dead lanes get t_max = 0: the traversal idles them;
        # camera/bounce class bit — see path.shade_regen)
        ghit = scene_closest(
            scene, o, d, t_max=jnp.where(alive, MAX_FLOAT, 0.0),
            sort_bias=(~fresh).astype(jnp.int32),
        )
        hit = interpolate_hit(scene, ghit, o, d)
        hit, seed = apply_opacity(scene, hit, seed)
        vert = vert + 1
        primary = vert == 1

        # --- free flight along the segment (volpath.cpp:44-62,117-183):
        # surface-vertex sources read the destination's by-side medium,
        # medium-vertex sources stay in their own
        seed, xi_m = rng.random_floats(seed, media.N_FLIGHT_DRAWS)
        mid_seg = jnp.where(
            scattering, cur_mid, segment_medium(scene, hit, -d)
        )
        t_seg = jnp.where(hit.valid, hit.t, MAX_FLOAT)
        scattered2, t2, w_med, ok_m = media.sample_flight(
            scene.media, mid_seg, t_seg, xi_m[0], xi_m[1]
        )
        beta = jnp.where(alive[..., None], beta * w_med, beta)
        alive = alive & ok_m
        pos_m = o + jnp.minimum(t2, 1e8)[..., None] * d
        cur_mid = jnp.where(scattered2, mid_seg, cur_mid)
        surf = alive & ~scattered2

        # --- escape -> env/constant with MIS (+ sun on camera segments);
        # pdf_mis = 1e12 on camera segments makes w_esc exactly 1.0
        if scene.env_kind != "none":
            esc = surf & ~hit.valid
            rad_esc = _escape_radiance(scene, d)
            pdf_esc = _escape_pdf(scene, d)
            w_esc = mis_weight(pdf_mis, pdf_esc)
            L_samp = L_samp + jnp.where(
                esc[..., None], w_esc[..., None] * beta * rad_esc, 0.0
            )
        if scene.sun_row >= 0:
            L_samp = L_samp + jnp.where(
                (surf & ~hit.valid & primary)[..., None],
                emitters.eval_sun_escape(
                    scene.emitters, scene.tex, scene.sun_row, d
                ),
                0.0,
            )
        alive = alive & (scattered2 | hit.valid)
        surf = alive & ~scattered2

        # --- emitter hit with MIS (volpath.cpp:205-238; primary hits:
        # w = 1, no cosine cut, honoring hide_emitters)
        has_b = hit.bsdf_id >= 0
        emitter = bsdfs.is_emitter(scene.bsdf, hit.bsdf_id) & has_b
        wi_in = -d
        cos_prime = dot(wi_in, hit.normal)
        pdf_area_hit = scene.map_inst_light_pdf[jnp.maximum(hit.inst_id, 0)]
        t_safe = jnp.where(hit.valid, jnp.minimum(hit.t, 1e8), 1.0)
        pdf_direct = (
            pdf_area_hit * (t_safe * t_safe) / jnp.maximum(cos_prime, 1e-12)
        )
        w_bsdf = mis_weight(pdf_mis, pdf_direct)
        rad = bsdfs.get_radiance(scene.bsdf, _stex(scene), hit.bsdf_id, hit.uv)
        backface = (
            hit.inside & ~bsdfs.is_twosided(scene.bsdf, hit.bsdf_id) & has_b
        )
        take_em = (
            surf & emitter & ~backface
            & ((cos_prime >= EPSILON_FLOAT) | primary)
        )
        if integ.hide_emitters:
            take_em = take_em & ~primary
        L_samp = L_samp + jnp.where(
            take_em[..., None], w_bsdf[..., None] * beta * rad, 0.0
        )
        alive = alive & (scattered2 | (~emitter & ~backface))
        alive = alive & (vert < depth_cut)

        # --- 1. Russian roulette with immediate compensation
        seed, rr_u = rng.random_float(seed)
        need_rr = vert >= integ.depth_rr
        alive = alive & (~need_rr | (rr_u < integ.pdf_rr))
        beta = jnp.where((alive & need_rr)[..., None], beta * pdf_rr_rcp, beta)

        # --- 2. NEE at surface OR medium vertex (transmitted shadow rays)
        seed, xi_nee = rng.random_floats(seed, n_nee)
        L_samp = L_samp + beta * _direct_lighting_vol(
            scene, hit, pos_m, scattered2, cur_mid, wi_in, alive, xi_nee
        )

        # --- 3. continuation: BSDF sample or phase sample
        seed, xi_b = rng.random_floats(seed, bsdfs.N_SAMPLE_DRAWS)
        wi_s, pdf_s, f_s, v_s = bsdfs.bsdf_sample(
            scene.bsdf,
            _stex(scene),
            scene.present_types,
            hit.bsdf_id,
            wi_in,
            hit.normal,
            hit.tangent,
            hit.bitangent,
            hit.inside,
            hit.uv,
            xi_b,
            kc=(scene.brdf_avg, scene.albedo_avg),
        )
        wi_p, pdf_p, f_p, v_p = media.sample_phase(
            scene.media, cur_mid, wi_in, xi_b[0], xi_b[1], xi_b[2]
        )
        wi = jnp.where(scattered2[..., None], wi_p, wi_s)
        pdf_b = jnp.where(scattered2, pdf_p, pdf_s)
        f = jnp.where(scattered2[..., None], f_p, f_s)
        valid_b = jnp.where(scattered2, v_p, v_s)

        beta_new = beta * f / jnp.maximum(pdf_b, 1e-12)[..., None]
        alive = alive & valid_b & (jnp.max(beta_new, axis=-1) >= EPSILON)
        beta = jnp.where(alive[..., None], beta_new, beta)
        null_vertex = ~scattered2 & (hit.bsdf_id < 0)
        pdf_mis = jnp.where(null_vertex, pdf_mis, pdf_b)
        o = jnp.where(scattered2[..., None], pos_m, hit.position)
        d = -wi

        return (work_k, L, L_samp, beta, o, d, pdf_mis, seed, alive, vert,
                scattered2, cur_mid)

    state = lax.while_loop(cond, body, state0)
    work_k, L, L_samp = state[0], state[1], state[2]
    L = fold(L, L_samp, jnp.ones_like(work_k, jnp.bool_))
    return L / spp, state[7]
