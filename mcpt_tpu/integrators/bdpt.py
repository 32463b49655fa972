"""Wavefront bidirectional path tracing
(archive/src/integrators/bdpt.cpp — the reference keeps BDPT in its v1
archive only; this is the TPU re-design of that estimator).

Structure mirrors the archive:
  1. `_light_subpath` builds a K-vertex light subpath per lane
     (CreateEmitterPath, bdpt.cpp:70-157): light point sampled from the
     area-light CDF, cosine-emitted, scattered by pseudo-sample +
     transport evaluate; each surface vertex caches the radiance
     scattered toward its outgoing direction (direct lighting + MIS-
     weighted transport from the previous vertex).
  2. `shade` walks the camera path (ShadeIterately, bdpt.cpp:159-313):
     per bounce it gathers NEE direct lighting, connects to every light
     subpath vertex (visibility ray + eval on both ends + area-measure
     pdf conversion + power-heuristic weight combination,
     bdpt.cpp:168-245), then continues by BSDF sampling with the
     archive's surface-reuse attenuation trick (bdpt.cpp:269-283).

Deviations (documented):
  * the archive's RR guard `if (i > pdf_rr_)` compares the loop index to
    the RR *probability* (0.95) so it always divides (bdpt.cpp:149-152);
    we use `depth_rr` as intended;
  * like the rest of this framework, MIS pdfs are the true sampling
    pdfs, and all draws are scene-static per stage for aligned lanes.
The estimator inherits the archive's heuristic multi-strategy weighting
(pairwise power heuristics, not Veach-complete); it is validated against
the unidirectional integrator on diffuse scenes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from mcpt_tpu.integrators.path import (
    HitAttrs,
    _stex,
    _bsdf_eval,
    _direct_lighting,
    _escape_pdf,
    _escape_radiance,
    _sample_area_light,
    apply_opacity,
    interpolate_hit,
    nee_draw_count,
)
from mcpt_tpu.models import bsdf as bsdfs
from mcpt_tpu.models import emitter as emitters
from mcpt_tpu.ops import rng
from mcpt_tpu.ops.math import (
    EPSILON,
    EPSILON_DISTANCE,
    EPSILON_FLOAT,
    MAX_FLOAT,
    dot,
    mis_weight,
    normalize,
)
from mcpt_tpu.ops.scene_intersect import scene_any, scene_closest
from mcpt_tpu.ops.warps import sample_hemisphere_cosine
from mcpt_tpu.ops.math import build_onb, to_world
from mcpt_tpu.scene.compile import SceneData

# static light-subpath length (surface vertices beyond the light point)
K_LIGHT = 3


class LightVertex(NamedTuple):
    valid: jnp.ndarray      # [N]
    position: jnp.ndarray   # [N, 3]
    normal: jnp.ndarray     # [N, 3] oriented shading normal
    inst_id: jnp.ndarray    # [N]
    bsdf_id: jnp.ndarray    # [N]
    uv: jnp.ndarray         # [N, 2]
    tangent: jnp.ndarray    # [N, 3]
    bitangent: jnp.ndarray  # [N, 3]
    inside: jnp.ndarray     # [N]
    wi_in: jnp.ndarray      # [N, 3] direction light traveled INTO vertex
    beta_in: jnp.ndarray    # [N, 3] incident throughput: emitted radiance
    #                         transported along the subpath, divided by
    #                         every sampling pdf up to this vertex
    #                         (the Veach alpha recurrence)
    cos_in: jnp.ndarray     # [N] |n . wi_in| at this vertex


def light_subpath_draws(scene: SceneData) -> int:
    opacity = 1 if scene.has_opacity else 0
    return 5 + K_LIGHT * opacity + (K_LIGHT - 1) * bsdfs.N_SAMPLE_DRAWS


def _light_subpath(scene: SceneData, integ, seed, n):
    """Build the light subpath with Veach alpha (beta) throughputs.

    Re-design of the archive's CreateEmitterPath (bdpt.cpp:70-157): the
    archive caches a per-vertex RADIANCE built from its own NEE calls
    and divides connections by a uniform instance-area pdf — a heuristic
    that is badly biased when the light subpath's true density differs
    from uniform (measured 1.6x bright on an indirect-only box, round
    2).  Here each vertex instead carries the standard BDPT incident
    throughput

        beta_1   = Le * cos(light) / (pdf_area * pdf_dir)
        beta_k+1 = beta_k * f(wi_in -> dir_next) * cos_out
                   / (cos_in * pdf_sample)

    (f in this codebase includes the INCIDENT cosine, hence the
    cos_out/cos_in correction), so a connection contributes the exact
    unweighted path integrand estimate beta * f_v * cos_conn /
    (cos_in * d^2) * f_cam — unbiased per strategy."""
    # --- light vertex (bdpt.cpp:77-90)
    seed, xi = rng.random_floats(seed, 5)
    pos0, n0, rad0, pdf_area0 = _sample_area_light(scene, xi[0], xi[1], xi[2])
    d_local, pdf_dir0 = sample_hemisphere_cosine(xi[3], xi[4])
    t0, b0 = build_onb(n0)
    dir0 = to_world(d_local, t0, b0, n0)

    vertices = []
    prev_pos = pos0
    prev_dir = dir0
    prev_valid = jnp.ones((n,), jnp.bool_) & (scene.n_emissive > 0)
    cos0 = jnp.abs(dot(dir0, n0))
    beta = (
        rad0 * cos0[..., None]
        / jnp.maximum(pdf_area0 * pdf_dir0, 1e-12)[..., None]
    )

    for k in range(K_LIGHT):
        ghit = scene_closest(
            scene, prev_pos, prev_dir,
            t_max=jnp.where(prev_valid, MAX_FLOAT, 0.0),
        )
        hit = interpolate_hit(scene, ghit, prev_pos, prev_dir)
        hit, seed = apply_opacity(scene, hit, seed)
        has_b = hit.bsdf_id >= 0
        is_em = bsdfs.is_emitter(scene.bsdf, hit.bsdf_id) & has_b
        backface = (
            hit.inside & ~bsdfs.is_twosided(scene.bsdf, hit.bsdf_id) & has_b
        )
        valid = prev_valid & hit.valid & ~is_em & ~backface & has_b

        wi_in = prev_dir  # direction light travels into this vertex
        cos_in = jnp.maximum(jnp.abs(dot(wi_in, hit.normal)), 1e-6)

        if k >= integ.depth_rr:
            beta = beta / integ.pdf_rr

        vertices.append(
            LightVertex(
                valid=valid,
                position=hit.position,
                normal=hit.normal,
                inst_id=hit.inst_id,
                bsdf_id=hit.bsdf_id,
                uv=hit.uv,
                tangent=hit.tangent,
                bitangent=hit.bitangent,
                inside=hit.inside,
                wi_in=wi_in,
                beta_in=jnp.where(valid[..., None], beta, 0.0),
                cos_in=cos_in,
            )
        )

        if k == K_LIGHT - 1:
            break

        # extend: sample the scattered continuation and update beta
        seed, xi_b = rng.random_floats(seed, bsdfs.N_SAMPLE_DRAWS)
        wi_ps, pdf_ps, f_ps, v_ps = bsdfs.bsdf_sample(
            scene.bsdf, _stex(scene), scene.present_types, hit.bsdf_id,
            -wi_in, hit.normal, hit.tangent, hit.bitangent, hit.inside,
            hit.uv, xi_b, kc=(scene.brdf_avg, scene.albedo_avg),
        )
        # bsdf_sample treats its wo argument (-wi_in) as the outgoing
        # side and the returned wi as incident; by reciprocity evaluate
        # the transport with the roles swapped: f includes cos(-wi_in
        # side)... use the explicit eval in the light-flow orientation.
        dir_next = -wi_ps
        pdf_t, f_t, v_t = _bsdf_eval(scene, hit, wi_in, dir_next)
        valid = valid & v_ps & v_t
        cos_out = jnp.maximum(jnp.abs(dot(dir_next, hit.normal)), 1e-6)
        beta = beta * f_t * (
            cos_out / (cos_in * jnp.maximum(pdf_ps, 1e-12))
        )[..., None]
        beta = jnp.where(valid[..., None], beta, 0.0)

        prev_pos = hit.position
        prev_dir = dir_next
        prev_valid = valid

    return vertices, seed


def _connect(scene: SceneData, hit: HitAttrs, wo, alive, vert: LightVertex,
             xi_shadow=None):
    """One camera-vertex <-> light-vertex connection
    (bdpt.cpp:194-245): visibility + eval at both ends + area-measure
    conversion.  Returns (L [N,3], pdf_direct [N], ok [N]).

    The visibility segment traces camera-vertex -> light-vertex (origin
    coherence for the march blocks — see path._direct_lighting) and applies
    stochastic alpha like the archive's IsTransparent-in-traversal
    (archive/src/shapes/triangle.cpp:66)."""
    from mcpt_tpu.integrators.path import shadow_occluded

    d_vec = hit.position - vert.position
    dist = jnp.sqrt(jnp.maximum(dot(d_vec, d_vec), 1e-20))
    dir_lc = d_vec / dist[..., None]  # light-vertex -> camera-vertex

    cos_prime = jnp.abs(dot(dir_lc, vert.normal))
    geo_ok = vert.valid & alive & (cos_prime >= EPSILON_FLOAT)
    occluded = shadow_occluded(
        scene, hit.position, -dir_lc, geo_ok, dist, xi_shadow
    )
    ok = geo_ok & ~occluded

    # light-side BSDF: light flowed in along wi_in, leaves toward the
    # camera vertex (reciprocal eval; f includes cos_in which the
    # G-term algebra divides back out — see _light_subpath docstring)
    pdf_v, f_v, v_v = _bsdf_eval(scene, vert, vert.wi_in, dir_lc)
    # camera vertex evaluates the incoming direction
    pdf_c, f_c, v_c = _bsdf_eval(scene, hit, dir_lc, wo)
    ok = ok & v_c & v_v
    # connections require BOTH endpoints to be connectible (wide lobes);
    # near-specular endpoints make the strategy fire ~never while the
    # proxy MIS density still hands it O(1) weight — the complementary
    # w_cont gate in shade() keeps the pairwise partition summing to 1
    ok = (
        ok
        & bsdfs.is_connectible(scene.bsdf, _stex(scene), vert.bsdf_id, vert.uv)
        & bsdfs.is_connectible(scene.bsdf, _stex(scene), hit.bsdf_id, hit.uv)
    )

    # unweighted contribution: beta_in * (f_v / cos_in) * G * (f_c /
    # cos_x) with G = cos_prime * cos_x / d^2  (cos_x cancels f_c's
    # built-in incident cosine)
    contrib = (
        vert.beta_in
        * f_v
        * f_c
        * (cos_prime / (vert.cos_in * dist * dist))[..., None]
    )

    # MIS vs the camera-side BSDF continuation that could build the same
    # edge, using the SAME instance-area proxy density as the skeleton's
    # w_cont down-weight (shade, bdpt.cpp:269-283) — the pair then
    # partitions exactly: w_conn + w_cont = 1 for every shared path
    area_pdf_l = scene.map_inst_area_pdf[jnp.maximum(vert.inst_id, 0)]
    pdf_direct = area_pdf_l * dist * dist / jnp.maximum(cos_prime, 1e-12)
    w_direct = mis_weight(pdf_direct, pdf_c)
    L = w_direct[..., None] * contrib
    return jnp.where(ok[..., None], L, 0.0), pdf_direct, ok


def shade(scene: SceneData, integ, o, d, seed, differentiable: bool = False):
    """BDPT shade: unidirectional skeleton + per-bounce light-subpath
    connections (ShadeIterately, bdpt.cpp:159-313)."""
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

    has_bsdf = hit.bsdf_id >= 0
    emitter0 = bsdfs.is_emitter(scene.bsdf, hit.bsdf_id) & has_bsdf & hit.valid
    backface0 = (
        hit.inside & ~bsdfs.is_twosided(scene.bsdf, hit.bsdf_id)
        & has_bsdf & hit.valid
    )
    if not integ.hide_emitters:
        L = L + jnp.where(
            (emitter0 & ~backface0)[..., None],
            bsdfs.get_radiance(scene.bsdf, _stex(scene), hit.bsdf_id, hit.uv),
            0.0,
        )
    alive = hit.valid & ~emitter0 & ~backface0

    no_lights = (
        scene.n_emissive == 0
        and not scene.emitter_rows
        and scene.env_kind == "none"
    )
    if no_lights or integ.depth_max <= 1:
        return L, seed

    # --- light subpath (shared by all bounces of this lane)
    light_path, seed = _light_subpath(scene, integ, seed, n)

    n_nee = nee_draw_count(scene)
    pdf_rr_rcp = 1.0 / integ.pdf_rr
    beta = jnp.ones((n, 3), jnp.float32)
    wo = -d
    pdf_mis = jnp.full((n,), 1e12, jnp.float32)

    # Python-unrolled bounce loop (depth_max for BDPT configs is small);
    # each bounce consumes a fixed draw budget.
    depth_cap = min(integ.depth_max, 8)
    for dep in range(1, depth_cap):
        # --- Russian roulette
        seed, rr_u = rng.random_float(seed)
        if dep >= integ.depth_rr:
            alive = alive & (rr_u < integ.pdf_rr)
            beta = jnp.where(alive[..., None], beta * pdf_rr_rcp, beta)

        # --- NEE (s=1 strategies)
        seed, xi_nee = rng.random_floats(seed, n_nee)
        L = L + beta * _direct_lighting(
            scene, hit, wo, alive, xi_nee, beta=beta
        )

        # --- light-subpath connections (s>=2), power-heuristic combined
        # across the K strategies (bdpt.cpp:240-245 WeightPowerHeuristic)
        conn_L = []
        conn_pdf = []
        for vert in light_path:
            if scene.has_opacity:
                from mcpt_tpu.integrators.path import SHADOW_ALPHA_K

                seed, xi_sh = rng.random_floats(seed, SHADOW_ALPHA_K)
            else:
                xi_sh = None
            Lc, pdfc, okc = _connect(scene, hit, wo, alive, vert, xi_sh)
            conn_L.append(Lc)
            conn_pdf.append(jnp.where(okc, pdfc, 0.0))
        if conn_L:
            pdf_sq = [p * p for p in conn_pdf]
            denom = sum(pdf_sq)
            for Lc, p2 in zip(conn_L, pdf_sq):
                w = p2 / jnp.maximum(denom, 1e-20)
                L = L + beta * w[..., None] * Lc

        # --- continuation
        seed, xi_b = rng.random_floats(seed, bsdfs.N_SAMPLE_DRAWS)
        wi, pdf_b, f, valid_b = bsdfs.bsdf_sample(
            scene.bsdf, _stex(scene), scene.present_types, hit.bsdf_id,
            wo, hit.normal, hit.tangent, hit.bitangent, hit.inside,
            hit.uv, xi_b, kc=(scene.brdf_avg, scene.albedo_avg),
        )
        beta_new = beta * f / jnp.maximum(pdf_b, 1e-12)[..., None]
        alive = alive & valid_b & (jnp.max(beta_new, axis=-1) >= EPSILON)
        beta = jnp.where(alive[..., None], beta_new, beta)
        null_vertex = hit.bsdf_id < 0
        pdf_mis = jnp.where(null_vertex, pdf_mis, pdf_b)

        o2 = hit.position
        d2 = -wi
        ghit2 = scene_closest(
            scene, o2, d2, t_max=jnp.where(alive, MAX_FLOAT, 0.0)
        )
        hit2 = interpolate_hit(scene, ghit2, o2, d2)
        hit2, seed = apply_opacity(scene, hit2, seed)

        if scene.env_kind != "none":
            esc = alive & ~hit2.valid
            rad_esc = _escape_radiance(scene, d2)
            pdf_esc = _escape_pdf(scene, d2)
            w_esc = mis_weight(pdf_mis, pdf_esc)
            L = L + jnp.where(
                esc[..., None], w_esc[..., None] * beta * rad_esc, 0.0
            )
        alive = alive & hit2.valid

        has_b = hit2.bsdf_id >= 0
        em = bsdfs.is_emitter(scene.bsdf, hit2.bsdf_id) & has_b
        cos_prime = dot(wi, hit2.normal)
        pdf_area_hit = scene.map_inst_light_pdf[jnp.maximum(hit2.inst_id, 0)]
        t_safe = jnp.where(hit2.valid, jnp.minimum(hit2.t, 1e8), 1.0)
        pdf_direct = (
            pdf_area_hit * (t_safe * t_safe) / jnp.maximum(cos_prime, 1e-12)
        )
        w_bsdf = mis_weight(pdf_mis, pdf_direct)
        rad = bsdfs.get_radiance(scene.bsdf, _stex(scene), hit2.bsdf_id, hit2.uv)
        # back faces absorb BEFORE emitter radiance is added — one-sided
        # lights emit from the front only (ShadePath order, path.cpp:99-124)
        backface2 = (
            hit2.inside & ~bsdfs.is_twosided(scene.bsdf, hit2.bsdf_id) & has_b
        )
        take_em = alive & em & ~backface2 & (cos_prime >= EPSILON_FLOAT)
        L = L + jnp.where(take_em[..., None], w_bsdf[..., None] * beta * rad, 0.0)
        alive = alive & ~em

        alive = alive & ~backface2

        # down-weight the surviving camera continuation against the
        # area-measure connection strategies that can also construct the
        # same transport paths (bdpt.cpp:269-283) — but ONLY where the
        # competing connection is actually enabled (_connect's
        # connectible gate); a specular-chain edge has no alternative
        # construction, so its continuation keeps full weight
        cos_cont = jnp.maximum(jnp.abs(dot(wi, hit2.normal)), 1e-4)
        pdf_area_cont = scene.map_inst_area_pdf[jnp.maximum(hit2.inst_id, 0)]
        pdf_direct_cont = pdf_area_cont * (t_safe * t_safe) / cos_cont
        both_conn = (
            bsdfs.is_connectible(scene.bsdf, _stex(scene), hit.bsdf_id, hit.uv)
            & bsdfs.is_connectible(
                scene.bsdf, scene.tex, hit2.bsdf_id, hit2.uv
            )
        )
        w_cont = jnp.where(
            both_conn, mis_weight(pdf_b, pdf_direct_cont), 1.0
        )
        beta = jnp.where(alive[..., None], beta * w_cont[..., None], beta)

        wo = wi
        hit = hit2

    return L, seed
