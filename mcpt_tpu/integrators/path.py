"""Wavefront unidirectional path integrator with NEE + MIS + RR
(csrt src/renderer/integrators/path.cpp).

The reference shades one pixel per thread with a serial depth loop.  The
TPU design shades a whole ray batch per `lax.while_loop` iteration: every
lane advances one bounce per iteration, dead lanes are masked (their
traversal rays get t_max = 0 so the BVH loop pops the root and idles).

Per-iteration structure mirrors ShadePath (path.cpp:57-133):
  1. Russian roulette (after depth_rr) — survivors compensated
     *immediately*, which keeps the estimator unbiased (the reference
     compensates one iteration late, path.cpp:129-132, under-weighting
     bounces >= depth_rr by exactly one pdf_rr factor; deviation noted).
  2. NEE toward one CDF-sampled emissive triangle + all analytic
     emitters, shadow ray via any-hit, power-heuristic MIS.
  3. BSDF sampling, throughput update, kill at throughput < kEpsilon.
  4. Closest-hit trace; escape -> envmap MIS; emitter hit -> MIS'd
     radiance and terminate; one-sided backface -> absorb.

RNG: one uint32 LCG lane per ray (Tea-seeded per pixel); every iteration
draws the same number of uniforms in every lane, so streams stay aligned
and the image is independent of batch/tile/mesh sharding.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from mcpt_tpu.models import bsdf as bsdfs
from mcpt_tpu.models import emitter as emitters
from mcpt_tpu.models import texture as textures
from mcpt_tpu.scene.ir import EmitterType
from mcpt_tpu.ops import rng
from mcpt_tpu.ops.math import (
    EPSILON,
    EPSILON_DISTANCE,
    EPSILON_FLOAT,
    MAX_FLOAT,
    dot,
    mis_weight,
    normalize,
    take_rows,
)
from mcpt_tpu.ops.quadric import quadric_attrs, sample_quadric_row
from mcpt_tpu.ops.scene_intersect import scene_any, scene_closest
from mcpt_tpu.ops.warps import sample_triangle_uniform, searchsorted_cdf
from mcpt_tpu.scene.compile import SceneData


class HitAttrs(NamedTuple):
    """Interpolated shading attributes (csrt Hit, hit.hpp:9-30)."""

    valid: jnp.ndarray    # [N] bool
    t: jnp.ndarray        # [N]
    position: jnp.ndarray  # [N, 3]
    normal: jnp.ndarray    # [N, 3] shading normal
    tangent: jnp.ndarray   # [N, 3]
    bitangent: jnp.ndarray  # [N, 3]
    uv: jnp.ndarray        # [N, 2]
    inside: jnp.ndarray    # [N] bool
    bsdf_id: jnp.ndarray   # [N] int32 (-1 none)
    inst_id: jnp.ndarray   # [N] int32


def _stex(scene: SceneData):
    """Texture view for surface shading: evaluation kinds restricted to
    what the BSDF tables can reach (scene.surface_kinds).  Emitter-only
    bitmaps (envmap radiance, sun/sky, spot projection) otherwise force
    the 12-gather bitmap branch into every BSDF parameter read — ~10 ms
    per eval at 64k lanes on a v5e for scenes whose surfaces are all
    constant/checkerboard (the whole matpreview family)."""
    return scene.tex.replace(kinds=scene.surface_kinds)


def interpolate_hit(scene: SceneData, ghit, o, d) -> HitAttrs:
    """Barycentric attribute interpolation (csrt triangle.cpp:116-147)."""
    g = scene.geom
    p = ghit.prim
    u = 1.0 - ghit.v - ghit.w
    uf = u[..., None]
    vf = ghit.v[..., None]
    wf = ghit.w[..., None]

    normal = normalize(uf * take_rows(g.n0, p) + vf * take_rows(g.n1, p) + wf * take_rows(g.n2, p))
    tangent = normalize(uf * take_rows(g.tg0, p) + vf * take_rows(g.tg1, p) + wf * take_rows(g.tg2, p))
    bitangent = normalize(uf * take_rows(g.bt0, p) + vf * take_rows(g.bt1, p) + wf * take_rows(g.bt2, p))
    uv = uf * take_rows(g.uv0, p) + vf * take_rows(g.uv1, p) + wf * take_rows(g.uv2, p)
    inst = take_rows(g.inst_id, p)

    # clamp t for the position so missed lanes (t = MAX_FLOAT) stay
    # finite — garbage leaks NaNs into reverse-mode AD otherwise.
    t_pos = jnp.minimum(ghit.t, 1e8)
    position = o + t_pos[..., None] * d

    # analytic quadric lanes override the interpolated frame with exact
    # attributes (csrt sphere.cpp:47-85 / disk.cpp / cylinder.cpp);
    # the shared bump + inside-flip pipeline below applies to both.
    quad_idx = getattr(ghit, "quad", None)
    if scene.quad_kinds and quad_idx is not None:
        qn, qt, qb, quv, qinst = quadric_attrs(
            scene.quad, scene.quad_kinds, quad_idx, position
        )
        is_q = quad_idx >= 0
        mq = is_q[..., None]
        normal = jnp.where(mq, qn, normal)
        tangent = jnp.where(mq, qt, tangent)
        bitangent = jnp.where(mq, qb, bitangent)
        uv = jnp.where(mq, quv, uv)
        inst = jnp.where(is_q, qinst, inst)
    bsdf_id = take_rows(scene.map_inst_bsdf, jnp.maximum(inst, 0))

    # bump mapping perturbs the shading frame BEFORE the inside flip
    # (csrt triangle.cpp:129-134 + bsdf.cpp:238-253)
    if scene.has_bump:
        from mcpt_tpu.ops.math import cross

        bump_tid = take_rows(scene.bsdf.bump_tid, jnp.maximum(bsdf_id, 0))
        has_bump = (bump_tid >= 0) & (bsdf_id >= 0)
        grad = textures.eval_gradient(
            bsdfs._ktex(scene.tex, scene.bsdf, "bump"),
            jnp.maximum(bump_tid, 0), uv
        )
        n_b = normalize(
            -grad[..., 0:1] * tangent - grad[..., 1:2] * bitangent + normal
        )
        b_b = normalize(cross(n_b, tangent))
        t_b = normalize(cross(b_b, n_b))
        m = has_bump[..., None]
        normal = jnp.where(m, n_b, normal)
        bitangent = jnp.where(m, b_b, bitangent)
        tangent = jnp.where(m, t_b, tangent)

    # back-face hits flip the stored normal/bitangent exactly like the
    # reference (triangle.cpp:136-141) — `inside` semantics downstream
    # (dielectric eta swap, medium side selection) depend on this.
    flip = ghit.inside[..., None]
    normal = jnp.where(flip, -normal, normal)
    bitangent = jnp.where(flip, -bitangent, bitangent)
    return HitAttrs(
        valid=ghit.valid,
        t=ghit.t,
        position=position,
        normal=normal,
        tangent=tangent,
        bitangent=bitangent,
        uv=uv,
        inside=ghit.inside,
        bsdf_id=jnp.where(ghit.valid, bsdf_id, -1),
        inst_id=inst,
    )


def apply_opacity(scene: SceneData, hit: HitAttrs, seed):
    """Stochastic alpha: a hit on an opacity-masked surface becomes a
    null pass-through vertex with probability (1 - alpha) — csrt tests
    IsTransparent inside traversal (triangle.cpp:117, bsdf.cpp:272-276);
    the wavefront form relocates the test to the shading vertex.
    Consumes one uniform draw iff the scene has opacity maps (static)."""
    if not scene.has_opacity:
        return hit, seed
    seed, u = rng.random_float(seed)
    tid = take_rows(scene.bsdf.opacity_tid, jnp.maximum(hit.bsdf_id, 0))
    has = (tid >= 0) & (hit.bsdf_id >= 0) & hit.valid
    alpha = textures.eval_opacity(
        bsdfs._ktex(scene.tex, scene.bsdf, "opacity"),
        jnp.maximum(tid, 0), hit.uv)
    transparent = has & (u >= alpha)
    return hit._replace(
        bsdf_id=jnp.where(transparent, -1, hit.bsdf_id)
    ), seed


def _sample_area_light(scene: SceneData, xi_sel, xi_a, xi_b):
    """Pick an emissive triangle from the global CDF and a point on it
    (equivalent to csrt path.cpp:186-196 + blas.cpp:79-98; see
    scene/compile.py docstring for the pdf identity)."""
    em = scene.em
    cell = searchsorted_cdf(em.cdf, xi_sel)
    w, u, v = sample_triangle_uniform(xi_a, xi_b)
    uf, vf = u[..., None], v[..., None]
    # take_rows: one-hot contraction for small emissive sets (per-lane
    # gathers serialize on the TPU VPU — measured 0.55 ms at 64k lanes
    # for these 10 row lookups), plain gather above its size cutoff
    p0c, e1c, e2c = take_rows(em.p0, cell), take_rows(em.e1, cell), take_rows(em.e2, cell)
    n0c, n1c, n2c = take_rows(em.n0, cell), take_rows(em.n1, cell), take_rows(em.n2, cell)
    uv0c, uv1c, uv2c = take_rows(em.uv0, cell), take_rows(em.uv1, cell), take_rows(em.uv2, cell)
    pdf_area_c = take_rows(em.pdf_area, cell)
    # resolve the radiance texture per CELL ([E] gather, table-sized),
    # then per lane — no [N]-lane gather anywhere on this path
    tid_cell = scene.bsdf.radiance_tid[em.bsdf_id]  # [E]
    radiance_tid = take_rows(tid_cell, cell)
    pos = p0c + uf * e1c + vf * e2c
    nrm = normalize(w[..., None] * n0c + uf * n1c + vf * n2c)
    uv = w[..., None] * uv0c + uf * uv1c + vf * uv2c
    # emissive analytic quadrics own one CDF cell each; their uniform
    # surface sample replaces the (zeroed) triangle row when selected
    for cell_idx, quad_row, kind in scene.em_quad_cells:
        qpos, qnrm, quv = sample_quadric_row(
            scene.quad, quad_row, kind, xi_a, xi_b
        )
        m = cell == cell_idx
        mf = m[..., None]
        pos = jnp.where(mf, qpos, pos)
        nrm = jnp.where(mf, qnrm, nrm)
        uv = jnp.where(mf, quv, uv)
    radiance = textures.eval_color(
        bsdfs._ktex(scene.tex, scene.bsdf, "radiance"),
        jnp.maximum(radiance_tid, 0), uv)
    return pos, nrm, radiance, pdf_area_c


def _bsdf_eval(scene, hit, wi, wo):
    return bsdfs.bsdf_evaluate(
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


# Max masked/null crossings resolved per shadow ray; deeper stacks pass
# unoccluded (documented bounded-depth deviation — no shipped scene
# stacks > 4 masked occluders; tests/test_features.py pins the boundary
# behavior).  MCPT_SHADOW_ALPHA_K raises it for stacked-foliage scenes.
SHADOW_ALPHA_K = max(1, int(__import__("os").environ.get(
    "MCPT_SHADOW_ALPHA_K", "4"
)))


def _use_origin_chunk(scene: SceneData) -> bool:
    """Whether to sort continuation/shadow rays by origin-chunk keys.

    OFF by default: measured end-to-end on matpreview-conductor the
    chunk-major key is throughput-neutral on block corridor unions
    (scripts/corridor_probe.py: sum|union| 4385 vs 4301 octori — the
    union is direction-divergence-bound, not origin-bound) while the
    extra [N] gather + loop carry cost ~10% (2.94 -> 2.66 Mrays/s).
    Kept behind MCPT_COH=1 for experiments on other scenes."""
    import os

    from mcpt_tpu.ops.traversal import DENSE_MAX_PRIMS

    if os.environ.get("MCPT_COH", "0") != "1":
        return False
    g = scene.geom
    return (
        g.march_chunk_of_prim is not None
        and g.p0.shape[0] > DENSE_MAX_PRIMS
    )


def _origin_chunk(scene: SceneData, shit):
    """SAH chunk id of the hit prim (-1 = miss/quadric): the coherence
    key for rays ORIGINATING at this hit point — continuation and shadow
    segments both start there, so sorting them by this id aligns march
    blocks with the chunk partition itself (traversal._ray_sort_keys).
    Returns None for scenes that don't use the march path."""
    if not _use_origin_chunk(scene):
        return None
    coh = take_rows(scene.geom.march_chunk_of_prim, shit.prim)
    ok = shit.valid
    if scene.quad_kinds:
        ok = ok & (shit.quad < 0)
    return jnp.where(ok, coh, -1)


def _nee_query_count(scene: SceneData) -> int:
    """Shadow queries one _direct_lighting call makes."""
    q = (1 if scene.n_emissive else 0) + len(scene.emitter_rows)
    if scene.env_kind != "none":
        q += 1
    return q


def _nee_rr_tau() -> float:
    """Shadow-ray Russian-roulette threshold: an NEE query whose
    potential contribution max(beta*contrib) is below tau is traced
    with probability p = max/tau and weighted 1/p — unbiased
    contribution-proportional RR (not in the reference; deviation
    documented).  The big win is near-delta vertices: a smooth
    conductor's alpha=0.001 GGX gives NEE contributions ~1e-6 yet paid
    a full shadow traversal every bounce; under RR those rays almost
    never fire and pack into dead march blocks.  Added variance is
    bounded by ~tau per query per sample.  MCPT_NEE_RR_TAU overrides;
    0 disables."""
    import os

    return float(os.environ.get("MCPT_NEE_RR_TAU", "0.05"))


def nee_draw_count(scene: SceneData) -> int:
    """Uniform draws consumed by one _direct_lighting call (scene-static
    so RNG streams stay aligned across the wavefront)."""
    k = 0
    if scene.n_emissive:
        k += 3
    k += 2 * len(scene.emitter_rows)
    if scene.env_kind == "envmap":
        k += 3  # row+jitter, col+jitter, alias coin
    elif scene.env_kind == "constant":
        k += 2
    if scene.has_opacity:
        # stochastic-alpha draws for every shadow query (shadow_occluded)
        k += SHADOW_ALPHA_K * _nee_query_count(scene)
    if _nee_rr_tau() > 0.0:
        k += _nee_query_count(scene)  # one RR coin per shadow query
    return max(k, 1)


def _nee_rr(pend, live, xi, beta=None):
    """Apply shadow-ray RR to one query's pending contribution.

    pend: [N, 3] contribution if unoccluded; live: [N] bool; xi: [N]
    uniform; beta: optional [N, 3] throughput NOT folded into pend (the
    RR decision must see the FULL pending radiance beta*pend so both
    engine bodies kill identically).  Returns (pend', live') with
    E[pend' | survive] * P[survive] = pend."""
    tau = _nee_rr_tau()
    if tau <= 0.0:
        return pend, live
    full = pend if beta is None else pend * beta
    m = jnp.max(full, axis=-1)
    p = jnp.clip(m / tau, 0.0, 1.0)
    fire = m < tau
    keep = ~fire | (xi < p)
    scale = jnp.where(fire, tau / jnp.maximum(m, 1e-20), 1.0)
    pend = jnp.where((fire & keep)[..., None], pend * scale[..., None],
                     pend)
    return pend, live & keep


def shadow_occluded(scene: SceneData, o, d, geo_ok, dist, xi,
                    coherence=None):
    """Occlusion along the segment o -> o + dist*d with stochastic alpha.

    The reference alpha-tests INSIDE both Intersect and IntersectAny
    (csrt triangle.cpp:116-147, bsdf.cpp:272-276): a masked surface
    passes a shadow ray with probability (1 - alpha).  The r3 any-hit
    honored only null-boundary transparency, so an alpha-masked occluder
    blocked 100% of shadow rays while passing (1 - alpha) of camera rays
    — biased (r3 VERDICT missing #3).

    Scenes without opacity maps compile the plain any-hit (static
    branch, zero cost).  With them, the query walks the segment's
    successive closest hits, up to SHADOW_ALPHA_K crossings: an opaque
    hit occludes; a null-boundary (medium shell) hit passes; a masked
    TRIANGLE hit occludes with probability alpha — the same draw
    convention as apply_opacity, and like csrt the alpha test applies
    only to triangles (quadric primitives have no alpha path,
    sphere.cpp/disk.cpp/cylinder.cpp).  Crossings beyond SHADOW_ALPHA_K
    pass unoccluded (bounded-depth deviation, noted).

    xi: [SHADOW_ALPHA_K, N] uniforms, consumed iff scene.has_opacity
    (nee_draw_count keeps RNG streams aligned).

    Cost note (ADVICE r4): on opacity scenes every query pays
    SHADOW_ALPHA_K closest-hit walks even when no masked geometry lies
    on the segment.  An any-hit prefilter (opaque-only occluders first,
    early-out when blocked) was considered and not built: it needs a
    second per-prim opacity-aware flag in the geometry SoA and a third
    traversal program per scene, and no shipped opacity scene is
    shadow-bound enough to repay that; SHADOW_ALPHA_K is env-tunable
    (MCPT_SHADOW_ALPHA_K) for stacked-foliage content instead.
    """
    from mcpt_tpu.ops.math import EPSILON_DISTANCE as EPS_D

    t_hi = jnp.where(geo_ok, dist - EPS_D, 0.0)
    if not scene.has_opacity:
        return scene_any(scene, o, d, t_min=EPS_D, t_max=t_hi,
                         coherence=coherence)

    n = dist.shape[0]
    occ = jnp.zeros((n,), jnp.bool_)
    active = geo_ok
    t_lo = jnp.full((n,), EPS_D, jnp.float32)
    g = scene.geom
    for k in range(SHADOW_ALPHA_K):
        h = scene_closest(
            scene, o, d, t_min=t_lo, t_max=jnp.where(active, t_hi, 0.0),
            coherence=coherence,
        )
        valid = h.valid & active
        inst = take_rows(g.inst_id, h.prim)
        if scene.quad_kinds:
            is_q = h.quad >= 0
            qinst = take_rows(scene.quad.inst_id, jnp.maximum(h.quad, 0))
            inst = jnp.where(is_q, qinst, inst)
        else:
            is_q = jnp.zeros((n,), jnp.bool_)
        bsdf_id = take_rows(scene.map_inst_bsdf, jnp.maximum(inst, 0))
        is_null = bsdf_id < 0
        tid = take_rows(scene.bsdf.opacity_tid, jnp.maximum(bsdf_id, 0))
        has_mask = (tid >= 0) & ~is_null & ~is_q
        u_b = 1.0 - h.v - h.w
        uv = (
            u_b[..., None] * take_rows(g.uv0, h.prim)
            + h.v[..., None] * take_rows(g.uv1, h.prim)
            + h.w[..., None] * take_rows(g.uv2, h.prim)
        )
        alpha = textures.eval_opacity(
            bsdfs._ktex(scene.tex, scene.bsdf, "opacity"),
            jnp.maximum(tid, 0), uv,
        )
        blocked = valid & ~is_null & (~has_mask | (xi[k] < alpha))
        occ = occ | blocked
        active = valid & ~blocked  # crossed a null shell or passed a mask
        t_lo = jnp.where(active, h.t + EPS_D, t_lo)
    return occ


def _nee_area_query(scene: SceneData, hit: HitAttrs, wo, alive, xi0, xi1,
                    xi2):
    """Sampled-area-light NEE query WITHOUT the occlusion test: returns
    (wi, dist, geo_ok, contrib-if-unoccluded) — csrt
    EvaluateDirectLightPath (path.cpp:185-236) with the shadow ray
    factored out so callers can batch it (shade_regen_batched) or run
    the stochastic-alpha walk (_direct_lighting)."""
    pos_l, n_l, radiance, pdf_area = _sample_area_light(scene, xi0, xi1, xi2)
    d_vec = hit.position - pos_l
    dist = jnp.sqrt(jnp.maximum(dot(d_vec, d_vec), 1e-20))
    wi = d_vec / dist[..., None]  # light travel direction: light -> surface

    cos_prime = dot(wi, n_l)
    cos_surf = dot(-wi, hit.normal)
    geo_ok = (cos_prime >= EPSILON_FLOAT) & (cos_surf >= EPSILON_FLOAT) & alive

    pdf_eval, f, f_valid = _bsdf_eval(scene, hit, wi, wo)

    pdf_direct = pdf_area * (dist * dist) / jnp.maximum(cos_prime, 1e-12)
    w_mis = mis_weight(pdf_direct, pdf_eval)
    contrib = (
        w_mis[..., None]
        * radiance
        * f
        / jnp.maximum(pdf_direct, 1e-12)[..., None]
    )
    return wi, dist, geo_ok, jnp.where(
        (geo_ok & f_valid)[..., None], contrib, 0.0
    )


def _shadow_ok(scene, hit, wi, dist, geo_ok, xi_shadow=None,
               coherence=None):
    """Surface-origin shadow ray along -wi (path.cpp:151-156)."""
    occluded = shadow_occluded(
        scene, hit.position, -wi, geo_ok, dist, xi_shadow, coherence
    )
    return geo_ok & ~occluded


def _nee_queries(scene: SceneData, hit: HitAttrs, wo, alive, xi,
                 differentiable: bool = False):
    """All-emitter NEE with the occlusion tests factored out: returns a
    list of (wi, dist, geo_ok, contrib-if-unoccluded) — one per shadow
    query in _nee_query_count order (csrt EvaluateDirectLightPath,
    path.cpp:138-236).  Consumes the leading nee_draw_count draws of xi
    (the stochastic-alpha tail, if any, belongs to the caller)."""
    queries = []
    cursor = 0

    if scene.n_emissive:
        queries.append(_nee_area_query(
            scene, hit, wo, alive, xi[0], xi[1], xi[2]
        ))
        cursor = 3

    for row, etype in scene.emitter_rows:
        xi0, xi1 = xi[cursor], xi[cursor + 1]
        cursor += 2
        if etype == EmitterType.POINT:
            wi, dist, rad, valid = emitters.sample_point(
                scene.emitters, row, hit.position
            )
        elif etype == EmitterType.SPOT:
            wi, dist, rad, valid = emitters.sample_spot(
                scene.emitters, scene.tex, row, hit.position
            )
        elif etype == EmitterType.DIRECTIONAL:
            wi, dist, rad, valid = emitters.sample_directional(
                scene.emitters, row, hit.position
            )
        elif etype == EmitterType.SUN:
            wi, dist, rad, valid = emitters.sample_sun(
                scene.emitters, row, hit.position, xi0, xi1
            )
        else:
            continue
        geo_ok = valid & alive & (dot(-wi, hit.normal) >= EPSILON_FLOAT)
        pdf_eval, f, f_valid = _bsdf_eval(scene, hit, wi, wo)
        # harsh delta light: no MIS, no pdf division (path.cpp:170-173)
        contrib = jnp.where((geo_ok & f_valid)[..., None], rad * f, 0.0)
        queries.append((wi, dist, geo_ok, contrib))

    if scene.env_kind != "none":
        if scene.env_kind == "envmap":
            wi, dist, rad, pdf, valid = emitters.sample_envmap(
                scene.env, scene.tex, hit.position,
                xi[cursor], xi[cursor + 1], xi[cursor + 2],
                differentiable=differentiable,
            )
        else:  # constant
            wi, dist, rad, pdf, valid = emitters.sample_constant(
                scene.emitters, scene.env_row, hit.position,
                xi[cursor], xi[cursor + 1]
            )
        geo_ok = valid & alive & (dot(-wi, hit.normal) >= EPSILON_FLOAT)
        pdf_eval, f, f_valid = _bsdf_eval(scene, hit, wi, wo)
        w_mis = mis_weight(pdf, pdf_eval)
        contrib = (
            w_mis[..., None] * rad * f / jnp.maximum(pdf, 1e-12)[..., None]
        )
        queries.append((
            wi, dist, geo_ok,
            jnp.where((geo_ok & f_valid)[..., None], contrib, 0.0),
        ))

    return queries


def _direct_lighting(scene: SceneData, hit: HitAttrs, wo, alive, xi,
                     differentiable: bool = False, coherence=None,
                     beta=None):
    """All-emitter NEE: every analytic emitter + one CDF-sampled area
    light + the escape emitter, each against its own shadow ray
    (csrt EvaluateDirectLightPath, path.cpp:138-236).

    Shadow segments run surface -> light (the reference traces light ->
    surface, path.cpp:199-203; occlusion of the segment is symmetric):
    the traversal sorts rays by direction-octant + origin-Morton, and a
    wavefront's bounce vertices are Morton-tight while the sampled
    light is one small patch — surface-origin rays share chunk
    corridors, light-origin rays fan out over the whole scene."""
    n = wo.shape[0]
    L = jnp.zeros((n, 3), jnp.float32)
    # draw layout tail (fixed by nee_draw_count): [...sample draws...,
    # opacity-alpha tail (K per query), RR coin per query]
    q_n = _nee_query_count(scene)
    rr_base = nee_draw_count(scene) - (q_n if _nee_rr_tau() > 0.0 else 0)
    s_base = rr_base - (SHADOW_ALPHA_K * q_n if scene.has_opacity else 0)
    for j, (wi, dist, geo_ok, contrib) in enumerate(
        _nee_queries(scene, hit, wo, alive, xi, differentiable)
    ):
        if _nee_rr_tau() > 0.0:
            contrib, geo_ok = _nee_rr(
                contrib, geo_ok, xi[rr_base + j], beta
            )
        xi_shadow = (
            xi[s_base + j * SHADOW_ALPHA_K : s_base + (j + 1) * SHADOW_ALPHA_K]
            if scene.has_opacity else None
        )
        occluded = shadow_occluded(
            scene, hit.position, -wi, geo_ok, dist, xi_shadow, coherence
        )
        L = L + jnp.where((occluded | ~geo_ok)[..., None], 0.0, contrib)
    return L


def _escape_radiance(scene: SceneData, look_dir, differentiable: bool = False):
    """Escape-ray emitter radiance (envmap / constant; primary rays also
    see the sun bitmap — path.cpp:24-35)."""
    if scene.env_kind == "envmap":
        return emitters.eval_envmap(
            scene.env, scene.tex, look_dir, differentiable=differentiable
        )
    if scene.env_kind == "constant":
        return jnp.broadcast_to(
            scene.emitters.radiance[scene.env_row], look_dir.shape
        )
    return jnp.zeros_like(look_dir)


def _escape_pdf(scene: SceneData, look_dir):
    if scene.env_kind == "envmap":
        return emitters.pdf_envmap(scene.env, scene.tex, look_dir)
    if scene.env_kind == "constant":
        from mcpt_tpu.ops.math import INV_FOUR_PI

        return jnp.full(look_dir.shape[:-1], INV_FOUR_PI, jnp.float32)
    return jnp.zeros(look_dir.shape[:-1], jnp.float32)


def shade(scene: SceneData, integ, o, d, seed, differentiable: bool = False):
    """Shade a ray batch; returns (L [N,3], seed).

    `integ` is the IntegratorInfo (static — folded into the trace).
    `differentiable=True` swaps the depth `while_loop` for a fixed-trip
    `lax.scan` so the estimator is reverse-mode differentiable w.r.t.
    scene parameters (textures, radiance); sampling decisions reuse the
    same RNG so forward values are identical.
    """
    n = o.shape[0]

    # --- primary hit (path.cpp:16-55)
    ghit = scene_closest(scene, o, d)
    hit = interpolate_hit(scene, ghit, o, d)
    hit, seed = apply_opacity(scene, hit, seed)

    L = jnp.zeros((n, 3), jnp.float32)
    # primary-ray escape: envmap/constant + sun bitmap (path.cpp:24-35)
    if scene.env_kind != "none":
        L = L + jnp.where(
            ~hit.valid[..., None],
            _escape_radiance(scene, d, differentiable),
            0.0,
        )
    if scene.sun_row >= 0:
        L = L + jnp.where(
            ~hit.valid[..., None],
            emitters.eval_sun_escape(scene.emitters, scene.tex, scene.sun_row, d),
            0.0,
        )

    has_bsdf = hit.bsdf_id >= 0
    emitter0 = bsdfs.is_emitter(scene.bsdf, hit.bsdf_id) & has_bsdf & hit.valid
    backface0 = (
        hit.inside & ~bsdfs.is_twosided(scene.bsdf, hit.bsdf_id) & has_bsdf & hit.valid
    )
    if not integ.hide_emitters:
        L = L + jnp.where(
            (emitter0 & ~backface0)[..., None],
            bsdfs.get_radiance(scene.bsdf, _stex(scene), hit.bsdf_id, hit.uv),
            0.0,
        )

    alive0 = hit.valid & ~emitter0 & ~backface0
    beta0 = jnp.ones((n, 3), jnp.float32)
    wo0 = -d

    no_lights = (
        scene.n_emissive == 0
        and not scene.emitter_rows
        and scene.env_kind == "none"
    )
    if no_lights or integ.depth_max <= 1:
        return L, seed

    n_nee = nee_draw_count(scene)
    pdf_rr_rcp = 1.0 / integ.pdf_rr

    use_coh = _use_origin_chunk(scene)
    coh0 = _origin_chunk(scene, ghit) if use_coh else jnp.full(
        (n,), -1, jnp.int32
    )

    def cond(state):
        dep = state[0]
        alive = state[7]
        return (dep < integ.depth_max) & jnp.any(alive)

    def body(state):
        dep, L, beta, wo, hit, pdf_mis, seed, alive, coh = state

        # --- 1. Russian roulette with immediate compensation
        seed, rr_u = rng.random_float(seed)
        need_rr = dep >= integ.depth_rr
        alive = alive & (~need_rr | (rr_u < integ.pdf_rr))
        beta = jnp.where((alive & need_rr)[..., None], beta * pdf_rr_rcp, beta)

        # --- 2. NEE over every emitter (scene-static draw count)
        seed, xi_nee = rng.random_floats(seed, n_nee)
        L = L + beta * _direct_lighting(
            scene, hit, wo, alive, xi_nee, differentiable,
            coherence=coh if use_coh else None, beta=beta,
        )

        # --- 3. BSDF sample (path.cpp:66-74)
        seed, xi_b = rng.random_floats(seed, bsdfs.N_SAMPLE_DRAWS)
        wi, pdf_b, f, valid_b = bsdfs.bsdf_sample(
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
        beta_new = beta * f / jnp.maximum(pdf_b, 1e-12)[..., None]
        alive = alive & valid_b & (jnp.max(beta_new, axis=-1) >= EPSILON)
        beta = jnp.where(alive[..., None], beta_new, beta)
        # null boundaries are delta pass-throughs: the MIS pdf of the last
        # REAL scattering event carries across them
        null_vertex = hit.bsdf_id < 0
        pdf_mis = jnp.where(null_vertex, pdf_mis, pdf_b)

        # --- 4. continuation trace (ray dir = -wi, path.cpp:77-78)
        o2 = hit.position
        d2 = -wi
        ghit2 = scene_closest(
            scene, o2, d2, t_max=jnp.where(alive, MAX_FLOAT, 0.0),
            coherence=coh if use_coh else None,
        )
        hit2 = interpolate_hit(scene, ghit2, o2, d2)
        hit2, seed = apply_opacity(scene, hit2, seed)
        coh = _origin_chunk(scene, ghit2) if use_coh else coh
        # --- escape -> envmap/constant with MIS (path.cpp:81-93)
        if scene.env_kind != "none":
            esc = alive & ~hit2.valid
            rad_esc = _escape_radiance(scene, d2, differentiable)
            pdf_esc = _escape_pdf(scene, d2)
            w_esc = mis_weight(pdf_mis, pdf_esc)
            L = L + jnp.where(
                esc[..., None], w_esc[..., None] * beta * rad_esc, 0.0
            )
        alive = alive & hit2.valid

        # --- emitter hit with MIS (path.cpp:105-124)
        has_b = hit2.bsdf_id >= 0
        emitter = bsdfs.is_emitter(scene.bsdf, hit2.bsdf_id) & has_b
        cos_prime = dot(wi, hit2.normal)
        pdf_area_hit = take_rows(scene.map_inst_light_pdf, jnp.maximum(hit2.inst_id, 0))
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
        take_em = alive & emitter & ~backface2 & (cos_prime >= EPSILON_FLOAT)
        L = L + jnp.where(take_em[..., None], w_bsdf[..., None] * beta * rad, 0.0)
        alive = alive & ~emitter

        # --- one-sided backface absorbs (path.cpp:99-104)
        alive = alive & ~backface2

        return dep + 1, L, beta, wi, hit2, pdf_mis, seed, alive, coh

    # pdf_mis starts effectively-delta (the camera ray) so emitters seen
    # through leading null boundaries get full weight
    pdf_mis0 = jnp.full((n,), 1e12, jnp.float32)
    state = (
        jnp.int32(1), L, beta0, wo0, hit, pdf_mis0, seed, alive0, coh0
    )
    if differentiable:
        def scan_body(state, _):
            return body(state), None

        state, _ = lax.scan(scan_body, state, None, length=integ.depth_max - 1)
    else:
        state = lax.while_loop(cond, body, state)
    return state[1], state[6]


def _use_batched_trace(scene: SceneData) -> bool:
    """Whether shade_regen uses the single-batched-trace body.

    Gated to scenes where "closest hit exists" == "shadow segment
    occluded" (every primitive opaque, no alpha masks), which lets the
    continuation ray and all Q NEE shadow rays ride ONE traversal call
    of (1+Q)*n lanes — the march/pairs pipelines' per-call fixed costs
    (variadic sorts are dispatch-bound: 512k lanes cost the same 1.4 ms
    as 64k, scripts/pair_sort_probe.py) then amortize over the whole
    iteration instead of recurring 1+Q times.  Small scenes keep the
    dense path (its cost is pure lane-work — nothing to amortize).
    MCPT_BATCH_TRACE=0 opts out."""
    import os

    from mcpt_tpu.ops.traversal import DENSE_MAX_PRIMS

    from mcpt_tpu.ops.traversal import resolved_strategy

    flag = os.environ.get("MCPT_BATCH_TRACE")
    if flag is not None:
        if flag != "1":
            return False
    elif scene.geom.p0.shape[0] > (1 << 18):
        # measured r5: batching wins the matpreview family (+12-18%) and
        # is neutral on dragon/classroom, but costs dining-room (270k
        # prims) ~12% — above ~256k prims the 2-3x wider march calls
        # stop amortizing.  MCPT_BATCH_TRACE=1 forces it on.
        return False
    elif resolved_strategy(scene.geom) == "pairs":
        # the pair pipeline's costs are per-block, not per-call —
        # batching triples its stream with nothing amortized (classroom
        # measured 1.10 batched vs 1.26 unbatched)
        return False
    return (
        scene.all_opaque
        and not scene.has_opacity
        and scene.geom.p0.shape[0] > DENSE_MAX_PRIMS
        and _nee_query_count(scene) >= 1
    )


def _shade_regen_batched(scene: SceneData, integ, camera, pixel_idx,
                         spp: int, frame_base=0,
                         spp_total: int | None = None, sample_offset=0):
    """shade_regen with ONE traversal per iteration (see
    _use_batched_trace).

    Estimator and per-sample RNG streams are identical to shade_regen:
    the per-vertex draw order (RR, NEE, BSDF) is unchanged; only the
    OCCLUSION of vertex v's NEE resolves one iteration later, inside
    the batch that also traces vertex v+1's continuation.  Because a
    lane may regenerate in between, a dying sample's radiance parks in
    L_prev until its pending shadow rays resolve (the fold — with the
    reference's per-sample clamp — happens strictly after resolution,
    so clamping sees the complete sample)."""
    from mcpt_tpu.ops.math import EPSILON_DISTANCE as EPS_D
    from mcpt_tpu.render.camera import generate_rays

    n = pixel_idx.shape[0]
    q_n = _nee_query_count(scene)
    if spp_total is None:
        spp_total = spp
    base = jnp.asarray(frame_base, jnp.uint32) + jnp.asarray(
        sample_offset, jnp.uint32
    )
    n_nee = nee_draw_count(scene)
    pdf_rr_rcp = 1.0 / integ.pdf_rr
    depth_cut = integ.depth_max

    def fold(L, Ls, mask):
        if integ.sample_clamp > 0:
            Ls = jnp.minimum(Ls, integ.sample_clamp)
        return L + jnp.where(mask[..., None], Ls, 0.0)

    def regen(work_k, L_samp, L_prev, fold_pend, beta, o, d, pdf_mis,
              seed, alive, vert, alive_entry):
        """Sample-boundary bookkeeping: lanes whose sample just ended
        park L_samp in L_prev (folded AFTER their pending shadows
        resolve) and, with samples left, start the next camera ray."""
        ended = alive_entry & ~alive
        L_prev = jnp.where(ended[..., None], L_samp, L_prev)
        fold_pend = fold_pend | ended
        L_samp = jnp.where(ended[..., None], 0.0, L_samp)
        fresh = ended & (work_k < spp)
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
        alive = alive | fresh
        work_k = work_k + fresh.astype(jnp.int32)
        return (work_k, L_samp, L_prev, fold_pend, beta, o, d, pdf_mis,
                seed, alive, vert, fresh)

    # bootstrap: every lane "ended" an empty sample and regenerates
    boot = regen(
        jnp.zeros((n,), jnp.int32),
        jnp.zeros((n, 3), jnp.float32),
        jnp.zeros((n, 3), jnp.float32),
        jnp.zeros((n,), jnp.bool_),
        jnp.ones((n, 3), jnp.float32),
        jnp.zeros((n, 3), jnp.float32),
        jnp.zeros((n, 3), jnp.float32).at[:, 2].set(1.0),
        jnp.full((n,), 1e12, jnp.float32),
        rng.pixel_seed(pixel_idx, base),
        jnp.zeros((n,), jnp.bool_),
        jnp.zeros((n,), jnp.int32),
        jnp.ones((n,), jnp.bool_),   # alive_entry: everyone "ended"
    )
    (work_k0, L_samp0, L_prev0, fold_pend0, beta0, o0, d0, pdf_mis0,
     seed0, alive0, vert0, fresh0) = boot
    fold_pend0 = jnp.zeros((n,), jnp.bool_)  # nothing truly pending yet
    state0 = (
        work_k0, jnp.zeros((n, 3), jnp.float32), L_samp0, L_prev0,
        fold_pend0, beta0, o0, d0, pdf_mis0, seed0, alive0, vert0, fresh0,
        jnp.zeros((n, 3), jnp.float32),        # sh_o
        jnp.zeros((q_n, n, 3), jnp.float32),   # sh_d (toward light)
        jnp.zeros((q_n, n), jnp.float32),      # sh_dist (0 = no query)
        jnp.zeros((q_n, n, 3), jnp.float32),   # sh_pend (beta * contrib)
    )

    def cond(st):
        alive, fold_pend = st[10], st[4]
        return jnp.any(alive | fold_pend)

    def body(st):
        (work_k, L, L_samp, L_prev, fold_pend, beta, o, d, pdf_mis, seed,
         alive, vert, fresh, sh_o, sh_d, sh_dist, sh_pend) = st

        # --- 1. ONE batched closest trace: [cont | shadow_1..Q].
        # all_opaque gate: a shadow segment is occluded iff its closest
        # hit exists (no null shells, no alpha), so every slot shares
        # closest-hit semantics and one traversal program.
        big_o = jnp.concatenate([o] + [sh_o] * q_n)
        big_d = jnp.concatenate([d] + [sh_d[q] for q in range(q_n)])
        big_tmax = jnp.concatenate(
            [jnp.where(alive, MAX_FLOAT, 0.0)]
            + [jnp.maximum(sh_dist[q] - EPS_D, 0.0) for q in range(q_n)]
        )
        # coherence classes: fresh camera 0 / bounce 1 / shadow 2+q
        # (clipped to the 2-bit field) — sun-shadow segments are nearly
        # parallel while env-shadow segments fan out; sharing one class
        # merges their corridors in the march blocks
        big_bias = jnp.concatenate(
            [(~fresh).astype(jnp.int32)]
            + [jnp.full((n,), min(2 + q, 3), jnp.int32)
               for q in range(q_n)]
        )
        bhit = scene_closest(
            scene, big_o, big_d, t_max=big_tmax, sort_bias=big_bias
        )
        ghit = type(bhit)(*(x[:n] for x in bhit))
        occ = [
            bhit.valid[n * (1 + q): n * (2 + q)] for q in range(q_n)
        ]

        # --- 2. resolve vertex-(v-1) NEE now its occlusion is known
        for q in range(q_n):
            add = jnp.where(
                (~occ[q] & (sh_dist[q] > 0.0))[..., None], sh_pend[q], 0.0
            )
            L_samp = L_samp + jnp.where(fold_pend[..., None], 0.0, add)
            L_prev = L_prev + jnp.where(fold_pend[..., None], add, 0.0)
        sh_dist = jnp.zeros_like(sh_dist)

        # --- 3. late fold: the parked sample is now complete
        L = fold(L, L_prev, fold_pend)
        L_prev = jnp.where(fold_pend[..., None], 0.0, L_prev)
        fold_pend = jnp.zeros_like(fold_pend)

        # --- 4. shade the continuation hit (mirrors shade_regen)
        hit = interpolate_hit(scene, ghit, o, d)
        vert = vert + 1
        primary = vert == 1
        alive_entry = alive

        if scene.env_kind != "none":
            esc = alive & ~hit.valid
            rad_esc = _escape_radiance(scene, d)
            pdf_esc = _escape_pdf(scene, d)
            w_esc = mis_weight(pdf_mis, pdf_esc)
            L_samp = L_samp + jnp.where(
                esc[..., None], w_esc[..., None] * beta * rad_esc, 0.0
            )
        if scene.sun_row >= 0:
            L_samp = L_samp + jnp.where(
                (alive & ~hit.valid & primary)[..., None],
                emitters.eval_sun_escape(
                    scene.emitters, scene.tex, scene.sun_row, d
                ),
                0.0,
            )

        has_b = hit.bsdf_id >= 0
        emitter = bsdfs.is_emitter(scene.bsdf, hit.bsdf_id) & has_b
        wi_in = -d
        cos_prime = dot(wi_in, hit.normal)
        pdf_area_hit = take_rows(
            scene.map_inst_light_pdf, jnp.maximum(hit.inst_id, 0)
        )
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
            alive & hit.valid & emitter & ~backface
            & ((cos_prime >= EPSILON_FLOAT) | primary)
        )
        if integ.hide_emitters:
            take_em = take_em & ~primary
        L_samp = L_samp + jnp.where(
            take_em[..., None], w_bsdf[..., None] * beta * rad, 0.0
        )
        alive = alive & hit.valid & ~emitter & ~backface & (vert < depth_cut)

        # --- 5. Russian roulette with immediate compensation
        seed, rr_u = rng.random_float(seed)
        need_rr = vert >= integ.depth_rr
        alive = alive & (~need_rr | (rr_u < integ.pdf_rr))
        beta = jnp.where((alive & need_rr)[..., None], beta * pdf_rr_rcp, beta)

        # --- 6. NEE prep: sample every emitter, compute the FULL
        # contribution now; only occlusion defers to the next batch.
        seed, xi_nee = rng.random_floats(seed, n_nee)
        queries = _nee_queries(scene, hit, wi_in, alive, xi_nee)
        rr_base = n_nee - (q_n if _nee_rr_tau() > 0.0 else 0)
        sh_o = hit.position
        sh_d_new = []
        sh_dist_new = []
        sh_pend_new = []
        for j, (wi, dist, geo_ok, contrib) in enumerate(queries):
            pend = beta * contrib
            if _nee_rr_tau() > 0.0:
                # shadow-ray RR: near-zero pending contributions (delta
                # -ish vertices) almost never trace — unbiased, and the
                # killed lanes pack into dead march blocks
                pend, geo_ok = _nee_rr(pend, geo_ok, xi_nee[rr_base + j])
            live_q = geo_ok & alive & (jnp.max(pend, axis=-1) > 0.0)
            sh_d_new.append(jnp.where(live_q[..., None], -wi, 0.0))
            sh_dist_new.append(jnp.where(live_q, dist, 0.0))
            sh_pend_new.append(jnp.where(live_q[..., None], pend, 0.0))
        sh_d = jnp.stack(sh_d_new)
        sh_dist = jnp.stack(sh_dist_new)
        sh_pend = jnp.stack(sh_pend_new)

        # --- 7. BSDF sample -> next continuation segment
        seed, xi_b = rng.random_floats(seed, bsdfs.N_SAMPLE_DRAWS)
        wi, pdf_b, f, valid_b = bsdfs.bsdf_sample(
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
        beta_new = beta * f / jnp.maximum(pdf_b, 1e-12)[..., None]
        alive = alive & valid_b & (jnp.max(beta_new, axis=-1) >= EPSILON)
        beta = jnp.where(alive[..., None], beta_new, beta)
        null_vertex = hit.bsdf_id < 0
        pdf_mis = jnp.where(null_vertex, pdf_mis, pdf_b)
        o = hit.position
        d = -wi

        # --- 8. sample boundary: park ended samples, start new ones
        (work_k, L_samp, L_prev, fold_pend, beta, o, d, pdf_mis, seed,
         alive, vert, fresh) = regen(
            work_k, L_samp, L_prev, fold_pend, beta, o, d, pdf_mis, seed,
            alive, vert, alive_entry,
        )
        return (work_k, L, L_samp, L_prev, fold_pend, beta, o, d, pdf_mis,
                seed, alive, vert, fresh, sh_o, sh_d, sh_dist, sh_pend)

    state = lax.while_loop(cond, body, state0)
    return state[1] / spp, state[9]


def shade_regen(scene: SceneData, integ, camera, pixel_idx, spp: int,
                frame_base=0, spp_total: int | None = None,
                sample_offset=0):
    """Fused spp x depth wavefront with ray regeneration.

    :func:`shade` masks dead lanes until the *whole batch* finishes a
    sample — at the reference's canonical depth 65 (cornell
    scene_v0.6.xml:18) the batch runs to near depth_max while the mean
    RR path length is ~an order of magnitude shorter, so most VPU work
    is masked waste.  Here every lane owns all `spp` samples of its
    pixel: the moment a lane's path dies it re-seeds and traces the
    next camera sample *inside the same `lax.while_loop` iteration*, so
    utilization stays ~100% until the final tail.  This is the
    TPU-native counterpart of persistent-threads megakernel scheduling
    (the reference instead parks one CUDA thread per pixel for the full
    spp loop, renderer.cpp:62-79).

    Per-sample radiance is the same estimator as :func:`shade` (same
    draw sequence per path vertex; seeds are per-sample
    Tea(pixel, base+k) rather than one threaded stream, so images agree
    statistically, not bitwise).  Returns (film [N, 3] = mean over spp,
    final seed).

    Large all-opaque scenes take the single-batched-trace body
    (_shade_regen_batched): same estimator, same per-sample RNG
    streams, one traversal per iteration instead of 1 + Q.
    """
    from mcpt_tpu.render.camera import generate_rays

    if _use_batched_trace(scene):
        return _shade_regen_batched(
            scene, integ, camera, pixel_idx, spp, frame_base=frame_base,
            spp_total=spp_total, sample_offset=sample_offset,
        )

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
    # with no lights (or depth_max 1) only the primary vertex matters
    depth_cut = 1 if (no_lights or integ.depth_max <= 1) else integ.depth_max

    def fold(L, L_samp, mask):
        """Fold finished per-sample radiance into the film sum, applying
        the reference's per-sample clamp (renderer.cpp:77-79)."""
        Ls = L_samp
        if integ.sample_clamp > 0:
            Ls = jnp.minimum(Ls, integ.sample_clamp)
        return L + jnp.where(mask[..., None], Ls, 0.0)

    use_coh = _use_origin_chunk(scene)
    state0 = (
        jnp.zeros((n,), jnp.int32),            # work_k: next sample index
        jnp.zeros((n, 3), jnp.float32),        # L (sum over folded samples)
        jnp.zeros((n, 3), jnp.float32),        # L_samp (current sample)
        jnp.ones((n, 3), jnp.float32),         # beta
        jnp.zeros((n, 3), jnp.float32),        # ray origin
        jnp.zeros((n, 3), jnp.float32) .at[:, 2].set(1.0),  # ray dir
        jnp.full((n,), 1e12, jnp.float32),     # pdf_mis
        rng.pixel_seed(pixel_idx, base),       # seed (replaced at regen)
        jnp.zeros((n,), jnp.bool_),            # alive
        jnp.zeros((n,), jnp.int32),            # vert: hits shaded so far
        jnp.full((n,), -1, jnp.int32),         # coh: origin chunk id
    )

    def cond(st):
        work_k, alive = st[0], st[8]
        return jnp.any(alive | (work_k < spp))

    def body(st):
        (work_k, L, L_samp, beta, o, d, pdf_mis, seed, alive, vert,
         coh) = st

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
        alive = alive | fresh
        work_k = work_k + fresh.astype(jnp.int32)

        # --- trace (dead lanes get t_max = 0: the traversal idles them;
        # fresh camera segments and bounce continuations sort into
        # separate march blocks via the class bit — a mixed block
        # marches the union of both classes' chunk corridors; bounce
        # continuations additionally carry their origin's SAH chunk id
        # so blocks align with the march partition)
        coh = jnp.where(fresh, -1, coh)
        ghit = scene_closest(
            scene, o, d, t_max=jnp.where(alive, MAX_FLOAT, 0.0),
            sort_bias=(~fresh).astype(jnp.int32),
            coherence=coh if use_coh else None,
        )
        hit = interpolate_hit(scene, ghit, o, d)
        hit, seed = apply_opacity(scene, hit, seed)
        coh = _origin_chunk(scene, ghit) if use_coh else coh
        vert = vert + 1
        primary = vert == 1  # this trace was a camera segment

        # --- escape -> env/constant (+ sun bitmap on camera segments);
        # pdf_mis = 1e12 on camera segments makes w_esc exactly 1.0
        if scene.env_kind != "none":
            esc = alive & ~hit.valid
            rad_esc = _escape_radiance(scene, d)
            pdf_esc = _escape_pdf(scene, d)
            w_esc = mis_weight(pdf_mis, pdf_esc)
            L_samp = L_samp + jnp.where(
                esc[..., None], w_esc[..., None] * beta * rad_esc, 0.0
            )
        if scene.sun_row >= 0:
            L_samp = L_samp + jnp.where(
                (alive & ~hit.valid & primary)[..., None],
                emitters.eval_sun_escape(
                    scene.emitters, scene.tex, scene.sun_row, d
                ),
                0.0,
            )

        # --- emitter hit with MIS (primary hits: w = 1, no cosine cut,
        # honoring hide_emitters — path.cpp:24-35 vs 105-124)
        has_b = hit.bsdf_id >= 0
        emitter = bsdfs.is_emitter(scene.bsdf, hit.bsdf_id) & has_b
        wi_in = -d  # light-travel convention of the emitter formulas
        cos_prime = dot(wi_in, hit.normal)
        pdf_area_hit = take_rows(scene.map_inst_light_pdf, jnp.maximum(hit.inst_id, 0))
        t_safe = jnp.where(hit.valid, jnp.minimum(hit.t, 1e8), 1.0)
        pdf_direct = (
            pdf_area_hit * (t_safe * t_safe) / jnp.maximum(cos_prime, 1e-12)
        )
        w_bsdf = mis_weight(pdf_mis, pdf_direct)
        rad = bsdfs.get_radiance(scene.bsdf, _stex(scene), hit.bsdf_id, hit.uv)
        backface = hit.inside & ~bsdfs.is_twosided(scene.bsdf, hit.bsdf_id) & has_b
        take_em = (
            alive & hit.valid & emitter & ~backface
            & ((cos_prime >= EPSILON_FLOAT) | primary)
        )
        if integ.hide_emitters:
            take_em = take_em & ~primary
        L_samp = L_samp + jnp.where(
            take_em[..., None], w_bsdf[..., None] * beta * rad, 0.0
        )
        alive = alive & hit.valid & ~emitter & ~backface & (vert < depth_cut)

        # --- 1. Russian roulette with immediate compensation
        seed, rr_u = rng.random_float(seed)
        need_rr = vert >= integ.depth_rr
        alive = alive & (~need_rr | (rr_u < integ.pdf_rr))
        beta = jnp.where((alive & need_rr)[..., None], beta * pdf_rr_rcp, beta)

        # --- 2. NEE over every emitter (shadow segments originate at
        # the hit point -> same chunk-coherence key as the continuation)
        seed, xi_nee = rng.random_floats(seed, n_nee)
        L_samp = L_samp + beta * _direct_lighting(
            scene, hit, wi_in, alive, xi_nee,
            coherence=coh if use_coh else None, beta=beta,
        )

        # --- 3. BSDF sample -> next segment
        seed, xi_b = rng.random_floats(seed, bsdfs.N_SAMPLE_DRAWS)
        wi, pdf_b, f, valid_b = bsdfs.bsdf_sample(
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
        beta_new = beta * f / jnp.maximum(pdf_b, 1e-12)[..., None]
        alive = alive & valid_b & (jnp.max(beta_new, axis=-1) >= EPSILON)
        beta = jnp.where(alive[..., None], beta_new, beta)
        null_vertex = hit.bsdf_id < 0
        pdf_mis = jnp.where(null_vertex, pdf_mis, pdf_b)
        o = hit.position
        d = -wi

        return (work_k, L, L_samp, beta, o, d, pdf_mis, seed, alive, vert,
                coh)

    state = lax.while_loop(cond, body, state0)
    work_k, L, L_samp = state[0], state[1], state[2]
    # fold the last sample of every lane (never followed by a regen)
    L = fold(L, L_samp, jnp.ones_like(work_k, jnp.bool_))
    return L / spp, state[7]
