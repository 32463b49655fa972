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
from mcpt_tpu.models import texture as textures
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
from mcpt_tpu.ops.traversal import intersect_any, intersect_closest
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


def interpolate_hit(scene: SceneData, ghit, o, d) -> HitAttrs:
    """Barycentric attribute interpolation (csrt triangle.cpp:116-147)."""
    g = scene.geom
    p = ghit.prim
    u = 1.0 - ghit.v - ghit.w
    uf = u[..., None]
    vf = ghit.v[..., None]
    wf = ghit.w[..., None]

    normal = normalize(uf * g.n0[p] + vf * g.n1[p] + wf * g.n2[p])
    tangent = normalize(uf * g.tg0[p] + vf * g.tg1[p] + wf * g.tg2[p])
    bitangent = normalize(uf * g.bt0[p] + vf * g.bt1[p] + wf * g.bt2[p])
    uv = uf * g.uv0[p] + vf * g.uv1[p] + wf * g.uv2[p]
    inst = g.inst_id[p]
    bsdf_id = scene.map_inst_bsdf[jnp.maximum(inst, 0)]
    # clamp t for the position so missed lanes (t = MAX_FLOAT) stay finite
    # — garbage on masked lanes leaks NaNs into reverse-mode AD otherwise.
    t_pos = jnp.minimum(ghit.t, 1e8)
    return HitAttrs(
        valid=ghit.valid,
        t=ghit.t,
        position=o + t_pos[..., None] * d,
        normal=normal,
        tangent=tangent,
        bitangent=bitangent,
        uv=uv,
        inside=ghit.inside,
        bsdf_id=jnp.where(ghit.valid, bsdf_id, -1),
        inst_id=inst,
    )


def _sample_area_light(scene: SceneData, xi_sel, xi_a, xi_b):
    """Pick an emissive triangle from the global CDF and a point on it
    (equivalent to csrt path.cpp:186-196 + blas.cpp:79-98; see
    scene/compile.py docstring for the pdf identity)."""
    em = scene.em
    cell = searchsorted_cdf(em.cdf, xi_sel)
    w, u, v = sample_triangle_uniform(xi_a, xi_b)
    uf, vf = u[..., None], v[..., None]
    pos = em.p0[cell] + uf * em.e1[cell] + vf * em.e2[cell]
    nrm = normalize(
        w[..., None] * em.n0[cell] + uf * em.n1[cell] + vf * em.n2[cell]
    )
    uv = w[..., None] * em.uv0[cell] + uf * em.uv1[cell] + vf * em.uv2[cell]
    radiance_tid = scene.bsdf.radiance_tid[em.bsdf_id[cell]]
    radiance = textures.eval_color(scene.tex, jnp.maximum(radiance_tid, 0), uv)
    return pos, nrm, radiance, em.pdf_area[cell]


def _nee(scene: SceneData, hit: HitAttrs, wo, alive, xi):
    """Direct lighting from the sampled area light with MIS
    (csrt EvaluateDirectLightPath, path.cpp:185-236)."""
    pos_l, n_l, radiance, pdf_area = _sample_area_light(
        scene, xi[0], xi[1], xi[2]
    )
    d_vec = hit.position - pos_l
    dist = jnp.sqrt(jnp.maximum(dot(d_vec, d_vec), 1e-20))
    wi = d_vec / dist[..., None]  # light travel direction: light -> surface

    cos_prime = dot(wi, n_l)
    cos_surf = dot(-wi, hit.normal)
    geo_ok = (cos_prime >= EPSILON_FLOAT) & (cos_surf >= EPSILON_FLOAT) & alive

    # shadow ray from the light point toward the surface (path.cpp:199-203)
    occluded = intersect_any(
        scene.geom,
        pos_l,
        wi,
        t_min=EPSILON_DISTANCE,
        t_max=jnp.where(geo_ok, dist - EPSILON_DISTANCE, 0.0),
    )
    ok = geo_ok & ~occluded

    pdf_eval, f, f_valid = bsdfs.bsdf_evaluate(
        scene.bsdf,
        scene.tex,
        scene.present_types,
        hit.bsdf_id,
        wi,
        wo,
        hit.normal,
        hit.tangent,
        hit.bitangent,
        hit.inside,
        hit.uv,
    )
    ok = ok & f_valid

    pdf_direct = pdf_area * (dist * dist) / jnp.maximum(cos_prime, 1e-12)
    w_mis = mis_weight(pdf_direct, pdf_eval)
    contrib = (
        w_mis[..., None]
        * radiance
        * f
        / jnp.maximum(pdf_direct, 1e-12)[..., None]
    )
    return jnp.where(ok[..., None], contrib, 0.0)


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
    ghit = intersect_closest(scene.geom, o, d)
    hit = interpolate_hit(scene, ghit, o, d)

    L = jnp.zeros((n, 3), jnp.float32)
    # TODO(envmap/sun): escape radiance for primary rays (path.cpp:24-35)

    has_bsdf = hit.bsdf_id >= 0
    emitter0 = bsdfs.is_emitter(scene.bsdf, hit.bsdf_id) & has_bsdf & hit.valid
    backface0 = (
        hit.inside & ~bsdfs.is_twosided(scene.bsdf, hit.bsdf_id) & has_bsdf & hit.valid
    )
    if not integ.hide_emitters:
        L = L + jnp.where(
            (emitter0 & ~backface0)[..., None],
            bsdfs.get_radiance(scene.bsdf, scene.tex, hit.bsdf_id, hit.uv),
            0.0,
        )

    alive0 = hit.valid & ~emitter0 & ~backface0
    beta0 = jnp.ones((n, 3), jnp.float32)
    wo0 = -d

    if scene.n_emissive == 0 or integ.depth_max <= 1:
        return L, seed

    pdf_rr_rcp = 1.0 / integ.pdf_rr

    def cond(state):
        dep = state[0]
        alive = state[6]
        return (dep < integ.depth_max) & jnp.any(alive)

    def body(state):
        dep, L, beta, wo, hit, seed, alive = state

        # --- 1. Russian roulette with immediate compensation
        seed, rr_u = rng.random_float(seed)
        need_rr = dep >= integ.depth_rr
        alive = alive & (~need_rr | (rr_u < integ.pdf_rr))
        beta = jnp.where((alive & need_rr)[..., None], beta * pdf_rr_rcp, beta)

        # --- 2. NEE (3 draws)
        seed, xi_nee = rng.random_floats(seed, 3)
        L = L + beta * _nee(scene, hit, wo, alive, xi_nee)

        # --- 3. BSDF sample (path.cpp:66-74)
        seed, xi_b = rng.random_floats(seed, bsdfs.N_SAMPLE_DRAWS)
        wi, pdf_b, f, valid_b = bsdfs.bsdf_sample(
            scene.bsdf,
            scene.tex,
            scene.present_types,
            hit.bsdf_id,
            wo,
            hit.normal,
            hit.tangent,
            hit.bitangent,
            hit.inside,
            hit.uv,
            xi_b,
        )
        beta_new = beta * f / jnp.maximum(pdf_b, 1e-12)[..., None]
        alive = alive & valid_b & (jnp.max(beta_new, axis=-1) >= EPSILON)
        beta = jnp.where(alive[..., None], beta_new, beta)

        # --- 4. continuation trace (ray dir = -wi, path.cpp:77-78)
        o2 = hit.position
        d2 = -wi
        ghit2 = intersect_closest(
            scene.geom, o2, d2, t_max=jnp.where(alive, MAX_FLOAT, 0.0)
        )
        hit2 = interpolate_hit(scene, ghit2, o2, d2)
        # TODO(envmap): escape MIS contribution (path.cpp:81-93)
        alive = alive & hit2.valid

        # --- emitter hit with MIS (path.cpp:105-124)
        has_b = hit2.bsdf_id >= 0
        emitter = bsdfs.is_emitter(scene.bsdf, hit2.bsdf_id) & has_b
        cos_prime = dot(wi, hit2.normal)
        pdf_area_hit = scene.map_inst_light_pdf[jnp.maximum(hit2.inst_id, 0)]
        t_safe = jnp.where(hit2.valid, jnp.minimum(hit2.t, 1e8), 1.0)
        pdf_direct = (
            pdf_area_hit * (t_safe * t_safe) / jnp.maximum(cos_prime, 1e-12)
        )
        w_bsdf = mis_weight(pdf_b, pdf_direct)
        rad = bsdfs.get_radiance(scene.bsdf, scene.tex, hit2.bsdf_id, hit2.uv)
        take_em = alive & emitter & (cos_prime >= EPSILON_FLOAT)
        L = L + jnp.where(take_em[..., None], w_bsdf[..., None] * beta * rad, 0.0)
        alive = alive & ~emitter

        # --- one-sided backface absorbs (path.cpp:99-104)
        backface = hit2.inside & ~bsdfs.is_twosided(scene.bsdf, hit2.bsdf_id) & has_b
        alive = alive & ~backface

        return dep + 1, L, beta, wi, hit2, seed, alive

    state = (jnp.int32(1), L, beta0, wo0, hit, seed, alive0)
    if differentiable:
        def scan_body(state, _):
            return body(state), None

        state, _ = lax.scan(scan_body, state, None, length=integ.depth_max - 1)
        _, L, _, _, _, seed, _ = state
    else:
        _, L, _, _, _, seed, _ = lax.while_loop(cond, body, state)
    return L, seed
