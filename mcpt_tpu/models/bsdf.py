"""Device BSDF system: SoA parameter tables + wavefront sample/evaluate.

The reference dispatches a tagged union by switch per ray
(csrt src/renderer/bsdfs/bsdf.cpp:188-236).  The TPU version keeps one
SoA row per scene BSDF and evaluates each *present* lobe family over the
whole wavefront with masked selects — the scene compiler records which
families exist (`present_types`, a static tuple) so XLA only compiles
those branches.  Material sorting in front of the shading stage makes the
masks dense later (SURVEY §2.7 "EP" analogue).

Direction conventions follow the reference exactly:
  * `wi` = direction light travels (INTO the surface);
  * `wo` = direction toward the viewer/previous vertex;
  * Sample() flips the shading frame when `dot(wo, n) < 0`,
    Evaluate() when `dot(-wi, n) < 0` (path.cpp:252-256, 281-285);
  * returned `attenuation` is f * |cos theta_i| (the reference folds the
    cosine into attenuation, diffuse.cpp:17-19).

Deviation from the reference (documented; SURVEY §7.4 spirit): Evaluate's
MIS pdf is the true BSDF sampling pdf of `wi` (e.g. cos/pi for Lambert).
The reference returns `dot(wo, n)` for diffuse (diffuse.cpp:12) which
breaks the MIS partition-of-unity; we keep the estimator unbiased.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from mcpt_tpu.models import texture as textures
from mcpt_tpu.ops.math import EPSILON, INV_PI, dot, to_local, to_world
from mcpt_tpu.ops.warps import sample_hemisphere_cosine
from mcpt_tpu.scene.ir import BsdfInfo, BsdfType

# Fixed number of uniform draws consumed by one Sample() call across all
# BSDF families — keeps per-lane RNG streams aligned in the wavefront.
N_SAMPLE_DRAWS = 3


@flax.struct.dataclass
class BsdfTables:
    btype: jnp.ndarray            # [B] int32
    twosided: jnp.ndarray         # [B] bool
    opacity_tid: jnp.ndarray      # [B] int32 (-1 none)
    bump_tid: jnp.ndarray         # [B] int32 (-1 none)
    radiance_tid: jnp.ndarray     # [B] int32 (area light)
    diffuse_tid: jnp.ndarray      # [B] int32
    roughness_tid: jnp.ndarray    # [B] int32 (rough diffuse sigma / plastic)
    roughness_u_tid: jnp.ndarray  # [B] int32
    roughness_v_tid: jnp.ndarray  # [B] int32
    specular_tid: jnp.ndarray     # [B] int32
    transmit_tid: jnp.ndarray     # [B] int32
    reflectivity_tid: jnp.ndarray  # [B] int32 (conductor F0)
    edgetint_tid: jnp.ndarray     # [B] int32
    eta: jnp.ndarray              # [B] f32
    eta_inv: jnp.ndarray          # [B] f32
    reflectivity: jnp.ndarray     # [B] f32 ((eta-1)^2/(eta+1)^2)
    f_avg: jnp.ndarray            # [B, 3] average Fresnel
    use_fast_approx: jnp.ndarray  # [B] bool


def build_bsdf_tables(infos: list[BsdfInfo]) -> BsdfTables:
    """Host-side commit (csrt renderer.cpp:433-501 CommitBsdfs)."""
    from mcpt_tpu.ops.microfacet import average_fresnel_scalar

    b = max(len(infos), 1)

    def arr(fn, dtype):
        out = np.zeros(b, dtype)
        for i, info in enumerate(infos):
            out[i] = fn(info)
        return out

    eta = arr(lambda i: i.eta, np.float32)
    f_avg = np.zeros((b, 3), np.float32)
    for i, info in enumerate(infos):
        if info.btype in (BsdfType.DIELECTRIC, BsdfType.THIN_DIELECTRIC,
                          BsdfType.PLASTIC):
            f_avg[i] = average_fresnel_scalar(info.eta)

    return BsdfTables(
        btype=jnp.asarray(arr(lambda i: int(i.btype), np.int32)),
        twosided=jnp.asarray(arr(lambda i: i.twosided, np.bool_)),
        opacity_tid=jnp.asarray(arr(lambda i: i.id_opacity, np.int32)),
        bump_tid=jnp.asarray(arr(lambda i: i.id_bump_map, np.int32)),
        radiance_tid=jnp.asarray(arr(lambda i: i.id_radiance, np.int32)),
        diffuse_tid=jnp.asarray(arr(lambda i: i.id_diffuse_reflectance, np.int32)),
        roughness_tid=jnp.asarray(arr(lambda i: i.id_roughness, np.int32)),
        roughness_u_tid=jnp.asarray(arr(lambda i: i.id_roughness_u, np.int32)),
        roughness_v_tid=jnp.asarray(arr(lambda i: i.id_roughness_v, np.int32)),
        specular_tid=jnp.asarray(arr(lambda i: i.id_specular_reflectance, np.int32)),
        transmit_tid=jnp.asarray(
            arr(lambda i: i.id_specular_transmittance, np.int32)
        ),
        reflectivity_tid=jnp.asarray(arr(lambda i: i.id_reflectivity, np.int32)),
        edgetint_tid=jnp.asarray(arr(lambda i: i.id_edgetint, np.int32)),
        eta=jnp.asarray(eta),
        eta_inv=jnp.asarray(1.0 / np.maximum(eta, 1e-6)),
        reflectivity=jnp.asarray(((eta - 1.0) ** 2 / (eta + 1.0) ** 2).astype(np.float32)),
        f_avg=jnp.asarray(f_avg),
        use_fast_approx=jnp.asarray(arr(lambda i: i.use_fast_approx, np.bool_)),
    )


# ---------------------------------------------------------------------------
# Shading frame helpers


def orient_frame(normal, tangent, bitangent, inside, ref_dir):
    """Flip the shading frame so `normal` faces the side of `ref_dir`
    (csrt path.cpp:252-256).  Returns (normal, inside)."""
    flip = dot(ref_dir, normal) < 0.0
    normal = jnp.where(flip[..., None], -normal, normal)
    inside = jnp.where(flip, ~inside, inside)
    return normal, inside


# ---------------------------------------------------------------------------
# Per-family lobes.  Each returns (wi, pdf, attenuation, valid) for sample
# and (pdf, attenuation, valid) for evaluate.  All are total functions over
# the wavefront; callers mask by btype.


def _sample_diffuse(tex, albedo_tid, uv, n, t, b, xi):
    """Lambert cosine sampling (csrt diffuse.cpp:22-34)."""
    wi_local, pdf = sample_hemisphere_cosine(xi[0], xi[1])
    wi = -to_world(wi_local, t, b, n)
    albedo = textures.eval_color(tex, albedo_tid, uv)
    atten = albedo * (INV_PI * wi_local[..., 2])[..., None]
    valid = pdf >= EPSILON
    return wi, pdf, atten, valid


def _eval_diffuse(tex, albedo_tid, uv, n, wi, wo):
    """Lambert eval; pdf is the cosine-hemisphere sampling pdf of wi
    (see module docstring re: reference's diffuse.cpp:12 quirk)."""
    cos_i = dot(-wi, n)
    cos_o = dot(wo, n)
    pdf = INV_PI * jnp.maximum(cos_i, 0.0)
    albedo = textures.eval_color(tex, albedo_tid, uv)
    atten = albedo * (INV_PI * jnp.maximum(cos_i, 0.0))[..., None]
    valid = (cos_i >= EPSILON) & (cos_o >= EPSILON)
    return pdf, atten, valid


# ---------------------------------------------------------------------------
# Wavefront dispatch


def bsdf_sample(tables: BsdfTables, tex, present_types, bid, wo, normal,
                tangent, bitangent, inside, uv, xi):
    """Sample a continuation direction for every lane.

    bid: [N] int32 BSDF row per lane (invalid rows allowed, masked out).
    wo: [N, 3] toward viewer.  xi: [N_SAMPLE_DRAWS, N] uniforms.
    Returns (wi [N,3], pdf [N], attenuation [N,3], valid [N]).
    """
    bid = jnp.maximum(bid, 0)
    n, inside = orient_frame(normal, tangent, bitangent, inside, wo)
    btype = tables.btype[bid]

    wi = -wo
    pdf = jnp.ones_like(wo[..., 0])
    atten = jnp.ones_like(wo)
    valid = jnp.zeros(wo.shape[:-1], jnp.bool_)

    if BsdfType.DIFFUSE in present_types:
        m = btype == BsdfType.DIFFUSE
        w_, p_, a_, v_ = _sample_diffuse(
            tex, tables.diffuse_tid[bid], uv, n, tangent, bitangent, xi
        )
        wi = jnp.where(m[..., None], w_, wi)
        pdf = jnp.where(m, p_, pdf)
        atten = jnp.where(m[..., None], a_, atten)
        valid = jnp.where(m, v_, valid)

    return wi, pdf, atten, valid


def bsdf_evaluate(tables: BsdfTables, tex, present_types, bid, wi, wo,
                  normal, tangent, bitangent, inside, uv):
    """Evaluate f*cos and the sampling pdf of `wi` for every lane
    (NEE MIS, csrt EvaluateRayPath path.cpp:238-266)."""
    bid = jnp.maximum(bid, 0)
    n, inside = orient_frame(normal, tangent, bitangent, inside, -wi)
    btype = tables.btype[bid]

    pdf = jnp.ones_like(wo[..., 0])
    atten = jnp.ones_like(wo)
    valid = jnp.zeros(wo.shape[:-1], jnp.bool_)

    if BsdfType.DIFFUSE in present_types:
        m = btype == BsdfType.DIFFUSE
        p_, a_, v_ = _eval_diffuse(tex, tables.diffuse_tid[bid], uv, n, wi, wo)
        pdf = jnp.where(m, p_, pdf)
        atten = jnp.where(m[..., None], a_, atten)
        valid = jnp.where(m, v_, valid)

    return pdf, atten, valid


def get_radiance(tables: BsdfTables, tex, bid, uv):
    """Area-light emitted radiance (csrt bsdf.cpp:255-265)."""
    bid = jnp.maximum(bid, 0)
    is_light = tables.btype[bid] == BsdfType.AREA_LIGHT
    rad = textures.eval_color(tex, jnp.maximum(tables.radiance_tid[bid], 0), uv)
    return jnp.where(is_light[..., None], rad, 0.0)


def is_emitter(tables: BsdfTables, bid):
    return tables.btype[jnp.maximum(bid, 0)] == BsdfType.AREA_LIGHT


def is_twosided(tables: BsdfTables, bid):
    return tables.twosided[jnp.maximum(bid, 0)]
