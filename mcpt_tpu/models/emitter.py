"""Emitter system: analytic lights + importance-sampled environment map.

The reference dispatches a tagged union per emitter (csrt
src/renderer/emitters/emitter.cpp:180-246).  Here each scene emitter is a
row in an SoA table; the integrator unrolls the (static, scene-known)
emitter list so every per-emitter function runs dense over the wavefront.

Conventions (csrt emitter.hpp:49-55):
  * `wi` = direction light travels (light -> surface);
  * shadow ray = from the surface along `-wi`, length `distance`;
  * `harsh` lights are delta distributions — no MIS, radiance carries
    the full geometric coupling (e.g. 1/d^2).

Documented deviations:
  * Point lights emit `intensity / d^2` — the reference's
    EvaluatePointLight returns zero (point_light.cpp:21-25), i.e. point
    lights are silently black there; we implement the physics.
  * The envmap sample/eval/pdf triple uses ONE consistent lat-long
    mapping (the reference's escape mapping, envmap.cpp:100-107) with
    sub-texel CDF inversion; the reference's own sample mapping is
    inconsistent with its eval (x/z swap + sign, SURVEY §7.3) and
    quantizes directions to texel corners (envmap.cpp:70-88).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from mcpt_tpu.models import texture as textures
from mcpt_tpu.ops.math import (
    INV_FOUR_PI,
    INV_PI,
    INV_TWO_PI,
    MAX_FLOAT,
    PI,
    TWO_PI,
    cartesian_to_spherical,
    dot,
    local_to_world,
    length,
    normalize,
    spherical_to_cartesian,
)
from mcpt_tpu.ops.warps import (
    sample_cone_uniform,
    sample_sphere_uniform,
    searchsorted_cdf,
    searchsorted_cdf_rows,
)
from mcpt_tpu.scene.ir import EmitterType


@flax.struct.dataclass
class EmitterTables:
    """One row per analytic emitter (point/spot/directional/sun/constant)."""

    etype: jnp.ndarray          # [E] int32
    position: jnp.ndarray       # [E, 3]
    intensity: jnp.ndarray      # [E, 3]
    direction: jnp.ndarray      # [E, 3] direction light travels
    radiance: jnp.ndarray       # [E, 3]
    cos_cutoff: jnp.ndarray     # [E] spot cutoff / sun aperture
    cos_beam: jnp.ndarray       # [E] spot beam width
    cutoff_angle: jnp.ndarray   # [E] radians
    trans_width_rcp: jnp.ndarray  # [E] 1/(cutoff-beam)
    uv_factor: jnp.ndarray      # [E] tan(cutoff) for projection texture
    to_local: jnp.ndarray       # [E, 4, 4] spot world->local
    tid: jnp.ndarray            # [E] int32 projection / sun texture (-1 none)


@flax.struct.dataclass
class EnvMapData:
    """Importance-sampled lat-long environment map
    (csrt envmap.cpp:20-68 CDF build)."""

    tid: jnp.ndarray        # radiance texture id (bitmap), int32 scalar
    to_world: jnp.ndarray   # [4, 4] (rotation only is meaningful)
    to_local: jnp.ndarray   # [4, 4]
    cdf_rows: jnp.ndarray   # [H + 1] row marginal CDF
    cdf_cols: jnp.ndarray   # [H, W + 1] per-row conditional CDFs
    pdf_sin: jnp.ndarray    # [H, W] pdf(omega) * sin(theta) per texel
    width: int = flax.struct.field(pytree_node=False)
    height: int = flax.struct.field(pytree_node=False)


def build_emitter_tables(infos) -> EmitterTables:
    """Host commit of the analytic emitters (csrt emitter.cpp:122-164)."""
    e = max(len(infos), 1)
    etype = np.full(e, -1, np.int32)
    pos = np.zeros((e, 3), np.float32)
    inten = np.zeros((e, 3), np.float32)
    direc = np.zeros((e, 3), np.float32)
    direc[:, 1] = -1.0
    rad = np.zeros((e, 3), np.float32)
    cos_cut = np.ones(e, np.float32)
    cos_beam = np.ones(e, np.float32)
    cut_ang = np.zeros(e, np.float32)
    twr = np.ones(e, np.float32)
    uvf = np.ones(e, np.float32)
    to_local = np.tile(np.eye(4, dtype=np.float32), (e, 1, 1))
    tid = np.full(e, -1, np.int32)
    for i, info in enumerate(infos):
        etype[i] = int(info.etype)
        inten[i] = info.intensity
        rad[i] = info.radiance
        tid[i] = info.id_texture
        if info.etype == EmitterType.POINT:
            pos[i] = info.position
        elif info.etype == EmitterType.SPOT:
            m = np.asarray(info.to_world, np.float32)
            pos[i] = m[:3, 3]
            to_local[i] = np.linalg.inv(m)
            cut = np.radians(info.cutoff_angle)
            beam = np.radians(info.beam_width)
            cos_cut[i] = np.cos(cut)
            cos_beam[i] = np.cos(beam)
            cut_ang[i] = cut
            twr[i] = 1.0 / max(cut - beam, 1e-6)
            uvf[i] = np.tan(cut)
        elif info.etype in (EmitterType.DIRECTIONAL, EmitterType.SUN):
            d = np.asarray(info.direction, np.float32)
            direc[i] = d / max(np.linalg.norm(d), 1e-12)
            cos_cut[i] = np.cos(np.radians(info.cutoff_angle))
    return EmitterTables(
        etype=jnp.asarray(etype),
        position=jnp.asarray(pos),
        intensity=jnp.asarray(inten),
        direction=jnp.asarray(direc),
        radiance=jnp.asarray(rad),
        cos_cutoff=jnp.asarray(cos_cut),
        cos_beam=jnp.asarray(cos_beam),
        cutoff_angle=jnp.asarray(cut_ang),
        trans_width_rcp=jnp.asarray(twr),
        uv_factor=jnp.asarray(uvf),
        to_local=jnp.asarray(to_local),
        tid=jnp.asarray(tid),
    )


# ---------------------------------------------------------------------------
# Analytic emitters.  `e` is a static Python int (the integrator unrolls
# the emitter loop).  Returns (wi [N,3], distance [N], radiance [N,3],
# valid [N]); radiance includes the delta-light geometric coupling.


def sample_point(tables, e, origin):
    """csrt point_light.cpp:8-19 + the intensity/d^2 physics the
    reference forgot (see module docstring)."""
    vec = origin - tables.position[e]
    dist = length(vec)
    wi = vec / dist[..., None]
    radiance = tables.intensity[e] / jnp.maximum(dist * dist, 1e-12)[..., None]
    valid = jnp.ones(dist.shape, jnp.bool_)
    return wi, dist, radiance, valid


def sample_spot(tables, tex, e, origin):
    """csrt spot_light.cpp:8-45: cone cutoff + beam falloff + optional
    projection texture."""
    vec = origin - tables.position[e]
    dist = length(vec)
    wi = vec / dist[..., None]
    m = tables.to_local[e]
    dl = normalize(jnp.einsum("ij,...j->...i", m[:3, :3], wi))
    valid = dl[..., 2] >= tables.cos_cutoff[e]

    fall = jnp.ones(origin.shape, origin.dtype)
    tid = tables.tid[e]
    z = jnp.maximum(dl[..., 2], 1e-6)
    uv = jnp.stack(
        [
            0.5 + 0.5 * dl[..., 0] / (z * tables.uv_factor[e]),
            0.5 + 0.5 * dl[..., 1] / (z * tables.uv_factor[e]),
        ],
        axis=-1,
    )
    has_tex = tid >= 0
    tex_fall = textures.eval_color(tex, jnp.maximum(tid, 0), uv)
    fall = jnp.where(has_tex, tex_fall, fall)
    in_transition = dl[..., 2] < tables.cos_beam[e]
    trans = (
        tables.cutoff_angle[e] - jnp.arccos(jnp.clip(dl[..., 2], -1.0, 1.0))
    ) * tables.trans_width_rcp[e]
    fall = fall * jnp.where(in_transition, trans, 1.0)[..., None]
    radiance = (
        tables.intensity[e] * fall / jnp.maximum(dist * dist, 1e-12)[..., None]
    )
    return wi, dist, radiance, valid


def sample_directional(tables, e, origin):
    """csrt directional_light.cpp:8-24."""
    n = origin.shape[0]
    wi = jnp.broadcast_to(tables.direction[e], origin.shape)
    dist = jnp.full((n,), MAX_FLOAT * 0.5, origin.dtype)
    radiance = jnp.broadcast_to(tables.radiance[e], origin.shape)
    return wi, dist, radiance, jnp.ones((n,), jnp.bool_)


def sample_sun(tables, e, origin, xi0, xi1):
    """Cone of directions around the sun direction (csrt sun.cpp:8-24)."""
    n = origin.shape[0]
    dl = sample_cone_uniform(tables.cos_cutoff[e], xi0, xi1)
    wi = local_to_world(dl, jnp.broadcast_to(tables.direction[e], origin.shape))
    dist = jnp.full((n,), MAX_FLOAT * 0.5, origin.dtype)
    radiance = jnp.broadcast_to(tables.radiance[e], origin.shape)
    return wi, dist, radiance, jnp.ones((n,), jnp.bool_)


def eval_sun_escape(tables, tex, e, look_dir):
    """Escape-ray lookup into the precomputed sun bitmap
    (csrt sun.cpp:26-32)."""
    theta, phi = cartesian_to_spherical(look_dir)
    uv = jnp.stack([phi * INV_TWO_PI, theta * INV_PI], axis=-1)
    return textures.eval_color(tex, jnp.maximum(tables.tid[e], 0), uv)


def sample_constant(tables, e, origin, xi0, xi1):
    """Uniform-sphere sample; pdf 1/4pi (csrt constant_light.cpp:8-37).
    Returns (wi, dist, radiance, pdf, valid) — NOT harsh, participates
    in MIS."""
    n = origin.shape[0]
    wi = sample_sphere_uniform(xi0, xi1)
    dist = jnp.full((n,), MAX_FLOAT * 0.5, origin.dtype)
    radiance = jnp.broadcast_to(tables.radiance[e], origin.shape)
    pdf = jnp.full((n,), INV_FOUR_PI, origin.dtype)
    return wi, dist, radiance, pdf, jnp.ones((n,), jnp.bool_)


# ---------------------------------------------------------------------------
# Environment map


def build_envmap(pixels: np.ndarray, to_world: np.ndarray, tid: int) -> EnvMapData:
    """Host-side luminance CDF build (csrt CreateEnvMapCdfPdf,
    envmap.cpp:20-68) in vectorized numpy.

    pixels: [H, W, 3] float32 linear radiance (the registered bitmap).
    """
    pixels = np.asarray(pixels, np.float32)
    h, w = pixels.shape[:2]
    lum = (
        0.2126 * pixels[..., 0]
        + 0.7152 * pixels[..., 1]
        + 0.0722 * pixels[..., 2]
    )
    sin_row = np.sin((np.arange(h) + 0.5) * np.pi / h).astype(np.float32)
    f = lum * sin_row[:, None]  # [H, W] importance
    f = np.maximum(f, 0.0)
    row_sum = f.sum(axis=1)
    total = max(float(f.sum()), 1e-20)

    cdf_rows = np.zeros(h + 1, np.float32)
    np.cumsum(row_sum / total, out=cdf_rows[1:])
    cdf_rows[-1] = 1.0

    cdf_cols = np.zeros((h, w + 1), np.float32)
    np.cumsum(f / np.maximum(row_sum, 1e-20)[:, None], axis=1, out=cdf_cols[:, 1:])
    cdf_cols[:, -1] = 1.0

    # pdf(omega) = p_texel * (W*H) / (2 pi^2 sin(theta));
    # store pdf*sin so eval needs one gather + the actual sin(theta).
    pdf_sin = (f / total) * (w * h) / (2.0 * np.pi**2)

    m = np.asarray(to_world, np.float32)
    return EnvMapData(
        tid=jnp.int32(tid),
        to_world=jnp.asarray(m),
        to_local=jnp.asarray(np.linalg.inv(m)),
        cdf_rows=jnp.asarray(cdf_rows),
        cdf_cols=jnp.asarray(cdf_cols),
        pdf_sin=jnp.asarray(pdf_sin),
        width=w,
        height=h,
    )


def _dir_to_uv(env: EnvMapData, look_dir):
    """World direction -> lat-long texcoord (csrt envmap.cpp:100-107)."""
    dl = normalize(jnp.einsum("ij,...j->...i", env.to_local[:3, :3], look_dir))
    theta, phi = cartesian_to_spherical(dl)
    return jnp.stack([phi * INV_TWO_PI, theta * INV_PI], axis=-1), theta


def sample_envmap(env: EnvMapData, tex, origin, xi0, xi1):
    """2D CDF inversion with in-cell uniform offset.  Returns
    (wi, dist, radiance, pdf, valid); wi = light travel direction
    = -(direction toward the env texel)."""
    row = searchsorted_cdf(env.cdf_rows, xi0)
    lo_r = env.cdf_rows[row]
    hi_r = env.cdf_rows[row + 1]
    v_frac = (xi0 - lo_r) / jnp.maximum(hi_r - lo_r, 1e-12)

    # per-lane binary search inside row `row` of the column CDF —
    # never materialize the [N, W+1] row gather (HBM-traffic disaster
    # at production lane counts; see searchsorted_cdf_rows)
    col = searchsorted_cdf_rows(env.cdf_cols, row, xi1)
    lo_c = env.cdf_cols[row, col]
    hi_c = env.cdf_cols[row, col + 1]
    u_frac = (xi1 - lo_c) / jnp.maximum(hi_c - lo_c, 1e-12)

    v = (row.astype(jnp.float32) + jnp.clip(v_frac, 0.0, 1.0)) / env.height
    u = (col.astype(jnp.float32) + jnp.clip(u_frac, 0.0, 1.0)) / env.width
    theta = v * PI
    phi = u * TWO_PI
    dir_local = spherical_to_cartesian(theta, phi)
    dir_world = normalize(
        jnp.einsum("ij,...j->...i", env.to_world[:3, :3], dir_local)
    )
    wi = -dir_world

    radiance = textures.eval_color(
        tex, env.tid, jnp.stack([u, v], axis=-1)
    )
    sin_t = jnp.maximum(jnp.abs(jnp.sin(theta)), 1e-4)
    pdf = env.pdf_sin[row, col] / sin_t
    n = origin.shape[0]
    dist = jnp.full((n,), MAX_FLOAT * 0.5, origin.dtype)
    valid = pdf > 0.0
    return wi, dist, radiance, pdf, valid


def eval_envmap(env: EnvMapData, tex, look_dir):
    """Escape-ray radiance (csrt envmap.cpp:100-107)."""
    uv, _ = _dir_to_uv(env, look_dir)
    return textures.eval_color(tex, env.tid, uv)


def pdf_envmap(env: EnvMapData, tex, look_dir):
    """Sampling pdf of the escape direction for MIS
    (consistent with sample_envmap; cf. csrt envmap.cpp:109-133)."""
    uv, theta = _dir_to_uv(env, look_dir)
    row = jnp.clip(
        (uv[..., 1] * env.height).astype(jnp.int32), 0, env.height - 1
    )
    col = jnp.clip(
        (uv[..., 0] * env.width).astype(jnp.int32), 0, env.width - 1
    )
    sin_t = jnp.maximum(jnp.abs(jnp.sin(theta)), 1e-4)
    return env.pdf_sin[row, col] / sin_t


def empty_envmap() -> EnvMapData:
    """Placeholder so SceneData keeps a static pytree structure."""
    return EnvMapData(
        tid=jnp.int32(0),
        to_world=jnp.eye(4),
        to_local=jnp.eye(4),
        cdf_rows=jnp.asarray(np.array([0.0, 1.0], np.float32)),
        cdf_cols=jnp.asarray(np.array([[0.0, 1.0]], np.float32)),
        pdf_sin=jnp.zeros((1, 1), jnp.float32),
        width=1,
        height=1,
    )
