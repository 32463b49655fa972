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
import jax
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
    """Importance-sampled lat-long environment map.

    The reference inverts a row CDF + per-row column CDF per draw
    (csrt envmap.cpp:20-98) — two binary searches.  On a TPU every
    per-lane dynamic gather costs the same ~0.85 ms at 64k lanes
    regardless of table size (scripts/gather_probe.py), so the two
    searches (~23 serialized gather rounds) dominated every
    bitmap-envmap scene.  Redesign: a Walker/Vose alias table — one
    [n,2] row gather resolves the texel, one [n,4] row gather returns
    its (radiance, pdf·sinθ).  Identical sampling distribution
    (texel-proportional to luminance·sinθ), ~10x fewer gather ops."""

    tid: jnp.ndarray        # radiance texture id (bitmap), int32 scalar
    to_world: jnp.ndarray   # [4, 4] (rotation only is meaningful)
    to_local: jnp.ndarray   # [4, 4]
    alias_tab: jnp.ndarray  # [n, 2] int32: (bitcast f32 accept-prob, alias idx)
    texel_tab: jnp.ndarray  # [n, 4] f32: (r, g, b, pdf(omega)*sin(theta))
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


def _alias_build_py(weights: np.ndarray):
    """Python oracle for native alias_build (Vose 1991).  Same pairing
    order as native/alias.c so tables match bit-for-bit on small inputs."""
    weights = np.asarray(weights, np.float64).reshape(-1)
    n = weights.shape[0]
    total = float(weights.sum())
    if not total > 0.0:
        raise ValueError("alias build: weights sum to zero")
    scaled = weights * (n / total)
    prob = np.ones(n, np.float32)
    al = np.arange(n, dtype=np.int32)
    small = [i for i in range(n) if scaled[i] < 1.0]
    large = [i for i in range(n) if scaled[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = np.float32(scaled[s])
        al[s] = l
        scaled[l] -= 1.0 - scaled[s]
        (small if scaled[l] < 1.0 else large).append(l)
    for i in small + large:
        prob[i] = 1.0
        al[i] = i
    return prob, al


def build_envmap(pixels: np.ndarray, to_world: np.ndarray, tid: int) -> EnvMapData:
    """Host-side alias-table build over luminance·sinθ texel importance
    (replaces csrt's CDF build, CreateEnvMapCdfPdf envmap.cpp:20-68 —
    same per-texel sampling probability, O(1) gathers per draw).

    pixels: [H, W, 3] float32 linear radiance (the registered bitmap).
    Maps larger than 2^24 texels are box-downscaled 2x until they fit so
    a 24-bit uniform can index rows/cols exactly.
    """
    pixels = np.asarray(pixels, np.float32)
    while pixels.shape[0] * pixels.shape[1] > (1 << 24):
        h2, w2 = pixels.shape[0] // 2 * 2, pixels.shape[1] // 2 * 2
        p = pixels[:h2, :w2]
        pixels = 0.25 * (
            p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]
        )
    h, w = pixels.shape[:2]
    lum = (
        0.2126 * pixels[..., 0]
        + 0.7152 * pixels[..., 1]
        + 0.0722 * pixels[..., 2]
    )
    sin_row = np.sin((np.arange(h) + 0.5) * np.pi / h).astype(np.float32)
    f = lum * sin_row[:, None]  # [H, W] importance
    f = np.maximum(f, 0.0)
    if not float(f.sum()) > 0.0:
        # all-black radiance (e.g. sunsky with skyScale=0: the sky half
        # of the emitter is zero and only the sun bitmap lights the
        # scene) — fall back to uniform-over-solid-angle importance so
        # the alias build stays well-defined; every NEE draw then
        # contributes exactly zero radiance with a valid pdf.
        f = np.broadcast_to(sin_row[:, None], lum.shape).astype(np.float32)
    total = max(float(f.sum()), 1e-20)

    if f.size <= 4096:
        prob, al = _alias_build_py(f)
    else:
        from mcpt_tpu import native

        prob, al = native.alias_build(f)

    # pdf(omega) = p_texel * (W*H) / (2 pi^2 sin(theta));
    # store pdf*sin so eval needs only the actual sin(theta).
    pdf_sin = (f.reshape(-1) / total) * (w * h) / (2.0 * np.pi**2)
    texel_tab = np.concatenate(
        [pixels.reshape(-1, 3), pdf_sin[:, None].astype(np.float32)], axis=1
    )
    alias_tab = np.stack([prob.view(np.int32), al], axis=1)

    m = np.asarray(to_world, np.float32)
    return EnvMapData(
        tid=jnp.int32(tid),
        to_world=jnp.asarray(m),
        to_local=jnp.asarray(np.linalg.inv(m)),
        alias_tab=jnp.asarray(alias_tab),
        texel_tab=jnp.asarray(texel_tab),
        width=w,
        height=h,
    )


def _dir_to_uv(env: EnvMapData, look_dir):
    """World direction -> lat-long texcoord (csrt envmap.cpp:100-107)."""
    dl = normalize(jnp.einsum("ij,...j->...i", env.to_local[:3, :3], look_dir))
    theta, phi = cartesian_to_spherical(dl)
    return jnp.stack([phi * INV_TWO_PI, theta * INV_PI], axis=-1), theta


def sample_envmap(env: EnvMapData, tex, origin, xi0, xi1, xi2,
                  differentiable: bool = False):
    """Alias-table texel draw with in-texel uniform jitter.  Returns
    (wi, dist, radiance, pdf, valid); wi = light travel direction
    = -(direction toward the env texel).

    Draw decomposition (three uniforms, full 24-bit mantissa where it
    matters): xi0 -> row index + in-texel v jitter (its fraction), xi1 ->
    column index + u jitter, xi2 -> the alias accept coin.  The texel
    distribution is exactly luminance·sinθ-proportional, matching the
    reference's CDF inversion (envmap.cpp:70-98) with O(1) gathers.

    `differentiable=True` reads radiance through the texture atlas
    (bilinear, gradient flows to the envmap bitmap); the default reads
    the baked texel table (nearest) — each mode is self-consistent with
    the matching eval/pdf, keeping MIS unbiased."""
    h, w = env.height, env.width
    n = h * w
    rx = xi0 * h
    cx = xi1 * w
    row = jnp.clip(rx.astype(jnp.int32), 0, h - 1)
    col = jnp.clip(cx.astype(jnp.int32), 0, w - 1)
    jv = jnp.clip(rx - row.astype(jnp.float32), 0.0, 1.0)
    ju = jnp.clip(cx - col.astype(jnp.float32), 0.0, 1.0)
    j = row * w + col

    ar = env.alias_tab[j]                       # [N, 2] row gather
    prob = jax.lax.bitcast_convert_type(ar[..., 0], jnp.float32)
    take_own = xi2 < prob
    jj = jnp.where(take_own, j, ar[..., 1])
    row = jj // w
    col = jj - row * w

    v = (row.astype(jnp.float32) + jv) / h
    u = (col.astype(jnp.float32) + ju) / w
    theta = v * PI
    phi = u * TWO_PI
    dir_local = spherical_to_cartesian(theta, phi)
    dir_world = normalize(
        jnp.einsum("ij,...j->...i", env.to_world[:3, :3], dir_local)
    )
    wi = -dir_world

    tx = env.texel_tab[jj]                      # [N, 4] row gather
    if differentiable:
        radiance = textures.eval_color(
            tex, env.tid, jnp.stack([u, v], axis=-1)
        )
    else:
        radiance = tx[..., :3]
    sin_t = jnp.maximum(jnp.abs(jnp.sin(theta)), 1e-4)
    pdf = tx[..., 3] / sin_t
    nlanes = origin.shape[0]
    dist = jnp.full((nlanes,), MAX_FLOAT * 0.5, origin.dtype)
    valid = pdf > 0.0
    return wi, dist, radiance, pdf, valid


def _dir_to_texel(env: EnvMapData, look_dir):
    uv, theta = _dir_to_uv(env, look_dir)
    row = jnp.clip(
        (uv[..., 1] * env.height).astype(jnp.int32), 0, env.height - 1
    )
    col = jnp.clip(
        (uv[..., 0] * env.width).astype(jnp.int32), 0, env.width - 1
    )
    return uv, theta, row * env.width + col


def eval_envmap(env: EnvMapData, tex, look_dir, differentiable: bool = False):
    """Escape-ray radiance (csrt envmap.cpp:100-107).  Default: baked
    texel table (one row gather, shared with pdf_envmap's by CSE);
    differentiable: bilinear atlas read (gradient flows)."""
    uv, _, j = _dir_to_texel(env, look_dir)
    if differentiable:
        return textures.eval_color(tex, env.tid, uv)
    return env.texel_tab[j][..., :3]


def pdf_envmap(env: EnvMapData, tex, look_dir):
    """Sampling pdf of the escape direction for MIS
    (consistent with sample_envmap; cf. csrt envmap.cpp:109-133)."""
    _, theta, j = _dir_to_texel(env, look_dir)
    sin_t = jnp.maximum(jnp.abs(jnp.sin(theta)), 1e-4)
    return env.texel_tab[j][..., 3] / sin_t


def empty_envmap() -> EnvMapData:
    """Placeholder so SceneData keeps a static pytree structure."""
    return EnvMapData(
        tid=jnp.int32(0),
        to_world=jnp.eye(4),
        to_local=jnp.eye(4),
        alias_tab=jnp.zeros((1, 2), jnp.int32),
        texel_tab=jnp.zeros((1, 4), jnp.float32),
        width=1,
        height=1,
    )
