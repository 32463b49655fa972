"""Participating media: homogeneous free-flight sampling + isotropic /
Henyey-Greenstein phase functions (csrt src/renderer/medium/).

SoA tables with one row per scene medium; every function is total over
the wavefront with a per-lane medium id (`mid`; -1 = vacuum -> identity
weight).  Ports the reference's channel-stratified spectral estimator
exactly:

  * free flight (homogeneous.cpp:9-51): with probability
    `sampling_weight` draw an exponential distance from one uniformly
    chosen RGB channel's sigma_t; the spectral pdf is the channel mean,
    so the returned weight is transmittance(*sigma_s) / pdf;
  * transmittance query for NEE (homogeneous.cpp:53-82, the
    `scattered=false` branch): weight = T / (sw * mean(T) + 1 - sw);
  * HG phase (henyey_greenstein.cpp:9-62): per-channel g (Vec3), channel
    -stratified inverse-CDF cos(theta), spectral pdf = channel mean of
    the per-channel phase values.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from mcpt_tpu.ops.math import (
    EPSILON,
    EPSILON_FLOAT,
    INV_FOUR_PI,
    TWO_PI,
    dot,
    local_to_world,
    sqr,
)
from mcpt_tpu.ops.warps import sample_sphere_uniform
from mcpt_tpu.scene.ir import MediumInfo

PHASE_ISOTROPIC = 0
PHASE_HG = 1

# Uniform draws consumed per call (fixed across media for aligned streams)
N_FLIGHT_DRAWS = 2
N_PHASE_DRAWS = 3


@flax.struct.dataclass
class MediumTables:
    sigma_s: jnp.ndarray          # [M, 3]
    sigma_t: jnp.ndarray          # [M, 3]
    sampling_weight: jnp.ndarray  # [M]
    phase_type: jnp.ndarray       # [M] int32
    g: jnp.ndarray                # [M, 3] HG asymmetry per channel


def build_medium_tables(infos: list[MediumInfo]) -> MediumTables:
    """Host commit (csrt medium.cpp:6-39): sampling_weight =
    max-channel single-scattering albedo, clamped into [0.5, 1] when
    positive."""
    m = max(len(infos), 1)
    sigma_s = np.zeros((m, 3), np.float32)
    sigma_t = np.ones((m, 3), np.float32)
    sw = np.zeros(m, np.float32)
    ptype = np.zeros(m, np.int32)
    g = np.zeros((m, 3), np.float32)
    for i, info in enumerate(infos):
        ss = np.asarray(info.sigma_s, np.float32)
        st = ss + np.asarray(info.sigma_a, np.float32)
        sigma_s[i] = ss
        sigma_t[i] = st
        albedo = ss / np.maximum(st, 1e-20)
        w = 0.0
        for c in range(3):
            if albedo[c] > w and st[c] > 0:
                w = float(albedo[c])
        if w > 0:
            w = max(w, 0.5)
        sw[i] = w
        ptype[i] = PHASE_HG if info.phase == "hg" else PHASE_ISOTROPIC
        g[i] = np.broadcast_to(np.asarray(info.g, np.float32), (3,))
    return MediumTables(
        sigma_s=jnp.asarray(sigma_s),
        sigma_t=jnp.asarray(sigma_t),
        sampling_weight=jnp.asarray(sw),
        phase_type=jnp.asarray(ptype),
        g=jnp.asarray(g),
    )


def sample_flight(tables: MediumTables, mid, max_distance, xi0, xi1):
    """Channel-stratified free-flight sampling (homogeneous.cpp:9-51).

    mid: [N] int32 (-1 = vacuum).  Returns
    (scattered [N] bool, distance [N], weight [N,3] = atten/pdf, valid [N]).
    """
    has_med = mid >= 0
    row = jnp.maximum(mid, 0)
    sw = tables.sampling_weight[row]
    sigma_t = tables.sigma_t[row]
    sigma_s = tables.sigma_s[row]

    try_scatter = (xi0 < sw) & has_med
    xi_r = xi0 / jnp.maximum(sw, 1e-12)
    channel = jnp.clip((xi1 * 3).astype(jnp.int32), 0, 2)
    st_c = jnp.take_along_axis(sigma_t, channel[..., None], axis=-1)[..., 0]
    dist_scatter = -jnp.log1p(-jnp.minimum(xi_r, 1.0 - 1e-7)) / jnp.maximum(
        st_c, 1e-20
    )
    scattered = try_scatter & (dist_scatter < max_distance)
    distance = jnp.where(scattered, dist_scatter, max_distance)

    # transmittance at the realized distance (clamped for masked lanes)
    d_safe = jnp.minimum(distance, 1e8)[..., None]
    trans = jnp.exp(-sigma_t * d_safe)

    pdf_scatter = sw * jnp.mean(sigma_t * trans, axis=-1)
    pdf_pass = sw * jnp.mean(trans, axis=-1) + (1.0 - sw)
    pdf = jnp.where(scattered, pdf_scatter, pdf_pass)

    atten = jnp.where(scattered[..., None], trans * sigma_s, trans)
    valid = jnp.any(atten > EPSILON_FLOAT, axis=-1)
    weight = atten / jnp.maximum(pdf, 1e-20)[..., None]

    weight = jnp.where(has_med[..., None], weight, 1.0)
    scattered = scattered & has_med
    valid = valid | ~has_med
    return scattered, distance, weight, valid


def eval_transmittance(tables: MediumTables, mid, distance):
    """NEE transmittance weight = T / pdf_pass (homogeneous.cpp:53-82,
    non-scattered branch).  Returns (weight [N,3], valid [N])."""
    has_med = mid >= 0
    row = jnp.maximum(mid, 0)
    sw = tables.sampling_weight[row]
    sigma_t = tables.sigma_t[row]
    d_safe = jnp.minimum(distance, 1e8)[..., None]
    trans = jnp.exp(-sigma_t * d_safe)
    pdf = sw * jnp.mean(trans, axis=-1) + (1.0 - sw)
    weight = trans / jnp.maximum(pdf, 1e-20)[..., None]
    valid = jnp.any(trans > EPSILON_FLOAT, axis=-1)
    weight = jnp.where(has_med[..., None], weight, 1.0)
    valid = valid | ~has_med
    return weight, valid


def _hg_value(g, cos_theta):
    """Per-channel HG phase value (henyey_greenstein.cpp:28-29)."""
    temp = 1.0 + sqr(g) + 2.0 * cos_theta[..., None] * g
    temp = jnp.maximum(temp, 1e-8)
    return INV_FOUR_PI * (1.0 - sqr(g)) / (temp * jnp.sqrt(temp))


def sample_phase(tables: MediumTables, mid, wo, xi0, xi1, xi2):
    """Sample a scattered direction at a medium vertex.

    Returns (wi [N,3], pdf [N], atten [N,3], valid [N]); `wi` is the
    direction light travels (continuation ray = -wi), matching
    henyey_greenstein.cpp:42 / isotropic.cpp:14.
    """
    row = jnp.maximum(mid, 0)
    is_hg = tables.phase_type[row] == PHASE_HG
    g = tables.g[row]

    channel = jnp.clip((xi0 * 3).astype(jnp.int32), 0, 2)
    g_c = jnp.take_along_axis(g, channel[..., None], axis=-1)[..., 0]
    g_safe = jnp.where(jnp.abs(g_c) < EPSILON_FLOAT, 1.0, g_c)
    sqr_term = (1.0 - sqr(g_safe)) / (1.0 - g_safe + 2.0 * g_safe * xi1)
    cos_hg = (1.0 + sqr(g_safe) - sqr(sqr_term)) / (2.0 * g_safe)
    cos_iso_like = 1.0 - 2.0 * xi1
    cos_theta = jnp.where(
        is_hg & (jnp.abs(g_c) >= EPSILON_FLOAT), cos_hg, cos_iso_like
    )
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)

    atten_hg = _hg_value(g, cos_theta)
    pdf_hg = jnp.mean(atten_hg, axis=-1)

    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - sqr(cos_theta)))
    phi = TWO_PI * xi2
    local = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta],
        axis=-1,
    )
    wi_hg = -local_to_world(local, wo)

    wi_iso = sample_sphere_uniform(xi1, xi2)

    wi = jnp.where(is_hg[..., None], wi_hg, wi_iso)
    pdf = jnp.where(is_hg, pdf_hg, INV_FOUR_PI)
    atten = jnp.where(
        is_hg[..., None], atten_hg, jnp.full_like(atten_hg, INV_FOUR_PI)
    )
    valid = pdf >= EPSILON
    return wi, pdf, atten, valid


def eval_phase(tables: MediumTables, mid, wi, wo):
    """Phase value + spectral pdf of `wi` for NEE MIS
    (henyey_greenstein.cpp:46-62, isotropic.cpp:18-23)."""
    row = jnp.maximum(mid, 0)
    is_hg = tables.phase_type[row] == PHASE_HG
    g = tables.g[row]
    cos_theta = dot(-wi, wo)
    atten_hg = _hg_value(g, cos_theta)
    pdf_hg = jnp.mean(atten_hg, axis=-1)
    pdf = jnp.where(is_hg, pdf_hg, INV_FOUR_PI)
    atten = jnp.where(
        is_hg[..., None], atten_hg, jnp.full_like(atten_hg, INV_FOUR_PI)
    )
    valid = pdf >= EPSILON
    return pdf, atten, valid


def empty_medium_tables() -> MediumTables:
    return build_medium_tables([])
