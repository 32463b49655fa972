"""Kulla-Conty multiple-scattering energy-compensation tables.

The reference precomputes a 128x128 directional-albedo table E(mu, alpha)
and a 128-entry average-albedo table E_avg(alpha) with 1024-sample GGX
quadrature on the host at startup (csrt src/renderer/bsdfs/kulla_conty.cpp:
12-80).  Here the quadrature is one fully-vectorized jitted computation of
shape [R, C, S] — it runs in milliseconds on a TPU core and is cached per
process.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mcpt_tpu.ops import rng
from mcpt_tpu.ops.math import sqr
from mcpt_tpu.ops.microfacet import sample_ggx, smith_g1

LUT_RESOLUTION = 128  # csrt kulla_conty.hpp:9
_N_SAMPLES = 1024


@functools.partial(jax.jit, static_argnums=())
def _compute_tables():
    res = LUT_RESOLUTION
    step = 1.0 / res
    roughness = (jnp.arange(res, dtype=jnp.float32) + 0.5) * step  # [R]
    n_dot_v = (jnp.arange(res, dtype=jnp.float32) + 0.5) * step  # [C]

    # Quadrature nodes shared by every (roughness, mu) cell
    # (kulla_conty.cpp:19-23): xi0 = i/S stratified, xi1 = VdC_2(i).
    i = jnp.arange(_N_SAMPLES, dtype=jnp.uint32)
    xi0 = i.astype(jnp.float32) / _N_SAMPLES  # [S]
    xi1 = rng.van_der_corput_base2(i)  # [S]

    # h: [R, S, 3] — isotropic GGX normals per roughness
    h, _ = sample_ggx(xi0[None, :], xi1[None, :], roughness[:, None], roughness[:, None])

    # View vector points into the surface: V = (-sin, 0, -mu)  [C, 3]
    sin_v = jnp.sqrt(jnp.maximum(0.0, 1.0 - sqr(n_dot_v)))
    v = jnp.stack([-sin_v, jnp.zeros_like(n_dot_v), -n_dot_v], axis=-1)

    # L = reflect(V, H): [R, C, S, 3]
    h_b = h[:, None, :, :]
    v_b = v[None, :, None, :]
    l = v_b - 2.0 * jnp.sum(v_b * h_b, axis=-1, keepdims=True) * h_b
    l = l / jnp.linalg.norm(l, axis=-1, keepdims=True)

    alpha = roughness[:, None, None]
    g = smith_g1(alpha, alpha, -v_b, h_b) * smith_g1(alpha, alpha, l, h_b)
    n_dot_l = l[..., 2]
    n_dot_h = h_b[..., 2]
    h_dot_v = jnp.sum(h_b * (-v_b), axis=-1)
    ok = (n_dot_l > 0.0) & (n_dot_h > 0.0) & (h_dot_v > 0.0)

    contrib = jnp.where(
        ok, (h_dot_v * g) / jnp.maximum(n_dot_v[None, :, None] * n_dot_h, 1e-8), 0.0
    )
    brdf = jnp.minimum(jnp.mean(contrib, axis=-1), 1.0)  # [R, C] = E(mu, alpha)

    albedo_cell = (
        jnp.where(ok, brdf[..., None] * n_dot_l, 0.0).mean(axis=-1) * 2.0
    )  # [R, C]
    albedo_avg = albedo_cell.mean(axis=-1)  # [R]
    return brdf, albedo_avg


@functools.lru_cache(maxsize=1)
def get_tables():
    """Returns (brdf_avg [128,128] indexed [roughness, cos], albedo_avg [128])."""
    brdf, albedo = _compute_tables()
    return jax.device_get(brdf), jax.device_get(albedo)


def _tri_weights(x, res):
    """Triangle-kernel interpolation weights at coordinate `x` in
    [0, res-1]: weight (1-t) at floor(x) and t at floor(x)+1, zero
    elsewhere — a *soft one-hot* row, so a bilinear LUT read becomes a
    dense contraction instead of 4 serialized per-lane gathers (a
    single gather is ~0.85 ms at 64k lanes on a v5e regardless of table
    size — scripts/gather_probe.py — while a [N,128]x[128,128] matmul is
    ~30 us on the MXU)."""
    iota = jnp.arange(res, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - iota))


def lookup_brdf_avg(brdf_avg, cos_theta, roughness):
    """Bilinear LUT lookup, clamped at the top row/col
    (csrt kulla_conty.cpp:82-131), as two soft-one-hot contractions:
    weights_mu @ LUT then a weighted row reduction — MXU work, no
    gathers.  Exactly the separable bilinear of the 4 corner texels."""
    res = LUT_RESOLUTION
    x1 = jnp.clip(roughness * res, 0.0, res - 1.0)
    x2 = jnp.clip(cos_theta * res, 0.0, res - 1.0)
    w1 = _tri_weights(x1, res)                       # [N, R]
    w2 = _tri_weights(x2, res)                       # [N, C]
    tmp = w1 @ brdf_avg                              # [N, C]
    return jnp.sum(tmp * w2, axis=-1)


def lookup_albedo_avg(albedo_avg, roughness):
    """Linear LUT lookup (csrt kulla_conty.cpp:133-143) via one
    soft-one-hot contraction."""
    res = LUT_RESOLUTION
    x = jnp.clip(roughness * res, 0.0, res - 1.0)
    return _tri_weights(x, res) @ albedo_avg
