"""GGX microfacet library (csrt src/renderer/bsdfs/microfacet.cpp).

Anisotropic GGX NDF sampling/pdf and the Smith G1 masking term, plus
Schlick Fresnel.  Everything batched; the isotropic entry points are the
anisotropic ones with alpha_u == alpha_v (they reduce to the same math).
"""

from __future__ import annotations

import jax.numpy as jnp

from mcpt_tpu.ops.math import PI, TWO_PI, sqr


def sample_ggx(xi0, xi1, alpha_u, alpha_v):
    """Sample a microfacet normal from the anisotropic GGX NDF
    (microfacet.cpp:20-37).  Returns (h_local, D*cos pdf)."""
    # phi warped by the anisotropy (Mitsuba convention)
    phi = jnp.arctan(alpha_v / alpha_u * jnp.tan(PI + TWO_PI * xi1)) + PI * jnp.floor(
        2.0 * xi1 + 0.5
    )
    cos_phi, sin_phi = jnp.cos(phi), jnp.sin(phi)
    alpha_2 = 1.0 / jnp.maximum(sqr(cos_phi / alpha_u) + sqr(sin_phi / alpha_v), 1e-20)
    xi0 = jnp.minimum(xi0, 1.0 - 1e-6)
    tan_theta_2 = alpha_2 * xi0 / (1.0 - xi0)
    cos_theta = 1.0 / jnp.sqrt(1.0 + tan_theta_2)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - sqr(cos_theta)))
    h = jnp.stack([sin_theta * cos_phi, sin_theta * sin_phi, cos_theta], axis=-1)
    pdf = 1.0 / jnp.maximum(
        PI * alpha_u * alpha_v * cos_theta**3 * sqr(1.0 + tan_theta_2 / alpha_2),
        1e-20,
    )
    return h, pdf


def pdf_ggx(alpha_u, alpha_v, h_local):
    """NDF-sampling pdf of microfacet normal `h_local`
    (microfacet.cpp:52-62); zero below the horizon."""
    cos_theta = h_local[..., 2]
    cos_theta_2 = sqr(cos_theta)
    denom = PI * alpha_u * alpha_v * sqr(
        sqr(h_local[..., 0] / alpha_u) + sqr(h_local[..., 1] / alpha_v) + cos_theta_2
    )
    pdf = cos_theta / jnp.maximum(denom, 1e-20)
    return jnp.where(cos_theta > 0.0, pdf, 0.0)


def smith_g1(alpha_u, alpha_v, v_local, h_local):
    """Smith G1 masking-shadowing for GGX (microfacet.cpp:76-86)."""
    n_dot_v = v_local[..., 2]
    xy_alpha_2 = sqr(alpha_u * v_local[..., 0]) + sqr(alpha_v * v_local[..., 1])
    tan_theta_2 = xy_alpha_2 / jnp.maximum(sqr(n_dot_v), 1e-20)
    g = 2.0 / (1.0 + jnp.sqrt(1.0 + tan_theta_2))
    return jnp.where(n_dot_v * h_local[..., 2] > 0.0, g, 0.0)


def sample_beckmann(xi0, xi1, alpha_u, alpha_v):
    """Sample a microfacet normal from the anisotropic Beckmann NDF
    (archive ndfs/beckmann.cpp:8-30).  Returns (h_local, pdf = D*cos)."""
    phi = jnp.arctan(
        alpha_v / alpha_u * jnp.tan(PI + TWO_PI * xi1)
    ) + PI * jnp.floor(2.0 * xi1 + 0.5)
    cos_phi, sin_phi = jnp.cos(phi), jnp.sin(phi)
    alpha_2 = 1.0 / jnp.maximum(
        sqr(cos_phi / alpha_u) + sqr(sin_phi / alpha_v), 1e-20
    )
    xi0 = jnp.minimum(xi0, 1.0 - 1e-6)
    cos_theta = 1.0 / jnp.sqrt(
        jnp.maximum(1.0 - alpha_2 * jnp.log1p(-xi0), 1e-12)
    )
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - sqr(cos_theta)))
    h = jnp.stack([sin_theta * cos_phi, sin_theta * sin_phi, cos_theta], axis=-1)
    pdf = (1.0 - xi0) / jnp.maximum(
        PI * alpha_u * alpha_v * cos_theta**3, 1e-20
    )
    return h, pdf


def pdf_beckmann(alpha_u, alpha_v, h_local):
    """Beckmann NDF-sampling pdf of `h_local`
    (archive beckmann.cpp:33-52)."""
    cos_theta = h_local[..., 2]
    cos_theta_2 = jnp.maximum(sqr(cos_theta), 1e-12)
    cos_theta_3 = cos_theta_2 * jnp.maximum(cos_theta, 1e-12)
    expo = (sqr(h_local[..., 0] / alpha_u) + sqr(h_local[..., 1] / alpha_v)) / cos_theta_2
    pdf = jnp.exp(-expo) / jnp.maximum(
        PI * alpha_u * alpha_v * cos_theta_3, 1e-20
    )
    return jnp.where(cos_theta > 0.0, pdf, 0.0)


def smith_g1_beckmann(alpha_u, alpha_v, v_local, h_local):
    """Beckmann Smith G1 with the rational fit (archive beckmann.cpp:55-96)."""
    n_dot_v = v_local[..., 2]
    xy_alpha_2 = sqr(alpha_u * v_local[..., 0]) + sqr(alpha_v * v_local[..., 1])
    tan_theta_2 = xy_alpha_2 / jnp.maximum(sqr(n_dot_v), 1e-20)
    a = 1.0 / jnp.sqrt(jnp.maximum(tan_theta_2, 1e-20))
    a2 = sqr(a)
    g = jnp.where(
        a < 1.6,
        (3.535 * a + 2.181 * a2) / (1.0 + 2.276 * a + 2.577 * a2),
        1.0,
    )
    return jnp.where(n_dot_v * h_local[..., 2] > 0.0, g, 0.0)


def fresnel_dielectric(cos_i, eta_inv):
    """Exact dielectric Fresnel for the clear-coat layer
    (archive math/sample.cpp FresnelDielectric semantics):
    `cos_i` >= 0 against the interface normal, `eta_inv` = n_i/n_t."""
    sin_t_2 = sqr(eta_inv) * (1.0 - sqr(cos_i))
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t_2))
    r_s = (eta_inv * cos_i - cos_t) / jnp.maximum(eta_inv * cos_i + cos_t, 1e-12)
    r_p = (cos_i - eta_inv * cos_t) / jnp.maximum(cos_i + eta_inv * cos_t, 1e-12)
    f = 0.5 * (sqr(r_s) + sqr(r_p))
    return jnp.where(sin_t_2 >= 1.0, 1.0, f)


def fresnel_schlick(cos_theta, reflectivity):
    """Schlick's approximation (microfacet.hpp:25-29).

    `reflectivity` may be scalar [...] or RGB [..., 3]; `cos_theta` [...].
    """
    ct = jnp.clip(cos_theta, 0.0, 1.0)
    pow5 = (1.0 - ct) ** 5
    if jnp.ndim(reflectivity) > jnp.ndim(ct):
        pow5 = pow5[..., None]
    return (1.0 - reflectivity) * pow5 + reflectivity


def _average_fresnel_scalar_poly(eta, xp):
    """Scalar average Fresnel fits (csrt bsdf.cpp:10-38):
    Egan–Hilgeman for eta < 1, d'Eon–Irving otherwise."""
    lo = -1.4399 * eta**2 + 0.7099 * eta + 0.6681 + 0.0636 / eta
    ie = 1.0 / eta
    hi = (
        0.919317
        - 3.4793 * ie
        + 6.75335 * ie**2
        - 7.80989 * ie**3
        + 4.98554 * ie**4
        - 1.36881 * ie**5
    )
    return xp.where(eta < 1.0, lo, hi)


def average_fresnel_scalar(eta):
    """Host-side numpy evaluation of the scalar average-Fresnel fit."""
    import numpy as np

    return _average_fresnel_scalar_poly(
        np.asarray(eta, np.float32), np
    ).astype(np.float32)


def average_fresnel_scalar_jnp(eta):
    """Traced (differentiable) scalar average-Fresnel fit — used when
    `eta` is a gradient parameter (parallel.shard.apply_params)."""
    return _average_fresnel_scalar_poly(jnp.asarray(eta, jnp.float32), jnp)


def _average_fresnel_rgb_poly(r, g):
    """Gulbrandsen-parametrized average Fresnel fit for conductors
    (csrt bsdf.cpp:40-51) — pure polynomial, numpy/jnp agnostic."""
    return (
        0.087237
        + 0.0230685 * g
        - 0.0864902 * g**2
        + 0.0774594 * g**3
        + 0.782654 * r
        - 0.136432 * r**2
        + 0.278708 * r**3
        + 0.19744 * g * r
        + 0.0360605 * g**2 * r
        - 0.2586 * g * r**2
    )


def average_fresnel_rgb(reflectivity, edgetint):
    """Host-side numpy evaluation of the conductor average-Fresnel fit."""
    import numpy as np

    r = np.asarray(reflectivity, np.float32)
    g = np.asarray(edgetint, np.float32)
    return _average_fresnel_rgb_poly(r, g).astype(np.float32)


def average_fresnel_rgb_jnp(reflectivity, edgetint):
    """Traced (differentiable) conductor average-Fresnel fit."""
    return _average_fresnel_rgb_poly(
        jnp.asarray(reflectivity, jnp.float32),
        jnp.asarray(edgetint, jnp.float32),
    )
