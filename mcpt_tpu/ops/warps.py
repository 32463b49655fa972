"""Sampling warps (csrt src/utils/math.cpp:15-55).

All warps map uniform samples in [0,1)^2 to directions in a z-up local
frame, batched over leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp

from mcpt_tpu.ops.math import INV_PI, PI, TWO_PI, sqr


def sample_cone_uniform(cos_cutoff, xi0, xi1):
    """Uniform direction in a cone around +z (math.cpp:15-22)."""
    cos_theta = 1.0 - (1.0 - cos_cutoff) * xi0
    phi = TWO_PI * xi1
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - sqr(cos_theta)))
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def sample_sphere_uniform(xi0, xi1):
    """Uniform direction on the sphere (math.cpp:24-29); pdf = 1/4pi."""
    cos_theta = 1.0 - 2.0 * xi0
    phi = TWO_PI * xi1
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - sqr(cos_theta)))
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def sample_hemisphere_cosine(xi0, xi1):
    """Cosine-weighted hemisphere sample around +z (math.cpp:31-38).

    Returns (direction, pdf) with pdf = cos_theta / pi.
    """
    cos_theta = jnp.sqrt(xi0)
    phi = TWO_PI * xi1
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - sqr(cos_theta)))
    vec = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )
    return vec, INV_PI * cos_theta


def sample_triangle_uniform(xi0, xi1):
    """sqrt-warp uniform barycentric coords (csrt triangle.cpp:150-160).

    Returns (w, u, v) barycentric weights for vertices (0, 1, 2) matching
    the reference's Lerp(data, w, u, v) ordering.
    """
    temp = jnp.sqrt(jnp.maximum(0.0, 1.0 - xi0))
    u = 1.0 - temp
    v = temp * xi1
    w = 1.0 - u - v
    return w, u, v


def searchsorted_cdf(cdf, target):
    """Find the CDF cell containing `target` (csrt BinarySearch,
    math.cpp:40-55, which returns the first index with cdf[i] >= target;
    callers subtract 1 to get the cell).

    `cdf`: [..., K] inclusive prefix (cdf[0] == 0, cdf[-1] == 1).
    `target`: [...] sample.  Returns the cell index in [0, K-2].

    Small K uses a branch-free linear scan (one fused [..., K]
    comparison).  Large 1-D CDFs use a real binary search: the linear
    scan materializes an [N, K] intermediate in HBM, which for a
    4k-entry envmap row CDF at 64k lanes is ~1 GB of traffic per call
    — measured as the dominant cost of every envmap scene (matpreview
    family 30x slower than cornell before this change).
    """
    k = cdf.shape[-1]
    if cdf.ndim == 1 and k > 64:
        return _searchsorted_binary(lambda mid: jnp.take(cdf, mid),
                                    k, target)
    idx = jnp.sum((cdf < target[..., None]).astype(jnp.int32), axis=-1)
    return jnp.clip(idx - 1, 0, k - 2)


def searchsorted_cdf_rows(cdf2d, rows, target):
    """Per-lane CDF cell search within row `rows[i]` of `cdf2d` [H, K].

    Equivalent to `searchsorted_cdf(cdf2d[rows], target)` WITHOUT
    materializing the [N, K] row gather (for an envmap column CDF that
    gather alone is N*K floats — gigabytes at production lane counts).
    Each binary-search step is one N-element gather.
    """
    k = cdf2d.shape[-1]
    return _searchsorted_binary(
        lambda mid: cdf2d[rows, jnp.minimum(mid, k - 1)], k, target
    )


def _searchsorted_binary(lookup, k, target):
    """Shared lower-bound loop: first index i with cdf[i] >= target,
    minus one, clipped to a valid cell.  `lookup(mid)` returns cdf
    values at per-lane positions `mid` (shape of `target`)."""
    lo = jnp.zeros(target.shape, jnp.int32)
    hi = jnp.full(target.shape, k, jnp.int32)
    for _ in range(int(k).bit_length()):
        live = lo < hi
        mid = (lo + hi) >> 1
        v = lookup(mid)
        right = (v < target) & live
        lo = jnp.where(right, mid + 1, lo)
        hi = jnp.where(live & ~right, mid, hi)
    return jnp.clip(lo - 1, 0, k - 2)
