"""Primitive intersection kernels (csrt src/rtcore/primitives/*).

Batched Möller–Trumbore triangle tests and AABB slab tests.  Triangles
are stored SoA as (p0, e1, e2) with e1 = p1 - p0, e2 = p2 - p0 so the
hot loop needs only 9 floats per candidate.

Sign conventions match the reference exactly:
  * `det_inv < 0` ⇒ hit the back face (`inside`, triangle.cpp:120)
  * barycentrics (u, v, w) weight vertices (0, 1, 2); u = 1 - v - w
    (triangle.cpp:88-113).
"""

from __future__ import annotations

import jax.numpy as jnp

from mcpt_tpu.ops.math import EPSILON_DISTANCE, MAX_FLOAT, cross, dot


def intersect_triangle(o, d, p0, e1, e2, t_min, t_max):
    """Möller–Trumbore.  All args broadcast; returns (hit, t, v, w, det_inv).

    `v`/`w` are the barycentric weights of vertices 1 and 2.
    """
    pvec = cross(d, e2)
    det = dot(e1, pvec)
    det_inv = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    tvec = o - p0
    v = dot(tvec, pvec) * det_inv
    qvec = cross(tvec, e1)
    w = dot(d, qvec) * det_inv
    t = dot(e2, qvec) * det_inv
    hit = (
        (v >= 0.0)
        & (v <= 1.0)
        & (w >= 0.0)
        & (v + w <= 1.0)
        & (t >= t_min)
        & (t <= t_max)
        & (jnp.abs(det) > 1e-20)
    )
    return hit, t, v, w, det_inv


def watertight_setup(d):
    """Per-ray Woop setup: dominant-axis permutation + shear constants
    (csrt src/rtcore/ray.cpp:19-47).  Returns (kx, ky, kz, sx, sy, sz)
    as [..., 1]-broadcastable arrays."""
    ad = jnp.abs(d)
    kz = jnp.argmax(ad, axis=-1)
    kx = (kz + 1) % 3
    ky = (kx + 1) % 3
    # preserve winding: if d[kz] < 0, swap kx/ky
    dz = jnp.take_along_axis(d, kz[..., None], axis=-1)[..., 0]
    swap = dz < 0.0
    kx, ky = jnp.where(swap, ky, kx), jnp.where(swap, kx, ky)
    dx = jnp.take_along_axis(d, kx[..., None], axis=-1)[..., 0]
    dy = jnp.take_along_axis(d, ky[..., None], axis=-1)[..., 0]
    dz = jnp.take_along_axis(d, kz[..., None], axis=-1)[..., 0]
    dz_safe = jnp.where(jnp.abs(dz) < 1e-20, 1e-20, dz)
    return kx, ky, kz, dx / dz_safe, dy / dz_safe, 1.0 / dz_safe


def intersect_triangle_watertight(o, d, p0, p1, p2, t_min, t_max, setup):
    """Woop watertight ray-triangle test (csrt triangle.cpp:23-87,
    "Watertight Ray/Triangle Intersection", Woop et al. 2013).

    `setup` = watertight_setup(d).  Broadcasts like intersect_triangle;
    returns (hit, t, v, w, det) with the same barycentric convention
    (v, w weight vertices 1, 2).  The reference's exact-zero double-
    precision fallback is omitted (f64 is unavailable on TPU); edge-on
    rays fall back to a miss, which the MC estimator absorbs.
    """
    kx, ky, kz, sx, sy, sz = setup

    def shear(p):
        a = p - o
        ax = jnp.take_along_axis(a, kx[..., None], axis=-1)[..., 0]
        ay = jnp.take_along_axis(a, ky[..., None], axis=-1)[..., 0]
        az = jnp.take_along_axis(a, kz[..., None], axis=-1)[..., 0]
        return ax - sx * az, ay - sy * az, az

    ax, ay, az = shear(p0)
    bx, by, bz = shear(p1)
    cx, cy, cz = shear(p2)

    u = cx * by - cy * bx
    v = ax * cy - ay * cx
    w = bx * ay - by * ax
    det = u + v + w
    same_sign = ((u >= 0) & (v >= 0) & (w >= 0)) | (
        (u <= 0) & (v <= 0) & (w <= 0)
    )
    det_safe = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    t = (u * az + v * bz + w * cz) * sz / det_safe
    hit = (
        same_sign
        & (jnp.abs(det) > 1e-20)
        & (t >= t_min)
        & (t <= t_max)
    )
    inv = 1.0 / det_safe
    # barycentric of vertices 1, 2 (u weights vertex 0)
    return hit, t, v * inv, w * inv, det


def intersect_aabb(o, d_rcp, box_min, box_max, t_min, t_max):
    """Slab test handling negative directions (csrt aabb.cpp:29-47).

    Returns (hit, t_enter).  `t_enter` is used for near-child ordering.
    """
    lo = (box_min - o) * d_rcp
    hi = (box_max - o) * d_rcp
    t_near = jnp.minimum(lo, hi)
    t_far = jnp.maximum(lo, hi)
    t_enter = jnp.maximum(jnp.max(t_near, axis=-1), t_min)
    t_exit = jnp.minimum(jnp.min(t_far, axis=-1), t_max)
    return t_enter <= t_exit, t_enter


def safe_rcp(d):
    """Reciprocal direction that avoids inf*0 NaNs in the slab test."""
    return 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)
