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
