"""Scene-level intersection: triangles (BVH / dense sweep) merged with
the analytic quadric sweep.

The reference's TLAS walks per-instance BLASes whose leaves virtual-
dispatch on primitive type (csrt tlas.cpp / primitive.cpp:24-58).  Here
the triangle soup and the quadric table are two parallel structures:
the triangle traversal produces its closest hit, the quadric sweep its
own, and the merge is a per-lane min — for scenes without quadrics
(the static common case) the wrapper IS the triangle path, zero cost.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mcpt_tpu.ops.quadric import intersect_quadrics
from mcpt_tpu.ops.traversal import intersect_any, intersect_closest


class SceneHit(NamedTuple):
    """GeomHit plus the quadric row index (-1 = triangle hit / miss)."""

    valid: jnp.ndarray
    t: jnp.ndarray
    prim: jnp.ndarray
    v: jnp.ndarray
    w: jnp.ndarray
    inside: jnp.ndarray
    quad: jnp.ndarray


def scene_closest(scene, o, d, t_min=None, t_max=None,
                  sort_bias=None, coherence=None) -> SceneHit:
    g = intersect_closest(scene.geom, o, d, t_min=t_min, t_max=t_max,
                          sort_bias=sort_bias, coherence=coherence)
    if not scene.quad_kinds:
        return SceneHit(
            valid=g.valid, t=g.t, prim=g.prim, v=g.v, w=g.w,
            inside=g.inside, quad=jnp.full(g.t.shape, -1, jnp.int32),
        )
    from mcpt_tpu.ops.math import EPSILON_DISTANCE, MAX_FLOAT

    lo = EPSILON_DISTANCE if t_min is None else t_min
    hi = MAX_FLOAT if t_max is None else t_max
    qt, qidx, qin = intersect_quadrics(
        scene.quad, scene.quad_kinds, o, d, lo, hi
    )
    qhit = qidx >= 0
    take = qhit & (~g.valid | (qt < g.t))
    return SceneHit(
        valid=g.valid | qhit,
        t=jnp.where(take, qt, g.t),
        prim=jnp.where(take, 0, g.prim),
        v=jnp.where(take, 0.0, g.v),
        w=jnp.where(take, 0.0, g.w),
        inside=jnp.where(take, qin, g.inside),
        quad=jnp.where(take, qidx, -1),
    )


def scene_any(scene, o, d, t_min=None, t_max=None, coherence=None):
    occ = intersect_any(scene.geom, o, d, t_min=t_min, t_max=t_max,
                        coherence=coherence)
    if not scene.quad_kinds:
        return occ
    from mcpt_tpu.ops.math import EPSILON_DISTANCE, MAX_FLOAT

    lo = EPSILON_DISTANCE if t_min is None else t_min
    hi = MAX_FLOAT if t_max is None else t_max
    _, qidx, _ = intersect_quadrics(
        scene.quad, scene.quad_kinds, o, d, lo, hi, any_hit=True
    )
    return occ | (qidx >= 0)
