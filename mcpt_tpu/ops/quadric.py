"""Analytic quadric primitives: sphere, disk, finite open cylinder.

The reference intersects these per-thread with virtual dispatch
(csrt src/rtcore/primitives/{sphere,disk,cylinder}.cpp).  The TPU form is
a dense vector sweep: scenes hold a handful of quadrics, so the batch is
tested against every row in a *statically unrolled* loop — each row's
shape kind is a compile-time fact (`quad_kinds` lives in SceneData's
static fields), so every lane runs straight-line VPU math with no
per-lane dispatch, and rows the scene doesn't have cost nothing.

Conventions (matched to the reference):
- sphere: local unit frame holds a sphere of radius `r` at the origin
  (the XML `center` is folded into `to_world` at compile time);
  uv = (phi/2pi, theta/pi) with theta = acos(y), phi = atan2(z, x)
  wrapped to [0, 2pi) — csrt math.cpp:102-118, sphere.cpp:39-41.
- disk: radius 0.5 in the z=0 plane (csrt disk.cpp:30 — NOT Mitsuba's
  unit radius); uv = (r/0.5, phi/2pi) (deviation: csrt's intersect uv
  uses a spherical phi that degenerates to {0, pi} in-plane,
  disk.cpp:38-40, while its sampler uses true polar phi — this
  implementation uses the sampler's convention for both).
- cylinder: radius `r`, axis z in [0, length] (the XML p0/p1 frame is
  folded into `to_world`); uv = (phi/2pi, z/length) (cylinder.cpp:47-49).
- t is re-measured in world units (|hit - origin|) because `to_world`
  may scale (sphere.cpp:32-35).
- `inside` mirrors the reference: sphere/cylinder test the implicit
  function at the ray origin (c < 0, sphere.cpp:49), the disk tests the
  approach side (d_local.z > 0, disk.cpp:48).

Uniform-area emitter sampling (SampleSphere / SampleDisk /
SampleCylinder, same files) samples uniformly in the LOCAL frame; under
a non-uniform `to_world` scale this is only approximately area-uniform
— the same approximation the reference makes.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from mcpt_tpu.ops.math import (
    EPSILON_DISTANCE,
    MAX_FLOAT,
    TWO_PI,
    cross,
    dot,
    normalize,
)

KIND_SPHERE = 0
KIND_DISK = 1
KIND_CYLINDER = 2


@flax.struct.dataclass
class QuadricTables:
    """SoA quadric rows (Q is tiny — a handful per scene)."""

    to_world: jnp.ndarray  # [Q, 4, 4]
    to_local: jnp.ndarray  # [Q, 4, 4]
    nmat: jnp.ndarray      # [Q, 3, 3] inverse-transpose linear part
    params: jnp.ndarray    # [Q, 2] (radius, length) — kind-dependent
    inst_id: jnp.ndarray   # [Q] int32
    sign: jnp.ndarray      # [Q] +1 / -1 (flip_normals)


def empty_quadrics() -> QuadricTables:
    return QuadricTables(
        to_world=jnp.eye(4, dtype=jnp.float32)[None],
        to_local=jnp.eye(4, dtype=jnp.float32)[None],
        nmat=jnp.eye(3, dtype=jnp.float32)[None],
        params=jnp.ones((1, 2), jnp.float32),
        inst_id=jnp.zeros(1, jnp.int32),
        sign=jnp.ones(1, jnp.float32),
    )


def _xform_point(m, p):
    return p @ m[:3, :3].T + m[:3, 3]


def _xform_dir(m, v):
    return v @ m[:3, :3].T


def _solve_quadratic(a, b, c):
    """Stable quadratic roots (csrt math.cpp SolveQuadratic analogue);
    returns (has_roots, t_near, t_far) with masked lanes finite."""
    disc = b * b - 4.0 * a * c
    ok = (disc >= 0.0) & (jnp.abs(a) > 1e-20)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    # q-form avoids catastrophic cancellation for small roots
    # (sign must never be 0 — jnp.sign(0) would zero the q term)
    s = jnp.where(b >= 0.0, 1.0, -1.0)
    q = -0.5 * (b + s * sq)
    q = jnp.where(jnp.abs(q) > 1e-30, q, 1e-30)
    t0 = q / jnp.where(jnp.abs(a) > 1e-30, a, 1e-30)
    t1 = c / q
    return ok, jnp.minimum(t0, t1), jnp.maximum(t0, t1)


def _row_candidate(kind, to_local, to_world, params, o, d):
    """Ray-vs-one-quadric in its local frame.

    Returns (hit, t_world, inside) — all [N], masked lanes finite."""
    ol = _xform_point(to_local, o)
    dl = _xform_dir(to_local, d)
    r = params[0]

    if kind == KIND_SPHERE:
        a = dot(dl, dl)
        b = 2.0 * dot(dl, ol)
        c = dot(ol, ol) - r * r
        ok, t_near, t_far = _solve_quadratic(a, b, c)
        ok = ok & (t_far >= EPSILON_DISTANCE)
        t_l = jnp.where(t_near < EPSILON_DISTANCE, t_far, t_near)
        inside = c < 0.0
    elif kind == KIND_DISK:
        dz = jnp.where(jnp.abs(dl[..., 2]) > 1e-20, dl[..., 2], 1e-20)
        t_l = -ol[..., 2] / dz
        pl = ol + t_l[..., None] * dl
        ok = (t_l > EPSILON_DISTANCE) & (
            dot(pl[..., :2], pl[..., :2]) <= 0.25
        )
        inside = dl[..., 2] > 0.0
    else:  # KIND_CYLINDER
        length = params[1]
        a = dl[..., 0] ** 2 + dl[..., 1] ** 2
        b = 2.0 * (dl[..., 0] * ol[..., 0] + dl[..., 1] * ol[..., 1])
        c = ol[..., 0] ** 2 + ol[..., 1] ** 2 - r * r
        ok, t_near, t_far = _solve_quadratic(a, b, c)
        ok = ok & (t_far >= EPSILON_DISTANCE)
        z_near = ol[..., 2] + dl[..., 2] * t_near
        z_far = ol[..., 2] + dl[..., 2] * t_far
        near_ok = (
            (t_near > EPSILON_DISTANCE) & (z_near >= 0.0) & (z_near <= length)
        )
        far_ok = (z_far >= 0.0) & (z_far <= length)
        t_l = jnp.where(near_ok, t_near, t_far)
        ok = ok & (near_ok | far_ok)
        inside = c < 0.0

    t_l = jnp.where(ok, t_l, 1.0)
    pw = _xform_point(to_world, ol + t_l[..., None] * dl)
    t_w = jnp.sqrt(jnp.maximum(dot(pw - o, pw - o), 1e-30))
    return ok, t_w, inside


def intersect_quadrics(q: QuadricTables, kinds, o, d, t_min, t_max,
                       any_hit: bool = False):
    """Sweep the batch over every quadric row (statically unrolled).

    kinds: tuple of (kind:int, opaque:bool) per row — a SceneData static.
    Returns (t [N], idx [N] int32 (-1 = miss), inside [N] bool)."""
    n = o.shape[0]
    best_t = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    # any-hit capped search still returns on first qualifying row; the
    # closest-hit path keeps the min like the dense triangle sweep
    best_idx = jnp.full((n,), -1, jnp.int32)
    best_in = jnp.zeros((n,), bool)
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))

    for i, (kind, opaque) in enumerate(kinds):
        if any_hit and not opaque:
            continue  # null-boundary shells never occlude
        hit, t_w, inside = _row_candidate(
            kind, q.to_local[i], q.to_world[i], q.params[i], o, d
        )
        take = hit & (t_w >= t_min) & (t_w < best_t)
        best_t = jnp.where(take, t_w, best_t)
        best_idx = jnp.where(take, i, best_idx)
        best_in = jnp.where(take, inside, best_in)
    return best_t, best_idx, best_in


def _wrap_phi(y, x):
    phi = jnp.arctan2(y, x)
    return jnp.where(phi < 0.0, phi + TWO_PI, phi)


def quadric_attrs(q: QuadricTables, kinds, idx, pos_w):
    """Shading attributes for lanes whose hit is a quadric.

    Computed per row (static loop) and selected by `idx`; the local hit
    point is recovered as to_local @ world position, so no local-t state
    needs to survive traversal.  Returns (normal, tangent, bitangent,
    uv, inst) — outward frame; the caller applies the shared bump +
    inside-flip pipeline (same order as triangles / the reference)."""
    n_l = pos_w.shape[0]
    normal = jnp.zeros((n_l, 3), jnp.float32).at[..., 2].set(1.0)
    tangent = jnp.zeros((n_l, 3), jnp.float32).at[..., 0].set(1.0)
    bitang = jnp.zeros((n_l, 3), jnp.float32).at[..., 1].set(1.0)
    uv = jnp.zeros((n_l, 2), jnp.float32)
    inst = jnp.zeros((n_l,), jnp.int32)

    for i, (kind, _opaque) in enumerate(kinds):
        sel = idx == i
        pl = _xform_point(q.to_local[i], pos_w)
        r = q.params[i, 0]
        if kind == KIND_SPHERE:
            nl = normalize(pl)
            theta = jnp.arccos(jnp.clip(nl[..., 1], -1.0, 1.0))
            phi = _wrap_phi(nl[..., 2], nl[..., 0])
            uv_i = jnp.stack([phi / TWO_PI, theta / jnp.pi], -1)
            # dP/dtheta in the y-up frame (sphere.cpp:55-64 jitter form,
            # here exact): P = r (sin t cos p, cos t, sin t sin p)
            sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
            cos_p, sin_p = jnp.cos(phi), jnp.sin(phi)
            bit_l = jnp.stack([cos_t * cos_p, -sin_t, cos_t * sin_p], -1)
            n_w = normalize(nl @ q.nmat[i].T)
            b_w = normalize(_xform_dir(q.to_world[i], bit_l))
        elif kind == KIND_DISK:
            rad = jnp.sqrt(
                jnp.maximum(dot(pl[..., :2], pl[..., :2]), 1e-30)
            )
            phi = _wrap_phi(pl[..., 1], pl[..., 0])
            uv_i = jnp.stack([rad / 0.5, phi / TWO_PI], -1)
            # u = r: tangent = dP/dr (radial); bitangent azimuthal
            tan_l = jnp.stack(
                [pl[..., 0], pl[..., 1], jnp.zeros_like(rad)], -1
            ) / rad[..., None]
            # normalize at scalar level THEN broadcast: a zero-variance
            # per-lane normalize chain trips the remote compiler's
            # fusion cost model (see sample_quadric_row disk note)
            n_w = jnp.broadcast_to(normalize(q.nmat[i][:, 2]), pl.shape)
            b_w = normalize(cross(n_w, _xform_dir(q.to_world[i], tan_l)))
        else:  # KIND_CYLINDER
            length = q.params[i, 1]
            phi = _wrap_phi(pl[..., 1], pl[..., 0])
            uv_i = jnp.stack([phi / TWO_PI, pl[..., 2] / length], -1)
            nl = jnp.stack(
                [pl[..., 0], pl[..., 1], jnp.zeros_like(phi)], -1
            ) / jnp.maximum(r, 1e-12)
            n_w = normalize(nl @ q.nmat[i].T)
            # tangent along the axis (cylinder.cpp:67-69)
            axis_w = jnp.broadcast_to(
                normalize(q.nmat[i][:, 2]), pl.shape
            )
            b_w = normalize(cross(n_w, axis_w))

        n_w = n_w * q.sign[i]
        t_w = normalize(cross(b_w, n_w))
        b_w = normalize(cross(n_w, t_w))

        m = sel[..., None]
        normal = jnp.where(m, n_w, normal)
        tangent = jnp.where(m, t_w, tangent)
        bitang = jnp.where(m, b_w, bitang)
        uv = jnp.where(m, uv_i, uv)
        inst = jnp.where(sel, q.inst_id[i], inst)
    return normal, tangent, bitang, uv, inst


def sample_quadric_row(q: QuadricTables, i: int, kind: int, xi0, xi1):
    """Uniform (local-frame) surface sample of one emissive quadric row
    (SampleSphere sphere.cpp:90-106, SampleDisk disk.cpp:112-142,
    SampleCylinder cylinder.cpp:92-105).

    Returns (position [N,3], normal [N,3], uv [N,2])."""
    r = q.params[i, 0]
    if kind == KIND_SPHERE:
        cos_t = 1.0 - 2.0 * xi0
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        phi = TWO_PI * xi1
        nl = jnp.stack(
            [sin_t * jnp.cos(phi), cos_t, sin_t * jnp.sin(phi)], -1
        )
        pl = r * nl
        uv = jnp.stack([xi1, jnp.arccos(jnp.clip(cos_t, -1, 1)) / jnp.pi], -1)
    elif kind == KIND_DISK:
        # polar sqrt warp — exactly area-uniform, same distribution as
        # the reference's concentric map (disk.cpp:115-135), but branch-
        # and division-free: the concentric map's select/divide mix
        # SIGILLs the axon remote TPU compiler (round-1 bisect —
        # `row_disk` probe; only the stratification mapping differs)
        rr = jnp.sqrt(jnp.maximum(xi0, 0.0))
        phi = TWO_PI * xi1
        pl = jnp.stack(
            [0.5 * rr * jnp.cos(phi), 0.5 * rr * jnp.sin(phi),
             jnp.zeros_like(rr)], -1
        )
        uv = jnp.stack([rr, xi1], -1)
        # the disk normal is CONSTANT: fold the frame transform at
        # scalar level and broadcast the result, instead of pushing a
        # broadcast [0,0,1] through a per-lane matmul+normalize.  The
        # zero-variance per-lane chain is also the round-2 bisected
        # trigger of the axon remote compiler's priority-fusion
        # cost-model SIGILL (mercury/rough_diffuse.xml — see PARITY.md);
        # [0,0,1] @ nmat.T is just nmat's third column.
        pos = _xform_point(q.to_world[i], pl)
        nrm = jnp.broadcast_to(
            normalize(q.nmat[i][:, 2]) * q.sign[i], pl.shape
        )
        return pos, nrm, uv
    else:  # KIND_CYLINDER
        length = q.params[i, 1]
        phi = TWO_PI * xi0
        z = xi1 * length
        nl = jnp.stack([jnp.cos(phi), jnp.sin(phi), jnp.zeros_like(phi)], -1)
        pl = jnp.stack([r * nl[..., 0], r * nl[..., 1], z], -1)
        uv = jnp.stack([xi0, xi1], -1)

    pos = _xform_point(q.to_world[i], pl)
    nrm = normalize(nl @ q.nmat[i].T) * q.sign[i]
    return pos, nrm, uv


def build_quadric_tables(rows) -> QuadricTables:
    """Host-side table build.  `rows` = list of dicts with keys
    kind, to_world (4x4), params (2,), inst_id, flip."""
    if not rows:
        return empty_quadrics()
    tw = np.stack([r["to_world"] for r in rows]).astype(np.float32)
    tl = np.stack(
        [np.linalg.inv(r["to_world"]) for r in rows]
    ).astype(np.float32)
    nm = np.stack(
        [np.linalg.inv(r["to_world"][:3, :3]).T for r in rows]
    ).astype(np.float32)
    pa = np.stack([np.asarray(r["params"], np.float32) for r in rows])
    ii = np.array([r["inst_id"] for r in rows], np.int32)
    sg = np.array(
        [-1.0 if r.get("flip") else 1.0 for r in rows], np.float32
    )
    return QuadricTables(
        to_world=jnp.asarray(tw),
        to_local=jnp.asarray(tl),
        nmat=jnp.asarray(nm),
        params=jnp.asarray(pa),
        inst_id=jnp.asarray(ii),
        sign=jnp.asarray(sg),
    )
