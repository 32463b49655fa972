"""Vector math kit (L0 tensor layer equivalent).

The reference implements Vec2/Vec3/Vec4/Mat4 as scalar classes
(include/csrt/tensor/*.hpp).  On TPU the natural representation is
plain jnp arrays with a trailing component axis: points/vectors are
`[..., 3]`, 4x4 transforms are `[4, 4]`.  Everything here broadcasts
over arbitrary leading batch dims so one call shades a whole wavefront.
"""

from __future__ import annotations

import jax.numpy as jnp

# Constants (csrt include/csrt/utils/math.hpp:15-22)
PI = 3.141592653589793
TWO_PI = 2.0 * PI
INV_PI = 1.0 / PI
INV_TWO_PI = 1.0 / TWO_PI
INV_FOUR_PI = 1.0 / (4.0 * PI)
MAX_FLOAT = 3.4028235e38
EPSILON = 0.01            # csrt kEpsilon (defs.hpp:25) — pdf/throughput cutoff
EPSILON_FLOAT = 1.1920929e-7   # csrt kEpsilonFloat = FLT_EPSILON
EPSILON_DISTANCE = 1e-4   # csrt kEpsilonDistance (ray t_min / shadow offset)


def to_radians(deg):
    return deg * (PI / 180.0)


#: Tables at or below this many rows are looked up with a dense one-hot
#: contraction instead of a per-lane gather (TPU gathers serialize; the
#: [N, T] mask product is pure VPU/MXU work).  Scene tables — textures,
#: BSDF rows, instance maps — are tiny, so this covers all of them.
TAKE_ROWS_DENSE_MAX = 512


def take_rows(table, idx):
    """``table[idx]`` without per-lane gathers for small tables.

    table: [T] or [T, C...]; idx: [...] int32 (rows outside [0, T)
    return zeros).  Per-lane dynamic gathers serialize on the TPU VPU
    (round-2 measurement: replacing the emissive-table gathers with a
    one-hot contraction took NEE 1.03 -> 0.57 ms at 64k lanes); for the
    small scene-constant tables the masked [*, T] reduction is far
    faster and differentiable w.r.t. `table`.  Falls back to the plain
    gather above :data:`TAKE_ROWS_DENSE_MAX` rows."""
    t = table.shape[0]
    if t > TAKE_ROWS_DENSE_MAX:
        return table[jnp.clip(idx, 0, t - 1)]
    oh = idx[..., None] == jnp.arange(t, dtype=idx.dtype)
    if table.ndim == 1:
        if table.dtype == jnp.bool_:
            return jnp.any(oh & table, axis=-1)
        return jnp.sum(jnp.where(oh, table, 0), axis=-1)
    flat = table.reshape(t, -1)
    if jnp.issubdtype(table.dtype, jnp.floating):
        # full-precision contraction: the default TPU matmul rounds f32
        # operands to bf16, which would quantize the table VALUES (a
        # one-hot row select must return rows bit-exactly)
        out = jnp.matmul(oh.astype(table.dtype), flat, precision="highest")
    else:
        out = jnp.sum(jnp.where(oh[..., None], flat, 0), axis=-2)
    return out.reshape(idx.shape + table.shape[1:])


def dot(a, b, keepdims: bool = False):
    """Batched dot product over the trailing axis."""
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a, b):
    return jnp.cross(a, b)


def length(v, keepdims: bool = False):
    return jnp.sqrt(jnp.maximum(dot(v, v, keepdims=keepdims), 1e-20))


def normalize(v):
    return v * (1.0 / length(v, keepdims=True))


def sqr(x):
    return x * x


def lerp(a, b, t):
    return (1.0 - t) * a + t * b


def reflect(wi, n):
    """Mirror `wi` about `n` (csrt src/rtcore/ray.cpp:49-52).

    `wi` points *into* the surface; the result points away on the same side.
    """
    return normalize(wi - 2.0 * dot(wi, n, keepdims=True) * n)


def refract(wi, n, eta_inv):
    """Refract `wi` through the interface with normal `n`.

    csrt src/rtcore/ray.cpp:55-69.  `eta_inv` is the relative IOR of the
    incident side over the transmitted side.  Returns `(ok, wt)`; when total
    internal reflection occurs `ok` is False and `wt` is unspecified.
    `eta_inv` may be batched `[...]`.
    """
    eta_inv = jnp.asarray(eta_inv)[..., None]
    cos_theta = jnp.abs(dot(wi, n, keepdims=True))
    k = 1.0 - sqr(eta_inv) * (1.0 - sqr(cos_theta))
    ok = (k >= 0.0)[..., 0]
    k = jnp.maximum(k, 0.0)
    wt = normalize(eta_inv * wi + (eta_inv * cos_theta - jnp.sqrt(k)) * n)
    return ok, wt


def mis_weight(pdf1, pdf2):
    """Power-2 heuristic (csrt src/utils/math.cpp:8-13).

    Computed in ratio form `1 / (1 + (pdf2/pdf1)^2)` so that huge pdfs on
    masked wavefront lanes can't overflow float32 in the squares — inf/inf
    NaNs there would otherwise leak through `jnp.where` in reverse-mode AD.
    """
    # scale-normalized form: the ratio pdf2/pdf1 overflows f32 on masked
    # wavefront lanes (pdf_direct ~ 1e29 over a grazing bsdf pdf), and
    # any inf here turns into 0 * inf = NaN in reverse-mode AD.  Dividing
    # both pdfs by their max keeps every intermediate in [0, 1]; the
    # 1e-15 floor is the smallest value whose SQUARE is still a normal
    # f32 (1e-24's square flushes to zero, making div's backward
    # x1/x2^2 = inf).
    m = jnp.maximum(jnp.maximum(pdf1, pdf2), 1e-15)
    a = sqr(pdf1 / m)
    b = sqr(pdf2 / m)
    return a / jnp.maximum(a + b, 1e-30)


def cartesian_to_spherical(v):
    """Return (theta, phi) with the reference's (right, up=y, front)
    convention: theta measured from +y, phi = atan2(z, x) in [0, 2pi)
    (csrt src/utils/math.cpp:100-118)."""
    v = normalize(v)
    theta = jnp.arccos(jnp.clip(v[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(v[..., 2], v[..., 0])
    phi = jnp.where(phi < 0.0, phi + TWO_PI, phi)
    return theta, phi


def spherical_to_cartesian(theta, phi, r=1.0):
    """Exact inverse of :func:`cartesian_to_spherical`.

    Note: the reference's SphericalToCartesian (math.cpp:121-127) swaps
    x and z relative to its own CartesianToSpherical, making its envmap
    sample/eval texel mappings mutually inconsistent.  We use the
    consistent inverse of the escape-ray mapping (the one that defines
    the visible envmap orientation, csrt envmap.cpp:100-107)."""
    sin_t = jnp.sin(theta)
    return jnp.stack(
        [r * jnp.cos(phi) * sin_t, r * jnp.cos(theta), r * jnp.sin(phi) * sin_t],
        axis=-1,
    )


def local_to_world(local, up):
    """Rotate a z-up local vector into the frame whose +z is `up`
    (csrt src/utils/math.cpp:129-144)."""
    ux, uy, uz = up[..., 0], up[..., 1], up[..., 2]
    len_xz = jnp.sqrt(sqr(ux) + sqr(uz))
    use_xz = len_xz > EPSILON_FLOAT
    inv_xz = 1.0 / jnp.maximum(len_xz, 1e-12)
    len_yz = jnp.sqrt(sqr(uy) + sqr(uz))
    inv_yz = 1.0 / jnp.maximum(len_yz, 1e-12)
    c = jnp.where(
        use_xz[..., None],
        jnp.stack([uz * inv_xz, jnp.zeros_like(ux), -ux * inv_xz], axis=-1),
        jnp.stack([jnp.zeros_like(ux), uz * inv_yz, -uy * inv_yz], axis=-1),
    )
    b = normalize(cross(c, up))
    out = (
        local[..., 0:1] * b + local[..., 1:2] * c + local[..., 2:3] * up
    )
    return normalize(out)


def build_onb(n):
    """Build an orthonormal basis (t, b) around unit normal `n` matching
    local_to_world's frame, so to_world(v) = v.x*t + v.y*b + v.z*n."""
    ux, uy, uz = n[..., 0], n[..., 1], n[..., 2]
    len_xz = jnp.sqrt(sqr(ux) + sqr(uz))
    use_xz = len_xz > EPSILON_FLOAT
    inv_xz = 1.0 / jnp.maximum(len_xz, 1e-12)
    len_yz = jnp.sqrt(sqr(uy) + sqr(uz))
    inv_yz = 1.0 / jnp.maximum(len_yz, 1e-12)
    b = jnp.where(
        use_xz[..., None],
        jnp.stack([uz * inv_xz, jnp.zeros_like(ux), -ux * inv_xz], axis=-1),
        jnp.stack([jnp.zeros_like(ux), uz * inv_yz, -uy * inv_yz], axis=-1),
    )
    t = normalize(cross(b, n))
    return t, b


def to_local(v, t, b, n):
    """Project world vector into the (tangent, bitangent, normal) frame,
    normalized — matches csrt BsdfSampleRec::ToLocal (bsdf.cpp:104-107)."""
    out = jnp.stack([dot(v, t), dot(v, b), dot(v, n)], axis=-1)
    return normalize(out)


def to_world(v, t, b, n):
    """Inverse of :func:`to_local` (bsdf.cpp:109-112)."""
    return normalize(v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n)


def transform_point(m, p):
    """Apply 4x4 row-major transform(s) to point(s). `m`: [..., 4, 4],
    `p`: [..., 3]."""
    ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
    out = jnp.einsum("...ij,...j->...i", m, ph)
    return out[..., :3] / out[..., 3:4]


def transform_vector(m, v):
    """Apply the linear part of a 4x4 transform to direction(s),
    normalized (csrt mat4 TransformVector)."""
    out = jnp.einsum("...ij,...j->...i", m[..., :3, :3], v)
    return normalize(out)


def solve_quadratic(a, b, c):
    """Numerically stable quadratic solve (csrt math.cpp:57-90).

    Returns (ok, x0, x1) with x0 <= x1; `ok` False when no real root.
    Fully vectorized; linear case (a == 0) handled like the reference.
    """
    linear = a == 0.0
    lin_ok = b != 0.0
    lin_x = -c / jnp.where(lin_ok, b, 1.0)

    discrim = sqr(b) - 4.0 * a * c
    quad_ok = discrim >= 0.0
    sqrt_d = jnp.sqrt(jnp.maximum(discrim, 0.0))
    temp = jnp.where(b < 0.0, -0.5 * (b - sqrt_d), -0.5 * (b + sqrt_d))
    safe_a = jnp.where(a == 0.0, 1.0, a)
    safe_temp = jnp.where(temp == 0.0, 1.0, temp)
    q_x0 = temp / safe_a
    q_x1 = c / safe_temp

    x0 = jnp.where(linear, lin_x, jnp.minimum(q_x0, q_x1))
    x1 = jnp.where(linear, lin_x, jnp.maximum(q_x0, q_x1))
    ok = jnp.where(linear, lin_ok, quad_ok)
    return ok, x0, x1
