"""Texture system: SoA tables + one packed atlas buffer.

The reference makes *every* scalar BSDF parameter a texture id and
concatenates all bitmap pixels into one flat device buffer with offsets
(csrt renderer.cpp:371-431 CommitTextures).  We keep exactly that layout —
it is already the TPU-friendly one — and evaluate with masked selection
over the three texture kinds (constant / checkerboard / bitmap,
csrt texture.hpp:13-43) instead of switch dispatch.

All lookups are differentiable w.r.t. `color0/color1/atlas`, which is what
makes the whole estimator differentiable in material & texture space.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from mcpt_tpu.ops.math import lerp, take_rows

TEX_NONE = 0
TEX_CONSTANT = 1
TEX_CHECKERBOARD = 2
TEX_BITMAP = 3


@flax.struct.dataclass
class TextureTables:
    ttype: jnp.ndarray          # [T] int32
    color0: jnp.ndarray         # [T, 3] constant color / checker color0
    color1: jnp.ndarray         # [T, 3] checker color1
    uv_transform: jnp.ndarray   # [T, 6] affine (u' = a*u + b*v + c, v' = d*u + e*v + f)
    bmp_offset: jnp.ndarray     # [T] int32 texel-row offset into atlas
    bmp_width: jnp.ndarray      # [T] int32
    bmp_height: jnp.ndarray     # [T] int32
    bmp_channels: jnp.ndarray   # [T] int32 source channel count (1, 3, 4)
    #: [P, 4] float32 — one RGBA row per texel (mono replicated to RGB,
    #: alpha = 1 unless the source had one).  A texel fetch is ONE row
    #: gather; the previous flat layout needed 3 channel gathers per
    #: texel (12 per bilinear) and per-lane gathers cost ~0.85 ms at 64k
    #: lanes on a v5e regardless of table size (scripts/gather_probe.py).
    atlas: jnp.ndarray
    #: static set of texture kinds present in the scene — evaluation
    #: compiles ONLY the branches a scene uses (the bitmap branch is 12
    #: serialized per-lane atlas gathers; an all-constant scene like
    #: cornell must never pay for it).  Same pattern as the BSDF
    #: dispatcher's `present_types`.
    kinds: tuple = flax.struct.field(
        pytree_node=False, default=(TEX_CONSTANT, TEX_CHECKERBOARD, TEX_BITMAP)
    )


class TextureBuilder:
    """Host-side accumulator mirroring csrt's CommitTextures."""

    def __init__(self):
        self.infos = []  # dicts
        self.atlas_parts = []
        self.atlas_size = 0

    def add_constant(self, color) -> int:
        color = np.broadcast_to(np.asarray(color, np.float32), (3,))
        self.infos.append(dict(type=TEX_CONSTANT, color0=color))
        return len(self.infos) - 1

    def add_checkerboard(self, color0, color1, uv_transform=None) -> int:
        self.infos.append(
            dict(
                type=TEX_CHECKERBOARD,
                color0=np.broadcast_to(np.asarray(color0, np.float32), (3,)),
                color1=np.broadcast_to(np.asarray(color1, np.float32), (3,)),
                uv_transform=uv_transform,
            )
        )
        return len(self.infos) - 1

    def add_bitmap(self, pixels: np.ndarray, uv_transform=None) -> int:
        """`pixels`: [H, W] or [H, W, C] float32 linear-light.  Packed
        as one RGBA row per texel (mono -> replicated RGB, alpha 1)."""
        pixels = np.asarray(pixels, np.float32)
        if pixels.ndim == 2:
            pixels = pixels[..., None]
        h, w, c = pixels.shape
        rows = np.ones((h * w, 4), np.float32)
        flat = pixels.reshape(h * w, c)
        if c == 1:
            rows[:, 0:3] = flat
        else:
            rows[:, 0:c] = flat
        self.infos.append(
            dict(
                type=TEX_BITMAP,
                offset=self.atlas_size,
                width=w,
                height=h,
                channels=c,
                uv_transform=uv_transform,
                part=len(self.atlas_parts),
            )
        )
        self.atlas_parts.append(rows)
        self.atlas_size += h * w
        return len(self.infos) - 1

    def bitmap_pixels(self, tid: int) -> np.ndarray:
        """Host-side [H, W, C] pixels of a registered bitmap (for envmap
        alias builds, cf. csrt CreateEnvMapCdfPdf's host read)."""
        info = self.infos[tid]
        assert info["type"] == TEX_BITMAP, f"texture {tid} is not a bitmap"
        c = info["channels"]
        rows = self.atlas_parts[info["part"]]
        full = rows.reshape(info["height"], info["width"], 4)
        return full[..., :1] if c == 1 else full[..., :c]

    def build(self) -> TextureTables:
        t = max(len(self.infos), 1)
        ttype = np.zeros(t, np.int32)
        color0 = np.zeros((t, 3), np.float32)
        color1 = np.zeros((t, 3), np.float32)
        uv_tf = np.tile(
            np.array([1, 0, 0, 0, 1, 0], np.float32), (t, 1)
        )
        offset = np.zeros(t, np.int32)
        width = np.ones(t, np.int32)
        height = np.ones(t, np.int32)
        channels = np.ones(t, np.int32)
        for i, info in enumerate(self.infos):
            ttype[i] = info["type"]
            if "color0" in info:
                color0[i] = info["color0"]
            if "color1" in info:
                color1[i] = info["color1"]
            if info.get("uv_transform") is not None:
                uv_tf[i] = np.asarray(info["uv_transform"], np.float32).reshape(6)
            if info["type"] == TEX_BITMAP:
                offset[i] = info["offset"]
                width[i] = info["width"]
                height[i] = info["height"]
                channels[i] = info["channels"]
        atlas = (
            np.concatenate(self.atlas_parts)
            if self.atlas_parts
            else np.zeros((1, 4), np.float32)
        )
        return TextureTables(
            ttype=jnp.asarray(ttype),
            color0=jnp.asarray(color0),
            color1=jnp.asarray(color1),
            uv_transform=jnp.asarray(uv_tf),
            bmp_offset=jnp.asarray(offset),
            bmp_width=jnp.asarray(width),
            bmp_height=jnp.asarray(height),
            bmp_channels=jnp.asarray(channels),
            atlas=jnp.asarray(atlas),
            kinds=tuple(sorted({info["type"] for info in self.infos})),
        )


def _apply_uv(tf, uv):
    u = tf[..., 0] * uv[..., 0] + tf[..., 1] * uv[..., 1] + tf[..., 2]
    v = tf[..., 3] * uv[..., 0] + tf[..., 4] * uv[..., 1] + tf[..., 5]
    return u, v


def _bitmap_bilinear4(tex: TextureTables, tid, u, v):
    """Wrap-around bilinear RGBA fetch from the packed atlas
    (csrt src/renderer/textures/bitmap.cpp:6-56): four [N, 4] row
    gathers — one per corner texel."""
    w = take_rows(tex.bmp_width, tid)
    h = take_rows(tex.bmp_height, tid)
    off = take_rows(tex.bmp_offset, tid)
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)

    x = u * wf
    y = v * hf
    x = x - jnp.floor(x / wf) * wf
    y = y - jnp.floor(y / hf) * hf
    x0 = jnp.clip(x.astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(y.astype(jnp.int32), 0, h - 1)
    tx = x - x0.astype(jnp.float32)
    ty = y - y0.astype(jnp.float32)
    x1 = jnp.where(x0 + 1 >= w, 0, x0 + 1)
    y1 = jnp.where(y0 + 1 >= h, 0, y0 + 1)

    def texel(xi, yi):
        # take_rows: tiny atlases (<=512 texels, e.g. fallback 1x1
        # bitmaps) become a one-hot contraction — a plain row gather
        # there measured 2x slower end-to-end on mercury
        return take_rows(tex.atlas, off + xi + w * yi)  # [N, 4]

    c00 = texel(x0, y0)
    c01 = texel(x0, y1)
    c10 = texel(x1, y0)
    c11 = texel(x1, y1)
    tx = tx[..., None]
    ty = ty[..., None]
    return lerp(lerp(c00, c01, ty), lerp(c10, c11, ty), tx)


def _bitmap_bilinear(tex: TextureTables, tid, u, v):
    return _bitmap_bilinear4(tex, tid, u, v)[..., :3]


def _bitmap_alpha(tex: TextureTables, tid, u, v):
    """Bilinear alpha for opacity masks (csrt bitmap.cpp:73-101); the
    packed atlas stores alpha 1 for non-RGBA sources."""
    return _bitmap_bilinear4(tex, tid, u, v)[..., 3]


def eval_color(tex: TextureTables, tid, uv):
    """Evaluate texture `tid` at `uv`.  `tid`: [...] int32, `uv`: [..., 2].
    Returns [..., 3].  Masked evaluation over the kinds the scene
    actually contains (`tex.kinds`, static): an all-constant scene
    compiles to one one-hot table contraction — no UV math, no atlas
    gathers."""
    tid = jnp.clip(tid, 0, tex.ttype.shape[0] - 1)
    const_c = take_rows(tex.color0, tid)
    needs_uv = (TEX_CHECKERBOARD in tex.kinds) or (TEX_BITMAP in tex.kinds)
    if not needs_uv:
        return const_c

    tf = take_rows(tex.uv_transform, tid)
    u, v = _apply_uv(tf, uv)
    ttype = take_rows(tex.ttype, tid)
    out = jnp.where((ttype == TEX_CONSTANT)[..., None], const_c, 0.0)

    if TEX_CHECKERBOARD in tex.kinds:
        # checkerboard (csrt checkboard.cpp:6-22)
        uw = u - jnp.floor(u)
        vw = v - jnp.floor(v)
        cx = 2 * ((uw * 2).astype(jnp.int32) % 2) - 1
        cy = 2 * ((vw * 2).astype(jnp.int32) % 2) - 1
        checker_c = jnp.where(
            ((cx * cy) == 1)[..., None], const_c, take_rows(tex.color1, tid)
        )
        out = jnp.where((ttype == TEX_CHECKERBOARD)[..., None], checker_c, out)

    if TEX_BITMAP in tex.kinds:
        bitmap_c = _bitmap_bilinear(tex, tid, u, v)
        out = jnp.where((ttype == TEX_BITMAP)[..., None], bitmap_c, out)
    return out


def eval_scalar(tex: TextureTables, tid, uv):
    """First channel of :func:`eval_color` (roughness etc.)."""
    return eval_color(tex, tid, uv)[..., 0]


def eval_gradient(tex: TextureTables, tid, uv):
    """Forward-difference gradient of texel luminance-length for bump maps
    (csrt bitmap.cpp:58-68)."""
    delta = 1e-4
    norm = 1.0 / delta
    base = jnp.linalg.norm(eval_color(tex, tid, uv), axis=-1)
    du = jnp.linalg.norm(
        eval_color(tex, tid, uv + jnp.asarray([delta, 0.0], jnp.float32)), axis=-1
    )
    dv = jnp.linalg.norm(
        eval_color(tex, tid, uv + jnp.asarray([0.0, delta], jnp.float32)), axis=-1
    )
    return jnp.stack([(du - base) * norm, (dv - base) * norm], axis=-1)


def eval_opacity(tex: TextureTables, tid, uv):
    """Opacity in [0,1]: constant → color.x, RGBA bitmap → alpha channel
    (csrt constant_texture.cpp:20-24, bitmap.cpp:73-101)."""
    tid = jnp.clip(tid, 0, tex.ttype.shape[0] - 1)
    ttype = take_rows(tex.ttype, tid)
    alpha = jnp.ones(tid.shape, jnp.float32)
    alpha = jnp.where(
        ttype == TEX_CONSTANT, take_rows(tex.color0, tid)[..., 0], alpha
    )
    if TEX_BITMAP in tex.kinds:
        tf = take_rows(tex.uv_transform, tid)
        u, v = _apply_uv(tf, uv)
        alpha = jnp.where(
            ttype == TEX_BITMAP, _bitmap_alpha(tex, tid, u, v), alpha
        )
    return alpha
