"""Scene commit: lower the RendererConfig IR to device tables.

Mirrors the reference's Renderer ctor pipeline (csrt renderer.cpp:259-330):
Scene geometry -> area-light CDF -> textures -> BSDFs -> emitters ->
integrator wiring — but builds every array exactly once (the reference's
O(n^2) realloc-append commit is intentionally not replicated, SURVEY §7.4).

Area-light NEE sampling design: the reference picks a light instance by
weight CDF then walks the instance's BLAS area tree for a point
(path.cpp:186-196, blas.cpp:79-98).  Equivalent TPU form: one global CDF
over *emissive triangles* with P(tri) = (w_L / sum_w) * (area_tri / area_L),
so a single searchsorted picks the triangle and
pdf_area = P(light) / area_light — identical to the reference's
`(cdf[i+1]-cdf[i]) * list_pdf_area_instance[inst]` (path.cpp:225-228).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from mcpt_tpu.models import kulla_conty
from mcpt_tpu.models.bsdf import BsdfTables, build_bsdf_tables
from mcpt_tpu.models.emitter import (
    EmitterTables,
    EnvMapData,
    build_emitter_tables,
    build_envmap,
    empty_envmap,
)
from mcpt_tpu.models.medium import MediumTables, build_medium_tables
from mcpt_tpu.models.texture import TextureTables
from mcpt_tpu.ops.quadric import (
    KIND_CYLINDER,
    KIND_DISK,
    KIND_SPHERE,
    QuadricTables,
    build_quadric_tables,
    empty_quadrics,
)
from mcpt_tpu.scene.geometry import Geometry, commit_geometry
from mcpt_tpu.scene.ir import BsdfType, EmitterType, RendererConfig
from mcpt_tpu.scene.shapes import instance_triangles, triangle_areas

#: analytic primitives get their own table; everything else tessellates
QUADRIC_SHAPES = ("sphere", "disk", "cylinder")


@flax.struct.dataclass
class EmissiveTris:
    """Flat emissive-triangle table for NEE (one row per light triangle)."""

    p0: jnp.ndarray        # [E, 3]
    e1: jnp.ndarray        # [E, 3]
    e2: jnp.ndarray        # [E, 3]
    n0: jnp.ndarray        # [E, 3] shading normals
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray       # [E, 2]
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    cdf: jnp.ndarray       # [E + 1] global selection CDF
    pdf_area: jnp.ndarray  # [E] P(light) / area_light for this tri's light
    bsdf_id: jnp.ndarray   # [E] int32 area-light BSDF row (radiance lookup)


@flax.struct.dataclass
class SceneData:
    """Everything the integrator needs on device (csrt IntegratorData,
    integrator.hpp:29-69)."""

    geom: Geometry
    tex: TextureTables
    bsdf: BsdfTables
    map_inst_bsdf: jnp.ndarray       # [I] int32 (-1 = none)
    map_inst_light_pdf: jnp.ndarray  # [I] f32 — pdf_area if instance is an
    #                                  area light else 0 (P(light)/area)
    map_inst_area_pdf: jnp.ndarray   # [I] f32 — uniform-surface-sampling pdf
    #   (1/area_inst) / n_non_emitter_instances for BDPT connections
    #   (archive its.pdf_area() * no_emitter_num_rcp_, bdpt.cpp:137-139)
    em: EmissiveTris
    emitters: EmitterTables          # analytic lights (SoA rows)
    env: EnvMapData                  # envmap CDFs (placeholder when absent)
    media: MediumTables              # participating media (SoA rows)
    map_inst_medium_int: jnp.ndarray  # [I] int32 (-1 = vacuum)
    map_inst_medium_ext: jnp.ndarray  # [I] int32
    quad: QuadricTables              # analytic sphere/disk/cylinder rows
    brdf_avg: jnp.ndarray            # [128, 128] Kulla-Conty E(mu, alpha)
    albedo_avg: jnp.ndarray          # [128]
    # static facts
    n_emissive: int = flax.struct.field(pytree_node=False)
    present_types: tuple = flax.struct.field(pytree_node=False)
    # ((row, etype_int), ...) for the NEE loop over harsh analytic lights
    emitter_rows: tuple = flax.struct.field(pytree_node=False, default=())
    # "none" | "envmap" | "constant" — the escape emitter
    # (csrt registers constant under id_envmap too, renderer.cpp:560-563)
    env_kind: str = flax.struct.field(pytree_node=False, default="none")
    env_row: int = flax.struct.field(pytree_node=False, default=-1)
    sun_row: int = flax.struct.field(pytree_node=False, default=-1)
    # static feature flags: skip the texture work when no BSDF uses it
    has_bump: bool = flax.struct.field(pytree_node=False, default=False)
    has_opacity: bool = flax.struct.field(pytree_node=False, default=False)
    # ((kind, opaque), ...) per quadric row — () = no analytic prims
    quad_kinds: tuple = flax.struct.field(pytree_node=False, default=())
    # ((cdf_cell, quad_row, kind), ...) for emissive quadrics
    em_quad_cells: tuple = flax.struct.field(pytree_node=False, default=())
    # every primitive (triangle AND quadric) blocks shadow rays — lets
    # the batched regen engine treat "closest hit exists" == occluded
    # (integrators.path.shade_regen_batched); False when the scene has
    # null-boundary medium shells
    all_opaque: bool = flax.struct.field(pytree_node=False, default=True)
    # texture kinds reachable from BSDF tables (surface shading).  The
    # full tex.kinds also counts emitter-only bitmaps (envmap radiance,
    # synthesized sun/sky, spot projections) — compiling the 12-gather
    # bitmap branch into every BSDF parameter read costs ~10 ms/eval at
    # 64k lanes on scenes whose only bitmap is the envmap (matpreview).
    # Surface shading paths restrict to this set via path._stex.
    surface_kinds: tuple = flax.struct.field(
        pytree_node=False, default=(1, 2, 3)
    )


def _quadric_row(info):
    """Fold an analytic instance into a quadric-table row
    (local frames per ops/quadric.py; csrt {sphere,disk,cylinder}.hpp).
    Returns (row_dict, kind, world_area).  Areas are exact for
    rotation + uniform scale; under non-uniform scale the local-uniform
    sampler (and hence 1/area pdf) is approximate — the same
    approximation the reference makes (SampleSphere sphere.cpp:90-106)."""
    m = np.asarray(info.to_world, np.float64)
    if info.shape == "sphere":
        f = np.eye(4)
        f[:3, 3] = np.asarray(info.center, np.float64)
        kind = KIND_SPHERE
        params = (float(info.radius), 0.0)
        tw = m @ f
        s = np.abs(np.linalg.det(tw[:3, :3])) ** (1.0 / 3.0)
        area = 4.0 * np.pi * (info.radius * s) ** 2
    elif info.shape == "disk":
        kind = KIND_DISK
        params = (0.5, 0.0)
        tw = m
        # affine image of a disk is an ellipse: exact area scale is the
        # cross product of the in-plane column images
        j = np.linalg.norm(np.cross(tw[:3, 0], tw[:3, 1]))
        area = np.pi * 0.25 * j
    else:  # cylinder — frame p0/p1 into local z in [0, length]
        p0 = np.asarray(info.p0, np.float64)
        p1 = np.asarray(info.p1, np.float64)
        axis = p1 - p0
        length = float(np.linalg.norm(axis))
        axis = axis / max(length, 1e-12)
        helper = (
            np.array([0.0, 1.0, 0.0])
            if abs(axis[0]) > 0.9
            else np.array([1.0, 0.0, 0.0])
        )
        t = np.cross(helper, axis)
        t /= np.linalg.norm(t)
        b = np.cross(axis, t)
        f = np.eye(4)
        f[:3, 0], f[:3, 1], f[:3, 2], f[:3, 3] = t, b, axis, p0
        kind = KIND_CYLINDER
        params = (float(info.radius), length)
        tw = m @ f
        s_axis = np.linalg.norm(tw[:3, 2])
        s_perp = np.sqrt(
            np.linalg.norm(tw[:3, 0]) * np.linalg.norm(tw[:3, 1])
        )
        area = 2.0 * np.pi * info.radius * length * s_axis * s_perp
    row = dict(
        kind=kind,
        to_world=tw.astype(np.float32),
        params=params,
        inst_id=-1,  # caller fills
        flip=info.flip_normals,
    )
    return row, kind, max(float(area), 1e-20)


def compile_scene(config: RendererConfig) -> SceneData:
    # --- geometry: mesh-like instances -> world-space triangle soup;
    # analytic sphere/disk/cylinder -> quadric rows (csrt keeps them as
    # distinct primitive kinds in the BLAS, primitive.cpp:24-58)
    all_pos, all_nrm, all_uv, all_tan, all_inst = [], [], [], [], []
    inst_tri_ranges = []
    quad_rows, quad_kinds = [], []
    inst_quad_row = {}   # inst_id -> quadric row index
    quad_area = {}       # inst_id -> world-space area
    cursor = 0
    for inst_id, info in enumerate(config.instances):
        if info.shape in QUADRIC_SHAPES:
            row, kind, area = _quadric_row(info)
            row["inst_id"] = inst_id
            inst_quad_row[inst_id] = len(quad_rows)
            quad_area[inst_id] = area
            quad_rows.append(row)
            quad_kinds.append((kind, info.id_bsdf >= 0))
            inst_tri_ranges.append((cursor, cursor))
            continue
        pos, nrm, uv, tan = instance_triangles(info)
        f = pos.shape[0]
        all_pos.append(pos)
        all_nrm.append(
            nrm
            if nrm is not None
            else _geometric_normals(pos)
        )
        if uv is None:
            uv = np.zeros((f, 3, 2), np.float32)
            uv[:, 1, 0] = 1.0
            uv[:, 2, 1] = 1.0
        all_uv.append(uv)
        all_tan.append(tan)
        all_inst.append(np.full(f, inst_id, np.int32))
        inst_tri_ranges.append((cursor, cursor + f))
        cursor += f

    if cursor == 0:
        # all-quadric scene (e.g. mercury): the triangle structures want
        # >= 1 row — a degenerate sliver at the origin can never be hit
        all_pos.append(np.zeros((1, 3, 3), np.float32))
        all_nrm.append(
            np.broadcast_to(
                np.array([0, 0, 1], np.float32), (1, 3, 3)
            ).copy()
        )
        all_uv.append(np.zeros((1, 3, 2), np.float32))
        all_tan.append(None)
        all_inst.append(np.full(1, -1, np.int32))

    tri_pos = np.concatenate(all_pos, axis=0)
    tri_nrm = np.concatenate(all_nrm, axis=0)
    tri_uv = np.concatenate(all_uv, axis=0)
    tri_tan = (
        np.concatenate([t if t is not None else np.zeros_like(p) for t, p in zip(all_tan, all_pos)], axis=0)
        if any(t is not None for t in all_tan)
        else None
    )
    tri_inst = np.concatenate(all_inst, axis=0)

    # null-boundary (medium shell) triangles never block shadow rays
    inst_bsdf_arr = np.array(
        [i.id_bsdf for i in config.instances] or [0], np.int32
    )
    tri_opaque = (inst_bsdf_arr[np.maximum(tri_inst, 0)] >= 0) & (
        tri_inst >= 0
    )

    geom = commit_geometry(
        tri_pos, tri_nrm, tri_uv, tri_tan, tri_inst, tri_opaque=tri_opaque
    )

    # --- instance -> bsdf / medium maps (csrt instance.hpp:40-51 binding)
    n_inst = len(config.instances)
    map_inst_bsdf = np.array(
        [i.id_bsdf for i in config.instances], np.int32
    ) if n_inst else np.zeros(0, np.int32)
    map_med_int = np.array(
        [i.id_medium_int for i in config.instances] or [-1], np.int32
    )
    map_med_ext = np.array(
        [i.id_medium_ext for i in config.instances] or [-1], np.int32
    )

    # --- area lights: weight CDF over lights x area CDF within light
    # (csrt renderer.cpp:272-304)
    lights = []  # (inst_id, weight, bsdf_id)
    for inst_id, info in enumerate(config.instances):
        if 0 <= info.id_bsdf < len(config.bsdfs):
            bi = config.bsdfs[info.id_bsdf]
            if bi.btype == BsdfType.AREA_LIGHT:
                lights.append((inst_id, bi.weight, info.id_bsdf))

    sum_w = sum(w for _, w, _ in lights) or 1.0
    em_rows = []
    map_inst_light_pdf = np.zeros(max(n_inst, 1), np.float32)
    light_ids = {i for i, _, _ in lights}
    n_non_emitter = max(n_inst - len(lights), 1)
    map_inst_area_pdf = np.zeros(max(n_inst, 1), np.float32)
    def _inst_area(inst_id):
        if inst_id in quad_area:
            return quad_area[inst_id]
        lo, hi = inst_tri_ranges[inst_id]
        return max(float(triangle_areas(tri_pos[lo:hi]).sum()), 1e-20)

    for inst_id in range(n_inst):
        if inst_id not in light_ids:
            map_inst_area_pdf[inst_id] = 1.0 / (
                _inst_area(inst_id) * n_non_emitter
            )
    em_quad_cells = []
    for inst_id, weight, bsdf_id in lights:
        area_l = _inst_area(inst_id)
        p_light = weight / sum_w
        map_inst_light_pdf[inst_id] = p_light / area_l
        if inst_id in quad_area:
            # one CDF cell for the whole analytic shape; the sampler
            # (path._sample_area_light) routes it to sample_quadric_row
            row = inst_quad_row[inst_id]
            em_quad_cells.append(
                (len(em_rows), row, quad_rows[row]["kind"])
            )
            em_rows.append((None, p_light, p_light / area_l, bsdf_id))
        else:
            lo, hi = inst_tri_ranges[inst_id]
            areas = triangle_areas(tri_pos[lo:hi])
            for k in range(lo, hi):
                em_rows.append(
                    (
                        k,
                        p_light * areas[k - lo] / area_l,
                        p_light / area_l,
                        bsdf_id,
                    )
                )

    e = max(len(em_rows), 1)
    em_p = np.zeros((e, 3, 3), np.float32)
    em_n = np.zeros((e, 3, 3), np.float32)
    em_uv = np.zeros((e, 3, 2), np.float32)
    em_prob = np.zeros(e, np.float32)
    em_pdfa = np.zeros(e, np.float32)
    em_bsdf = np.zeros(e, np.int32)
    for row, (k, prob, pdfa, bsdf_id) in enumerate(em_rows):
        if k is not None:  # quadric light cells keep zero geometry rows
            em_p[row] = tri_pos[k]
            em_n[row] = tri_nrm[k]
            em_uv[row] = tri_uv[k]
        em_prob[row] = prob
        em_pdfa[row] = pdfa
        em_bsdf[row] = bsdf_id
    cdf = np.zeros(e + 1, np.float32)
    np.cumsum(em_prob, out=cdf[1:])
    if em_rows:
        cdf /= max(cdf[-1], 1e-20)  # weights already normalized; guard fp

    em = EmissiveTris(
        p0=jnp.asarray(em_p[:, 0]),
        e1=jnp.asarray(em_p[:, 1] - em_p[:, 0]),
        e2=jnp.asarray(em_p[:, 2] - em_p[:, 0]),
        n0=jnp.asarray(em_n[:, 0]),
        n1=jnp.asarray(em_n[:, 1]),
        n2=jnp.asarray(em_n[:, 2]),
        uv0=jnp.asarray(em_uv[:, 0]),
        uv1=jnp.asarray(em_uv[:, 1]),
        uv2=jnp.asarray(em_uv[:, 2]),
        cdf=jnp.asarray(cdf),
        pdf_area=jnp.asarray(em_pdfa),
        bsdf_id=jnp.asarray(em_bsdf),
    )

    # --- emitters (csrt CommitEmitters, renderer.cpp:522-620)
    emitter_rows = []
    env_kind, env_row, sun_row = "none", -1, -1
    env = empty_envmap()
    for row, info in enumerate(config.emitters):
        if info.etype == EmitterType.ENVMAP:
            pixels = config.textures.bitmap_pixels(info.id_texture)
            if pixels.shape[-1] == 1:
                pixels = np.repeat(pixels, 3, axis=-1)
            env = build_envmap(pixels, info.to_world, info.id_texture)
            env_kind, env_row = "envmap", row
        elif info.etype == EmitterType.CONSTANT:
            env_kind, env_row = "constant", row
        else:
            emitter_rows.append((row, int(info.etype)))
            if info.etype == EmitterType.SUN:
                sun_row = row
    emitters = build_emitter_tables(config.emitters)

    # --- textures + bsdfs
    tex = config.textures.build()
    bsdf = build_bsdf_tables(config.bsdfs, config.textures.infos)
    present = tuple(sorted({int(b.btype) for b in config.bsdfs}))

    # texture kinds reachable from surface shading (every *_tid column
    # of the BSDF tables); emitter-only bitmaps don't force the bitmap
    # branch into BSDF parameter reads
    tex_infos = config.textures.infos
    surf_tids = set()
    for b in config.bsdfs:
        surf_tids.update(
            t for t in (
                b.id_opacity, b.id_bump_map, b.id_radiance,
                b.id_diffuse_reflectance, b.id_roughness,
                b.id_roughness_u, b.id_roughness_v,
                b.id_specular_reflectance, b.id_specular_transmittance,
                b.id_coat_roughness,
            ) if 0 <= t < len(tex_infos)
        )
    surface_kinds = tuple(sorted({tex_infos[t]["type"] for t in surf_tids}))

    # --- Kulla-Conty LUT (jitted one-time precompute)
    needs_kc = any(
        b.btype in (BsdfType.CONDUCTOR, BsdfType.DIELECTRIC) for b in config.bsdfs
    )
    if needs_kc:
        brdf_avg, albedo_avg = kulla_conty.get_tables()
    else:
        brdf_avg = np.zeros((kulla_conty.LUT_RESOLUTION,) * 2, np.float32)
        albedo_avg = np.zeros(kulla_conty.LUT_RESOLUTION, np.float32)

    return SceneData(
        geom=geom,
        tex=tex,
        bsdf=bsdf,
        map_inst_bsdf=jnp.asarray(map_inst_bsdf if n_inst else np.zeros(1, np.int32)),
        map_inst_light_pdf=jnp.asarray(map_inst_light_pdf),
        map_inst_area_pdf=jnp.asarray(map_inst_area_pdf),
        em=em,
        emitters=emitters,
        env=env,
        media=build_medium_tables(config.media),
        map_inst_medium_int=jnp.asarray(map_med_int),
        map_inst_medium_ext=jnp.asarray(map_med_ext),
        quad=build_quadric_tables(quad_rows) if quad_rows else empty_quadrics(),
        brdf_avg=jnp.asarray(brdf_avg),
        albedo_avg=jnp.asarray(albedo_avg),
        n_emissive=len(em_rows),
        present_types=present,
        emitter_rows=tuple(emitter_rows),
        env_kind=env_kind,
        env_row=env_row,
        sun_row=sun_row,
        has_bump=any(b.id_bump_map >= 0 for b in config.bsdfs),
        has_opacity=any(b.id_opacity >= 0 for b in config.bsdfs),
        quad_kinds=tuple(quad_kinds),
        em_quad_cells=tuple(em_quad_cells),
        all_opaque=bool(np.all(tri_opaque)) and all(
            op for _, op in quad_kinds
        ),
        surface_kinds=surface_kinds,
    )


def _geometric_normals(pos: np.ndarray) -> np.ndarray:
    gn = np.cross(pos[:, 1] - pos[:, 0], pos[:, 2] - pos[:, 0])
    gn /= np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
    return np.repeat(gn[:, None, :], 3, axis=1)
