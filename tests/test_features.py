"""Feature tests: stochastic opacity masks, bump mapping, disk/cylinder
tessellation (csrt feature set, README.md:11-61)."""

import numpy as np
import pytest

from mcpt_tpu.models.texture import TextureBuilder
from mcpt_tpu.render.renderer import Renderer
from mcpt_tpu.scene.ir import (
    BsdfInfo,
    BsdfType,
    CameraInfo,
    InstanceInfo,
    IntegratorInfo,
    RendererConfig,
)


def wall_through_mask_scene(alpha, spp=256):
    """Emissive wall at z=-2 behind a black alpha-masked screen at z=0."""
    tex = TextureBuilder()
    rad = tex.add_constant([2.0, 2.0, 2.0])
    black = tex.add_constant([0.0, 0.0, 0.0])
    opacity = tex.add_constant([alpha, alpha, alpha])
    bsdfs = [
        BsdfInfo(btype=BsdfType.AREA_LIGHT, id_radiance=rad),
        BsdfInfo(
            btype=BsdfType.DIFFUSE,
            id_diffuse_reflectance=black,
            id_opacity=opacity,
        ),
    ]
    wall = InstanceInfo(shape="rectangle", id_bsdf=0)
    wall.to_world = np.diag([3.0, 3.0, 1.0, 1.0]).astype(np.float32)
    wall.to_world[2, 3] = -2.0
    screen = InstanceInfo(shape="rectangle", id_bsdf=1)
    screen.to_world = np.diag([3.0, 3.0, 1.0, 1.0]).astype(np.float32)
    cam = CameraInfo(
        width=8, height=8, spp=spp, fov_x=20.0,
        eye=np.array([0, 0, 3], np.float32),
        look_at=np.zeros(3, np.float32),
    )
    return RendererConfig(
        camera=cam,
        integrator=IntegratorInfo(depth_max=4, sample_clamp=0.0),
        textures=tex,
        bsdfs=bsdfs,
        instances=[wall, screen],
    )


class TestOpacity:
    def test_expected_transmission(self):
        """E[L] = (1 - alpha) * wall radiance through a black mask."""
        for alpha in (0.25, 0.75):
            cfg = wall_through_mask_scene(alpha)
            img = np.asarray(Renderer(cfg).render(tile=64))
            expected = (1.0 - alpha) * 2.0
            np.testing.assert_allclose(img[4, 4], expected, rtol=0.1)

    def test_fully_opaque_blocks(self):
        cfg = wall_through_mask_scene(1.0, spp=8)
        img = np.asarray(Renderer(cfg).render(tile=64))
        assert img[4, 4].max() < 1e-5


class TestBump:
    def test_bump_perturbs_shading(self):
        """A ramp bump map on a lit floor changes the image vs no bump."""
        from tests.test_emitter import floor_scene
        from mcpt_tpu.scene.ir import EmitterInfo, EmitterType

        def build(with_bump):
            cfg = floor_scene(
                EmitterInfo(
                    etype=EmitterType.DIRECTIONAL,
                    direction=np.array([0.5, -0.86, 0.0], np.float32),
                    radiance=np.array([2.0] * 3, np.float32),
                ),
                spp=4,
                res=8,
            )
            if with_bump:
                ramp = np.linspace(0, 4.0, 64, dtype=np.float32)
                bump = np.tile(ramp[None, :, None], (64, 1, 1))
                tid = cfg.textures.add_bitmap(bump)
                cfg.bsdfs[0].id_bump_map = tid
            return np.asarray(Renderer(cfg).render(tile=64))

        img0 = build(False)
        img1 = build(True)
        assert np.isfinite(img1).all()
        assert np.abs(img1 - img0).max() > 1e-3


class TestAnalyticShapes:
    def test_disk_tessellation(self):
        from mcpt_tpu.scene.shapes import disk_mesh, triangle_areas

        m = disk_mesh(segments=256)
        tris = m.positions[m.indices]
        area = triangle_areas(tris).sum()
        # unit-DIAMETER disk: area = pi * 0.25
        assert area == pytest.approx(np.pi * 0.25, rel=1e-3)

    def test_cylinder_tessellation(self):
        from mcpt_tpu.scene.shapes import cylinder_mesh, triangle_areas

        p0, p1, r = [0, 0, 0], [0, 0, 2], 0.5
        m = cylinder_mesh(p0, p1, r, segments=256)
        tris = m.positions[m.indices]
        area = triangle_areas(tris).sum()
        assert area == pytest.approx(2 * np.pi * r * 2.0, rel=1e-3)
        # all normals perpendicular to the axis
        assert np.abs(m.normals[:, 2]).max() < 1e-6


class TestColumnKinds:
    """Per-parameter texture-kind narrowing (BsdfTables.col_kinds) must
    not change values: a BSDF eval with narrowed kinds equals the same
    eval with every branch compiled."""

    def test_narrowed_eval_matches_full(self):
        import jax.numpy as jnp
        import numpy as np

        from mcpt_tpu.models import bsdf as B
        from mcpt_tpu.models.texture import TextureBuilder
        from mcpt_tpu.scene.ir import BsdfInfo, BsdfType

        r = np.random.default_rng(5)
        tb = TextureBuilder()
        t_rough = tb.add_constant([0.3, 0.3, 0.3])
        t_albedo = tb.add_bitmap((r.random((8, 8, 3)) * 0.8).astype(np.float32))
        infos = [
            BsdfInfo(btype=BsdfType.ROUGH_DIFFUSE,
                     id_diffuse_reflectance=t_albedo,
                     id_roughness=t_rough),
        ]
        tex = tb.build()
        tables = B.build_bsdf_tables(infos, tb.infos)
        # the narrowing must have recorded bitmap-only diffuse and
        # constant-only roughness
        ck = dict(tables.col_kinds)
        assert ck["diffuse"] == (3,)
        assert ck["roughness"] == (1,)

        n = 256
        bid = jnp.zeros((n,), jnp.int32)
        nrm = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
        tan = jnp.tile(jnp.asarray([1.0, 0.0, 0.0]), (n, 1))
        bit = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (n, 1))
        inside = jnp.zeros((n,), bool)
        uv = jnp.asarray(r.random((n, 2), dtype=np.float32))
        wo = jnp.tile(jnp.asarray([0.0, 0.3, 0.954]), (n, 1))
        wi = -jnp.tile(jnp.asarray([0.3, 0.0, 0.954]), (n, 1))

        full = tables.replace(col_kinds=())  # falls back to tex.kinds
        args = (B_present := (int(BsdfType.ROUGH_DIFFUSE),),)
        p1, f1, v1 = B.bsdf_evaluate(
            tables, tex, args[0], bid, wi, wo, nrm, tan, bit, inside, uv)
        p2, f2, v2 = B.bsdf_evaluate(
            full, tex, args[0], bid, wi, wo, nrm, tan, bit, inside, uv)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def _ceiling_light_floor_scene(screen_alpha, spp=512, n_screens=1,
                               opaque_cap_y=None):
    """White floor at y=0 lit by a ceiling area light at y=2; optional
    alpha-masked black screen at y=1 between them.  The camera looks at
    the floor from below the screen plane, so ONLY the NEE shadow rays
    cross the mask — isolating the shadow-ray alpha path (csrt runs
    IsTransparent inside IntersectAny, triangle.cpp:116-147 +
    bsdf.cpp:272-276)."""
    tex = TextureBuilder()
    white = tex.add_constant([0.8, 0.8, 0.8])
    black = tex.add_constant([0.0, 0.0, 0.0])
    rad = tex.add_constant([5.0, 5.0, 5.0])
    bsdfs = [
        BsdfInfo(btype=BsdfType.DIFFUSE, id_diffuse_reflectance=white),
        BsdfInfo(btype=BsdfType.AREA_LIGHT, id_radiance=rad),
    ]

    def xform(deg, scale, ty):
        r = np.radians(deg)
        c, s = np.cos(r), np.sin(r)
        m = np.array(
            [[scale, 0, 0, 0],
             [0, c * scale, -s * scale, ty],
             [0, s * scale, c * scale, 0],
             [0, 0, 0, 1]], np.float32)
        return m

    floor = InstanceInfo(shape="rectangle", id_bsdf=0,
                         to_world=xform(-90, 2.0, 0.0))
    light = InstanceInfo(shape="rectangle", id_bsdf=1,
                         to_world=xform(90, 0.5, 2.0))
    instances = [floor, light]
    if screen_alpha is not None:
        alpha_t = tex.add_constant([screen_alpha] * 3)
        bsdfs.append(BsdfInfo(btype=BsdfType.DIFFUSE,
                              id_diffuse_reflectance=black,
                              id_opacity=alpha_t))
        for i in range(n_screens):
            instances.append(InstanceInfo(
                shape="rectangle", id_bsdf=2,
                to_world=xform(90, 2.0, 0.5 + 0.1 * i),
            ))
    if opaque_cap_y is not None:
        # plain opaque black screen above the masked stack
        bsdfs.append(BsdfInfo(btype=BsdfType.DIFFUSE,
                              id_diffuse_reflectance=black))
        instances.append(InstanceInfo(
            shape="rectangle", id_bsdf=len(bsdfs) - 1,
            to_world=xform(90, 2.0, opaque_cap_y),
        ))
    cam = CameraInfo(
        width=8, height=8, spp=spp, fov_x=25.0,
        eye=np.array([0, 0.4, 3.0], np.float32),
        look_at=np.array([0, 0, 0], np.float32),
    )
    return RendererConfig(
        camera=cam,
        integrator=IntegratorInfo(depth_max=2, sample_clamp=0.0),
        textures=tex,
        bsdfs=bsdfs,
        instances=instances,
    )


class TestShadowRayAlpha:
    def test_half_transparent_occluder_passes_half_nee(self):
        """NEE energy through an alpha-masked occluder must scale by
        (1 - alpha) — the r3 any-hit blocked 100% (VERDICT missing #3)."""
        base = np.asarray(
            Renderer(_ceiling_light_floor_scene(None)).render(tile=64)
        )
        for alpha in (0.3, 0.7):
            img = np.asarray(
                Renderer(_ceiling_light_floor_scene(alpha)).render(tile=64)
            )
            ratio = img[4, 4].mean() / max(base[4, 4].mean(), 1e-9)
            np.testing.assert_allclose(ratio, 1.0 - alpha, rtol=0.15)

    def test_opaque_screen_blocks_all(self):
        img = np.asarray(
            Renderer(_ceiling_light_floor_scene(1.0, spp=16)).render(tile=64)
        )
        assert img[4, 4].max() < 1e-5


class TestShadowAlphaBoundary:
    """SHADOW_ALPHA_K bounds the masked/null crossings a shadow ray
    resolves; crossings beyond it pass unoccluded (documented deviation,
    integrators/path.py).  These tests pin the boundary: K fully
    transparent masks resolve exactly, an occluder hiding BEHIND K
    masks leaks (and stops leaking when MCPT_SHADOW_ALPHA_K is raised,
    via the module knob)."""

    def test_k_transparent_masks_pass(self):
        base = np.asarray(
            Renderer(_ceiling_light_floor_scene(None, spp=256)).render(tile=64)
        )
        img = np.asarray(Renderer(
            _ceiling_light_floor_scene(0.0, spp=256, n_screens=4)
        ).render(tile=64))
        ratio = img[4, 4].mean() / max(base[4, 4].mean(), 1e-9)
        np.testing.assert_allclose(ratio, 1.0, rtol=0.1)

    def test_occluder_beyond_k_leaks_documented(self, monkeypatch):
        from mcpt_tpu.integrators import path as P

        # opaque cap above 4 transparent masks: the cap is the 5th
        # crossing -> never tested at K=4 -> full leak (documented)
        img = np.asarray(Renderer(_ceiling_light_floor_scene(
            0.0, spp=64, n_screens=4, opaque_cap_y=1.5
        )).render(tile=64))
        base = np.asarray(
            Renderer(_ceiling_light_floor_scene(None, spp=64)).render(tile=64)
        )
        assert img[4, 4].mean() > 0.5 * base[4, 4].mean()  # leaks

        # raising the knob resolves the 5th crossing -> occluded.
        # (different spp than above so the jit cache can't reuse the
        # K=4 program for the same tile signature)
        monkeypatch.setattr(P, "SHADOW_ALPHA_K", 6)
        dark = np.asarray(Renderer(_ceiling_light_floor_scene(
            0.0, spp=63, n_screens=4, opaque_cap_y=1.5
        )).render(tile=64))
        assert dark[4, 4].max() < 1e-5
