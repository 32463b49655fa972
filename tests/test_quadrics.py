"""Analytic quadric primitives: intersection closed forms, shading
frames, uniform surface sampling, and render equivalence against the
tessellated meshes they replace (csrt rtcore/primitives/)."""

import numpy as np
import pytest

from mcpt_tpu.models.texture import TextureBuilder
from mcpt_tpu.ops.quadric import (
    KIND_CYLINDER,
    KIND_DISK,
    KIND_SPHERE,
    build_quadric_tables,
    intersect_quadrics,
    quadric_attrs,
    sample_quadric_row,
)
from mcpt_tpu.render.renderer import Renderer
from mcpt_tpu.scene.compile import compile_scene
from mcpt_tpu.scene.ir import (
    BsdfInfo,
    BsdfType,
    CameraInfo,
    InstanceInfo,
    IntegratorInfo,
    MeshData,
    RendererConfig,
)


def _tables(kind, to_world=None, params=(1.0, 0.0), flip=False):
    return build_quadric_tables(
        [
            dict(
                kind=kind,
                to_world=np.eye(4, dtype=np.float32)
                if to_world is None
                else np.asarray(to_world, np.float32),
                params=params,
                inst_id=7,
                flip=flip,
            )
        ]
    )


class TestIntersect:
    def test_sphere_closed_form(self):
        q = _tables(KIND_SPHERE, params=(1.0, 0.0))
        o = np.array([[0.0, 0.0, -5.0], [0.0, 0.0, 0.0], [0.0, 3.0, -5.0]],
                     np.float32)
        d = np.array([[0, 0, 1], [0, 0, 1], [0, 0, 1]], np.float32)
        t, idx, inside = intersect_quadrics(
            q, ((KIND_SPHERE, True),), o, d, 1e-4, 1e30
        )
        t, idx, inside = map(np.asarray, (t, idx, inside))
        assert idx.tolist() == [0, 0, -1]          # grazing row misses
        assert t[0] == pytest.approx(4.0, abs=1e-4)
        assert t[1] == pytest.approx(1.0, abs=1e-4)  # origin inside
        assert not inside[0] and inside[1]

    def test_sphere_world_t_under_scale(self):
        # to_world scales x2: world sphere radius 2 centered at origin
        m = np.diag([2.0, 2.0, 2.0, 1.0])
        q = _tables(KIND_SPHERE, to_world=m)
        o = np.array([[0.0, 0.0, -5.0]], np.float32)
        d = np.array([[0, 0, 1]], np.float32)
        t, idx, _ = intersect_quadrics(
            q, ((KIND_SPHERE, True),), o, d, 1e-4, 1e30
        )
        assert np.asarray(t)[0] == pytest.approx(3.0, abs=1e-4)

    def test_disk_radius_bound(self):
        q = _tables(KIND_DISK)
        o = np.array(
            [[0.3, 0.0, 2.0], [0.6, 0.0, 2.0], [0.0, 0.2, -1.0]], np.float32
        )
        d = np.array([[0, 0, -1], [0, 0, -1], [0, 0, 1]], np.float32)
        t, idx, inside = map(
            np.asarray,
            intersect_quadrics(q, ((KIND_DISK, True),), o, d, 1e-4, 1e30),
        )
        assert idx.tolist() == [0, -1, 0]          # r=0.6 > 0.5 misses
        assert t[0] == pytest.approx(2.0, abs=1e-4)
        assert not inside[0] and inside[2]          # back-side approach

    def test_cylinder_z_range(self):
        q = _tables(KIND_CYLINDER, params=(0.5, 2.0))
        o = np.array(
            [[-5.0, 0.0, 1.0], [-5.0, 0.0, 3.0], [0.0, 0.0, 1.0]], np.float32
        )
        d = np.array([[1, 0, 0], [1, 0, 0], [1, 0, 0]], np.float32)
        t, idx, inside = map(
            np.asarray,
            intersect_quadrics(
                q, ((KIND_CYLINDER, True),), o, d, 1e-4, 1e30
            ),
        )
        assert idx.tolist() == [0, -1, 0]          # z=3 off the finite span
        assert t[0] == pytest.approx(4.5, abs=1e-4)
        assert t[2] == pytest.approx(0.5, abs=1e-4)
        assert not inside[0] and inside[2]

    def test_any_hit_skips_non_opaque(self):
        q = _tables(KIND_SPHERE)
        o = np.array([[0.0, 0.0, -5.0]], np.float32)
        d = np.array([[0, 0, 1]], np.float32)
        _, idx, _ = intersect_quadrics(
            q, ((KIND_SPHERE, False),), o, d, 1e-4, 1e30, any_hit=True
        )
        assert np.asarray(idx)[0] == -1


class TestAttrs:
    def test_sphere_frame(self):
        q = _tables(KIND_SPHERE)
        pos = np.array([[0.0, 0.0, -1.0], [0.0, 1.0, 0.0]], np.float32)
        n, t, b, uv, inst = map(
            np.asarray,
            quadric_attrs(
                q, ((KIND_SPHERE, True),), np.zeros(2, np.int32), pos
            ),
        )
        # outward normals, orthonormal right-handed frame
        np.testing.assert_allclose(n, pos, atol=1e-5)
        for v in (n, t, b):
            np.testing.assert_allclose(
                np.linalg.norm(v, axis=-1), 1.0, atol=1e-5
            )
        assert abs(np.sum(n * t, axis=-1)).max() < 1e-5
        assert abs(np.sum(n * b, axis=-1)).max() < 1e-5
        np.testing.assert_allclose(np.cross(b, n), t, atol=1e-4)
        assert inst.tolist() == [7, 7]
        # equator at -z: phi = 3pi/2 in the atan2(z,x) wrap, theta = pi/2
        np.testing.assert_allclose(uv[0], [0.75, 0.5], atol=1e-5)
        # pole: theta = 0
        assert uv[1, 1] == pytest.approx(0.0, abs=1e-5)

    def test_flip_normals(self):
        q = _tables(KIND_SPHERE, flip=True)
        pos = np.array([[0.0, 0.0, -1.0]], np.float32)
        n, *_ = map(
            np.asarray,
            quadric_attrs(
                q, ((KIND_SPHERE, True),), np.zeros(1, np.int32), pos
            ),
        )
        np.testing.assert_allclose(n, -pos, atol=1e-5)


class TestSample:
    def test_sphere_uniform(self):
        q = _tables(KIND_SPHERE, params=(2.0, 0.0))
        rng = np.random.default_rng(3)
        xi0 = rng.random(4096).astype(np.float32)
        xi1 = rng.random(4096).astype(np.float32)
        pos, nrm, uv = map(
            np.asarray, sample_quadric_row(q, 0, KIND_SPHERE, xi0, xi1)
        )
        np.testing.assert_allclose(
            np.linalg.norm(pos, axis=-1), 2.0, atol=1e-5
        )
        np.testing.assert_allclose(nrm, pos / 2.0, atol=1e-5)
        # uniform on the sphere: componentwise mean -> 0
        assert np.abs(pos.mean(0)).max() < 0.15
        assert uv.min() >= 0.0 and uv.max() <= 1.0

    def test_disk_concentric(self):
        q = _tables(KIND_DISK)
        rng = np.random.default_rng(4)
        xi0 = rng.random(4096).astype(np.float32)
        xi1 = rng.random(4096).astype(np.float32)
        pos, nrm, _ = map(
            np.asarray, sample_quadric_row(q, 0, KIND_DISK, xi0, xi1)
        )
        r = np.linalg.norm(pos[:, :2], axis=-1)
        assert np.abs(pos[:, 2]).max() < 1e-6
        assert r.max() <= 0.5 + 1e-5
        # area-uniform: E[r^2] = R^2 / 2
        assert (r**2).mean() == pytest.approx(0.25 / 2, rel=0.05)
        np.testing.assert_allclose(nrm[:, 2], 1.0, atol=1e-6)


def _sphere_scene(analytic: bool, emissive_disk: bool = False, spp=64):
    """Diffuse sphere over a floor, lit by a rect or analytic-disk area
    light overhead; `analytic=False` swaps in tessellated mesh stand-ins
    so both paths answer the same integral."""
    from mcpt_tpu.scene.shapes import disk_mesh, sphere_mesh

    tex = TextureBuilder()
    rad = tex.add_constant([8.0, 8.0, 8.0])
    gray = tex.add_constant([0.6, 0.6, 0.6])
    bsdfs = [
        BsdfInfo(btype=BsdfType.AREA_LIGHT, id_radiance=rad),
        BsdfInfo(btype=BsdfType.DIFFUSE, id_diffuse_reflectance=gray),
    ]

    # local +z (the rect/disk normal) -> world -y: light faces DOWN
    light_m = np.eye(4, dtype=np.float32)
    light_m[:3, :3] = np.array(
        [[1, 0, 0], [0, 0, -1], [0, -1, 0]], np.float32
    )
    light_m[1, 3] = 3.0
    if emissive_disk and analytic:
        light = InstanceInfo(shape="disk", to_world=light_m, id_bsdf=0)
    elif emissive_disk:
        m = disk_mesh(segments=128)
        light = InstanceInfo(
            shape="mesh", mesh=m, to_world=light_m, id_bsdf=0
        )
    else:
        rect_m = light_m.copy()
        rect_m[:3, :3] *= 0.25
        rect_m[1, 3] = 3.0
        light = InstanceInfo(shape="rectangle", to_world=rect_m, id_bsdf=0)

    if analytic:
        ball = InstanceInfo(shape="sphere", radius=1.0, id_bsdf=1)
    else:
        m = sphere_mesh(subdiv=4)  # 5120 tris keeps the dense sweep path
        ball = InstanceInfo(shape="mesh", mesh=m, id_bsdf=1)

    floor = InstanceInfo(shape="rectangle", id_bsdf=1)
    fm = np.eye(4, dtype=np.float32)
    fm[:3, :3] = 8.0 * np.array(
        [[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float32
    )
    fm[1, 3] = -1.0
    floor.to_world = fm

    cam = CameraInfo(
        width=48, height=48, spp=spp, fov_x=40.0,
        eye=np.array([0, 1.0, 6.0], np.float32),
        look_at=np.array([0, 0.5, 0], np.float32),
    )
    return RendererConfig(
        camera=cam,
        integrator=IntegratorInfo(depth_max=5, sample_clamp=0.0),
        textures=tex,
        bsdfs=bsdfs,
        instances=[light, ball, floor],
    )


class TestRenderEquivalence:
    def test_analytic_sphere_matches_tessellated(self):
        a = np.asarray(Renderer(_sphere_scene(True)).render(tile=48 * 48))
        b = np.asarray(Renderer(_sphere_scene(False)).render(tile=48 * 48))
        assert np.isfinite(a).all()
        assert a.mean() > 0.002  # guard: the scene must actually be lit
        np.testing.assert_allclose(a.mean((0, 1)), b.mean((0, 1)), rtol=0.03)

    def test_emissive_disk_matches_tessellated(self):
        a = np.asarray(
            Renderer(_sphere_scene(True, emissive_disk=True)).render(
                tile=48 * 48
            )
        )
        b = np.asarray(
            Renderer(_sphere_scene(False, emissive_disk=True)).render(
                tile=48 * 48
            )
        )
        sc = compile_scene(_sphere_scene(True, emissive_disk=True))
        assert sc.em_quad_cells  # the analytic light actually took a cell
        assert np.isfinite(a).all()
        assert a.mean() > 0.002  # guard: the scene must actually be lit
        np.testing.assert_allclose(a.mean((0, 1)), b.mean((0, 1)), rtol=0.04)


class TestMercuryScene:
    """mercury/smooth_diffuse.xml is the reference's all-quadric scene:
    an analytic disk area light + textured sphere, zero triangles."""

    def test_parse_compile_render(self):
        import os
        import warnings

        scene = "/root/reference/resources/scene/mercury/smooth_diffuse.xml"
        if not os.path.exists(scene):
            pytest.skip("reference scenes not mounted")
        from mcpt_tpu.scene.parser import load_config

        with warnings.catch_warnings():
            # the 8k_mercury.jpg bitmap is not shipped — gray fallback
            warnings.simplefilter("ignore")
            cfg = load_config(scene)
        sc = compile_scene(cfg)
        assert sc.quad_kinds == ((KIND_DISK, True), (KIND_SPHERE, True))
        assert len(sc.em_quad_cells) == 1
        cfg.camera.width = cfg.camera.height = 16
        cfg.integrator.depth_max = 4
        img = np.asarray(Renderer(cfg).render(spp=4, tile=256))
        assert np.isfinite(img).all()
        assert img.max() > 0.0  # the disk light illuminates the sphere


class TestCompile:
    def test_quadric_only_scene(self):
        """A scene with no triangle instances still compiles (degenerate
        placeholder row) and renders black-on-miss."""
        tex = TextureBuilder()
        gray = tex.add_constant([0.5, 0.5, 0.5])
        cfg = RendererConfig(
            camera=CameraInfo(width=8, height=8, spp=4),
            integrator=IntegratorInfo(depth_max=3),
            textures=tex,
            bsdfs=[BsdfInfo(btype=BsdfType.DIFFUSE, id_diffuse_reflectance=gray)],
            instances=[InstanceInfo(shape="sphere", radius=1.0, id_bsdf=0)],
        )
        sc = compile_scene(cfg)
        assert sc.quad_kinds == ((KIND_SPHERE, True),)
        img = np.asarray(Renderer(cfg).render(tile=64))
        assert np.isfinite(img).all()


class TestQuadricMediumBoundary:
    def test_null_sphere_shell_with_interior_medium(self):
        """An analytic null-BSDF sphere bounding an absorbing medium must
        attenuate a light seen through it exactly like the tessellated
        shell (volumetric-caustic's glass ball is this shape analytically;
        null shells are also shadow-transparent)."""
        from mcpt_tpu.scene.ir import MediumInfo
        from mcpt_tpu.scene.shapes import sphere_mesh

        def build(analytic):
            tex = TextureBuilder()
            rad = tex.add_constant([4.0, 4.0, 4.0])
            bsdfs = [BsdfInfo(btype=BsdfType.AREA_LIGHT, id_radiance=rad)]
            media = [
                MediumInfo(
                    sigma_a=np.array([0.5, 1.0, 2.0], np.float32),
                    sigma_s=np.zeros(3, np.float32),
                )
            ]
            # emissive wall behind a medium-filled sphere shell
            wall = InstanceInfo(shape="rectangle", id_bsdf=0)
            m = np.eye(4, dtype=np.float32)
            m[:3, :3] *= 3.0
            m[2, 3] = -3.0
            wall.to_world = m
            if analytic:
                shell = InstanceInfo(
                    shape="sphere", radius=1.0, id_bsdf=-1, id_medium_int=0
                )
            else:
                shell = InstanceInfo(
                    shape="mesh", mesh=sphere_mesh(subdiv=4), id_bsdf=-1,
                    id_medium_int=0,
                )
            cam = CameraInfo(
                width=8, height=8, spp=64, fov_x=10.0,
                eye=np.array([0, 0, 4], np.float32),
                look_at=np.zeros(3, np.float32),
            )
            return RendererConfig(
                camera=cam,
                integrator=IntegratorInfo(itype="volpath", depth_max=6),
                textures=tex,
                bsdfs=bsdfs,
                media=media,
                instances=[wall, shell],
            )

        a = np.asarray(Renderer(build(True)).render(tile=64))
        b = np.asarray(Renderer(build(False)).render(tile=64))
        c = a[4, 4]  # center pixel looks through the full diameter
        # through-the-center transmittance: exp(-sigma_a * 2r) * L
        expected = 4.0 * np.exp(-np.array([0.5, 1.0, 2.0]) * 2.0)
        np.testing.assert_allclose(c, expected, rtol=0.15)
        np.testing.assert_allclose(a[4, 4], b[4, 4], rtol=0.1)
