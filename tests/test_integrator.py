"""End-to-end integrator tests on a tiny cornell-like scene.

The reference verifies by golden-image eyeballing only (SURVEY.md §4);
here the direct-lighting estimator is checked against a dense numpy
quadrature of the same integral, and the full render is checked for
determinism and batch-shape independence.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mcpt_tpu.render.renderer import Renderer
from mcpt_tpu.scene.ir import (
    BsdfInfo,
    BsdfType,
    CameraInfo,
    InstanceInfo,
    IntegratorInfo,
    RendererConfig,
)
from mcpt_tpu.models.texture import TextureBuilder


def make_box_scene(spp=16, res=32, light_radiance=20.0, depth_max=2):
    """A floor plane plus a small overhead area light."""
    tex = TextureBuilder()
    white = tex.add_constant([0.75, 0.75, 0.75])
    rad = tex.add_constant([light_radiance] * 3)

    bsdfs = [
        BsdfInfo(btype=BsdfType.DIFFUSE, id_diffuse_reflectance=white),
        BsdfInfo(btype=BsdfType.AREA_LIGHT, id_radiance=rad, weight=1.0),
    ]

    floor = InstanceInfo(shape="rectangle", id_bsdf=0)
    floor.to_world = rot_x(-90.0, scale=2.0)  # z=0 plane -> y=0 plane, +y normal

    light = InstanceInfo(shape="rectangle", id_bsdf=1)
    # 0.5 x 0.5 light at y=2 facing down (-y)
    light.to_world = rot_x(90.0, scale=0.25, ty=2.0)

    cam = CameraInfo(
        width=res,
        height=res,
        spp=spp,
        fov_x=60.0,
        eye=np.array([0.0, 1.0, 3.0], np.float32),
        look_at=np.array([0.0, 0.5, 0.0], np.float32),
        up=np.array([0.0, 1.0, 0.0], np.float32),
    )
    integ = IntegratorInfo(depth_max=depth_max, sample_clamp=0.0)
    return RendererConfig(
        camera=cam,
        integrator=integ,
        textures=tex,
        bsdfs=bsdfs,
        instances=[floor, light],
    )


def rot_x(deg, scale=1.0, ty=0.0):
    """to_world = translate(0,ty,0) @ rot_x(deg) @ scale."""
    r = np.radians(deg)
    c, s = np.cos(r), np.sin(r)
    m = np.array(
        [
            [scale, 0, 0, 0],
            [0, c * scale, -s * scale, ty],
            [0, s * scale, c * scale, 0],
            [0, 0, 0, 1],
        ],
        np.float32,
    )
    return m


def direct_light_quadrature(p, albedo, light_y=2.0, half=0.25, L=20.0, n=400):
    """Dense quadrature of the direct lighting integral at floor point p:
    Lo = integral over light area of albedo/pi * cos_s * cos_l / d^2 * L dA,
    occlusion-free."""
    xs = np.linspace(-half, half, n, endpoint=False) + half / n
    zs = xs
    X, Z = np.meshgrid(xs, zs, indexing="ij")
    lp = np.stack([X, np.full_like(X, light_y), Z], axis=-1)  # [n,n,3]
    d = lp - p
    dist2 = (d**2).sum(-1)
    dist = np.sqrt(dist2)
    wi = d / dist[..., None]
    cos_s = wi[..., 1]           # floor normal +y
    cos_l = -wi[..., 1] * -1.0   # light normal -y: cos_l = dot(-wi, (0,-1,0)) = wi_y
    cos_l = wi[..., 1]
    ok = (cos_s > 0) & (cos_l > 0)
    area = (2 * half) ** 2
    integ = np.where(ok, cos_s * cos_l / dist2, 0.0)
    return albedo / np.pi * L * integ.mean() * area


class TestDirectLighting:
    def test_floor_point_matches_quadrature(self):
        """Render the floor with depth_max=2 (direct light only) and
        compare the center pixel region against the analytic integral."""
        cfg = make_box_scene(spp=512, res=16, depth_max=2)
        r = Renderer(cfg)
        img = r.render(tile=16 * 16)
        # center pixels look at floor near origin through 60deg fov;
        # compute the expected value at the exact hit point of the center ray
        # instead: compare a small center patch mean to quadrature at its
        # mean hit point.  Camera at (0,1,3) looking at (0,0.5,0): center
        # ray hits y=0 plane at t where o.y + t*d.y = 0.
        eye = np.array([0.0, 1.0, 3.0])
        d = np.array([0.0, 0.5, 0.0]) - eye
        d /= np.linalg.norm(d)
        t = -eye[1] / d[1]
        p = eye + t * d
        expected = direct_light_quadrature(p, albedo=0.75)
        got = np.asarray(img)[7:9, 7:9].mean(axis=(0, 1))
        np.testing.assert_allclose(got, expected, rtol=0.2)

    def test_light_is_visible(self):
        """Camera pointed at the light sees its radiance directly."""
        cfg = make_box_scene(spp=4, res=8, depth_max=2)
        cfg.camera.eye = np.array([0.0, 1.0, 0.0], np.float32)
        cfg.camera.look_at = np.array([0.0, 2.0, 0.0], np.float32)
        cfg.camera.up = np.array([0.0, 0.0, 1.0], np.float32)
        cfg.integrator.sample_clamp = 0.0
        r = Renderer(cfg)
        img = np.asarray(r.render(tile=64))
        np.testing.assert_allclose(img[4, 4], 20.0, rtol=1e-4)

    def test_deterministic_and_tile_independent(self):
        cfg = make_box_scene(spp=8, res=16, depth_max=3)
        r = Renderer(cfg)
        img1 = np.asarray(r.render(tile=256))
        img2 = np.asarray(r.render(tile=64))
        np.testing.assert_array_equal(img1, img2)
        assert np.isfinite(img1).all()

    def test_energy_sanity(self):
        """Indirect light adds energy but stays bounded by albedo series."""
        cfg1 = make_box_scene(spp=64, res=8, depth_max=2)
        cfgN = make_box_scene(spp=64, res=8, depth_max=8)
        i1 = np.asarray(Renderer(cfg1).render(tile=64))
        iN = np.asarray(Renderer(cfgN).render(tile=64))
        # more bounces -> not less light
        assert iN.mean() >= i1.mean() * 0.999
        # geometric-series bound: multi-bounce < direct / (1 - albedo)
        assert iN.mean() < i1.mean() / (1 - 0.75) + 1e-3
