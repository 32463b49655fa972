"""Single-batched-trace regen engine (path._shade_regen_batched).

The batched body defers each vertex's NEE occlusion by one iteration
(resolved inside the batch that traces the next continuation) but keeps
the per-sample draw sequence and contribution formulas identical to
shade_regen — so on a gated scene the two bodies must agree to float
tolerance, and the chunked engine must agree statistically."""

import numpy as np
import pytest

from mcpt_tpu.render.renderer import Renderer
from mcpt_tpu.scene.ir import (
    BsdfInfo, BsdfType, CameraInfo, InstanceInfo, IntegratorInfo,
    MeshData, RendererConfig,
)
from mcpt_tpu.models.texture import TextureBuilder
from tests.test_integrator import rot_x


def make_mesh_box_scene(spp=8, res=12, depth_max=4, grid=104,
                        sample_clamp=0.0):
    """The test_integrator box scene with the floor tessellated past
    DENSE_MAX_PRIMS so the march path (and the batched-trace gate)
    engages."""
    tex = TextureBuilder()
    white = tex.add_constant([0.75, 0.75, 0.75])
    rad = tex.add_constant([20.0] * 3)
    bsdfs = [
        BsdfInfo(btype=BsdfType.DIFFUSE, id_diffuse_reflectance=white),
        BsdfInfo(btype=BsdfType.AREA_LIGHT, id_radiance=rad, weight=1.0),
    ]
    # tessellated floor on y=0: grid x grid quads = 2*grid^2 tris
    xs = np.linspace(-2.0, 2.0, grid + 1, dtype=np.float32)
    X, Z = np.meshgrid(xs, xs, indexing="ij")
    V = np.stack([X, np.zeros_like(X), Z], axis=-1).reshape(-1, 3)
    idx = []
    for i in range(grid):
        for j in range(grid):
            a = i * (grid + 1) + j
            b = a + 1
            c = a + (grid + 1)
            d = c + 1
            idx += [[a, c, b], [b, c, d]]
    mesh = MeshData(positions=V, indices=np.asarray(idx, np.int32))
    floor = InstanceInfo(shape="mesh", id_bsdf=0, mesh=mesh)
    light = InstanceInfo(shape="rectangle", id_bsdf=1)
    light.to_world = rot_x(90.0, scale=0.25, ty=2.0)
    cam = CameraInfo(
        width=res, height=res, spp=spp, fov_x=60.0,
        eye=np.array([0.0, 1.0, 3.0], np.float32),
        look_at=np.array([0.0, 0.5, 0.0], np.float32),
        up=np.array([0.0, 1.0, 0.0], np.float32),
    )
    integ = IntegratorInfo(depth_max=depth_max, sample_clamp=sample_clamp)
    return RendererConfig(camera=cam, integrator=integ, textures=tex,
                          bsdfs=bsdfs, instances=[floor, light])


def test_gate_engages():
    from mcpt_tpu.integrators.path import _use_batched_trace
    from mcpt_tpu.scene.compile import compile_scene

    scene = compile_scene(make_mesh_box_scene())
    assert scene.all_opaque
    assert _use_batched_trace(scene)


@pytest.mark.parametrize("clamp", [0.0, 1.5])
def test_batched_matches_unbatched(monkeypatch, clamp):
    cfg = make_mesh_box_scene(spp=4, res=10, depth_max=4,
                              sample_clamp=clamp)
    monkeypatch.setenv("MCPT_BATCH_TRACE", "0")
    ref = np.asarray(Renderer(cfg).render(spp=4, engine="regen", tile=50))
    monkeypatch.setenv("MCPT_BATCH_TRACE", "1")
    got = np.asarray(Renderer(cfg).render(spp=4, engine="regen", tile=50))
    # identical draws, identical per-sample terms; only float
    # accumulation order differs between the two program shapes
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_batched_matches_chunked_statistically():
    cfg = make_mesh_box_scene(spp=64, res=8, depth_max=4)
    a = np.asarray(Renderer(cfg).render(spp=64, engine="chunked",
                                        spp_chunk=64))
    b = np.asarray(Renderer(cfg).render(spp=64, engine="regen",
                                        spp_chunk=64))
    np.testing.assert_allclose(
        a.mean(axis=(0, 1)), b.mean(axis=(0, 1)), rtol=0.03
    )
