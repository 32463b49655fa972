"""Golden ground-truth test: the cornell box must converge to the
Tungsten reference render that ships with the scene (the reference
renderer's own output is ~1.6x off this truth; see PARITY.md)."""

import os

import numpy as np
import pytest

SCENE = "/root/reference/resources/scene/cornell-box/scene_v0.6.xml"
GOLDEN = "/root/reference/resources/scene/cornell-box/TungstenRender.exr"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SCENE), reason="reference scenes not mounted"
)


def test_cornell_matches_tungsten_ground_truth():
    from mcpt_tpu.render.renderer import Renderer
    from mcpt_tpu.scene.parser import load_config
    from mcpt_tpu.utils.image import read_exr

    cfg = load_config(SCENE)
    res = 64
    cfg.camera.width = cfg.camera.height = res
    cfg.integrator.depth_max = 16
    cfg.integrator.sample_clamp = 0.0
    img = np.asarray(Renderer(cfg).render(spp=64, tile=res * res, spp_chunk=16))

    g = read_exr(GOLDEN)
    h, w = g.shape[:2]
    g = g.reshape(res, h // res, res, w // res, 3).mean((1, 3))

    # channel means within 2% (MC noise at 64 spp is ~sub-percent on
    # the mean; a systematic estimator bias would show up here)
    np.testing.assert_allclose(img.mean((0, 1)), g.mean((0, 1)), rtol=0.02)
    # pixelwise relative MSE dominated by residual noise
    relmse = float(np.mean((img - g) ** 2 / (g**2 + 1e-3)))
    assert relmse < 0.05, relmse
