"""BDPT vs unidirectional path tracing: both must converge to the same
integral on a diffuse scene (archive/src/integrators/bdpt.cpp parity)."""

import numpy as np

from mcpt_tpu.render.renderer import Renderer
from tests.test_integrator import make_box_scene


def test_bdpt_matches_path_on_diffuse_box():
    cfg_p = make_box_scene(spp=192, res=8, depth_max=4)
    img_p = np.asarray(Renderer(cfg_p).render(tile=64))

    cfg_b = make_box_scene(spp=192, res=8, depth_max=4)
    cfg_b.integrator.itype = "bdpt"
    img_b = np.asarray(Renderer(cfg_b).render(tile=64))

    assert np.isfinite(img_b).all()
    # same integral within MC noise + the documented heuristic-weighting
    # differences of the archive estimator
    ratio = img_b.mean() / img_p.mean()
    assert 0.8 < ratio < 1.25, (img_b.mean(), img_p.mean())


def test_bdpt_sees_emitters_directly():
    cfg = make_box_scene(spp=4, res=8, depth_max=3)
    cfg.integrator.itype = "bdpt"
    cfg.camera.eye = np.array([0.0, 1.0, 0.0], np.float32)
    cfg.camera.look_at = np.array([0.0, 2.0, 0.0], np.float32)
    cfg.camera.up = np.array([0.0, 0.0, 1.0], np.float32)
    img = np.asarray(Renderer(cfg).render(tile=64))
    np.testing.assert_allclose(img[4, 4], 20.0, rtol=1e-4)
