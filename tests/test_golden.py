"""Golden ground-truth gates (VERDICT r1 weak #7/#10): cornell vs the
Tungsten EXR truth, plus box / lte-orb-silver / volumetric-caustic vs
the reference renderer's own committed results
(/root/reference/resources/results/*.png) — four cheap CI gates that
catch estimator regressions across triangles, quadrics, conductor/
plastic, and participating media."""

import os

import numpy as np
import pytest

SCENE = "/root/reference/resources/scene/cornell-box/scene_v0.6.xml"
GOLDEN = "/root/reference/resources/scene/cornell-box/TungstenRender.exr"
SCENES = "/root/reference/resources/scene"
RESULTS = "/root/reference/resources/results"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SCENE), reason="reference scenes not mounted"
)


def _render(xml, res=64, spp=32, depth=8, clamp=0.0):
    from mcpt_tpu.render.renderer import Renderer
    from mcpt_tpu.scene.parser import load_config

    cfg = load_config(xml)
    cfg.camera.width = cfg.camera.height = res
    cfg.integrator.depth_max = depth
    cfg.integrator.sample_clamp = clamp
    return np.asarray(
        Renderer(cfg).render(spp=spp, tile=res * res, spp_chunk=16)
    )


def _own_golden(name, res):
    """Reference-own result PNG: sRGB->linear FIRST, then box-downsample
    (matches scripts/golden_report.py)."""
    from mcpt_tpu.utils.image import read_png_linear

    g = read_png_linear(f"{RESULTS}/{name}.png")
    h, w = g.shape[:2]
    return g[: res * (h // res), : res * (w // res)].reshape(
        res, h // res, res, w // res, 3
    ).mean((1, 3))


def _display_relmse(img, golden_linear):
    a = np.clip(img, 0.0, 1.0) ** (1 / 2.2)
    b = np.clip(golden_linear, 0.0, 1.0) ** (1 / 2.2)
    return float(np.mean((a - b) ** 2 / (b**2 + 1e-3)))


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


def test_box_matches_reference_own_render():
    """Analytic cylinder/disk/sphere scene vs the reference's committed
    render (GOLDEN.md r1: 0.085 at 128px/32spp).  spp kept low: this is
    a CPU CI gate (~2 min), the threshold allows the extra noise."""
    img = _render(f"{SCENES}/box/scene_v0.6.xml", spp=8)
    g = _own_golden("box", 64)
    assert _display_relmse(img, g) < 0.2


def test_volumetric_caustic_matches_reference_own_render():
    """volpath + glass sphere + isotropic medium, in clamp-compat mode:
    the scene's radiance-1200 light makes the reference's sample clamp
    (csrt renderer.cpp:77-79) discard ~45% of the energy, so the
    unclamped estimator correctly renders ~2x brighter than the
    committed PNG (measured depth-8 means 0.64 vs 0.32; clamp=1 lands
    at 0.36 / relMSE 0.044)."""
    img = _render(f"{SCENES}/volumetric-caustic/scene_v0.6.xml", spp=32,
                  depth=8, clamp=1.0)
    g = _own_golden("volumetric-caustic_isotropic", 64)
    assert _display_relmse(img, g) < 0.12


def test_matpreview_conductor_structure_matches_reference():
    """matpreview conductor (60k-tri .serialized mesh -> march traversal,
    HDR envmap importance sampling, smooth conductor).  The reference's
    own render carries its global estimator-energy defect (GOLDEN.md
    acceptance table: one display gain of ~0.75 explains the whole
    matpreview residual), so this gate fits that single scalar and
    bounds the STRUCTURAL residual (measured 0.054 at 40x30@8spp)."""
    from mcpt_tpu.render.renderer import Renderer
    from mcpt_tpu.scene.parser import load_config

    cfg = load_config(f"{SCENES}/matpreview/conductor.xml")
    w, h = 40, 30  # keeps the native 4:3 aspect
    cfg.camera.width, cfg.camera.height = w, h
    cfg.integrator.depth_max = 8
    img = np.asarray(Renderer(cfg).render(spp=8, tile=w * h, spp_chunk=8))

    from mcpt_tpu.utils.image import read_png_linear

    g = read_png_linear(f"{RESULTS}/conductor.png")
    gh, gw = g.shape[:2]
    g = g[: h * (gh // h), : w * (gw // w)].reshape(
        h, gh // h, w, gw // w, 3
    ).mean((1, 3))

    od = np.clip(img, 0.0, 1.0) ** (1 / 2.2)
    rd = np.clip(g, 0.0, 1.0) ** (1 / 2.2)
    gain = float((od * rd).sum() / (od * od).sum())
    relmse = float(np.mean((gain * od - rd) ** 2 / (rd**2 + 1e-2)))
    assert 0.6 < gain < 0.95, gain
    assert relmse < 0.11, relmse


def test_mercury_rough_diffuse_structure_matches_reference():
    """mercury/rough_diffuse.xml: all-quadric scene (sphere + emissive
    disk light), Oren-Nayar, bump, envmap — the scene whose NEE program
    SIGILLed the round-1 TPU compiler (fixed by the scalar-level disk
    normal fold, ops/quadric.py).  The checkout is missing
    textures/8k_mercury.jpg (0.5-gray fallback) so the background
    differs from the committed render by a global factor; the gate fits
    one display gain and bounds structure (measured 0.013 at 64px@8spp)."""
    from mcpt_tpu.render.renderer import Renderer
    from mcpt_tpu.scene.parser import load_config
    from mcpt_tpu.utils.image import read_png_linear

    g = read_png_linear(f"{RESULTS}/mercury_rough-diffuse.png")
    gh, gw = g.shape[:2]
    cfg = load_config(f"{SCENES}/mercury/rough_diffuse.xml")
    w = h = 64
    cfg.camera.width, cfg.camera.height = w, h
    cfg.integrator.depth_max = 6
    img = np.asarray(Renderer(cfg).render(spp=8, tile=w * h))

    g = g[: h * (gh // h), : w * (gw // w)].reshape(
        h, gh // h, w, gw // w, 3
    ).mean((1, 3))
    od = np.clip(img, 0.0, 1.0) ** (1 / 2.2)
    rd = np.clip(g, 0.0, 1.0) ** (1 / 2.2)
    gain = float((od * rd).sum() / (od * od).sum())
    relmse = float(np.mean((gain * od - rd) ** 2 / (rd**2 + 1e-2)))
    assert 0.55 < gain < 0.95, gain
    assert relmse < 0.05, relmse


def test_lte_orb_silver_matches_reference_own_render():
    """Conductor + plastic orb under an area light (mesh scene -> march
    traversal path) vs the reference's committed render (GOLDEN.md r1:
    0.065 at 128px/32spp).  Low spp: CPU CI gate; threshold covers the
    noise."""
    img = _render(f"{SCENES}/lte-orb/silver.xml", spp=8)
    g = _own_golden("lte-orb_silver", 64)
    assert _display_relmse(img, g) < 0.2
