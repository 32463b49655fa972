"""BDPT estimator validation (VERDICT r1 weak #5): quantitative
agreement with the path tracer on direct AND indirect transport.

Round-2 note: the archive's cached-radiance connection formula
(archive/src/integrators/bdpt.cpp:159-245) divides connections by a
uniform instance-area pdf; re-measured here, that estimator is ~1.5x
bright whenever the light subpath's true vertex density is non-uniform
(an indirect-only box).  integrators/bdpt.py therefore re-derives the
connections in standard Veach beta-throughput form — these tests pin
the corrected estimator to the (Tungsten-validated) path tracer on both
scene classes."""

import numpy as np

from mcpt_tpu.render.renderer import Renderer
from mcpt_tpu.scene.ir import InstanceInfo
from tests.test_integrator import make_box_scene, rot_x


def _indirect_cfg(itype, spp=256):
    """Up-facing light under a ceiling panel: every camera path needs
    the ceiling bounce (NEE fails at the floor, works at the ceiling) —
    the scene class where the archive's connection weighting was 1.5x
    bright."""
    cfg = make_box_scene(spp=spp, res=8, depth_max=3)
    cfg.instances[1].to_world = rot_x(-90.0, scale=0.25, ty=1.0)
    cfg.instances.append(InstanceInfo(
        shape="rectangle", id_bsdf=0, to_world=rot_x(90.0, scale=2.0, ty=2.0)
    ))
    cfg.integrator.itype = itype
    return cfg


def test_bdpt_matches_path_on_diffuse_box():
    cfg_p = make_box_scene(spp=192, res=8, depth_max=4)
    img_p = np.asarray(Renderer(cfg_p).render(tile=64))

    cfg_b = make_box_scene(spp=192, res=8, depth_max=4)
    cfg_b.integrator.itype = "bdpt"
    img_b = np.asarray(Renderer(cfg_b).render(tile=64))

    assert np.isfinite(img_b).all()
    ratio = img_b.mean() / img_p.mean()
    assert 0.95 < ratio < 1.05, (img_b.mean(), img_p.mean())


def test_bdpt_matches_path_on_indirect_transport():
    img_p = np.asarray(Renderer(_indirect_cfg("path")).render(tile=64))
    img_b = np.asarray(Renderer(_indirect_cfg("bdpt")).render(tile=64))
    ratio = img_b.mean() / img_p.mean()
    # the pre-fix archive formulation measured 1.47 here
    assert 0.9 < ratio < 1.1, (img_b.mean(), img_p.mean())


def test_bdpt_matches_path_through_specular_chain():
    """Glass sphere between light and floor (the caustic path class).
    Connection-based BDPT cannot construct specular chains — the
    is_connectible MIS gate removes those never-firing strategies from
    the partition and hands the unidirectional construction full weight.
    This pins estimator agreement on the scene class no previous BDPT
    test covered (diffuse-only boxes)."""
    import numpy as np

    from mcpt_tpu.scene.ir import BsdfInfo, BsdfType

    def cfg_for(itype):
        cfg = make_box_scene(spp=256, res=8, depth_max=6)
        glass = BsdfInfo(btype=BsdfType.DIELECTRIC, eta=1.5)
        cfg.bsdfs.append(glass)
        sphere = InstanceInfo(shape="sphere", radius=0.45, id_bsdf=2)
        sphere.to_world = np.eye(4, dtype=np.float32)
        sphere.to_world[:3, 3] = [0.0, 1.0, 0.0]  # between light and floor
        cfg.instances.append(sphere)
        cfg.integrator.itype = itype
        return cfg

    img_p = np.asarray(Renderer(cfg_for("path")).render(tile=64))
    img_b = np.asarray(Renderer(cfg_for("bdpt")).render(tile=64))
    ratio = img_b.mean() / img_p.mean()
    # measured 0.947 at 256 spp; wall time is bdpt-compile-dominated
    assert 0.85 < ratio < 1.15, (img_b.mean(), img_p.mean())


def test_bdpt_sees_emitters_directly():
    cfg = make_box_scene(spp=4, res=8, depth_max=3)
    cfg.integrator.itype = "bdpt"
    cfg.camera.eye = np.array([0.0, 1.0, 0.0], np.float32)
    cfg.camera.look_at = np.array([0.0, 2.0, 0.0], np.float32)
    cfg.camera.up = np.array([0.0, 0.0, 1.0], np.float32)
    img = np.asarray(Renderer(cfg).render(tile=64))
    np.testing.assert_allclose(img[4, 4], 20.0, rtol=1e-4)


def test_bdpt_caustic_firefly_suppression():
    """The archive-BDPT headline claim as a suite gate (r3 VERDICT weak
    #5/#8): on the glass-sphere caustic scene, light-subpath connections
    replace the path tracer's rare-but-huge near-delta-NEE fireflies,
    and relMSE vs a 1024-spp path reference drops ~50x at matched spp.

    Robust formulation (round 5): per-seed whole-image relMSE is a
    heavy-tailed firefly lottery for BOTH estimators — path measured
    {0.01..38} and bdpt {0.03..1.3} across frame_bases — so any gate
    on a single (or mean/median-pooled) relMSE realization flakes
    whenever an estimator change shifts the RNG stream (the r5 NEE
    shadow-ray RR coin did exactly that: same estimator statistics,
    different realization).  The stable statistic is the CAUSTIC-REGION
    energy estimate across independent seeds at matched spp: measured
    64-spp region ratios vs a 1024-spp reference are 0.227-0.336 for
    path (seed std ~0.043, the firefly lottery) vs 0.211 +- 0.002 for
    BDPT (std ~0.0024, ~18x smaller): the light-subpath strategies
    trade the path tracer's rare-huge events for low-variance
    estimates.  (Flip side, measured in GOLDEN.md's BDPT-bias section:
    the pairwise heuristic under-weights those strategies, costing ~8%
    total energy on this scene — suppression is of VARIANCE, not a
    faster-converging mean.)  Gate: BDPT's seed-std is >=3x smaller;
    false-fail needs all path seeds quiet, measured ~0.2%.
    Skips when the reference scene assets are not mounted."""
    import os

    import numpy as np
    import pytest

    xml = ("/root/reference/resources/scene/volumetric-caustic/"
           "no_medium.xml")
    if not os.path.exists(xml):
        pytest.skip("reference scene assets not mounted")

    from mcpt_tpu.render.renderer import Renderer
    from mcpt_tpu.scene.parser import load_config

    def renderer(itype):
        cfg = load_config(xml)
        cfg.camera.width = cfg.camera.height = 64
        cfg.integrator.itype = itype
        return Renderer(cfg)

    ref = np.asarray(renderer("path").render(spp=1024, tile=64 * 64))
    lum = ref.mean(-1)
    caustic = lum > np.percentile(lum, 90)
    ref_region = float(lum[caustic].mean())

    stats = {}
    for itype in ("path", "bdpt"):
        r = renderer(itype)
        ratios = []
        for fb in range(1, 7):
            img = np.asarray(
                r.render(spp=64, tile=64 * 64, frame_base=fb * 15485863)
            )
            ratios.append(float(img.mean(-1)[caustic].mean() / ref_region))
        stats[itype] = (float(np.std(ratios)), ratios)
    # sanity: neither estimator loses the caustic entirely (ratios are
    # well below 1 at 64 spp for both — the region converges slowly)
    for itype in ("path", "bdpt"):
        assert all(0.05 < x < 2.0 for x in stats[itype][1]), stats
    assert stats["bdpt"][0] * 3.0 < stats["path"][0], stats
