"""Ray-regeneration wavefront (integrators.path.shade_regen) tests.

The fused spp x depth loop must reproduce the chunked per-sample
estimator: same per-vertex draw sequence, same MIS/RR/clamp semantics —
only the seed schedule differs (per-sample Tea(pixel, base+k) instead of
one threaded stream), so images agree statistically, not bitwise.
"""

import numpy as np
import pytest

from mcpt_tpu.render.renderer import Renderer
from tests.test_integrator import make_box_scene


def _render(cfg, engine, spp, **kw):
    return np.asarray(Renderer(cfg).render(spp=spp, engine=engine, **kw))


class TestRegenEngine:
    def test_matches_chunked_statistically(self):
        """High-spp means of both engines agree within MC tolerance."""
        cfg = make_box_scene(spp=256, res=16, depth_max=6)
        a = _render(cfg, "chunked", 256, spp_chunk=256)
        b = _render(cfg, "regen", 256, spp_chunk=256)
        # channel means: noise ~ sigma/sqrt(256*N) -> sub-percent
        np.testing.assert_allclose(
            a.mean(axis=(0, 1)), b.mean(axis=(0, 1)), rtol=0.02
        )
        # per-pixel: same estimator, independent streams
        rel = np.abs(a - b).mean() / max(a.mean(), 1e-9)
        assert rel < 0.15, rel

    def test_direct_light_exact_primary(self):
        """A camera staring at the light sees exact radiance (primary
        emitter hits bypass MIS in both engines)."""
        cfg = make_box_scene(spp=4, res=8, depth_max=2)
        cfg.camera.eye = np.array([0.0, 1.0, 0.0], np.float32)
        cfg.camera.look_at = np.array([0.0, 2.0, 0.0], np.float32)
        cfg.camera.up = np.array([0.0, 0.0, 1.0], np.float32)
        img = _render(cfg, "regen", 4, tile=64)
        np.testing.assert_allclose(img[4, 4], 20.0, rtol=1e-4)

    def test_tile_and_chunk_independent(self):
        """Per-sample seeds are pure f(pixel, k): any tile/spp_chunk split
        renders the identical image."""
        cfg = make_box_scene(spp=8, res=16, depth_max=4)
        r = Renderer(cfg)
        img1 = np.asarray(r.render(spp=8, engine="regen", tile=256, spp_chunk=8))
        img2 = np.asarray(r.render(spp=8, engine="regen", tile=64, spp_chunk=8))
        np.testing.assert_array_equal(img1, img2)  # tile split: bitwise
        img3 = np.asarray(r.render(spp=8, engine="regen", tile=256, spp_chunk=4))
        # spp-chunk split: same samples, host-side fp accumulation order
        np.testing.assert_allclose(img1, img3, atol=1e-6)
        assert np.isfinite(img1).all()

    def test_sample_clamp_is_per_sample(self):
        """clamp folds each finished sample, not the running mean — a
        clamped render is bounded by the clamp and darker than unclamped
        (the reference clamps each sample to 1, renderer.cpp:77-79)."""
        cfg = make_box_scene(spp=32, res=8, depth_max=3, light_radiance=50.0)
        cfg.integrator.sample_clamp = 1.0
        clamped = _render(cfg, "regen", 32, tile=64)
        assert clamped.max() <= 1.0 + 1e-6
        cfg2 = make_box_scene(spp=32, res=8, depth_max=3, light_radiance=50.0)
        ref = _render(cfg2, "regen", 32, tile=64)
        assert clamped.mean() < ref.mean()
        # clamp semantics agree across engines on identical seeds is not
        # expected (different streams); compare against chunked statistically
        cfg3 = make_box_scene(spp=256, res=8, depth_max=3, light_radiance=50.0)
        cfg3.integrator.sample_clamp = 1.0
        a = _render(cfg3, "chunked", 256, tile=64, spp_chunk=256)
        b = _render(cfg3, "regen", 256, tile=64, spp_chunk=256)
        np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.03)

    def test_depth_one_and_no_light_paths(self):
        """depth_max=1 (primary only) terminates and matches chunked."""
        cfg = make_box_scene(spp=8, res=8, depth_max=1)
        a = _render(cfg, "chunked", 8, tile=64)
        b = _render(cfg, "regen", 8, tile=64)
        # depth 1: only primary emitter hits contribute -> deterministic
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestVolpathRegen:
    """volpath.shade_regen vs the chunked volpath estimator."""

    def _medium_box(self, spp, depth_max=6):
        """Box scene with a homogeneous-medium sphere in front of the
        light path (mirrors tests/test_medium.py's render scenes)."""
        from mcpt_tpu.scene.ir import InstanceInfo, MediumInfo

        cfg = make_box_scene(spp=spp, res=8, depth_max=depth_max)
        cfg.media.append(MediumInfo(
            sigma_a=np.array([0.4, 0.4, 0.4], np.float32),
            sigma_s=np.array([0.8, 0.8, 0.8], np.float32),
        ))
        ball = InstanceInfo(shape="sphere", radius=0.5, id_bsdf=-1,
                            id_medium_int=0)
        ball.to_world = np.eye(4, dtype=np.float32)
        ball.to_world[:3, 3] = [0.0, 1.0, 0.0]
        cfg.instances.append(ball)
        cfg.integrator.itype = "volpath"
        return cfg

    def test_matches_chunked_statistically(self):
        a = _render(self._medium_box(384), "chunked", 384, tile=64,
                    spp_chunk=128)
        b = _render(self._medium_box(384), "regen", 384, tile=64,
                    spp_chunk=128)
        np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.04)
        assert np.isfinite(b).all()

    def test_depth_one_matches(self):
        cfg = self._medium_box(8, depth_max=1)
        a = _render(cfg, "chunked", 8, tile=64)
        b = _render(cfg, "regen", 8, tile=64)
        np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.1)


class TestShadowRayRR:
    """Contribution-proportional shadow-ray Russian roulette
    (path._nee_rr): unbiased — high-spp means match the tau=0
    estimator within MC tolerance."""

    def test_means_match_no_rr(self, monkeypatch):
        cfg = make_box_scene(spp=512, res=12, depth_max=4)
        monkeypatch.setenv("MCPT_NEE_RR_TAU", "0")
        a = _render(cfg, "regen", 512, spp_chunk=512)
        monkeypatch.setenv("MCPT_NEE_RR_TAU", "0.1")
        b = _render(cfg, "regen", 511, spp_chunk=511)  # distinct compile
        np.testing.assert_allclose(
            a.mean(axis=(0, 1)), b.mean(axis=(0, 1)), rtol=0.03
        )
        assert np.isfinite(b).all()
