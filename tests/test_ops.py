"""Unit tests for the L0/L1 math kit: RNG determinism, warp distributions
against closed forms, microfacet identities (the tests the reference never
had — SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mcpt_tpu.ops import math as m
from mcpt_tpu.ops import microfacet as mf
from mcpt_tpu.ops import rng, warps


class TestRng:
    def test_tea_matches_cpp(self):
        # Golden values computed with the exact csrt Tea<4> algorithm.
        def tea_ref(v0, v1):
            s0 = 0
            M = 0xFFFFFFFF
            for _ in range(4):
                s0 = (s0 + 0x9E3779B9) & M
                v0 = (v0 + ((((v1 << 4) & M) + 0xA341316C) ^ ((v1 + s0) & M) ^ ((v1 >> 5) + 0xC8013EA4))) & M
                v1 = (v1 + ((((v0 << 4) & M) + 0xAD90777D) ^ ((v0 + s0) & M) ^ ((v0 >> 5) + 0x7E95761E))) & M
            return v0

        for a, b in [(0, 0), (1, 0), (12345, 678), (3 * 1000000, 7)]:
            assert int(rng.tea(a, b)) == tea_ref(a, b)

    def test_lcg_stream(self):
        # LCG: seed' = seed*1664525 + 1013904223; sample = (s & 0xffffff)/2^24
        state = jnp.uint32(42)
        state, x = rng.random_float(state)
        s_ref = (42 * 1664525 + 1013904223) & 0xFFFFFFFF
        assert int(state) == s_ref
        assert float(x) == pytest.approx((s_ref & 0xFFFFFF) / 2**24, abs=1e-7)

    def test_random_float_range_and_mean(self):
        state = rng.tea(jnp.arange(10000, dtype=jnp.uint32), 0)
        state, x = rng.random_float(state)
        x = np.asarray(x)
        assert (x >= 0).all() and (x < 1).all()
        assert abs(x.mean() - 0.5) < 0.02

    def test_van_der_corput_base2(self):
        # VdC_2(1) = 0.5, VdC_2(2) = 0.25, VdC_2(3) = 0.75
        got = np.asarray(rng.van_der_corput_base2(jnp.array([1, 2, 3, 4], jnp.uint32)))
        np.testing.assert_allclose(got, [0.5, 0.25, 0.75, 0.125], atol=1e-7)

    def test_van_der_corput_base3(self):
        got = np.asarray(rng.van_der_corput(jnp.array([1, 2, 3], jnp.uint32), 3))
        np.testing.assert_allclose(got, [1 / 3, 2 / 3, 1 / 9], atol=1e-6)


class TestWarps:
    def _uniforms(self, n=200000, d=2, seed=7):
        r = np.random.default_rng(seed)
        return [jnp.asarray(r.random(n, dtype=np.float32)) for _ in range(d)]

    def test_hemisphere_cosine(self):
        xi0, xi1 = self._uniforms()
        vec, pdf = warps.sample_hemisphere_cosine(xi0, xi1)
        v = np.asarray(vec)
        assert (v[:, 2] >= 0).all()
        np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
        # E[cos theta] = 2/3 for cosine-weighted hemisphere
        assert abs(v[:, 2].mean() - 2 / 3) < 0.01
        np.testing.assert_allclose(np.asarray(pdf), v[:, 2] / np.pi, atol=1e-5)

    def test_sphere_uniform(self):
        xi0, xi1 = self._uniforms()
        v = np.asarray(warps.sample_sphere_uniform(xi0, xi1))
        np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
        assert abs(v.mean(axis=0)).max() < 0.01

    def test_cone_uniform(self):
        xi0, xi1 = self._uniforms()
        cos_cut = 0.9
        v = np.asarray(warps.sample_cone_uniform(cos_cut, xi0, xi1))
        assert (v[:, 2] >= cos_cut - 1e-6).all()
        # uniform in cos theta over [cos_cut, 1]
        assert abs(v[:, 2].mean() - (1 + cos_cut) / 2) < 0.002

    def test_triangle_uniform(self):
        xi0, xi1 = self._uniforms()
        w, u, v = warps.sample_triangle_uniform(xi0, xi1)
        w, u, v = map(np.asarray, (w, u, v))
        assert (w >= -1e-6).all() and (u >= -1e-6).all() and (v >= -1e-6).all()
        np.testing.assert_allclose(w + u + v, 1.0, atol=1e-5)
        # each barycentric coordinate has mean 1/3 under uniform sampling
        assert abs(w.mean() - 1 / 3) < 0.005

    def test_searchsorted_cdf(self):
        cdf = jnp.asarray([0.0, 0.2, 0.5, 1.0])
        tgt = jnp.asarray([0.0, 0.1, 0.2, 0.3, 0.9, 1.0])
        got = np.asarray(warps.searchsorted_cdf(cdf, tgt))
        np.testing.assert_array_equal(got, [0, 0, 0, 1, 2, 2])


class TestMicrofacet:
    def test_ggx_pdf_consistency(self):
        """pdf returned by sample_ggx must equal pdf_ggx of the sample."""
        r = np.random.default_rng(0)
        xi0 = jnp.asarray(r.random(5000, dtype=np.float32))
        xi1 = jnp.asarray(r.random(5000, dtype=np.float32))
        for au, av in [(0.1, 0.1), (0.5, 0.5), (0.2, 0.6)]:
            h, pdf_s = mf.sample_ggx(xi0, xi1, au, av)
            pdf_e = mf.pdf_ggx(au, av, h)
            np.testing.assert_allclose(
                np.asarray(pdf_s), np.asarray(pdf_e), rtol=2e-2, atol=1e-3
            )

    def test_ggx_ndf_normalization(self):
        """Monte-Carlo check: E[1] under the sampled pdf integrates D*cos to 1."""
        r = np.random.default_rng(1)
        n = 200000
        xi0 = jnp.asarray(r.random(n, dtype=np.float32))
        xi1 = jnp.asarray(r.random(n, dtype=np.float32))
        h, pdf = mf.sample_ggx(xi0, xi1, 0.3, 0.3)
        # chi^2-style sanity: cos_theta distribution matches analytic CDF
        cos = np.asarray(h[..., 2])
        alpha2 = 0.09
        # GGX: P(cos > c) = analytic; test median
        med = np.median(cos)
        # cdf of tan^2 = alpha^2 * xi/(1-xi) at xi=0.5 -> tan^2 = alpha^2
        expect_med = 1 / np.sqrt(1 + alpha2)
        assert abs(med - expect_med) < 0.005

    def test_smith_g1_limits(self):
        v = jnp.asarray([[0.0, 0.0, 1.0]])
        h = jnp.asarray([[0.0, 0.0, 1.0]])
        g = mf.smith_g1(0.5, 0.5, v, h)
        np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)

    def test_fresnel_schlick(self):
        f0 = mf.fresnel_schlick(jnp.asarray(1.0), jnp.asarray(0.04))
        f90 = mf.fresnel_schlick(jnp.asarray(0.0), jnp.asarray(0.04))
        assert float(f0) == pytest.approx(0.04, abs=1e-6)
        assert float(f90) == pytest.approx(1.0, abs=1e-6)


class TestMath:
    def test_reflect(self):
        wi = jnp.asarray([[1.0, -1.0, 0.0]]) / np.sqrt(2)
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        out = np.asarray(m.reflect(wi, n))[0]
        np.testing.assert_allclose(out, [1 / np.sqrt(2), 1 / np.sqrt(2), 0], atol=1e-6)

    def test_refract_tir(self):
        # grazing into a less dense medium -> total internal reflection
        wi = jnp.asarray([[0.99, -np.sqrt(1 - 0.99**2), 0.0]])
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        ok, _ = m.refract(wi, n, 1.5)
        assert not bool(ok[0])

    def test_refract_snell(self):
        wi = jnp.asarray([[np.sin(0.5), -np.cos(0.5), 0.0]], dtype=jnp.float32)
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        ok, wt = m.refract(wi, n, 1.0 / 1.5)
        assert bool(ok[0])
        sin_t = float(np.asarray(wt)[0, 0])
        assert sin_t == pytest.approx(np.sin(0.5) / 1.5, abs=1e-5)

    def test_spherical_roundtrip(self):
        r = np.random.default_rng(3)
        v = m.normalize(jnp.asarray(r.normal(size=(100, 3)), jnp.float32))
        theta, phi = m.cartesian_to_spherical(v)
        back = m.spherical_to_cartesian(theta, phi)
        np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)

    def test_onb_orthonormal(self):
        r = np.random.default_rng(4)
        n = m.normalize(jnp.asarray(r.normal(size=(100, 3)), jnp.float32))
        t, b = m.build_onb(n)
        t, b, n = map(np.asarray, (t, b, n))
        np.testing.assert_allclose((t * b).sum(-1), 0, atol=1e-5)
        np.testing.assert_allclose((t * n).sum(-1), 0, atol=1e-5)
        np.testing.assert_allclose((b * n).sum(-1), 0, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1, atol=1e-5)

    def test_local_world_roundtrip(self):
        r = np.random.default_rng(5)
        n = m.normalize(jnp.asarray(r.normal(size=(50, 3)), jnp.float32))
        t, b = m.build_onb(n)
        v = m.normalize(jnp.asarray(r.normal(size=(50, 3)), jnp.float32))
        lv = m.to_local(v, t, b, n)
        wv = m.to_world(lv, t, b, n)
        np.testing.assert_allclose(np.asarray(wv), np.asarray(v), atol=1e-5)

    def test_local_to_world_matches_onb(self):
        """local_to_world(v, up) must agree with build_onb's frame."""
        r = np.random.default_rng(6)
        up = m.normalize(jnp.asarray(r.normal(size=(50, 3)), jnp.float32))
        local = m.normalize(jnp.asarray(r.normal(size=(50, 3)), jnp.float32))
        a = m.local_to_world(local, up)
        t, b = m.build_onb(up)
        bvec = m.to_world(local, t, b, up)
        # both are valid frames around `up`; check z-component preserved
        np.testing.assert_allclose(
            np.asarray(m.dot(a, up)), np.asarray(local[..., 2]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(m.dot(bvec, up)), np.asarray(local[..., 2]), atol=1e-5
        )

    def test_solve_quadratic(self):
        ok, x0, x1 = m.solve_quadratic(
            jnp.asarray([1.0, 1.0, 0.0, 1.0]),
            jnp.asarray([-3.0, 0.0, 2.0, 0.0]),
            jnp.asarray([2.0, 1.0, -4.0, 1.0]),
        )
        ok = np.asarray(ok)
        assert list(ok) == [True, False, True, False]
        assert float(x0[0]) == pytest.approx(1.0)
        assert float(x1[0]) == pytest.approx(2.0)
        assert float(x0[2]) == pytest.approx(2.0)

    def test_mis_weight(self):
        assert float(m.mis_weight(jnp.asarray(1.0), jnp.asarray(1.0))) == pytest.approx(0.5)
        assert float(m.mis_weight(jnp.asarray(10.0), jnp.asarray(1.0))) == pytest.approx(100 / 101)
