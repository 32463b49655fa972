"""Pair-scheduled traversal (ops.pallas_pairs) vs the XLA march and
brute force — interpret mode on CPU, plus overflow-fallback coverage."""

import numpy as np
import jax.numpy as jnp

from mcpt_tpu.ops.traversal import (
    _intersect_march,
    _intersect_pairs,
    intersect_closest_brute,
)
from tests.test_bvh import commit_geometry, random_rays, random_soup


def _geom(n_tris=900, seed=3):
    verts = random_soup(n_tris, seed=seed)
    return commit_geometry(verts, None, None, None, np.zeros(n_tris))


def _assert_same_hits(got, ref, o, d, geom):
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(ref.valid))
    m = np.asarray(ref.valid)
    np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(ref.t)[m],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.inside)[m],
                                  np.asarray(ref.inside)[m])
    # prim may differ only on exact-t ties: the winning triangle must
    # reproduce the reference t
    from mcpt_tpu.ops.intersect import intersect_triangle

    pid = np.asarray(got.prim)[m]
    hit, t, _, _, _ = intersect_triangle(
        o[m], d[m], geom.p0[pid], geom.e1[pid], geom.e2[pid], 1e-4, 3.4e38
    )
    assert bool(jnp.all(hit))
    np.testing.assert_allclose(np.asarray(t), np.asarray(ref.t)[m],
                               rtol=1e-5, atol=1e-5)


def test_pairs_matches_march_interpret():
    geom = _geom()
    o, d = random_rays(700, seed=11)
    ref = _intersect_march(geom, o, d, 1e-4, 3.4e38, False)
    got = _intersect_pairs(geom, o, d, 1e-4, 3.4e38, False, interpret=True)
    _assert_same_hits(got, ref, o, d, geom)


def test_pairs_matches_brute_interpret():
    geom = _geom(n_tris=500, seed=7)
    o, d = random_rays(400, seed=13)
    ref = intersect_closest_brute(geom, o, d, 1e-4, 3.4e38)
    got = _intersect_pairs(geom, o, d, 1e-4, 3.4e38, False, interpret=True)
    _assert_same_hits(got, ref, o, d, geom)


def test_pairs_any_hit_interpret():
    geom = _geom(n_tris=600, seed=17)
    o, d = random_rays(500, seed=19)
    ref = _intersect_march(geom, o, d, 1e-4, 3.4e38, True)
    got = _intersect_pairs(geom, o, d, 1e-4, 3.4e38, True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(ref.valid))


def test_pairs_overflow_fallback(monkeypatch):
    """K=1 forces nearly every ray through the block-march fallback —
    results must still match brute force exactly."""
    monkeypatch.setenv("MCPT_PAIR_K", "1")
    geom = _geom(n_tris=500, seed=23)
    o, d = random_rays(300, seed=29)
    ref = intersect_closest_brute(geom, o, d, 1e-4, 3.4e38)
    got = _intersect_pairs(geom, o, d, 1e-4, 3.4e38, False, interpret=True)
    _assert_same_hits(got, ref, o, d, geom)
    ref_a = _intersect_march(geom, o, d, 1e-4, 3.4e38, True)
    got_a = _intersect_pairs(geom, o, d, 1e-4, 3.4e38, True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_a.valid),
                                  np.asarray(ref_a.valid))


def test_pairs_t_window_and_dead_lanes():
    geom = _geom(n_tris=400, seed=31)
    o, d = random_rays(256, seed=37)
    # dead lanes (t_max = 0) never hit
    dead = _intersect_pairs(geom, o, d, 1e-4, 0.0, False, interpret=True)
    assert not bool(np.asarray(dead.valid).any())
    # t window cut: no reported t beyond the cap
    full = _intersect_pairs(geom, o, d, 1e-4, 3.4e38, False, interpret=True)
    tcap = float(np.median(np.asarray(full.t)[np.asarray(full.valid)]))
    cut = _intersect_pairs(geom, o, d, 1e-4, tcap, False, interpret=True)
    m = np.asarray(cut.valid)
    assert (np.asarray(cut.t)[m] <= tcap + 1e-5).all()
    # every cut hit matches the full traversal's result
    np.testing.assert_allclose(np.asarray(cut.t)[m], np.asarray(full.t)[m],
                               rtol=1e-6, atol=1e-6)


def test_pallas_pairs_on_chip_equivalence():
    """Real-Mosaic (non-interpret) equivalence for the pair kernels —
    the pair path is the DEFAULT traversal for thin-chunk scenes
    (traversal.resolved_strategy), so it gets the same on-chip gate as
    the march kernel.  Runs only under MCPT_TEST_TPU=1."""
    import jax
    import pytest

    if jax.default_backend() != "tpu":
        pytest.skip("needs a real TPU backend (MCPT_TEST_TPU=1)")
    geom = _geom(n_tris=900, seed=3)
    o, d = random_rays(700, seed=11)
    ref = _intersect_march(geom, o, d, 1e-4, 3.4e38, False)
    got = _intersect_pairs(geom, o, d, 1e-4, 3.4e38, False,
                           interpret=False)
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(ref.valid))
    m = np.asarray(ref.valid)
    np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(ref.t)[m],
                               rtol=1e-5, atol=1e-5)
    any_ref = _intersect_march(geom, o, d, 1e-4, 3.4e38, True)
    any_got = _intersect_pairs(geom, o, d, 1e-4, 3.4e38, True,
                               interpret=False)
    np.testing.assert_array_equal(np.asarray(any_got.valid),
                                  np.asarray(any_ref.valid))


def test_auto_routing(monkeypatch):
    """resolved_strategy: pairs iff the chunk doubling landed thin
    (march_leaf < 256); env override wins."""
    from mcpt_tpu.ops import traversal as T

    class G:
        march_leaf = 128

    class G2:
        march_leaf = 256

    monkeypatch.delenv("MCPT_TRAVERSAL", raising=False)
    assert T.resolved_strategy(G) == "pairs"
    assert T.resolved_strategy(G2) == "march"
    monkeypatch.setenv("MCPT_TRAVERSAL", "march")
    assert T.resolved_strategy(G) == "march"
    monkeypatch.setenv("MCPT_TRAVERSAL", "pairs")
    assert T.resolved_strategy(G2) == "pairs"
