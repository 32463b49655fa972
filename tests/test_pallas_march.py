"""Pallas march kernel (interpret mode) vs the XLA march and brute force.

The kernel processes chunks in a different order than the XLA march
(block-min-entry vs per-lane nearest), so `t` must agree everywhere but
`prim` may differ on exact-t ties; the assertions compare t/valid/inside
strictly and check the winning prim produces the same t.
"""

import numpy as np
import jax.numpy as jnp

from mcpt_tpu.ops.traversal import (
    _intersect_march,
    _intersect_march_pallas,
    intersect_closest_brute,
)
from tests.test_bvh import commit_geometry, random_rays, random_soup


def _geom(n_tris=900, seed=3):
    verts = random_soup(n_tris, seed=seed)
    return commit_geometry(verts, None, None, None, np.zeros(n_tris))


def test_pallas_march_matches_xla_march_interpret():
    geom = _geom()
    o, d = random_rays(700, seed=11)
    ref = _intersect_march(geom, o, d, 1e-4, 3.4e38, False)
    got = _intersect_march_pallas(geom, o, d, 1e-4, 3.4e38, False,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(ref.valid))
    m = np.asarray(ref.valid)
    np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(ref.t)[m],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.inside)[m],
                                  np.asarray(ref.inside)[m])
    # prim may differ only on exact-t ties: re-evaluating the kernel's
    # winning triangle must reproduce the reference t
    from mcpt_tpu.ops.intersect import intersect_triangle

    pid = np.asarray(got.prim)[m]
    hit, t, _, _, _ = intersect_triangle(
        o[m], d[m], geom.p0[pid], geom.e1[pid], geom.e2[pid], 1e-4, 3.4e38
    )
    assert bool(jnp.all(hit))
    np.testing.assert_allclose(np.asarray(t), np.asarray(ref.t)[m],
                               rtol=1e-5, atol=1e-5)


def test_pallas_march_matches_brute_interpret():
    geom = _geom(n_tris=500, seed=7)
    o, d = random_rays(400, seed=13)
    ref = intersect_closest_brute(geom, o, d, 1e-4, 3.4e38)
    got = _intersect_march_pallas(geom, o, d, 1e-4, 3.4e38, False,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(ref.valid))
    m = np.asarray(ref.valid)
    np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(ref.t)[m],
                               rtol=1e-5, atol=1e-5)


def test_pallas_march_anyhit_interpret():
    geom = _geom(n_tris=500, seed=9)
    o, d = random_rays(400, seed=17)
    ref = intersect_closest_brute(geom, o, d, 1e-4, 3.4e38)
    got = _intersect_march_pallas(geom, o, d, 1e-4, 3.4e38, True,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(ref.valid))


def test_pallas_march_respects_tmax_window():
    geom = _geom(n_tris=300, seed=21)
    o, d = random_rays(256, seed=23)
    full = _intersect_march_pallas(geom, o, d, 1e-4, 3.4e38, False,
                                   interpret=True)
    t_cut = 0.45
    cut = _intersect_march_pallas(geom, o, d, 1e-4, t_cut, False,
                                  interpret=True)
    v_full = np.asarray(full.valid)
    v_cut = np.asarray(cut.valid)
    t_full = np.asarray(full.t)
    # every hit within the window must still be found, none beyond it
    want = v_full & (t_full < t_cut)
    np.testing.assert_array_equal(v_cut, want)


def test_pallas_march_on_chip_equivalence():
    """Real-Mosaic (non-interpret) equivalence — the VERDICT round-1 gap
    "the Pallas kernel has never executed on a real TPU".  Runs only
    when the suite itself is on a TPU backend (MCPT_TEST_TPU=1); the
    measured on-chip result is also recorded in docs/PERF.md
    (bit-exact vs the XLA march on matpreview, 2.5-5.6x faster)."""
    import jax
    import pytest

    if jax.default_backend() != "tpu":
        pytest.skip("needs a real TPU backend (MCPT_TEST_TPU=1)")
    geom = _geom(n_tris=900, seed=3)
    o, d = random_rays(700, seed=11)
    ref = _intersect_march(geom, o, d, 1e-4, 3.4e38, False)
    got = _intersect_march_pallas(geom, o, d, 1e-4, 3.4e38, False,
                                  interpret=False)
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(ref.valid))
    m = np.asarray(ref.valid)
    np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(ref.t)[m],
                               rtol=1e-5, atol=1e-5)
    any_ref = _intersect_march(geom, o, d, 1e-4, 3.4e38, True)
    any_got = _intersect_march_pallas(geom, o, d, 1e-4, 3.4e38, True,
                                      interpret=False)
    np.testing.assert_array_equal(np.asarray(any_got.valid),
                                  np.asarray(any_ref.valid))


def test_pallas_march_super_cull_on_off_identical(monkeypatch):
    """The two-level super-chunk phase A must be EXACT: for every block,
    a culled super means no ray in the block enters its union AABB, so
    per-chunk block-min entries are INF either way.  Compare the full
    output (t, prim, valid, inside) bit-for-bit between the dense and
    the two-level phase A."""
    geom = _geom(n_tris=1200, seed=31)
    o, d = random_rays(600, seed=37)
    monkeypatch.setenv("MCPT_MARCH_SUPER", "0")
    off = _intersect_march_pallas(geom, o, d, 1e-4, 3.4e38, False,
                                  interpret=True)
    monkeypatch.setenv("MCPT_MARCH_SUPER", "1")
    on = _intersect_march_pallas(geom, o, d, 1e-4, 3.4e38, False,
                                 interpret=True)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(off),
                    jax.tree_util.tree_leaves(on)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pallas_march_traces_beyond_super_lanes():
    """Scenes with more than SUP_LANES*SUPER chunks must still trace:
    the r3 wrapper computed the super-union AABBs unconditionally and
    raised at trace time on the negative pad width even though the cull
    was disabled (ADVICE r4, high).  eval_shape exercises exactly the
    trace path without paying for execution."""
    import jax

    from mcpt_tpu.ops.pallas_march import SUP_LANES, SUPER, march_sweep

    lm = (SUP_LANES + 1) * SUPER  # one super too many
    ls = 8
    rays = jax.ShapeDtypeStruct((1, 8, 128), jnp.float32)
    cbox = jax.ShapeDtypeStruct((4, lm), jnp.float32)
    tris = jax.ShapeDtypeStruct((lm, 16, ls), jnp.float32)
    outs = jax.eval_shape(
        lambda r, lo, hi, t: march_sweep(r, lo, hi, t, interpret=True),
        rays, cbox, cbox, tris,
    )
    assert outs[0].shape == (1, 128, 1)


def test_march_group_self_clamps(monkeypatch):
    """MCPT_MARCH_GROUP beyond the scoped-VMEM budget clamps with a
    warning instead of OOM-ing the Mosaic allocator (VERDICT r3 #5)."""
    import warnings

    from mcpt_tpu.ops.pallas_march import _chunk_group

    monkeypatch.setenv("MCPT_MARCH_BLOCK", "512")
    monkeypatch.setenv("MCPT_MARCH_GROUP", "4096")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        cg = _chunk_group(64)
    assert cg == (384 << 10) // 512 // 64
    assert any("scoped-VMEM" in str(w.message) for w in rec)


def test_march_block_validation(monkeypatch):
    from mcpt_tpu.ops.pallas_march import ray_block

    monkeypatch.setenv("MCPT_MARCH_BLOCK", "not-a-number")
    import pytest

    with pytest.raises(ValueError):
        ray_block()
    monkeypatch.setenv("MCPT_MARCH_BLOCK", "-8")
    with pytest.raises(ValueError):
        ray_block()
    monkeypatch.setenv("MCPT_MARCH_BLOCK", "200")
    import warnings

    with warnings.catch_warnings(record=True):
        warnings.simplefilter("ignore")
        assert ray_block() == 256
    monkeypatch.setenv("MCPT_MARCH_BLOCK", "256")
    assert ray_block() == 256


def test_sort_bias_is_result_invariant():
    """The coherence-class bit only re-permutes rays into blocks; the
    hit record must be identical with and without it."""
    import jax
    import jax.numpy as jnp2

    geom = _geom(n_tris=700, seed=41)
    o, d = random_rays(512, seed=43)
    bias = (jnp2.arange(512) % 2).astype(jnp2.int32)
    base = _intersect_march_pallas(geom, o, d, 1e-4, 3.4e38, False,
                                   interpret=True)
    biased = _intersect_march_pallas(geom, o, d, 1e-4, 3.4e38, False,
                                     interpret=True, sort_bias=bias)
    for a, b in zip(jax.tree_util.tree_leaves(base),
                    jax.tree_util.tree_leaves(biased)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dead_blocks_no_hits():
    """All-dead wavefronts (t_max <= t_min) take the kernel's early-exit
    path and must report no hits."""
    geom = _geom(n_tris=300, seed=51)
    o, d = random_rays(256, seed=53)
    got = _intersect_march_pallas(geom, o, d, 1e-4, 0.0, False,
                                  interpret=True)
    assert not bool(np.asarray(got.valid).any())
    # mixed: half dead, half live — live lanes unchanged vs all-live
    tmax = jnp.where(jnp.arange(256) % 2 == 0, 3.4e38, 0.0)
    mixed = _intersect_march_pallas(geom, o, d, 1e-4, tmax, False,
                                    interpret=True)
    full = _intersect_march_pallas(geom, o, d, 1e-4, 3.4e38, False,
                                   interpret=True)
    live = np.arange(256) % 2 == 0
    np.testing.assert_array_equal(np.asarray(mixed.valid)[live],
                                  np.asarray(full.valid)[live])
    assert not bool(np.asarray(mixed.valid)[~live].any())


def test_scene_size_dependent_defaults(monkeypatch):
    """r4 measured defaults: chunk 256 up to 64k prims / 64-doubling
    above; block 256 globally (docs/PERF.md round-4 closing sweep)."""
    from mcpt_tpu.ops.pallas_march import ray_block

    monkeypatch.delenv("MCPT_MARCH_BLOCK", raising=False)
    assert ray_block(50_000) == 256
    assert ray_block(300_000) == 256
    assert ray_block(None) == 256
    monkeypatch.setenv("MCPT_MARCH_BLOCK", "384")
    assert ray_block(300_000) == 384


def test_coherence_keys_identical_results():
    """Origin-chunk coherence keys (r5) only permute block packing — the
    per-ray results must be bit-identical with any coherence vector."""
    import jax

    geom = _geom(n_tris=700, seed=61)
    o, d = random_rays(512, seed=63)
    rs = np.random.RandomState(65)
    coh = jnp.asarray(
        rs.randint(-1, geom.n_march_leaves, size=512), jnp.int32
    )
    base = _intersect_march_pallas(geom, o, d, 1e-4, 3.4e38, False,
                                   interpret=True)
    keyed = _intersect_march_pallas(geom, o, d, 1e-4, 3.4e38, False,
                                    interpret=True, coherence=coh)
    for a, b in zip(jax.tree_util.tree_leaves(base),
                    jax.tree_util.tree_leaves(keyed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # any-hit variant too
    base_a = _intersect_march_pallas(geom, o, d, 1e-4, 3.4e38, True,
                                     interpret=True)
    keyed_a = _intersect_march_pallas(geom, o, d, 1e-4, 3.4e38, True,
                                      interpret=True, coherence=coh)
    np.testing.assert_array_equal(np.asarray(base_a.valid),
                                  np.asarray(keyed_a.valid))


def test_march_chunk_of_prim_matches_pack():
    """march_chunk_of_prim inverts the chunk pack's prim-id channel."""
    geom = _geom(n_tris=400, seed=71)
    mt = np.asarray(geom.march_tris)
    cop = np.asarray(geom.march_chunk_of_prim)
    for j in range(geom.n_march_leaves):
        rows = mt[j]
        real = rows[:, 3:9].any(axis=1)  # non-degenerate edges
        pids = rows[real, 10].astype(np.int64)
        assert (cop[pids] == j).all()
