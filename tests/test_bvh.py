"""BVH traversal vs brute force equivalence (the test the reference never
had, SURVEY.md §4): random triangle soups, random rays, closest-hit and
any-hit must agree exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcpt_tpu.ops.traversal import (
    _traverse,
    intersect_any,
    intersect_closest,
    intersect_closest_brute,
)
from mcpt_tpu.scene.geometry import commit_geometry


def random_soup(n_tris, seed=0, spread=4.0, size=0.5):
    r = np.random.default_rng(seed)
    base = r.uniform(-spread, spread, size=(n_tris, 1, 3))
    verts = base + r.uniform(-size, size, size=(n_tris, 3, 3))
    return verts.astype(np.float32)


def random_rays(n, seed=1, spread=6.0):
    r = np.random.default_rng(seed)
    o = r.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("n_tris,leaf_size", [(1, 4), (7, 1), (100, 4), (333, 2), (1000, 8)])
def test_closest_matches_brute(n_tris, leaf_size):
    verts = random_soup(n_tris)
    geom = commit_geometry(verts, None, None, None, np.zeros(n_tris), leaf_size=leaf_size)
    o, d = random_rays(512)
    got = jax.jit(intersect_closest)(geom, o, d)
    ref = intersect_closest_brute(geom, o, d)

    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    m = np.asarray(ref.valid)
    np.testing.assert_allclose(
        np.asarray(got.t)[m], np.asarray(ref.t)[m], rtol=1e-5, atol=1e-5
    )
    # same primitive except exact-tie cases
    same = np.asarray(got.prim)[m] == np.asarray(ref.prim)[m]
    if m.sum() > 0:
        assert same.mean() > 0.999


@pytest.mark.parametrize("n_tris,leaf_size", [(7, 1), (333, 2), (1000, 8)])
def test_bvh_traversal_matches_brute(n_tris, leaf_size):
    """Force the stacked BVH walk (intersect_closest may route small
    scenes to the dense sweep)."""
    verts = random_soup(n_tris, seed=11)
    geom = commit_geometry(
        verts, None, None, None, np.zeros(n_tris), leaf_size=leaf_size
    )
    o, d = random_rays(512, seed=12)
    got = jax.jit(
        lambda g, o, d: _traverse(g, o, d, 1e-4, 3.4e38, any_hit=False)
    )(geom, o, d)
    ref = intersect_closest_brute(geom, o, d)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    m = np.asarray(ref.valid)
    np.testing.assert_allclose(
        np.asarray(got.t)[m], np.asarray(ref.t)[m], rtol=1e-5, atol=1e-5
    )


def test_bvh_any_hit_matches_closest():
    verts = random_soup(300, seed=15)
    geom = commit_geometry(verts, None, None, None, np.zeros(300))
    o, d = random_rays(512, seed=16)
    occ = jax.jit(
        lambda g, o, d: _traverse(g, o, d, 1e-4, 3.4e38, any_hit=True).valid
    )(geom, o, d)
    closest = intersect_closest_brute(geom, o, d)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(closest.valid))


def test_any_hit_consistent_with_closest():
    verts = random_soup(300, seed=5)
    geom = commit_geometry(verts, None, None, None, np.zeros(300))
    o, d = random_rays(512, seed=6)
    occluded = jax.jit(intersect_any)(geom, o, d)
    closest = jax.jit(intersect_closest)(geom, o, d)
    np.testing.assert_array_equal(np.asarray(occluded), np.asarray(closest.valid))


def test_t_max_limits_hits():
    verts = random_soup(200, seed=9)
    geom = commit_geometry(verts, None, None, None, np.zeros(200))
    o, d = random_rays(256, seed=10)
    full = intersect_closest(geom, o, d)
    # shrink t_max below each found hit -> ray must miss
    t_cut = jnp.where(full.valid, full.t * 0.5, 1e-3)
    cut = intersect_closest(geom, o, d, t_max=t_cut)
    hits_inside_cut = np.asarray(cut.valid & full.valid & (cut.t >= full.t))
    assert not hits_inside_cut.any()


def test_inside_flag_matches_winding():
    # single CCW triangle in z=0 plane, normal +z
    verts = np.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    geom = commit_geometry(verts, None, None, None, np.zeros(1))
    o = jnp.asarray([[0.2, 0.2, 1.0], [0.2, 0.2, -1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
    hit = intersect_closest(geom, o, d)
    assert bool(hit.valid[0]) and bool(hit.valid[1])
    assert not bool(hit.inside[0])  # front face from +z
    assert bool(hit.inside[1])      # back face from -z


def test_barycentric_interpolation_point():
    verts = np.asarray([[[0, 0, 0], [2, 0, 0], [0, 2, 0]]], np.float32)
    geom = commit_geometry(verts, None, None, None, np.zeros(1))
    o = jnp.asarray([[0.5, 0.5, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = intersect_closest(geom, o, d)
    # v, w weights of vertices 1, 2: position = p0 + v*e1 + w*e2
    p = np.asarray(geom.p0[hit.prim] + hit.v[:, None] * geom.e1[hit.prim] + hit.w[:, None] * geom.e2[hit.prim])
    np.testing.assert_allclose(p[0], [0.5, 0.5, 0.0], atol=1e-6)


def test_pallas_dense_matches_reference_interpret():
    """The Pallas VMEM sweep (interpret mode on CPU) agrees with the
    XLA dense path and brute force."""
    from mcpt_tpu.ops.traversal import _intersect_dense_pallas

    verts = random_soup(700, seed=21)
    geom = commit_geometry(verts, None, None, None, np.zeros(700))
    o, d = random_rays(300, seed=22)
    got = _intersect_dense_pallas(geom, o, d, 1e-4, 3.4e38, False,
                                  interpret=True)
    ref = intersect_closest_brute(geom, o, d)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    m = np.asarray(ref.valid)
    np.testing.assert_allclose(
        np.asarray(got.t)[m], np.asarray(ref.t)[m], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(got.inside)[m], np.asarray(ref.inside)[m]
    )
    occ = _intersect_dense_pallas(geom, o, d, 1e-4, 3.4e38, True,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(occ.valid), np.asarray(ref.valid))


def test_watertight_matches_moller():
    """Woop watertight vs Moller-Trumbore: same hits/t/barycentrics and
    back-face sign on a random soup."""
    from mcpt_tpu.ops.intersect import (
        intersect_triangle,
        intersect_triangle_watertight,
        watertight_setup,
    )

    verts = random_soup(400, seed=31)
    geom = commit_geometry(verts, None, None, None, np.zeros(400))
    o, d = random_rays(500, seed=32)
    p0 = geom.p0[None, :, :]
    p1 = (geom.p0 + geom.e1)[None, :, :]
    p2 = (geom.p0 + geom.e2)[None, :, :]
    ob = jnp.asarray(o)[:, None, :]
    db = jnp.asarray(d)[:, None, :]
    h_m, t_m, v_m, w_m, det_m = intersect_triangle(
        ob, db, p0, geom.e1[None], geom.e2[None], 1e-4, 3.4e38
    )
    setup = tuple(x[:, None] for x in watertight_setup(jnp.asarray(d)))
    h_w, t_w, v_w, w_w, det_w = intersect_triangle_watertight(
        ob, db, p0, p1, p2, 1e-4, 3.4e38, setup
    )
    hm = np.asarray(h_m)
    hw = np.asarray(h_w)
    # watertight may accept boundary hits Moller rejects; require that
    # all Moller hits are found and extras are a tiny fraction
    assert (hm & ~hw).mean() < 1e-4
    both = hm & hw
    np.testing.assert_allclose(
        np.asarray(t_m)[both], np.asarray(t_w)[both], rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(v_m)[both], np.asarray(v_w)[both], rtol=1e-2, atol=1e-3
    )
    # back-face agreement: Moller det_inv<0 == Woop front/back sign
    back_m = np.asarray(det_m)[both] < 0
    back_w = np.asarray(det_w)[both] < 0
    frac = (back_m == back_w).mean()
    assert frac > 0.999 or frac < 0.001  # consistent up to a global sign


def test_march_matches_brute():
    """Leaf-march traversal (the default for > DENSE_MAX_PRIMS scenes)
    against the brute-force oracle, closest and any-hit."""
    from mcpt_tpu.ops.traversal import _intersect_march

    n_tris = 3000
    verts = random_soup(n_tris, seed=21)
    geom = commit_geometry(verts, None, None, None, np.zeros(n_tris))
    o, d = random_rays(1024, seed=22)
    got = jax.jit(
        lambda g, o, d: _intersect_march(g, o, d, 1e-4, 3.4e38, False)
    )(geom, o, d)
    ref = intersect_closest_brute(geom, o, d)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    m = np.asarray(ref.valid)
    np.testing.assert_allclose(
        np.asarray(got.t)[m], np.asarray(ref.t)[m], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(got.prim)[m], np.asarray(ref.prim)[m])
    occ = jax.jit(
        lambda g, o, d: _intersect_march(g, o, d, 1e-4, 3.4e38, True).valid
    )(geom, o, d)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref.valid))


def test_march_t_window_and_opacity():
    from mcpt_tpu.ops.traversal import _intersect_march

    n_tris = 500
    verts = random_soup(n_tris, seed=31)
    opaque = np.zeros(n_tris, np.bool_)  # nothing blocks shadows
    geom = commit_geometry(
        verts, None, None, None, np.zeros(n_tris), tri_opaque=opaque
    )
    o, d = random_rays(256, seed=32)
    occ = jax.jit(
        lambda g, o, d: _intersect_march(g, o, d, 1e-4, 3.4e38, True).valid
    )(geom, o, d)
    assert not np.asarray(occ).any()
    # t_max below the closest hit -> miss
    full = jax.jit(
        lambda g, o, d: _intersect_march(g, o, d, 1e-4, 3.4e38, False)
    )(geom, o, d)
    t_cut = jnp.where(full.valid, full.t * 0.5, 1e-3)
    cut = _intersect_march(geom, o, d, 1e-4, t_cut, False)
    assert not np.asarray(cut.valid & full.valid & (cut.t >= full.t)).any()


def test_sah_march_chunk_pack_structure():
    """Binned-SAH chunk pack invariants (scene/geometry.py): every real
    prim appears exactly once in channel 10, chunk AABBs contain their
    member triangles, chunk count and membership respect the caps."""
    n_tris = 5000
    verts = random_soup(n_tris, seed=41)
    geom = commit_geometry(verts, None, None, None, np.zeros(n_tris))
    mt = np.asarray(geom.march_tris)  # [Lm, ls, 12]
    cmin = np.asarray(geom.march_min)
    cmax = np.asarray(geom.march_max)
    assert geom.n_march_leaves <= 2048
    assert mt.shape == (geom.n_march_leaves, geom.march_leaf, 12)

    # filled rows = non-degenerate edges
    filled = (np.abs(mt[..., 3:9]).sum(-1) > 0)
    ids = mt[..., 10][filled].astype(np.int64)
    assert ids.size == n_tris
    assert np.array_equal(np.sort(ids), np.arange(n_tris))

    v0 = mt[..., 0:3]
    v1 = v0 + mt[..., 3:6]
    v2 = v0 + mt[..., 6:9]
    tmin = np.minimum(np.minimum(v0, v1), v2)
    tmax = np.maximum(np.maximum(v0, v1), v2)
    for j in range(geom.n_march_leaves):
        f = filled[j]
        if not f.any():
            assert (cmin[j] > 1e30).all()  # empty chunk parked far away
            continue
        assert (tmin[j][f] >= cmin[j] - 1e-4).all()
        assert (tmax[j][f] <= cmax[j] + 1e-4).all()


def test_native_sah_matches_python_oracle():
    """native/sah.c is an exact mirror of geometry._sah_chunks_py: same
    float32 binning, first-min tie-breaks, stable partition — chunk
    memberships must match element for element."""
    from mcpt_tpu import native
    from mcpt_tpu.scene.geometry import _sah_chunks_py

    for n, leaf, seed in ((3000, 64, 0), (20000, 128, 1), (5, 64, 2)):
        r = np.random.RandomState(seed)
        v = r.uniform(-10, 10, (n, 3)).astype(np.float32)
        e = r.uniform(0.01, 0.5, (n, 3)).astype(np.float32)
        tmin, tmax = v - e, v + e
        cent = 0.5 * (tmin + tmax)
        py = sorted(tuple(x) for x in _sah_chunks_py(cent, tmin, tmax, leaf))
        cc = sorted(tuple(np.asarray(x)) for x in
                    native.sah_chunks(cent, tmin, tmax, leaf))
        assert len(py) == len(cc)
        for a, b in zip(py, cc):
            assert np.array_equal(a, b)

    # degenerate: coincident centroids fall back to middle splits
    cent = np.zeros((300, 3), np.float32)
    tmin = cent - 0.1
    tmax = cent + 0.1
    py = sorted(tuple(x) for x in _sah_chunks_py(cent, tmin, tmax, 64))
    cc = sorted(tuple(np.asarray(x)) for x in
                native.sah_chunks(cent, tmin, tmax, 64))
    assert all(np.array_equal(a, b) for a, b in zip(py, cc))
