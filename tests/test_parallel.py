"""Mesh-sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4):
the sharded film must be bit-identical to the single-device render, and
the differentiable train step must produce finite psum'd gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcpt_tpu.parallel.shard import make_mesh, make_train_step, render_film_sharded
from mcpt_tpu.render.camera import make_camera
from mcpt_tpu.render.renderer import Renderer, _freeze
from mcpt_tpu.scene.compile import compile_scene

from tests.test_integrator import make_box_scene


@pytest.fixture(scope="module")
def setup():
    cfg = make_box_scene(spp=4, res=16, depth_max=3)
    scene = compile_scene(cfg)
    camera = make_camera(cfg.camera)
    integ = _freeze(cfg.integrator)
    return cfg, scene, camera, integ


def test_sharded_film_matches_single_device(setup):
    cfg, scene, camera, integ = setup
    n_dev = len(jax.devices())
    mesh = make_mesh()
    film = np.asarray(
        render_film_sharded(scene, camera, integ, mesh, spp=4)
    )
    # pin the chunked engine: render_film_sharded shades with
    # render_pixels, and the regen engine's fp accumulation order differs
    single = np.asarray(
        Renderer(cfg).render(spp=4, tile=16 * 16, engine="chunked")
    ).reshape(-1, 3)
    assert n_dev >= 2, "expected a multi-device test mesh"
    np.testing.assert_array_equal(film, single)


def test_train_step_grads_finite_and_nonzero(setup):
    cfg, scene, camera, integ = setup
    mesh = make_mesh()
    n_pix = 16 * 16
    pixel_idx = jnp.arange(n_pix, dtype=jnp.int32)
    target = jnp.zeros((n_pix, 3), jnp.float32)
    step = make_train_step(integ, spp=2, mesh=mesh)
    loss, grads = step(scene, camera, pixel_idx, target)
    assert np.isfinite(float(loss)) and float(loss) > 0
    g = np.asarray(grads["tex.color0"])
    assert np.isfinite(g).all()
    # the white diffuse texture (id 0) must receive gradient
    assert np.abs(g[0]).max() > 0


def test_grad_matches_finite_difference(setup):
    """Pixel-gradient vs finite differences (BASELINE.md acceptance)."""
    cfg, scene, camera, integ = setup
    mesh = make_mesh()
    n_pix = 16 * 16
    pixel_idx = jnp.arange(n_pix, dtype=jnp.int32)
    target = jnp.zeros((n_pix, 3), jnp.float32)
    step = make_train_step(integ, spp=2, mesh=mesh)
    _, grads = step(scene, camera, pixel_idx, target)
    g_auto = float(np.asarray(grads["tex.color0"])[0, 0])

    # central finite difference on the white albedo's red channel
    eps = 1e-3

    def loss_at(delta):
        c0 = scene.tex.color0.at[0, 0].add(delta)
        s2 = scene.replace(tex=scene.tex.replace(color0=c0))
        from mcpt_tpu.render.renderer import render_pixels

        img = render_pixels(s2, camera, integ, pixel_idx, spp=2)
        return float(jnp.mean((img - target) ** 2))

    g_fd = (loss_at(eps) - loss_at(-eps)) / (2 * eps)
    assert g_auto == pytest.approx(g_fd, rel=5e-2, abs=1e-5)


def test_grad_chunked_matches_unchunked(setup):
    """scan-chunked per-chunk-psum grads (comm/compute overlap path)
    match the single-psum step up to float re-association."""
    cfg, scene, camera, integ = setup
    mesh = make_mesh()
    n_pix = 16 * 16
    pixel_idx = jnp.arange(n_pix, dtype=jnp.int32)
    target = jnp.zeros((n_pix, 3), jnp.float32)
    step1 = make_train_step(integ, spp=2, mesh=mesh)
    step4 = make_train_step(integ, spp=2, mesh=mesh, grad_chunks=4)
    loss1, g1 = step1(scene, camera, pixel_idx, target)
    loss4, g4 = step4(scene, camera, pixel_idx, target)
    np.testing.assert_allclose(float(loss1), float(loss4), rtol=1e-5)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g4[k]), rtol=1e-4, atol=1e-7
        )
