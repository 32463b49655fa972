"""Elastic tile recovery: a tile dispatch killed mid-render is re-issued
and — because per-pixel RNG is a pure function of (pixel, sample) — the
recovered film is BIT-IDENTICAL to an uninterrupted render (SURVEY §5
failure-detection row; renderer.py retry loop)."""

import numpy as np
import jax
import pytest

import mcpt_tpu.render.renderer as R
from tests.test_integrator import make_box_scene


def test_killed_tile_recovers_bit_identical(monkeypatch):
    cfg = make_box_scene(spp=4, res=16, depth_max=3)
    r = R.Renderer(cfg)
    clean = np.asarray(r.render(spp=4, tile=64, engine="regen"))

    real = R.render_tile_regen
    state = {"failed": False}

    def flaky(scene, cam, integ, idx, s, frame_base, **kw):
        # kill the third tile's first dispatch exactly once
        if not state["failed"] and int(np.asarray(idx)[0]) == 128:
            state["failed"] = True
            raise jax.errors.JaxRuntimeError(
                "injected: device halted mid-dispatch"
            )
        return real(scene, cam, integ, idx, s, frame_base, **kw)

    monkeypatch.setattr(R, "render_tile_regen", flaky)
    with pytest.warns(UserWarning, match="re-rendering"):
        recovered = np.asarray(r.render(spp=4, tile=64, engine="regen"))
    assert state["failed"]
    np.testing.assert_array_equal(recovered, clean)


def test_exhausted_retries_raise(monkeypatch):
    cfg = make_box_scene(spp=2, res=8, depth_max=2)
    r = R.Renderer(cfg)

    def always_dead(*a, **kw):
        raise jax.errors.JaxRuntimeError("injected: device gone")

    monkeypatch.setattr(R, "render_tile_regen", always_dead)
    monkeypatch.setenv("MCPT_TILE_RETRIES", "1")
    with pytest.raises(Exception, match="injected|failed"):
        with pytest.warns(UserWarning):
            r.render(spp=2, tile=64, engine="regen")
