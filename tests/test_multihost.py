"""Multi-PROCESS mesh validation (SURVEY.md §4 simulation path;
BASELINE.md 1->N hosts): a 2-process x 2-virtual-device jax.distributed
CPU job must produce the EXACT single-process film — the per-pixel RNG
design makes the image invariant to the process/device layout."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_film_matches_single_device(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    out = str(tmp_path / "film.npy")
    env = dict(os.environ)
    env.update(
        _MCPT_REEXECED="1",
        JAX_PLATFORMS="cpu",
        PYTHONPATH=repo,
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
    )
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), "2", out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    logs = [p.communicate(timeout=280)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]

    film = np.load(out)

    # single-process reference on this process's own (8-device) mesh
    from mcpt_tpu.render.camera import make_camera
    from mcpt_tpu.render.renderer import _freeze
    from mcpt_tpu.parallel.shard import make_mesh, render_film_sharded
    from mcpt_tpu.scene.compile import compile_scene

    from tests.test_integrator import make_box_scene

    cfg = make_box_scene(spp=4, res=16, depth_max=3)
    scene = compile_scene(cfg)
    single = np.asarray(
        render_film_sharded(
            scene, make_camera(cfg.camera), _freeze(cfg.integrator),
            make_mesh(), spp=4,
        )
    )
    np.testing.assert_array_equal(film, single)
