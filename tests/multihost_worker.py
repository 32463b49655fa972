"""Subprocess entry for tests/test_multihost.py: one process of an
N-process jax.distributed CPU job; renders the shared box scene through
`render_film_multihost` and (process 0) writes the film to disk."""

import os
import sys


def main():
    port, pid, nproc, out = sys.argv[1:5]
    import jax

    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=int(nproc),
        process_id=int(pid),
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

    import numpy as np

    from mcpt_tpu.parallel.distributed import render_film_multihost
    from mcpt_tpu.render.camera import make_camera
    from mcpt_tpu.render.renderer import _freeze
    from mcpt_tpu.scene.compile import compile_scene

    from tests.test_integrator import make_box_scene

    cfg = make_box_scene(spp=4, res=16, depth_max=3)
    scene = compile_scene(cfg)
    camera = make_camera(cfg.camera)
    integ = _freeze(cfg.integrator)

    film = render_film_multihost(scene, camera, integ, spp=4)
    assert film.shape == (16 * 16, 3), film.shape
    if int(pid) == 0:
        np.save(out, film)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
