"""Multi-host scale-out (BASELINE.md acceptance: >=80% linear rays/s
from 1 host to N hosts).

TPU-native design: one `jax.distributed` job, a single GLOBAL 1-D mesh
over every chip in the slice, film pixels sharded over that mesh.  Each
host shades only its addressable pixel shards; the per-pixel Tea/LCG
streams (mcpt_tpu.ops.rng) make the film bit-identical for ANY
process/device layout.  The only cross-host traffic is the gradient
`psum` in the differentiable path (riding ICI within a slice / DCN
across slices — XLA inserts the collectives from the sharding) and the
optional film all-gather at the end of a frame.

The reference scales by MPI-style manual patch distribution on CPU
(csrt src/renderer/renderer.cpp CPU scheduler); here the mesh + sharding
IS the scheduler.

Validated without TPU pods by the documented simulation path (SURVEY.md
§4): N local processes x M virtual CPU devices each —
`tests/test_multihost.py` spawns 2x2 and checks bit-equality with the
single-process film.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Join (or form) the multi-host job.

    Arguments default to the MCPT_COORDINATOR / MCPT_NUM_PROCS /
    MCPT_PROC_ID environment variables; with none present and no TPU
    auto-detection available this is a no-op so single-host scripts can
    call it unconditionally.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "MCPT_COORDINATOR"
    )
    if num_processes is None and "MCPT_NUM_PROCS" in os.environ:
        num_processes = int(os.environ["MCPT_NUM_PROCS"])
    if process_id is None and "MCPT_PROC_ID" in os.environ:
        process_id = int(os.environ["MCPT_PROC_ID"])
    if coordinator_address is None and num_processes is None:
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def render_film_multihost(scene, camera, integ, spp: int,
                          frame_base: int = 0) -> np.ndarray:
    """Render the film over EVERY device in the (possibly multi-host)
    job and return the full [H*W, 3] film on every process.

    Single-process: delegates to the same code path as
    `render_film_sharded` (the mesh is just this host's devices).
    Multi-process: pixel indices are materialized as a global sharded
    array (each host only ever touches its own shards), the shard_map
    program runs collectively, and the film is re-assembled with a
    tiled cross-process all-gather.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mcpt_tpu.parallel.shard import (
        _pad_to,
        make_mesh,
        render_film_sharded,
    )

    if jax.process_count() == 1:
        mesh = make_mesh()
        return np.asarray(
            render_film_sharded(scene, camera, integ, mesh, spp,
                                frame_base=frame_base)
        )

    from jax.experimental import multihost_utils

    mesh = make_mesh()  # global: jax.devices() spans all processes
    n_pix = camera.width * camera.height
    n_pad = _pad_to(n_pix, mesh.devices.size)
    sharding = NamedSharding(mesh, P("devices"))

    def _shard_vals(index):
        lo, hi, _ = index[0].indices(n_pad)
        return np.arange(lo, hi, dtype=np.int32) % n_pix

    pixel_idx = jax.make_array_from_callback((n_pad,), sharding, _shard_vals)

    import functools

    from jax import shard_map

    from mcpt_tpu.render.renderer import render_pixels

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P("devices")),
        out_specs=P("devices"),
        check_vma=False,
    )
    def tile_fn(scene_, camera_, idx):
        return render_pixels(scene_, camera_, integ, idx, spp, frame_base)

    out = jax.jit(tile_fn)(scene, camera, pixel_idx)
    full = multihost_utils.process_allgather(out, tiled=True)
    return np.asarray(full)[:n_pix]
