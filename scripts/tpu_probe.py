"""Staged TPU measurement session: each step runs in its own subprocess
with a timeout so one hang doesn't wedge the chip session for the rest.

    python scripts/tpu_probe.py [step ...]

Steps: warmup, pallas, dense, packet, render, bench
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STEPS = {
    "warmup": (
        300,
        """
import time, jax, jax.numpy as jnp
t0=time.time(); print('devices', jax.devices(), flush=True)
print('warm', (jnp.arange(11)*3).sum(), time.time()-t0, flush=True)
""",
    ),
    "pallas": (
        420,
        """
import time, numpy as np, jax, jax.numpy as jnp
from mcpt_tpu.ops.traversal import _intersect_dense_pallas
from mcpt_tpu.scene.geometry import commit_geometry
r = np.random.default_rng(0)
base = r.uniform(-4, 4, size=(4096, 1, 3))
verts = (base + r.uniform(-0.3, 0.3, size=(4096, 3, 3))).astype(np.float32)
geom = commit_geometry(verts, None, None, None, np.zeros(4096))
o = jnp.asarray(r.uniform(-6, 6, size=(16384, 3)).astype(np.float32))
d = r.normal(size=(16384, 3)).astype(np.float32)
d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
f = jax.jit(lambda o, d: _intersect_dense_pallas(geom, o, d, 1e-4, 3.4e38, False).t)
t0=time.time(); f(o, d).block_until_ready(); print('pallas compile+run', time.time()-t0, flush=True)
t0=time.time()
for _ in range(20): out = f(o, d)
out.block_until_ready(); dt=(time.time()-t0)/20
print(f'pallas dense 16k rays x 4096 tris: {dt*1e3:.2f} ms  {16384/dt/1e6:.1f} Mrays/s', flush=True)
""",
    ),
    "dense": (
        420,
        """
import time, numpy as np, jax, jax.numpy as jnp
from mcpt_tpu.ops.traversal import _intersect_dense
from mcpt_tpu.scene.geometry import commit_geometry
r = np.random.default_rng(0)
base = r.uniform(-4, 4, size=(4096, 1, 3))
verts = (base + r.uniform(-0.3, 0.3, size=(4096, 3, 3))).astype(np.float32)
geom = commit_geometry(verts, None, None, None, np.zeros(4096))
o = jnp.asarray(r.uniform(-6, 6, size=(16384, 3)).astype(np.float32))
d = r.normal(size=(16384, 3)).astype(np.float32)
d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
f = jax.jit(lambda o, d: _intersect_dense(geom, o, d, 1e-4, 3.4e38, False).t)
t0=time.time(); f(o, d).block_until_ready(); print('xla dense compile+run', time.time()-t0, flush=True)
t0=time.time()
for _ in range(20): out = f(o, d)
out.block_until_ready(); dt=(time.time()-t0)/20
print(f'xla dense 16k rays x 4096 tris: {dt*1e3:.2f} ms  {16384/dt/1e6:.1f} Mrays/s', flush=True)
""",
    ),
    "packet": (
        420,
        """
import time, numpy as np, jax, jax.numpy as jnp
from mcpt_tpu.ops.traversal import _intersect_packet
from mcpt_tpu.scene.loaders import load_mesh
from mcpt_tpu.scene.geometry import commit_geometry
m = load_mesh('/root/reference/resources/scene/matpreview/matpreview.serialized', shape_index=2)
tris = m.positions[m.indices]
geom = commit_geometry(tris, None, None, None, np.zeros(len(tris)), leaf_size=16)
print('tris', len(tris), flush=True)
n = 16384
ij = np.stack(np.meshgrid(np.linspace(-0.4,0.4,128), np.linspace(-0.4,0.4,128)), -1).reshape(-1,2)
d = np.concatenate([ij, np.ones((n,1))], -1).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
center = tris.mean((0,1)); lo = tris.min((0,1))
o = jnp.asarray(np.tile((center + np.array([0,0,-3],np.float32))[None], (n,1)).astype(np.float32))
d = jnp.asarray(d)
f = jax.jit(lambda o, d: _intersect_packet(geom, o, d, 1e-4, 3.4e38, False).t)
t0=time.time(); f(o, d).block_until_ready(); print('packet compile+run', time.time()-t0, flush=True)
t0=time.time()
for _ in range(10): out = f(o, d)
out.block_until_ready(); dt=(time.time()-t0)/10
print(f'packet 16k coherent rays x {len(tris)} tris: {dt*1e3:.2f} ms  {16384/dt/1e6:.2f} Mrays/s', flush=True)
""",
    ),
    "render": (
        560,
        """
import time, numpy as np, jax
from mcpt_tpu.scene.parser import load_config
from mcpt_tpu.render.renderer import Renderer
cfg = load_config('/root/reference/resources/scene/cornell-box/scene_v0.6.xml')
cfg.camera.width = cfg.camera.height = 128
cfg.integrator.depth_max = 8
r = Renderer(cfg)
t0=time.time(); img = r.render(spp=8, tile=128*128, spp_chunk=8); print('compile+8spp', time.time()-t0, flush=True)
for trial in range(3):
    t0=time.time(); img = r.render(spp=8, tile=128*128, spp_chunk=8, frame_base=trial+1); jax.block_until_ready(img)
    dt=time.time()-t0
    print(f'cornell 128x128 @8spp warm: {dt:.3f}s  {128*128*8/dt/1e6:.3f} Mpaths/s', flush=True)
print('mean', np.asarray(img).mean(axis=(0,1)), flush=True)
""",
    ),
    "breakdown": (
        560,
        """
import time, numpy as np, jax, jax.numpy as jnp
from mcpt_tpu.scene.parser import load_config
from mcpt_tpu.scene.compile import compile_scene
from mcpt_tpu.render.camera import make_camera, generate_rays
from mcpt_tpu.render.renderer import _freeze
from mcpt_tpu.integrators import path as P
from mcpt_tpu.ops import rng
from mcpt_tpu.ops.traversal import intersect_closest, intersect_any

cfg = load_config('/root/reference/resources/scene/cornell-box/scene_v0.6.xml')
cfg.camera.width = cfg.camera.height = 128
cfg.integrator.depth_max = 8
scene = compile_scene(cfg)
camera = make_camera(cfg.camera)
integ = _freeze(cfg.integrator)
idx = jnp.arange(128*128, dtype=jnp.int32)
o, d = generate_rays(camera, idx, 0.5, 0.5)
seed = rng.pixel_seed(idx, 0)

def timeit(name, f, *args, reps=10):
    out = f(*args); jax.block_until_ready(out)
    t0=time.time()
    for _ in range(reps): out = f(*args)
    jax.block_until_ready(out)
    print(f'{name}: {(time.time()-t0)/reps*1e3:.2f} ms', flush=True)

timeit('trace', jax.jit(lambda o, d: intersect_closest(scene.geom, o, d).t), o, d)
timeit('trace+interp', jax.jit(lambda o, d: P.interpolate_hit(scene, intersect_closest(scene.geom, o, d), o, d).position), o, d)
ghit = intersect_closest(scene.geom, o, d)
hit = P.interpolate_hit(scene, ghit, o, d)
alive = hit.valid
xi = rng.random_floats(seed, P.nee_draw_count(scene))[1]
timeit('nee', jax.jit(lambda: P._direct_lighting(scene, hit, -d, alive, xi)))
import mcpt_tpu.models.bsdf as B
xib = rng.random_floats(seed, B.N_SAMPLE_DRAWS)[1]
timeit('bsdf_sample', jax.jit(lambda: B.bsdf_sample(scene.bsdf, scene.tex, scene.present_types, hit.bsdf_id, -d, hit.normal, hit.tangent, hit.bitangent, hit.inside, hit.uv, xib, kc=(scene.brdf_avg, scene.albedo_avg))[1]))
timeit('shade 1spp', jax.jit(lambda o, d, s: P.shade(scene, integ, o, d, s)[0]), o, d, seed)
""",
    ),
    "bench": (1600, None),  # runs bench.py itself
}


def main():
    names = sys.argv[1:] or ["warmup", "pallas", "dense", "packet", "render"]
    for name in names:
        timeout, code = STEPS[name]
        print(f"===== step: {name} (timeout {timeout}s) =====", flush=True)
        if code is None:
            cmd = [sys.executable, os.path.join(REPO, "bench.py")]
        else:
            cmd = [sys.executable, "-c", "import sys; sys.path.insert(0, %r)\n%s" % (REPO, code)]
        try:
            proc = subprocess.run(cmd, timeout=timeout, cwd=REPO)
            print(f"[{name}] exit {proc.returncode}", flush=True)
            if proc.returncode != 0:
                print(f"[{name}] FAILED — stopping session", flush=True)
                break
        except subprocess.TimeoutExpired:
            print(f"[{name}] TIMEOUT — stopping session", flush=True)
            break


if __name__ == "__main__":
    main()
