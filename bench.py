"""Benchmark harness: renders the cornell-box reference scene on the
available chip and prints ONE JSON line with throughput.

Metric: Mrays/s where rays = camera samples * (avg segments + shadow
rays per bounce), plus spp/s at the benchmark resolution in `detail`.
`vs_baseline`: the reference publishes no numbers (BASELINE.md), so 1.0
records our own round-1 measurement as the baseline.

Work is dispatched in short chunks (see Renderer.render) so no single
device execution trips watchdogs.
"""

import json
import os
import signal
import sys
import time

SCENE = "/root/reference/resources/scene/cornell-box/scene_v0.6.xml"
RES = int(os.environ.get("MCPT_BENCH_RES", "512"))
SPP = int(os.environ.get("MCPT_BENCH_SPP", "16"))
DEPTH = 8
TIMEOUT_S = int(os.environ.get("MCPT_BENCH_TIMEOUT", "1500"))


def _watchdog(signum, frame):
    print(
        json.dumps(
            {
                "metric": "Mrays/s",
                "value": 0.0,
                "unit": "Mrays/s",
                "vs_baseline": 0.0,
                "detail": {"error": f"timeout after {TIMEOUT_S}s "
                                     "(device unavailable or compile hang)"},
            }
        ),
        flush=True,
    )
    os._exit(2)


def fallback_scene():
    """Stand-in cornell box if the reference assets are not mounted."""
    import numpy as np

    from mcpt_tpu.models.texture import TextureBuilder
    from mcpt_tpu.scene.ir import (
        BsdfInfo, BsdfType, CameraInfo, InstanceInfo, IntegratorInfo,
        RendererConfig,
    )

    tex = TextureBuilder()
    white = tex.add_constant([0.725, 0.71, 0.68])
    rad = tex.add_constant([17.0, 12.0, 4.0])
    bsdfs = [
        BsdfInfo(btype=BsdfType.DIFFUSE, id_diffuse_reflectance=white),
        BsdfInfo(btype=BsdfType.AREA_LIGHT, id_radiance=rad),
    ]

    def xf(scale, t, rx=0.0):
        m = np.eye(4, dtype=np.float32)
        r = np.radians(rx)
        c, s = np.cos(r), np.sin(r)
        m[:3, :3] = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32) * scale
        m[:3, 3] = t
        return m

    instances = [
        InstanceInfo(shape="rectangle", id_bsdf=0, to_world=xf(2, [0, 0, 0], -90)),
        InstanceInfo(shape="rectangle", id_bsdf=1, to_world=xf(0.25, [0, 1.98, 0], 90)),
    ]
    cam = CameraInfo(width=RES, height=RES, spp=SPP, fov_x=39.0,
                     eye=np.array([0, 1, 4.5], np.float32),
                     look_at=np.array([0, 1, 0], np.float32))
    return RendererConfig(
        camera=cam,
        integrator=IntegratorInfo(depth_max=DEPTH, depth_rr=5),
        textures=tex, bsdfs=bsdfs, instances=instances,
    )


def main():
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(TIMEOUT_S)

    import jax

    from mcpt_tpu.render.renderer import Renderer

    if os.path.exists(SCENE):
        from mcpt_tpu.scene.parser import load_config

        config = load_config(SCENE)
        config.camera.width = config.camera.height = RES
        config.integrator.depth_max = DEPTH
        scene_name = "cornell-box"
    else:
        config = fallback_scene()
        scene_name = "cornell-box-builtin"

    r = Renderer(config)
    # 64k-lane tiles + 8-spp chunks: the scripts/tile_sweep.py optimum
    # (64k beats 16k by 1.25x and 256k by 1.44x at depth 65; dispatches
    # stay ~2s, well under the device watchdog)
    tile = 1 << 16
    spp_chunk = 8
    # warmup with the SAME (spp_chunk, spp_total) program so the timed
    # run never compiles
    r.render(spp=SPP, tile=tile, spp_chunk=spp_chunk)

    t0 = time.time()
    img = r.render(spp=SPP, tile=tile, spp_chunk=spp_chunk, frame_base=1)
    jax.block_until_ready(img)
    dt = time.time() - t0

    n_pix = RES * RES
    samples = n_pix * SPP
    # per camera sample: primary ray + per-bounce (1 shadow + 1
    # continuation); conservative average path length for RR(0.95 @ 5)
    # with depth 8 in a closed box ~ 5.5 bounces
    avg_bounces = 5.5
    rays = samples * (1 + 2 * avg_bounces)
    mrays = rays / dt / 1e6

    # worst-case scene alongside the headline (r3 VERDICT weak #8:
    # "bench.py reports one scene — the flattering one").  classroom is
    # the slowest per-scene config (docs/PERF.md); same convention as
    # scripts/bench_suite.py (avg_bounces 3.5).
    classroom = {}
    cls_xml = "/root/reference/resources/scene/classroom/scene_v0.6.xml"
    if os.path.exists(cls_xml) and os.environ.get("MCPT_BENCH_WORST", "1") == "1":
        try:
            from mcpt_tpu.scene.parser import load_config

            ccfg = load_config(cls_xml)
            ccfg.camera.width = ccfg.camera.height = RES
            ccfg.integrator.depth_max = DEPTH
            rc = Renderer(ccfg)
            rc.render(spp=SPP, tile=tile, spp_chunk=spp_chunk)
            t0 = time.time()
            img = rc.render(spp=SPP, tile=tile, spp_chunk=spp_chunk,
                            frame_base=1)
            jax.block_until_ready(img)
            cdt = time.time() - t0
            cm = samples * (1 + 2 * 3.5) / cdt / 1e6
            classroom = {
                "mrays_s": round(cm, 3),
                "wall_s": round(cdt, 3),
                # measured reference CPU build, this host (BASELINE.md r4)
                "vs_reference_cpu": round(cm / 0.534, 2),
            }
        except Exception as e:  # classroom failure must not kill the bench
            classroom = {"error": str(e)[:200]}

    print(
        json.dumps(
            {
                "metric": "Mrays/s",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                # ratio to the recorded round-1 number (BENCH_r01.json);
                # the reference publishes nothing — BASELINE.md carries
                # the measured CPU-build bar instead (detail ratios)
                "vs_baseline": round(mrays / 8.794, 3),
                "detail": {
                    "scene": scene_name,
                    "resolution": RES,
                    "spp": SPP,
                    "depth_max": DEPTH,
                    "wall_s": round(dt, 3),
                    "msamples_per_s": round(samples / dt / 1e6, 3),
                    "spp_per_s": round(SPP / dt, 3),
                    "vs_reference_cpu": round(mrays / 6.386, 2),
                    "classroom": classroom,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
