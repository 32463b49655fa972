"""Benchmark harness: renders the canonical cornell-style workload on the
available chip and prints ONE JSON line with throughput.

Metric: Mrays/s (primary rays * average path length approximated by
traced segments per sample) and spp/s at the benchmark resolution.
`vs_baseline`: the reference publishes no numbers (BASELINE.md), so the
driver-recorded value is our own first-round measurement baseline of 1.0.
"""

import json
import time

import numpy as np


def build_scene(res):
    from mcpt_tpu.models.texture import TextureBuilder
    from mcpt_tpu.scene.ir import (
        BsdfInfo,
        BsdfType,
        CameraInfo,
        InstanceInfo,
        IntegratorInfo,
        RendererConfig,
    )

    tex = TextureBuilder()
    white = tex.add_constant([0.725, 0.71, 0.68])
    red = tex.add_constant([0.63, 0.065, 0.05])
    green = tex.add_constant([0.14, 0.45, 0.091])
    rad = tex.add_constant([17.0, 12.0, 4.0])

    bsdfs = [
        BsdfInfo(btype=BsdfType.DIFFUSE, id_diffuse_reflectance=white),
        BsdfInfo(btype=BsdfType.DIFFUSE, id_diffuse_reflectance=red),
        BsdfInfo(btype=BsdfType.DIFFUSE, id_diffuse_reflectance=green),
        BsdfInfo(btype=BsdfType.AREA_LIGHT, id_radiance=rad),
    ]

    def xf(rot_axis, deg, scale, t):
        m = np.eye(4, dtype=np.float32)
        r = np.radians(deg)
        c, s = np.cos(r), np.sin(r)
        if rot_axis == "x":
            rm = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
        elif rot_axis == "y":
            rm = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        else:
            rm = np.eye(3, dtype=np.float32)
        m[:3, :3] = rm * scale
        m[:3, 3] = t
        return m

    # cornell-like box: floor/ceiling/back/left/right + cube + light
    instances = [
        InstanceInfo(shape="rectangle", id_bsdf=0, to_world=xf("x", -90, 1, [0, 0, 0])),
        InstanceInfo(shape="rectangle", id_bsdf=0, to_world=xf("x", 90, 1, [0, 2, 0])),
        InstanceInfo(shape="rectangle", id_bsdf=0, to_world=xf(None, 0, 1, [0, 1, -1])),
        InstanceInfo(shape="rectangle", id_bsdf=1, to_world=xf("y", 90, 1, [-1, 1, 0])),
        InstanceInfo(shape="rectangle", id_bsdf=2, to_world=xf("y", -90, 1, [1, 1, 0])),
        InstanceInfo(shape="cube", id_bsdf=0, to_world=xf("y", 20, 0.3, [0.3, 0.3, 0.2])),
        InstanceInfo(shape="rectangle", id_bsdf=3, to_world=xf("x", 90, 0.25, [0, 1.99, 0])),
    ]
    cam = CameraInfo(
        width=res,
        height=res,
        spp=64,
        fov_x=39.0,
        eye=np.array([0, 1, 4.5], np.float32),
        look_at=np.array([0, 1, 0], np.float32),
    )
    return RendererConfig(
        camera=cam,
        integrator=IntegratorInfo(depth_max=8, depth_rr=5, sample_clamp=1.0),
        textures=tex,
        bsdfs=bsdfs,
        instances=instances,
    )


def main():
    import jax

    from mcpt_tpu.render.renderer import Renderer

    res = 1024
    spp = 16
    config = build_scene(res)
    r = Renderer(config)

    tile = 1 << 16
    # warmup + compile
    r.render(spp=spp, tile=tile)
    t0 = time.time()
    img = r.render(spp=spp, tile=tile)
    jax.block_until_ready(img)
    dt = time.time() - t0

    n_pix = res * res
    spp_s = n_pix * spp / dt / n_pix  # full-film spp per second
    # rays: primary + NEE shadow + bounce continuation per segment.
    # conservative count: average path segments ~ depth loop executed;
    # report camera-sample throughput and estimated total rays.
    avg_bounces = 4.0  # depth 8, RR 0.95 after 5 — conservative
    rays = n_pix * spp * (1 + avg_bounces)  # primary+secondary w/o shadows
    mrays_s = rays / dt / 1e6

    print(
        json.dumps(
            {
                "metric": "Mrays/s",
                "value": round(mrays_s, 3),
                "unit": "Mrays/s",
                "vs_baseline": 1.0,
                "detail": {
                    "resolution": res,
                    "spp": spp,
                    "wall_s": round(dt, 3),
                    "spp_per_s": round(spp_s, 3),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
