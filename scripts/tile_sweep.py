"""End-to-end tile/wavefront-size sweep on the real chip.

Renders cornell-box 512x512 @ 8spp with the regen and chunked engines at
several tile sizes and prints Msamples/s for each — the data that picks
Renderer.render's TPU defaults (VERDICT weak #10).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax


def main():
    from mcpt_tpu.render.renderer import Renderer
    from mcpt_tpu.scene.parser import load_config

    res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    cfg = load_config(
        "/root/reference/resources/scene/cornell-box/scene_v0.6.xml"
    )
    cfg.camera.width = cfg.camera.height = res
    cfg.integrator.depth_max = depth
    r = Renderer(cfg)

    for engine in ("regen", "chunked"):
        for tile in (1 << 14, 1 << 16, 1 << 18):
            if tile > res * res:
                continue
            tag = f"{engine} tile={tile}"
            print(f"[sweep] {tag} compiling...", flush=True)
            t0 = time.time()
            img = r.render(spp=spp, tile=tile, spp_chunk=spp, engine=engine)
            print(f"        warm+compile {time.time()-t0:.1f}s", flush=True)
            t0 = time.time()
            img = r.render(spp=spp, tile=tile, spp_chunk=spp, engine=engine,
                           frame_base=1)
            jax.block_until_ready(img)
            dt = time.time() - t0
            ms = res * res * spp / dt / 1e6
            print(
                f"[sweep] {tag}: {dt:6.2f}s  {ms:6.3f} Msamples/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
