"""Measure the reference renderer (csrt, CPU build) on the BASELINE
configs — the perf bar the TPU build must beat (VERDICT r3 missing #1).

The reference publishes no numbers (BASELINE.md), so this host is the
measurement: build/csrt (see build.sh — the unchanged reference sources
plus minimal header shims) runs each scene with the SAME resolution,
spp, maxDepth, and ray-counting convention as scripts/bench_suite.py,
i.e. rays = samples * (1 + 2 * avg_bounces) with the same per-scene
avg_bounces estimates.  Timing is the renderer's own wall-clock print
("It takes ...", src/utils/timer.cpp:9-24), which excludes parse/BVH
build — matching the suite's warm render timing.

maxDepth lives in the scene XML (the reference CLI has no depth flag,
apps/main.cpp:98-199), so each config gets a patched XML copy in a
directory of symlinks back to the original assets.  Mercury's missing
textures/8k_mercury.jpg is stood in as mid-gray, mirroring
mcpt_tpu/scene/parser.py's warn-skip.

    python run_baseline.py [--res 512] [--spp 16] [--scene NAME] [--threads N]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
from scripts.bench_suite import CONFIGS, SCENES  # noqa: E402


def make_scene_copy(xml_rel: str, depth: int, out_root: str) -> str:
    src_dir = os.path.join(SCENES, os.path.dirname(xml_rel))
    xml_name = os.path.basename(xml_rel)
    dst_dir = os.path.join(out_root, os.path.dirname(xml_rel) + f"_d{depth}")
    os.makedirs(dst_dir, exist_ok=True)
    for entry in os.listdir(src_dir):
        dst = os.path.join(dst_dir, entry)
        if entry == xml_name or os.path.lexists(dst):
            continue
        os.symlink(os.path.join(src_dir, entry), dst)
    text = open(os.path.join(src_dir, xml_name)).read()
    patched, n = re.subn(
        r'(<integer\s+name="maxDepth"\s+value=")[^"]*(")',
        rf"\g<1>{depth}\g<2>", text,
    )
    if n == 0:  # no maxDepth in the XML: inject one into the integrator
        patched, n = re.subn(
            r'(<integrator[^>]*>)',
            rf'\g<1>\n\t\t<integer name="maxDepth" value="{depth}" />',
            text, count=1,
        )
        assert n == 1, f"no integrator element in {xml_rel}"
    dst_xml = os.path.join(dst_dir, xml_name)
    with open(dst_xml, "w") as f:
        f.write(patched)

    if "mercury" in xml_rel:
        tex_dir = os.path.join(dst_dir, "textures")
        tex = os.path.join(tex_dir, "8k_mercury.jpg")
        if os.path.islink(tex_dir):
            os.unlink(tex_dir)
        if not os.path.exists(tex):
            os.makedirs(tex_dir, exist_ok=True)
            from PIL import Image

            Image.new("RGB", (1024, 512), (128, 128, 128)).save(tex)
    return dst_xml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--scene", default=None)
    ap.add_argument("--timeout", type=int, default=7200)
    ap.add_argument("--out", default=os.path.join(HERE, "results.json"))
    args = ap.parse_args()

    binary = os.path.join(HERE, "build", "csrt")
    assert os.path.exists(binary), "run build.sh first"
    out_root = os.path.join(HERE, "scenes")
    os.makedirs(out_root, exist_ok=True)

    n_threads = os.cpu_count()
    rows = []
    for cfg_row in CONFIGS:
        name, rel, depth, avg_b = cfg_row[:4]
        # mirror bench_suite's row shape: slot 4 may be None (use the CLI
        # res) and slot 5 an integrator override the reference lacks —
        # skip such rows instead of invoking the binary with "-w None"
        res = cfg_row[4] if len(cfg_row) > 4 and cfg_row[4] else args.res
        if len(cfg_row) > 5 and cfg_row[5]:
            continue
        if args.scene and args.scene != name:
            continue
        xml = make_scene_copy(rel, depth, out_root)
        cmd = [binary, "-c", "-i", xml,
               "-o", f"/tmp/refbench_{name}.png",
               "-w", str(res), "-h", str(res), "-s", str(args.spp)]
        t0 = time.time()
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=args.timeout)
        except subprocess.TimeoutExpired:
            rows.append({"scene": name, "error": f"timeout {args.timeout}s"})
            print(json.dumps(rows[-1]), flush=True)
            continue
        total_s = time.time() - t0
        m = re.search(
            r"It takes (\d+) hr (\d+) min (\d+) sec (\d+) ms",
            out.stdout + out.stderr,
        )
        if out.returncode != 0 or not m:
            rows.append({"scene": name,
                         "error": (out.stderr or out.stdout)[-300:].strip()})
            print(json.dumps(rows[-1]), flush=True)
            continue
        hr, mn, sec, ms = map(int, m.groups())
        dt = hr * 3600 + mn * 60 + sec + ms / 1000.0
        samples = res * res * args.spp
        rays = samples * (1 + 2 * avg_b)
        rows.append({
            "scene": name, "res": res, "spp": args.spp, "depth": depth,
            "mrays_s": round(rays / max(dt, 1e-9) / 1e6, 3),
            "msamples_s": round(samples / max(dt, 1e-9) / 1e6, 3),
            "wall_s": round(dt, 3),
            "total_s": round(total_s, 1),
            "threads": n_threads,
        })
        print(json.dumps(rows[-1]), flush=True)

    with open(args.out, "w") as f:
        json.dump({"host_cpus": n_threads, "res": args.res,
                   "spp": args.spp, "rows": rows}, f, indent=1)
    print("\n| scene | Mrays/s | Msamples/s | wall s |")
    print("|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['scene']} | — | — | {r['error'][:60]} |")
        else:
            print(f"| {r['scene']} | {r['mrays_s']} | {r['msamples_s']} "
                  f"| {r['wall_s']} |")


if __name__ == "__main__":
    main()
