"""Live HTTP preview server (render/preview.py — the reference's GLUT
viewer re-imagined for a headless TPU host, csrt ray_tracer.cpp:161-201)."""

import io
import urllib.request

import numpy as np

from mcpt_tpu.render.preview import PreviewServer


def test_preview_server_serves_latest_frame():
    srv = PreviewServer(port=0, host="127.0.0.1")
    try:
        base = f"http://127.0.0.1:{srv.port}"

        # before any frame: 404 on the image, 200 on the page
        page = urllib.request.urlopen(f"{base}/").read()
        assert b"mcpt_tpu preview" in page
        try:
            urllib.request.urlopen(f"{base}/frame.png")
            assert False, "expected 404 before first update"
        except urllib.error.HTTPError as e:
            assert e.code == 404

        img = np.zeros((4, 6, 3), np.float32)
        img[..., 0] = 1.0  # pure red, linear
        srv.update(img)
        data = urllib.request.urlopen(f"{base}/frame.png?1").read()

        from PIL import Image

        decoded = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert decoded.shape == (4, 6, 3)
        assert (decoded[..., 0] == 255).all() and (decoded[..., 1] == 0).all()

        # update replaces the frame
        srv.update(np.zeros((2, 2, 3), np.float32))
        data2 = urllib.request.urlopen(f"{base}/frame.png?2").read()
        assert np.asarray(
            Image.open(io.BytesIO(data2)).convert("RGB")
        ).shape == (2, 2, 3)
    finally:
        srv.close()
