"""Native (C) runtime components, compiled on demand with the system
toolchain and bound via ctypes.

Components:
  * piz.c — OpenEXR PIZ chunk decompression (Huffman + wavelet), used by
    `mcpt_tpu.utils.image.read_exr`.

The shared objects are cached next to the sources; a stale .so (older
than its .c) is rebuilt automatically.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))


def _build(name: str) -> str:
    src = os.path.join(_DIR, f"{name}.c")
    lib = os.path.join(_DIR, f"lib{name}.so")
    if (
        not os.path.exists(lib)
        or os.path.getmtime(lib) < os.path.getmtime(src)
    ):
        cmd = ["gcc", "-O2", "-fPIC", "-shared", src, "-o", lib]
        subprocess.run(cmd, check=True, capture_output=True)
    return lib


@functools.lru_cache(maxsize=None)
def load(name: str) -> ctypes.CDLL:
    return ctypes.CDLL(_build(name))


@functools.lru_cache(maxsize=1)
def piz():
    """PIZ decoder with argtypes configured."""
    import numpy as np  # noqa: F401  (kept for symmetry with callers)

    lib = load("piz")
    lib.piz_uncompress.restype = ctypes.c_int
    lib.piz_uncompress.argtypes = [
        ctypes.c_char_p,                  # in
        ctypes.c_long,                    # in_len
        ctypes.c_int,                     # n_channels
        ctypes.POINTER(ctypes.c_int),     # nx per channel
        ctypes.POINTER(ctypes.c_int),     # ny per channel
        ctypes.POINTER(ctypes.c_uint16),  # out
        ctypes.c_long,                    # out_count
    ]
    return lib


def piz_uncompress(payload: bytes, nx_list, ny_list):
    """Decode one PIZ chunk to a list of per-channel uint16 planes."""
    import numpy as np

    lib = piz()
    n = len(nx_list)
    total = sum(int(a) * int(b) for a, b in zip(nx_list, ny_list))
    out = np.empty(total, np.uint16)
    nx = (ctypes.c_int * n)(*[int(v) for v in nx_list])
    ny = (ctypes.c_int * n)(*[int(v) for v in ny_list])
    ret = lib.piz_uncompress(
        payload,
        len(payload),
        n,
        nx,
        ny,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        total,
    )
    if ret != 0:
        raise ValueError(f"PIZ decode failed (code {ret})")
    planes = []
    off = 0
    for a, b in zip(nx_list, ny_list):
        planes.append(out[off : off + a * b].reshape(b, a))
        off += a * b
    return planes
