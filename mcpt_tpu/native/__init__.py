"""Native (C) runtime components, compiled on demand with the system
toolchain and bound via ctypes.

Components:
  * piz.c — OpenEXR PIZ chunk decompression (Huffman + wavelet), used by
    `mcpt_tpu.utils.image.read_exr`.
  * sah.c — binned-SAH chunk partition for the march traversal's scene
    commit (`mcpt_tpu.scene.geometry`), exact mirror of the Python
    oracle `_sah_chunks_py`.
  * alias.c — Walker/Vose alias-table construction for envmap texel
    sampling (`mcpt_tpu.models.emitter.build_envmap`); the build is a
    strict O(n) sequential pairing loop over up to tens of millions of
    texels.  Python oracle: `emitter._alias_build_py`.

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


@functools.lru_cache(maxsize=1)
def sah():
    lib = load("sah")
    lib.sah_chunks.restype = ctypes.c_long
    lib.sah_chunks.argtypes = [
        ctypes.POINTER(ctypes.c_float),   # cent [n,3]
        ctypes.POINTER(ctypes.c_float),   # tmin [n,3]
        ctypes.POINTER(ctypes.c_float),   # tmax [n,3]
        ctypes.c_long,                    # n
        ctypes.c_long,                    # leaf
        ctypes.c_int,                     # nbins
        ctypes.POINTER(ctypes.c_long),    # order out [n]
        ctypes.POINTER(ctypes.c_long),    # chunk_off out [max_chunks+1]
        ctypes.c_long,                    # max_chunks
    ]
    return lib


@functools.lru_cache(maxsize=1)
def alias():
    lib = load("alias")
    lib.alias_build.restype = ctypes.c_int
    lib.alias_build.argtypes = [
        ctypes.POINTER(ctypes.c_double),  # weights [n]
        ctypes.c_int64,                   # n
        ctypes.POINTER(ctypes.c_float),   # prob out [n]
        ctypes.POINTER(ctypes.c_int32),   # alias out [n]
        ctypes.POINTER(ctypes.c_int32),   # scratch [2n]
        ctypes.POINTER(ctypes.c_double),  # scaled scratch [n]
    ]
    return lib


def alias_build(weights):
    """Vose alias table for unnormalized non-negative `weights` [n].
    Returns (prob f32 [n], alias i32 [n]); raises on an all-zero input."""
    import numpy as np

    weights = np.ascontiguousarray(weights, np.float64).reshape(-1)
    n = int(weights.shape[0])
    prob = np.empty(n, np.float32)
    al = np.empty(n, np.int32)
    scratch = np.empty(2 * n, np.int32)
    scaled = np.empty(n, np.float64)
    rc = alias().alias_build(
        weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
        prob.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        al.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        scaled.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise ValueError("alias_build: weights sum to zero")
    return prob, al


def sah_chunks(cent, tmin, tmax, leaf: int, nbins: int = 16):
    """Partition prims into chunks of <= `leaf`; returns a list of int64
    index arrays (same chunks as geometry._sah_chunks_py)."""
    import numpy as np

    lib = sah()
    n = int(cent.shape[0])
    cent = np.ascontiguousarray(cent, np.float32)
    tmin = np.ascontiguousarray(tmin, np.float32)
    tmax = np.ascontiguousarray(tmax, np.float32)
    order = np.empty(max(n, 1), np.int64)
    max_chunks = n + 1
    off = np.empty(max_chunks + 1, np.int64)
    fp = ctypes.POINTER(ctypes.c_float)
    lp = ctypes.POINTER(ctypes.c_long)
    count = lib.sah_chunks(
        cent.ctypes.data_as(fp), tmin.ctypes.data_as(fp),
        tmax.ctypes.data_as(fp), n, int(leaf), int(nbins),
        order.ctypes.data_as(lp), off.ctypes.data_as(lp), max_chunks,
    )
    if count < 0:
        raise RuntimeError("sah_chunks failed")
    return [order[off[j]: off[j + 1]] for j in range(count)]


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
