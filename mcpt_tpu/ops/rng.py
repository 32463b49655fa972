"""Counter-based RNG matching the reference's replayability properties.

The reference seeds each pixel with `Tea<4>(pixel_offset, frame)` and then
draws from a 32-bit LCG (csrt include/csrt/utils/math.hpp:43-63).  We keep
the identical generators — they vectorize perfectly on the VPU as uint32
lanes — so every ray's sample stream is a pure function of
(pixel, frame), independent of batch shape or device mesh.  That makes
multi-chip renders bit-identical to single-chip ones.

State is a uint32 array with one lane per ray.  Each draw advances the
state in place (functionally).  A fixed number of draws happens per bounce
regardless of branch outcomes, so streams stay aligned across lanes.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_TEA_DELTA = jnp.uint32(0x9E3779B9)
_LCG_MUL = jnp.uint32(1664525)
_LCG_ADD = jnp.uint32(1013904223)


def tea(v0, v1, rounds: int = 4):
    """TEA-based hash of two uint32s (csrt math.hpp:43-54)."""
    v0 = jnp.asarray(v0, jnp.uint32)
    v1 = jnp.asarray(v1, jnp.uint32)
    s0 = jnp.uint32(0)
    for _ in range(rounds):
        s0 = s0 + _TEA_DELTA
        v0 = v0 + (
            ((v1 << 4) + jnp.uint32(0xA341316C))
            ^ (v1 + s0)
            ^ ((v1 >> 5) + jnp.uint32(0xC8013EA4))
        )
        v1 = v1 + (
            ((v0 << 4) + jnp.uint32(0xAD90777D))
            ^ (v0 + s0)
            ^ ((v0 >> 5) + jnp.uint32(0x7E95761E))
        )
    return v0


def random_float(state):
    """One LCG draw in [0, 1) (csrt math.hpp:58-63).

    Returns (new_state, sample); shapes follow `state`.

    The masked 24-bit value converts through int32: uint32->float32 is
    ~100x slower than int32->float32 on the TPU VPU (measured on v5e),
    and the detour is bit-exact for values < 2^31.
    """
    state = state * _LCG_MUL + _LCG_ADD
    bits24 = (state & jnp.uint32(0x00FFFFFF)).astype(jnp.int32)
    sample = bits24.astype(jnp.float32) * (1.0 / 16777216.0)
    return state, sample


def random_floats(state, n: int):
    """Draw `n` samples per lane; returns (state, [n, ...] array)."""
    outs = []
    for _ in range(n):
        state, x = random_float(state)
        outs.append(x)
    return state, jnp.stack(outs, axis=0)


def van_der_corput_base2(index):
    """Radical inverse in base 2 of uint32 `index`
    (csrt math.hpp:29-41 with base=2 — equals bit reversal / 2^32)."""
    i = jnp.asarray(index, jnp.uint32)
    i = ((i & jnp.uint32(0x55555555)) << 1) | ((i & jnp.uint32(0xAAAAAAAA)) >> 1)
    i = ((i & jnp.uint32(0x33333333)) << 2) | ((i & jnp.uint32(0xCCCCCCCC)) >> 2)
    i = ((i & jnp.uint32(0x0F0F0F0F)) << 4) | ((i & jnp.uint32(0xF0F0F0F0)) >> 4)
    i = ((i & jnp.uint32(0x00FF00FF)) << 8) | ((i & jnp.uint32(0xFF00FF00)) >> 8)
    i = (i << 16) | (i >> 16)
    # 2^-32 scaling, split hi24/lo8 through int32 converts (the direct
    # uint32->float32 convert is ~100x slower on the TPU VPU); the two
    # exact terms round once on add — bit-identical to the direct form.
    hi = (i >> 8).astype(jnp.int32).astype(jnp.float32)
    lo = (i & jnp.uint32(0xFF)).astype(jnp.int32).astype(jnp.float32)
    return hi * jnp.float32(5.960464477539063e-08) + lo * jnp.float32(
        2.3283064365386963e-10
    )


def van_der_corput(index, base: int):
    """General-base radical inverse (csrt math.hpp:29-41) via fori_loop."""
    if base == 2:
        return van_der_corput_base2(index)
    index = jnp.asarray(index, jnp.uint32)
    base_inv = jnp.float32(1.0 / base)
    ubase = jnp.uint32(base)

    def body(_, carry):
        idx, result, frac = carry
        # digit < base always fits int32; the int32 detour avoids the
        # slow uint32->float32 VPU convert (see random_float above)
        digit = (idx % ubase).astype(jnp.int32).astype(jnp.float32)
        result = result + frac * digit
        idx = idx // ubase
        frac = frac * base_inv
        return idx, result, frac

    # 32 bits / log2(base) iterations always suffice; draws are masked by
    # idx hitting 0 (adding zeros), so a fixed trip count is safe.
    import math as _math

    trips = int(_math.ceil(32 / _math.log2(base))) + 1
    _, result, _ = lax.fori_loop(
        0,
        trips,
        body,
        (index, jnp.zeros(jnp.shape(index), jnp.float32), jnp.full(jnp.shape(index), base_inv)),
    )
    return result


def pixel_seed(pixel_index, frame=0):
    """Per-pixel deterministic seed: Tea<4>(pixel_offset, frame) where
    pixel_offset = 3 * pixel_index as in csrt renderer.cpp:65-66."""
    return tea(jnp.asarray(pixel_index, jnp.uint32) * jnp.uint32(3),
               jnp.asarray(frame, jnp.uint32))
