"""Counter-based, shard-invariant RNG for the wavefront renderer.

The reference uses a ``thread_local`` mt19937 (global.hpp:182-199), which
makes images depend on thread count and call order. Here every random
decision is a pure function of ``(seed, pixel/lane id, sample, bounce,
purpose)``, so results are identical regardless of device count, sharding
layout, or evaluation order — a capability the reference cannot offer.

The generator is a small Feistel/murmur-style uint32 mixer. It is not
cryptographic; it is statistically plenty for Monte Carlo rendering, fully
vectorizes on the VPU, and costs ~10 integer ops per draw.
"""
from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32

# distinct draw purposes within one path vertex
LIGHT_PICK = 0
LIGHT_U = 1
LIGHT_V = 2
BSDF_U0 = 3
BSDF_U1 = 4
BSDF_LOTTERY = 5
RR = 6
PIXEL_JX = 7
PIXEL_JY = 8
LIGHT_DIR_U0 = 9
LIGHT_DIR_U1 = 10
COMPACT = 11        # compaction-overflow lane roulette (path.py:compact)


def _mix(h):
    h = h.astype(U32)
    h = (h ^ (h >> U32(16))) * U32(0x7FEB352D)
    h = (h ^ (h >> U32(15))) * U32(0x846CA68B)
    h = h ^ (h >> U32(16))
    return h


def hash_u32(*words):
    """Combine integer words (arrays or scalars, broadcastable) -> uint32."""
    h = jnp.asarray(0x9E3779B9, U32)
    for w in words:
        w = jnp.asarray(w).astype(U32)
        h = _mix(h ^ (w + U32(0x9E3779B9) + (h << U32(6)) + (h >> U32(2))))
    return h


def uniform(seed, lane, sample, bounce, purpose):
    """U[0, 1) float32 for each lane. All args broadcastable ints."""
    bits = hash_u32(seed, lane, sample, bounce * 32 + purpose)
    # 24-bit mantissa -> [0, 1)
    return (bits >> U32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def uniform_simple(seed, lane, tag):
    bits = hash_u32(seed, lane, tag)
    return (bits >> U32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
