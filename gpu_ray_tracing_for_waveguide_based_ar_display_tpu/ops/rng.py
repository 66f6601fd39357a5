"""Counter-style per-ray RNG (xorshift32) as jnp uint32 vector ops.

The reference uses one xorshift32 state per CUDA thread with a zero-state reseed
(GPU_ray_tracing_functions.py:25-34) and multiplicative golden-ratio seeding
(gpu_ray_tracing_pro_fullColor.py:158).  Both are reproduced bit-exactly for parity
mode; 'fast' mode seeds through a splitmix32-style hash so nearby ray indices get
decorrelated streams (the reference's linear seeding makes stream *prefixes*
correlated across adjacent rays; harmless for its workload but worth fixing).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_GOLDEN = np.uint32(0x9E3779B9)
_RESEED = np.uint32(0x6D2B79F5)


def xorshift32_step(s: jnp.ndarray) -> jnp.ndarray:
    """One xorshift32 update on a uint32 vector."""
    s = s ^ (s << 13)
    s = s ^ (s >> 17)
    s = s ^ (s << 5)
    return s


def draw_uniform(state: jnp.ndarray, ray_idx: jnp.ndarray, advance: jnp.ndarray):
    """Draw U[0,1) float32 per ray; advance the state only where ``advance``.

    Mirrors the reference semantics: zero states reseed from the ray index before the
    draw; non-advancing rays keep their state (and their draw is meaningless).
    """
    s = jnp.where(state == 0, _RESEED ^ (ray_idx.astype(jnp.uint32) + 1), state)
    s_new = xorshift32_step(s)
    # top-24-bit draw: exact in float32 (and the TPU backend lacks uint32->f32
    # casts); differs from the reference's s * 2^-32 by < 6e-8
    u = ((s_new >> 8).astype(jnp.int32).astype(jnp.float32)
         * jnp.float32(1.0 / 16777216.0))
    return u, jnp.where(advance, s_new, state)


def seed_parity(ray_idx: np.ndarray) -> np.ndarray:
    """Reference seeding: 0x9E3779B9 * (idx + 1) mod 2^32."""
    return (_GOLDEN * (ray_idx.astype(np.uint32) + np.uint32(1))).astype(np.uint32)


def seed_fast(ray_idx: np.ndarray, seed: int) -> np.ndarray:
    """Splitmix32-style hash of (global seed, ray index)."""
    offset = np.uint64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    x = ray_idx.astype(np.uint64) + offset
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    out = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return np.where(out == 0, np.uint32(1), out)


# ---- device-side seed_fast: exact uint64 splitmix emulated in uint32 pairs.
# TPU XLA has no native 64-bit integers, but seeding 22500 cells x 2048 slots
# on the host costs a ~184 MB uint32 upload per iteration over the (slow,
# relay-attached) host->device link — the dominant cost of the full reference
# workload.  Emulating the hash in (hi, lo) uint32 pairs keeps seeds bitwise
# identical to :func:`seed_fast` with zero link traffic.


def _u64_mul_const(hi, lo, k: int):
    """(hi, lo) * k mod 2^64 for a Python-int constant k."""
    u32 = jnp.uint32
    klo, khi = k & 0xFFFFFFFF, (k >> 32) & 0xFFFFFFFF
    k0, k1 = klo & 0xFFFF, klo >> 16
    a0 = lo & u32(0xFFFF)
    a1 = lo >> u32(16)
    # full 32x32 -> 64 of lo * klo via 16-bit limbs
    p00 = a0 * u32(k0)
    p10 = a1 * u32(k0)
    p01 = a0 * u32(k1)
    p11 = a1 * u32(k1)
    mid = p10 + p01
    midc = (mid < p10).astype(jnp.uint32)           # carry out of mid
    lo_out = p00 + (mid << u32(16))
    c1 = (lo_out < p00).astype(jnp.uint32)
    hi_lo = p11 + (mid >> u32(16)) + (midc << u32(16)) + c1
    # cross terms only touch the high word
    hi_out = hi_lo + lo * u32(khi) + hi * u32(klo)
    return hi_out, lo_out


def _u64_shr_xor(hi, lo, k: int):
    """(hi, lo) ^= (hi, lo) >> k, for 0 < k < 32."""
    u32 = jnp.uint32
    lo_s = (lo >> u32(k)) | (hi << u32(32 - k))
    hi_s = hi >> u32(k)
    return hi ^ hi_s, lo ^ lo_s


def seed_fast_device(ray_idx: jnp.ndarray, seed: int) -> jnp.ndarray:
    """Bitwise :func:`seed_fast` on device: ``ray_idx`` is uint32 (callers must
    guarantee global ray indices fit 32 bits; the pipeline asserts this)."""
    u32 = jnp.uint32
    offset = (seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    off_lo, off_hi = offset & 0xFFFFFFFF, offset >> 32
    lo = ray_idx.astype(u32) + u32(off_lo)
    carry = (lo < u32(off_lo)).astype(u32)
    hi = u32(off_hi) + carry
    hi, lo = _u64_shr_xor(hi, lo, 30)
    hi, lo = _u64_mul_const(hi, lo, 0xBF58476D1CE4E5B9)
    hi, lo = _u64_shr_xor(hi, lo, 27)
    hi, lo = _u64_mul_const(hi, lo, 0x94D049BB133111EB)
    hi, lo = _u64_shr_xor(hi, lo, 31)
    return jnp.where(lo == 0, u32(1), lo)
