"""Hash functions as vectorized uint32 jnp arithmetic.

Bit-exact re-derivations of the reference's hash family
(common/dpcpp/hashfunctions.hpp:3-137, common/dpcpp/slab_hash.hpp:60-64) so
that table layouts and bucket assignments are reproducible. Each function is
shape-polymorphic (works on scalars or arrays) and dtype-strict uint32, where
C++ unsigned wraparound is the semantics to match.

These run on the VPU as a handful of elementwise integer ops — on TPU a hash
is ~8 vector instructions, fully fused into surrounding kernels by XLA.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)
_M5 = np.uint32(5)
_MIX = np.uint32(0xE6546B64)
_F1 = np.uint32(0x85EBCA6B)
_F2 = np.uint32(0xC2B2AE35)


def _rotl32(x: jnp.ndarray, r: int) -> jnp.ndarray:
    x = x.astype(jnp.uint32)
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def _fmix32(h: jnp.ndarray) -> jnp.ndarray:
    """Murmur3 finalizer (hashfunctions.hpp:76-84)."""
    h = h ^ (h >> jnp.uint32(16))
    h = h * _F1
    h = h ^ (h >> jnp.uint32(13))
    h = h * _F2
    h = h ^ (h >> jnp.uint32(16))
    return h


def murmur3_32(v: jnp.ndarray, seed, size=None) -> jnp.ndarray:
    """MurmurHash3_x86_32 of a 4-byte uint32 key, reduced mod ``size``.

    Bit-exact vs. the reference functor with len=4 (hashfunctions.hpp:64-137):
    one block iteration, no tail, ``h1 ^= 4`` length mix, fmix32, ``% size``.
    Pass ``size=None`` for the raw 32-bit hash.
    """
    v = jnp.asarray(v).astype(jnp.uint32)
    seed = jnp.uint32(seed)
    k1 = v * _C1
    k1 = _rotl32(k1, 15)
    k1 = k1 * _C2
    h1 = seed ^ k1
    h1 = _rotl32(h1, 13)
    h1 = h1 * _M5 + _MIX
    h1 = h1 ^ jnp.uint32(4)  # len
    h1 = _fmix32(h1)
    if size is None:
        return h1
    return h1 % jnp.uint32(size)


def simple_hash(v: jnp.ndarray, size) -> jnp.ndarray:
    """SimpleHasher: ``v % size`` (hashfunctions.hpp:43-49)."""
    return jnp.asarray(v).astype(jnp.uint32) % jnp.uint32(size)


def simple_hash_with_offset(v: jnp.ndarray, size, offset) -> jnp.ndarray:
    """SimpleHasherWithOffset: ``(v % size + offset % size) % size``
    (hashfunctions.hpp:51-62 — the ctor pre-reduces the offset)."""
    size = jnp.uint32(size)
    off = jnp.uint32(offset) % size
    return (jnp.asarray(v).astype(jnp.uint32) % size + off) % size


def polynomial_hash(v: jnp.ndarray, size, p) -> jnp.ndarray:
    """PolynomialHasher: base-10 digit polynomial in prime ``p`` mod ``size``
    (hashfunctions.hpp:3-31). The C++ accumulates in int with signed overflow
    on ``pow_p *= p``; we reproduce two's-complement int32 wraparound.
    """
    v = jnp.asarray(v).astype(jnp.uint32)
    size_i = jnp.int32(size)
    res = jnp.zeros_like(v, dtype=jnp.int32)
    pow_p = jnp.full_like(v, p, dtype=jnp.int32)
    x = v
    # uint32 has at most 10 decimal digits; the C++ loop runs while v > 0 —
    # extra iterations here are no-ops because digit == 0 contributes 0 only
    # when pow_p stays in sync, so mask on x > 0 instead.
    for _ in range(10):
        live = x > 0
        digit = (x % jnp.uint32(10)).astype(jnp.int32)
        term = (digit * pow_p) % size_i  # C++ % on int (sign-preserving)
        res = jnp.where(live, (res + term) % size_i, res)
        pow_p = jnp.where(live, pow_p * jnp.int32(p), pow_p)
        x = x // jnp.uint32(10)
    # C++ returns size_t(res) — res may be negative after signed-wrap %;
    # keep the same bit pattern reduced into [0, size).
    return (res % size_i + size_i) % size_i


def affine_hash(v: jnp.ndarray, a, b, prime, num_buckets) -> jnp.ndarray:
    """SlabHash DefaultHasher: ``((a*k + b) % p) % buckets``
    (common/dpcpp/slab_hash.hpp:60-64)."""
    v = jnp.asarray(v).astype(jnp.uint32)
    return (
        (v * jnp.uint32(a) + jnp.uint32(b)) % jnp.uint32(prime)
    ) % jnp.uint32(num_buckets)


POLYNOMIAL_PRIMES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43)
SLAB_HASH_PRIME = 4294967291  # largest 32-bit prime, classic slab-hash choice
