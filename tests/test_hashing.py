"""Bit-exactness tests for the hash family vs. pure-Python reference
implementations of the C++ functors (hashfunctions.hpp)."""

import numpy as np
import jax.numpy as jnp

from dwarf_bench_tpu.ops.hashing import (
    affine_hash,
    murmur3_32,
    polynomial_hash,
    simple_hash,
    simple_hash_with_offset,
)


def _py_murmur3_u32(v: int, seed: int, size: int | None) -> int:
    """Literal transcription of MurmurHash3_x86_32 for a 4-byte key
    (hashfunctions.hpp:64-137)."""
    M = 0xFFFFFFFF

    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & M

    c1, c2 = 0xCC9E2D51, 0x1B873593
    k1 = (v * c1) & M
    k1 = rotl(k1, 15)
    k1 = (k1 * c2) & M
    h1 = seed ^ k1
    h1 = rotl(h1, 13)
    h1 = (h1 * 5 + 0xE6546B64) & M
    h1 ^= 4
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & M
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & M
    h1 ^= h1 >> 16
    return h1 % size if size else h1


class TestMurmur3:
    def test_bit_exact(self, rng):
        keys = rng.integers(0, 2**32, 200, dtype=np.uint32)
        for seed in (0, 1, 0xDEADBEEF):
            got = np.asarray(murmur3_32(jnp.asarray(keys), seed))
            exp = np.array(
                [_py_murmur3_u32(int(k), seed, None) for k in keys],
                dtype=np.uint32,
            )
            assert np.array_equal(got, exp)

    def test_mod_size(self, rng):
        keys = rng.integers(0, 2**32, 100, dtype=np.uint32)
        got = np.asarray(murmur3_32(jnp.asarray(keys), 7, size=1000))
        exp = np.array(
            [_py_murmur3_u32(int(k), 7, 1000) for k in keys], dtype=np.uint32
        )
        assert np.array_equal(got, exp)
        assert got.max() < 1000


class TestSimpleHashers:
    def test_simple(self, rng):
        keys = rng.integers(0, 2**32, 100, dtype=np.uint32)
        assert np.array_equal(
            np.asarray(simple_hash(jnp.asarray(keys), 37)), keys % 37
        )

    def test_with_offset(self, rng):
        keys = rng.integers(0, 2**32, 100, dtype=np.uint32)
        # ctor pre-reduces offset (hashfunctions.hpp:51-62)
        got = np.asarray(simple_hash_with_offset(jnp.asarray(keys), 37, 100))
        exp = (keys % 37 + (100 % 37)) % 37
        assert np.array_equal(got, exp)


class TestPolynomial:
    def test_matches_cpp_semantics(self):
        """Digit-polynomial with int32-wrapping pow (hashfunctions.hpp:3-31)."""

        def cpp_poly(v, size, p):
            res = 0
            pow_p = np.int32(p)
            with np.errstate(over="ignore"):
                while v > 0:
                    term = int(np.int32(v % 10) * pow_p) % size
                    res = (res + term) % size
                    pow_p = np.int32(pow_p * np.int32(p))
                    v //= 10
            return res % size

        for p in (2, 7, 43):
            for v in (0, 5, 123, 987654, 4294967295):
                got = int(polynomial_hash(jnp.asarray([v], jnp.uint32), 1024, p)[0])
                exp = cpp_poly(v, 1024, p)
                assert got % 1024 == exp % 1024, (v, p, got, exp)


class TestAffine:
    def test_affine(self, rng):
        keys = rng.integers(0, 2**32, 50, dtype=np.uint32)
        got = np.asarray(affine_hash(jnp.asarray(keys), 3, 11, 4294967291, 64))
        exp = (
            (keys.astype(np.uint64) * 3 + 11) % np.uint64(0xFFFFFFFF)
        )  # placeholder: recompute properly below
        exp = (((keys.astype(np.uint64) * 3) & 0xFFFFFFFF) + 11) & 0xFFFFFFFF
        exp = (exp % 4294967291) % 64
        assert np.array_equal(got, exp.astype(np.uint32))
