"""ctypes bindings for the native oracle/validation library
(native/liboracles.cpp). Falls back to numpy/python implementations when the
shared library has not been built (``make -C native``) — functional parity,
just slower at large sizes.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native",
    "liboracles.so",
)

_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64, i32, u32p, i32p = (
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_int32),
    )
    lib.oracle_sort_i32.argtypes = [i32p, i64]
    lib.oracle_filter_lt_i32.restype = i64
    lib.oracle_filter_lt_i32.argtypes = [i32p, i64, i32, i32p]
    lib.oracle_reduce_i32.restype = i32
    lib.oracle_reduce_i32.argtypes = [i32p, i64]
    lib.oracle_groupby_sum_u32.argtypes = [u32p, u32p, i64, u32p, i64]
    lib.oracle_join_count.restype = i64
    lib.oracle_join_count.argtypes = [u32p, i64, u32p, i64]
    lib.oracle_validate_csr_join.restype = i64
    lib.oracle_validate_csr_join.argtypes = [
        u32p, i64, u32p, i64, i32p, i32p, u32p, i64,
    ]
    lib.oracle_seq_join.restype = i64
    lib.oracle_seq_join.argtypes = [
        u32p, u32p, i64, u32p, u32p, i64, u32p, u32p, u32p, i64,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _p(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def join_count(a_keys, b_keys) -> int:
    """Total matching (a, b) pairs."""
    a = np.ascontiguousarray(a_keys, np.uint32)
    b = np.ascontiguousarray(b_keys, np.uint32)
    lib = _load()
    if lib is not None:
        return int(
            lib.oracle_join_count(
                _p(a, ctypes.c_uint32), len(a), _p(b, ctypes.c_uint32), len(b)
            )
        )
    from collections import Counter

    ca = Counter(a.tolist())
    cb = Counter(b.tolist())
    return sum(ca[k] * cb.get(k, 0) for k in ca)


def validate_csr_join(a_keys, b_keys, pos, cnt, id_buffer) -> bool:
    """True iff the CSR join result matches the id-set oracle
    (join_omnisci.cpp:15-45 semantics)."""
    a = np.ascontiguousarray(a_keys, np.uint32)
    b = np.ascontiguousarray(b_keys, np.uint32)
    p = np.ascontiguousarray(pos, np.int32)
    c = np.ascontiguousarray(cnt, np.int32)
    ids = np.ascontiguousarray(id_buffer, np.uint32)
    lib = _load()
    if lib is not None:
        bad = lib.oracle_validate_csr_join(
            _p(a, ctypes.c_uint32), len(a),
            _p(b, ctypes.c_uint32), len(b),
            _p(p, ctypes.c_int32), _p(c, ctypes.c_int32),
            _p(ids, ctypes.c_uint32), len(ids),
        )
        return bad == 0
    # python fallback
    by_key = {}
    for i, k in enumerate(a):
        by_key.setdefault(int(k), set()).add(i)
    for j, k in enumerate(b):
        exp = by_key.get(int(k), set())
        got = set(ids[p[j]: p[j] + c[j]].tolist()) if c[j] > 0 else set()
        if got != exp:
            return False
    return True


def seq_join_sorted(ak, av, bk, bv) -> np.ndarray:
    """All (key, a_val, b_val) triples, lexicographically sorted, as an
    (n, 3) uint32 array (seq_join oracle)."""
    a_k = np.ascontiguousarray(ak, np.uint32)
    a_v = np.ascontiguousarray(av, np.uint32)
    b_k = np.ascontiguousarray(bk, np.uint32)
    b_v = np.ascontiguousarray(bv, np.uint32)
    lib = _load()
    if lib is not None:
        cap = max(16, int(join_count(a_k, b_k)))
        ok = np.empty(cap, np.uint32)
        oa = np.empty(cap, np.uint32)
        ob = np.empty(cap, np.uint32)
        n = lib.oracle_seq_join(
            _p(a_k, ctypes.c_uint32), _p(a_v, ctypes.c_uint32), len(a_k),
            _p(b_k, ctypes.c_uint32), _p(b_v, ctypes.c_uint32), len(b_k),
            _p(ok, ctypes.c_uint32), _p(oa, ctypes.c_uint32),
            _p(ob, ctypes.c_uint32), cap,
        )
        assert n >= 0
        return np.stack([ok[:n], oa[:n], ob[:n]], axis=1)
    from .ops.join import seq_join_oracle

    return seq_join_oracle(a_k, a_v, b_k, b_v).astype(np.uint32)


def groupby_sum(keys, vals, groups: int) -> np.ndarray:
    k = np.ascontiguousarray(keys, np.uint32)
    v = np.ascontiguousarray(vals, np.uint32)
    lib = _load()
    if lib is not None:
        out = np.zeros(groups, np.uint32)
        lib.oracle_groupby_sum_u32(
            _p(k, ctypes.c_uint32), _p(v, ctypes.c_uint32), len(k),
            _p(out, ctypes.c_uint32), groups,
        )
        return out
    out = np.zeros(groups, np.uint32)
    np.add.at(out, k.astype(np.int64), v)
    return out
