# coding: utf-8
"""ctypes bindings for the C++ host-graph kernels (hostgraph.cpp).

The compute path of this framework is JAX/XLA/Pallas on the TPU; this
package is the *host runtime* counterpart — native kernels for the
CPU-side graph work that feeds the chip (k-core peeling, random-walk
sampling).  Loading is lazy and failure-tolerant: if the shared library
is missing it is built once with g++ (atomic replace, multiprocess-safe);
if that fails — or ``CTGCN_TPU_NATIVE=0`` is set — callers fall back to
the pure-numpy implementations in ``ctgcn_tpu.preprocessing``.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_lib = None  # None = not tried, False = unavailable, CDLL = loaded


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("CTGCN_TPU_NATIVE", "1") == "0":
        _lib = False
        return _lib
    from ctgcn_tpu.native.build import LIB, build, stale

    try:
        if stale():
            build()
        lib = ctypes.CDLL(LIB)
    except Exception:
        _lib = False
        return _lib

    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.hg_core_numbers.argtypes = [ctypes.c_int64, i64p, i32p, i64p]
    lib.hg_core_numbers.restype = None
    lib.hg_simulate_walks.argtypes = [
        ctypes.c_int64, i64p, i32p, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_uint64, ctypes.c_int32, i32p]
    lib.hg_simulate_walks.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return bool(_load())


def _csr_arrays(A):
    indptr = np.ascontiguousarray(A.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(A.indices, dtype=np.int32)
    return indptr, indices


def core_numbers(A) -> np.ndarray:
    """Exact k-core numbers of a symmetric self-loop-free scipy CSR."""
    lib = _load()
    assert lib, "native library unavailable"
    indptr, indices = _csr_arrays(A)
    n = A.shape[0]
    core = np.zeros(n, dtype=np.int64)
    lib.hg_core_numbers(n, indptr, indices, core)
    return core


def _default_threads():
    """OpenMP thread budget: respect OMP_NUM_THREADS when set; inside a
    multiprocessing Pool worker default to 1 (the preprocessing fan-out
    already owns the cores — an uncapped parallel-for per worker
    oversubscribes the host, the exact failure mode CLAUDE.md documents
    for sklearn/BLAS)."""
    env = os.environ.get("OMP_NUM_THREADS")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            pass
    import multiprocessing

    if multiprocessing.parent_process() is not None:
        return 1
    return 0  # 0 = let OpenMP use its default (whole machine)


def simulate_walks(A, walk_length, walk_time, weighted=True, seed=None,
                   n_threads=None) -> np.ndarray:
    """``walk_time`` walks of ``walk_length+1`` nodes from every node, in
    the reference layout (walks.py:60-62).  Weighted hops sample by the
    per-row inclusive weight running sum (inverse-CDF binary search)."""
    lib = _load()
    assert lib, "native library unavailable"
    indptr, indices = _csr_arrays(A)
    n = A.shape[0]
    nnz = int(indptr[-1])
    if weighted and nnz > 0:
        # per-row inclusive cumsum, vectorized: global cumsum minus the
        # running total at each row start
        data = np.asarray(A.data, dtype=np.float64)[:nnz]
        g = np.cumsum(data)
        row_base = np.repeat(g[indptr[:-1] - 1] * (indptr[:-1] > 0),
                             np.diff(indptr))
        cumw = np.ascontiguousarray(g - row_base)
        cumw_ptr = cumw.ctypes.data_as(ctypes.c_void_p)
    else:
        # unweighted — or edgeless snapshot (every walk stays put; the
        # uniform path's dead-end handling covers it without touching cumw)
        cumw = None
        cumw_ptr = None
    if seed is None:
        seed = int(np.random.randint(0, 2**63 - 1, dtype=np.int64))
    nt = _default_threads() if n_threads is None else max(0, int(n_threads))
    walks = np.empty((n * walk_time, walk_length + 1), dtype=np.int32)
    lib.hg_simulate_walks(n, indptr, indices, cumw_ptr,
                          np.int32(walk_time), np.int32(walk_length),
                          np.uint64(seed), np.int32(nt), walks)
    return walks
