# coding: utf-8
"""Build the native host-graph kernel library (g++ -O3 -fopenmp).

The library is plain C ABI (no Python.h), loaded via ctypes by
``ctgcn_tpu.native``.  Build is atomic (temp file + os.replace) so
concurrent first-use from multiprocessing preprocessing workers is safe.

Usage: ``python -m ctgcn_tpu.native.build`` — or just import the package;
the loader builds lazily on first use.
"""
from __future__ import annotations

import os
import subprocess
import tempfile

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "hostgraph.cpp")
LIB = os.path.join(_DIR, "libhostgraph.so")


def stale():
    """True when the library is missing or older than its source (edits to
    hostgraph.cpp must not silently run against a cached binary)."""
    if not os.path.exists(LIB):
        return True
    return os.path.getmtime(LIB) < os.path.getmtime(SRC)


def build(verbose=False):
    """Compile hostgraph.cpp → libhostgraph.so.  Returns the library path.

    Raises on compiler failure; callers treat any exception as "native
    unavailable" and keep the numpy fallback.
    """
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
    os.close(fd)
    # no -march=native: the gitignored .so can outlive the host it was
    # built on (shared checkouts / container rebuilds) and SIGILL; these
    # kernels are branch/latency-bound, not SIMD-bound, so portable -O3
    # costs nothing measurable
    cmd = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC",
           "-funroll-loops", SRC, "-o", tmp]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True)
        if res.returncode != 0:
            raise RuntimeError(f"native build failed:\n{res.stderr}")
        os.replace(tmp, LIB)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    if verbose:
        print(f"built {LIB}")
    return LIB


if __name__ == "__main__":
    build(verbose=True)
