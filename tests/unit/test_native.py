# coding: utf-8
"""C++ host-graph kernels (ctgcn_tpu/native) vs the numpy reference paths.

The native library is the production default for preprocessing
(kcore.core_numbers, walks.simulate_walks with rng=None); these tests pin
exact k-core parity against both the numpy peel and networkx, and the walk
kernel's structural/statistical contract (reference
preprocessing/random_walk.py:21-49 semantics).
"""
import numpy as np
import networkx as nx
import pytest
import scipy.sparse as sp

from ctgcn_tpu import native


pytestmark = pytest.mark.unit


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library unavailable (g++ missing?)")
    return True


def _random_graph(n, m, seed, weighted=True):
    G = nx.gnm_random_graph(n, m, seed=seed)
    A = nx.to_scipy_sparse_array(G, nodelist=range(n),
                                 format="csr").astype(np.float64)
    if weighted:
        rng = np.random.default_rng(seed)
        w = rng.random(A.nnz) * 3 + 0.1
        A.data = w
        # keep symmetric: rebuild from upper triangle
        U = sp.triu(A, k=1)
        A = (U + U.T).tocsr()
    return G, A


@pytest.mark.parametrize("n,m,seed", [(200, 800, 0), (500, 3000, 1),
                                      (300, 300, 2)])
def test_core_numbers_parity(lib_ok, n, m, seed):
    G, A = _random_graph(n, m, seed, weighted=False)
    got = native.core_numbers(A)
    nx_core = nx.core_number(G)
    want = np.array([nx_core[i] for i in range(n)])
    np.testing.assert_array_equal(got, want)


def test_core_numbers_through_kcore_module(lib_ok):
    """kcore.core_numbers routes through the native path and still matches
    networkx (and therefore the numpy fallback, which is nx-parity-tested
    in test_tooling)."""
    from ctgcn_tpu.preprocessing.kcore import core_numbers

    G, A = _random_graph(400, 2500, 7, weighted=True)
    got = core_numbers(A)
    nx_core = nx.core_number(G)
    want = np.array([nx_core[i] for i in range(400)])
    np.testing.assert_array_equal(got, want)


def test_core_numbers_isolated_nodes(lib_ok):
    rows = [0, 1, 1, 2, 2, 0]
    cols = [1, 0, 2, 1, 0, 2]
    A = sp.csr_matrix((np.ones(6), (rows, cols)), shape=(10, 10))
    got = native.core_numbers(A)
    assert list(got[:3]) == [2, 2, 2]
    assert (got[3:] == 0).all()
    # fully empty matrix: all zeros, no crash
    empty = sp.csr_matrix((10, 10))
    assert (native.core_numbers(empty) == 0).all()


def test_walks_edgeless_snapshot(lib_ok):
    """A snapshot with zero edges is valid input (walks stay put) — the
    weighted cumsum build must not index into the empty data array."""
    empty = sp.csr_matrix((7, 7))
    walks = native.simulate_walks(empty, 3, 2, weighted=True, seed=5)
    assert walks.shape == (14, 4)
    assert np.array_equal(walks, np.repeat(
        np.repeat(np.arange(7), 2)[:, None], 4, axis=1))


def test_walks_structure(lib_ok):
    _, A = _random_graph(150, 600, 3)
    # add isolated node coverage: node indices >= 140 likely have edges;
    # force one isolated node by zeroing its row/col
    lil = A.tolil()
    lil[0, :] = 0
    lil[:, 0] = 0
    A = lil.tocsr()
    A.eliminate_zeros()
    T, L = 6, 4
    walks = native.simulate_walks(A, L, T, weighted=True, seed=9)
    assert walks.shape == (150 * T, L + 1)
    assert np.array_equal(walks[:, 0], np.repeat(np.arange(150), T))
    indptr, indices = A.indptr, A.indices
    for r in range(walks.shape[0]):
        for s in range(1, L + 1):
            u, v = int(walks[r, s - 1]), int(walks[r, s])
            if u == v:
                assert indptr[u + 1] == indptr[u]  # dead end stays put
            else:
                assert v in indices[indptr[u]:indptr[u + 1]]
    # deterministic per seed
    again = native.simulate_walks(A, L, T, weighted=True, seed=9)
    np.testing.assert_array_equal(walks, again)
    other = native.simulate_walks(A, L, T, weighted=True, seed=10)
    assert not np.array_equal(walks, other)


def test_walks_weight_bias(lib_ok):
    """A 10x-heavier edge must be sampled ~10x more often (inverse-CDF
    correctness), matching the numpy sampler's distribution."""
    # star: node 0 connected to 1 (w=10) and 2 (w=1)
    rows = [0, 0, 1, 2]
    cols = [1, 2, 0, 0]
    vals = [10.0, 1.0, 10.0, 1.0]
    A = sp.csr_matrix((vals, (rows, cols)), shape=(3, 3))
    walks = native.simulate_walks(A, 1, 20000, weighted=True, seed=1)
    first_hop = walks[:20000, 1]  # walks starting at node 0
    frac_heavy = (first_hop == 1).mean()
    assert abs(frac_heavy - 10 / 11) < 0.02
    # unweighted: ~uniform
    walks_u = native.simulate_walks(A, 1, 20000, weighted=False, seed=1)
    frac_u = (walks_u[:20000, 1] == 1).mean()
    assert abs(frac_u - 0.5) < 0.02


def test_simulate_walks_module_routing(lib_ok, monkeypatch):
    """walks.simulate_walks: rng=None -> native; explicit rng -> numpy."""
    from ctgcn_tpu.preprocessing import walks as W

    _, A = _random_graph(60, 200, 5)
    out_native = W.simulate_walks(A, 3, 2)
    assert out_native.shape == (120, 4)
    out_np = W.simulate_walks(A, 3, 2, rng=np.random.RandomState(0))
    assert out_np.shape == (120, 4)
    # disabling the native path falls back cleanly
    monkeypatch.setenv("CTGCN_TPU_NATIVE", "0")
    monkeypatch.setattr(native, "_lib", None)
    assert not native.available()
    out_fallback = W.simulate_walks(A, 3, 2)
    assert out_fallback.shape == (120, 4)
    monkeypatch.setattr(native, "_lib", None)  # re-enable for other tests
