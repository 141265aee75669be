# coding: utf-8
"""Test fixtures.

Tests run on CPU with 8 virtual devices so multi-chip sharding code paths are
exercised without TPU hardware (SURVEY §4's test-pyramid design).
"""
import os

# Must happen before the first backend initialization.  The container's axon
# sitecustomize pre-imports jax and pins JAX_PLATFORMS=axon, so the env var
# alone is not enough — jax.config.update below overrides it.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest
import scipy.sparse as sp


@pytest.fixture(autouse=True)
def reset_seeds():
    np.random.seed(42)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def toy_adj(rng):
    """A small random symmetric weighted graph, no self loops."""
    n = 37
    dense = (rng.rand(n, n) < 0.15).astype(np.float32)
    dense *= rng.rand(n, n).astype(np.float32) + 0.5
    dense = np.triu(dense, 1)
    dense = dense + dense.T
    return sp.coo_matrix(dense)


@pytest.fixture
def toy_features(rng, toy_adj):
    return rng.randn(toy_adj.shape[0], 16).astype(np.float32)


def make_snapshot_graph(rng, n, density=0.1):
    dense = (rng.rand(n, n) < density).astype(np.float32)
    dense = np.triu(dense, 1)
    dense = dense + dense.T
    return sp.coo_matrix(dense)
