"""Parity: Pallas two-level lookup vs the sort-based sparse.lookup
(interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from de6d_tpu.ops import sparse
from de6d_tpu.ops.pallas.lookup import lookup_pallas


def _check(table_np, queries_np):
    keys = jnp.asarray(table_np)
    qk = jnp.asarray(queries_np)
    ref_idx, ref_hit = sparse.lookup(keys, qk)
    idx, hit = lookup_pallas(keys, qk, interpret=True)
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(ref_hit))
    # idx contract: only meaningful where hit
    h = np.asarray(ref_hit)
    np.testing.assert_array_equal(
        np.asarray(idx)[h], np.asarray(ref_idx)[h]
    )
    # and the indexed keys really match
    np.testing.assert_array_equal(
        np.asarray(keys)[np.asarray(idx)[h]], np.asarray(qk)[h]
    )


@pytest.mark.parametrize("v,q", [(16000, 4096), (700, 2048), (16384, 512)])
def test_lookup_pallas_random(rng, v, q):
    grid_max = 41 * 1600 * 1408
    u = np.unique(rng.randint(0, grid_max, v).astype(np.int32))
    table = np.full((v,), sparse.INVALID, np.int32)
    table[: len(u)] = u
    # queries: half present, half absent/random, some INVALID
    present = u[rng.randint(0, len(u), q // 2)]
    absent = rng.randint(0, grid_max, q - q // 2 - 8).astype(np.int32)
    inv = np.full((8,), sparse.INVALID, np.int32)
    queries = np.concatenate([present, absent, inv])
    rng.shuffle(queries)
    _check(table, queries)


def test_lookup_pallas_edges(rng):
    table = np.full((256,), sparse.INVALID, np.int32)
    table[:5] = [0, 1, 128, 129, 500000]
    queries = np.array(
        [0, 1, 2, 127, 128, 129, 130, 499999, 500000, 500001,
         sparse.INVALID, -0 + 0], np.int32,
    )
    _check(table, queries)


def test_lookup_pallas_empty_table():
    table = np.full((128,), sparse.INVALID, np.int32)
    queries = np.array([0, 5, sparse.INVALID], np.int32)
    _check(table, queries)
