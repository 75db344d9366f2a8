"""Pallas TPU kernel: sorted-table key lookup (two-level, matmul-based).

Replaces the sort-based ``ops.sparse.lookup`` on the hot path: that
formulation pays one lax.sort of (V + Q) rows per lookup (16.5 ms of a
19.5 ms submanifold layer at V=16k, Q=27V — runs/sparse_probe_r5d.log).
Binary search is no better on TPU (log2 V rounds of random HBM
gathers), and per-lane dynamic VMEM indexing is not a thing the VPU
does. Instead:

  level 1: the table's 128 bucket heads (table[::128]) live as one
    broadcast row; bucket(q) = Σ (head ≤ q) − 1 — a (T, 128) compare.
  level 2: the query's 128-entry bucket row is fetched with a one-hot
    (T, 128) × (128, 128) MXU matmul from the table reshaped
    (128 buckets, 128 entries); rank-in-bucket is another (T, 128)
    compare-and-sum. idx = bucket·128 + rank − 1; hit ⇔ that entry
    equals the query.

Keys are int32 < 2³¹; the one-hot matmul must reproduce them exactly,
so the table is pre-split into hi/lo 16-bit halves (each < 2¹⁶ — exact
in fp32's 24-bit mantissa) and fetched with two HIGHEST-precision
matmuls (canvas.py:57-64 precedent).

Capacity: V ≤ 128·128 = 16384 (every backbone stage cap); callers fall
back to the sort path beyond that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_B = 128          # buckets == entries per bucket
_CAP = _B * _B    # max table rows
INVALID = jnp.iinfo(jnp.int32).max


def _make_kernel(tile: int, nsub: int):
    def kernel(heads_ref, thi_ref, tlo_ref, q_ref, idx_ref, hit_ref):
        q = q_ref[0]  # (nsub, tile) int32
        heads = heads_ref[:]  # (nsub, B) int32, rows identical
        ge = (
            q[:, :, None] >= heads[:, None, :]
        )  # (nsub, tile, B)
        bucket = jnp.sum(ge.astype(jnp.int32), axis=-1) - 1
        in_range = bucket >= 0
        bk = jnp.clip(bucket, 0, _B - 1)
        iota_b = jax.lax.broadcasted_iota(
            jnp.int32, (nsub, tile, _B), 2
        )
        onehot = (bk[:, :, None] == iota_b).astype(jnp.float32)
        # exact fetch: 16-bit halves in fp32 at HIGHEST (one-hot rows
        # are exact; the table halves must not round through bf16)
        fetch = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        rows_hi = fetch(onehot, thi_ref[:]).astype(jnp.int32)
        rows_lo = fetch(onehot, tlo_ref[:]).astype(jnp.int32)
        rows = rows_hi * 65536 + rows_lo  # (nsub, tile, B)
        le = rows <= q[:, :, None]
        rank = jnp.sum(le.astype(jnp.int32), axis=-1)  # (nsub, tile)
        idx = bk * _B + jnp.clip(rank - 1, 0, _B - 1)
        eq = jnp.sum(
            ((rows == q[:, :, None]) & le).astype(jnp.int32), axis=-1
        )
        hit = in_range & (rank > 0) & (eq > 0) & (q != INVALID)
        idx_ref[0] = jnp.where(hit, idx, 0)
        hit_ref[0] = hit.astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def lookup_pallas(keys_sorted, query_keys, interpret: bool = False):
    """Drop-in for ops.sparse.lookup (same contract) when
    V ≤ 16384. keys_sorted (V,) ascending with INVALID tail;
    query_keys (Q,). Returns (idx (Q,), hit (Q,))."""
    v = keys_sorted.shape[0]
    assert v <= _CAP, f"lookup_pallas capacity {_CAP} < V={v}"
    q = query_keys.shape[0]
    tile, nsub = 128, 8
    step = tile * nsub
    q_pad = (q + step - 1) // step * step
    qk = query_keys.astype(jnp.int32)
    if q_pad != q:
        qk = jnp.pad(qk, (0, q_pad - q), constant_values=INVALID)
    qk = qk.reshape(q_pad // step, nsub, tile)

    table = keys_sorted.astype(jnp.int32)
    if v < _CAP:
        table = jnp.pad(table, (0, _CAP - v), constant_values=INVALID)
    t2 = table.reshape(_B, _B)
    heads = jnp.broadcast_to(t2[:, 0], (nsub, _B))
    # 16-bit halves, exact in fp32 (INVALID = 2³¹−1 → hi 32767, lo ok)
    thi = (t2 >> 16).astype(jnp.float32)
    tlo = (t2 & 0xFFFF).astype(jnp.float32)

    grid = (q_pad // step,)
    idx, hit = pl.pallas_call(
        _make_kernel(tile, nsub),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, _B), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_B, _B), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_B, _B), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nsub, tile), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, nsub, tile), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nsub, tile), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_pad // step, nsub, tile), jnp.int32),
            jax.ShapeDtypeStruct((q_pad // step, nsub, tile), jnp.int32),
        ],
        interpret=interpret,
    )(heads, thi, tlo, qk)
    idx = idx.reshape(-1)[:q]
    hit = hit.reshape(-1)[:q].astype(bool)
    # contract parity with sparse.lookup: miss idx is arbitrary in-range
    return jnp.clip(idx, 0, max(v - 1, 1)), hit
