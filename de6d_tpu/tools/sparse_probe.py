"""Component-level cost attribution for the sparse-conv path
(ops/sparse.py) at SECOND scale — the r4 per-config bench put SECOND
at 267 ms/frame vs PointPillars' 3.5 ms on the same chip (VERDICT r5
item #4); this probe splits a submanifold layer into lookup / gather /
GEMM and times the strided layer's site discovery, so the optimization
targets the measured term instead of a guess.

Protocol: each component runs inside ONE jitted lax.fori_loop with a
carried perturbation (NEXT.md measurement discipline — per-dispatch
tunnel overhead swamps isolated stage timings).

Usage: python -m de6d_tpu.tools.sparse_probe [--v 16000] [--b 4]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=16000)
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--c", type=int, default=32)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from de6d_tpu.ops import sparse

    print(f"backend={jax.default_backend()} V={args.v} B={args.b} "
          f"C={args.c}", flush=True)

    grid = (41, 1600, 1408)
    b, v, c = args.b, args.v, args.c
    rng = np.random.RandomState(0)

    # realistic active-site pattern: cluster sites on a ground band
    # (z in a few layers) like a voxelized KITTI scan
    coords = np.stack(
        [
            rng.randint(0, 6, (b, v)),           # z concentrated low
            rng.randint(0, grid[1], (b, v)),
            rng.randint(0, grid[2], (b, v)),
        ],
        axis=-1,
    ).astype(np.int32)
    keys = (
        (coords[..., 0] * grid[1] + coords[..., 1]) * grid[2]
        + coords[..., 2]
    )
    keys = np.sort(keys, axis=-1)
    # dedupe within each sample (duplicates break the sorted-unique
    # precondition; INVALID-pad the tail)
    for i in range(b):
        u = np.unique(keys[i])
        keys[i, : len(u)] = u
        keys[i, len(u):] = np.iinfo(np.int32).max
    keys_j = jnp.asarray(keys)
    feats_j = jnp.asarray(rng.randn(b, v, c).astype(np.float32))
    w = jnp.asarray(rng.randn(27, c, c).astype(np.float32) * 0.05)

    offsets = sparse._kernel_offsets((3, 3, 3))

    def timed(name, fn, *xs, k=args.k):
        """fn must map (carry,) -> same-shape carry; loops k times
        inside one executable."""

        @jax.jit
        def run(x0):
            def body(_, x):
                return fn(x)

            return jax.lax.fori_loop(0, k, body, x0)

        out = run(*xs)
        jax.block_until_ready(out)
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(*xs)
            jax.block_until_ready(out)
            reps.append((time.perf_counter() - t0) / k * 1e3)
        ms = min(reps)
        print(f"  {name}: {ms:8.2f} ms/iter (B={b})", flush=True)
        return ms

    # T1: full submanifold conv layer
    def t1(f):
        out = jax.vmap(
            lambda ff, kk: sparse.subm_conv(ff, kk, grid, w)
        )(f, keys_j)
        return f + out * 1e-6

    timed("subm_conv full", t1, feats_j)

    # T2: neighbor lookup only (27 searchsorted sweeps)
    def t2(f):
        def one(kk, ff):
            coords_ = sparse.keys_to_coords(kk, grid)
            valid = kk != sparse.INVALID
            nbr = coords_[:, None, :] + offsets[None, :, :]
            nbr_keys = sparse.coords_to_keys(
                nbr.reshape(-1, 3), grid, jnp.repeat(valid, 27)
            )
            idx, hit = sparse.lookup(kk, nbr_keys)
            return (
                jnp.sum(idx.astype(jnp.float32))
                + jnp.sum(hit.astype(jnp.float32))
            )

        s = jax.vmap(one)(keys_j, f)
        return f + s[:, None, None] * 1e-12

    timed("lookup only (27 offs)", t2, feats_j)

    # T3: lookup + gather (no GEMM)
    def t3(f):
        def one(kk, ff):
            coords_ = sparse.keys_to_coords(kk, grid)
            valid = kk != sparse.INVALID
            g = sparse.gather_neighbors(
                ff, kk, coords_, offsets, grid, valid
            )
            return jnp.sum(g)

        s = jax.vmap(one)(keys_j, f)
        return f + s[:, None, None] * 1e-12

    timed("lookup+gather", t3, feats_j)

    # T4: GEMM only (pre-gathered random operand)
    gathered0 = jnp.asarray(
        rng.randn(b, v, 27 * c).astype(np.float32)
    )

    def t4(g):
        out = jax.lax.dot_general(
            g.reshape(-1, 27 * c), w.reshape(27 * c, c),
            (((1,), (0,)), ((), ())),
        )
        return g + jnp.sum(out) * 1e-12

    timed("GEMM only", t4, gathered0)

    # T2b: neighbor-table build (9 sorted lookups + shifted gathers)
    def t2b(f):
        def one(kk):
            ti, th = sparse.subm_neighbor_table(kk, grid)
            return (
                jnp.sum(ti.astype(jnp.float32))
                + jnp.sum(th.astype(jnp.float32))
            )

        s = jax.vmap(one)(keys_j)
        return f + s[:, None, None] * 1e-12

    timed("neighbor_table build", t2b, feats_j)

    # T2c: subm conv from a prebuilt table (the per-layer marginal
    # cost once the stage shares the table)
    tab_i, tab_h = jax.vmap(
        lambda kk: sparse.subm_neighbor_table(kk, grid)
    )(keys_j)

    def t2c(f):
        out = jax.vmap(
            lambda ff, ti, th, kk: sparse.subm_conv_table(
                ff, ti, th, w, kk != sparse.INVALID
            )
        )(f, tab_i, tab_h, keys_j)
        return f + out * 1e-6

    timed("subm_conv_table (table given)", t2c, feats_j)

    # T5: strided-layer site discovery (unique)
    def t5(f):
        def one(kk):
            ok, _ = sparse.downsample_coords(
                kk, grid, (2, 2, 2), (1, 1, 1), v
            )
            return jnp.sum(ok.astype(jnp.float32))

        s = jax.vmap(one)(keys_j)
        return f + s[:, None, None] * 1e-12

    timed("downsample_coords", t5, feats_j)

    # T6: strided conv (sites precomputed)
    out_keys, out_grid = jax.vmap(
        lambda kk: sparse.downsample_coords(
            kk, grid, (2, 2, 2), (1, 1, 1), v
        )[0]
    )(keys_j), None
    _, out_grid = sparse.downsample_coords(
        keys_j[0], grid, (2, 2, 2), (1, 1, 1), v
    )

    def t6(f):
        out = jax.vmap(
            lambda ff, kk, ok: sparse.strided_conv(
                ff, kk, grid, w, (3, 3, 3), (2, 2, 2), (1, 1, 1), ok,
                out_grid,
            )
        )(f, keys_j, out_keys)
        return f + jnp.sum(out) * 1e-12

    timed("strided_conv (sites given)", t6, feats_j)

    # T7: Pallas slab-gather subm conv (table given) — the r5 kernel
    # (ops/pallas/sparse_gather.py); also report the spread check
    from de6d_tpu.ops.pallas.sparse_gather import (
        slab_spread_ok, subm_conv_slab,
    )

    ok = slab_spread_ok(tab_i, tab_h, v, cin=feats_j.shape[-1])
    print(f"  slab spread ok: {np.asarray(ok)}", flush=True)

    def t7(f):
        out, _ = subm_conv_slab(
            f, tab_i, tab_h, w, keys_j != sparse.INVALID
        )
        return f + out * 1e-6

    timed("subm_conv_slab (Pallas)", t7, feats_j)

    # T7b: same in bf16 (the per-config bench dtype)
    feats_bf = feats_j.astype(jnp.bfloat16)

    def t7b(f):
        out, _ = subm_conv_slab(
            f, tab_i, tab_h, w, keys_j != sparse.INVALID
        )
        return f + out * jnp.bfloat16(1e-6)

    timed("subm_conv_slab bf16", t7b, feats_bf)

    def t2c_bf(f):
        out = jax.vmap(
            lambda ff, ti, th, kk: sparse.subm_conv_table(
                ff, ti, th, w.astype(jnp.bfloat16), kk != sparse.INVALID
            )
        )(f, tab_i, tab_h, keys_j)
        return f + out * jnp.bfloat16(1e-6)

    timed("subm_conv_table bf16", t2c_bf, feats_bf)


if __name__ == "__main__":
    main()
