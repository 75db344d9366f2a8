"""BEV canvas build variants — micro-bench on the real chip.

The PointPillarScatter canvas (16k sorted pillars -> 432x496x64 dense
canvas) costs ~1.6 ms/scan in the r2 split — the #1 inference lever
(NEXT.md). Voxel coords are KEY-SORTED and unique (ops/voxelize), which
several variants exploit:

  v1 id-scatter + gather        (current PointPillarScatter)
  v2 id-scatter w/ sorted+unique hints + gather
  v3 cummax sorted-gather: scatter (i+1) at lin (sorted/unique),
     cummax over cells -> monotone gather indices (sorted fast path),
     mask cells that own no pillar
  v4 row scatter .at[lin].set(feat) w/ sorted+unique hints
  v5 segment_sum(feat, lin) w/ indices_are_sorted (sorted segment
     reduction — the dynamic-VFE pattern)

All timed with the chained protocol (tunnel memoizes identical
dispatches; block_until_ready does not block — end reps with a host
fetch). Correctness asserted vs v1 before timing.

Usage: python -m de6d_tpu.tools.canvas_probe [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


NY, NX, V, C = 496, 432, 16384, 64


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--platform", default=None,
                    help="'cpu' to avoid touching the TPU tunnel "
                         "(shell JAX_PLATFORMS does not override axon)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    dt = jnp.dtype(args.dtype)
    print(f"backend={jax.default_backend()} dtype={dt} batch={args.batch}")

    g = NY * NX
    rng = np.random.RandomState(0)
    feats = rng.randn(args.batch, V, C).astype(np.float32)
    # sorted unique linear cell ids per sample, ~90% fill of V
    lins = np.full((args.batch, V), g, np.int64)
    for b in range(args.batch):
        n_valid = int(V * 0.9)
        lin = np.sort(rng.choice(g, n_valid, replace=False))
        lins[b, :n_valid] = lin
        feats[b, n_valid:] = 0.0
    feats = jnp.asarray(feats, dt)
    lins = jnp.asarray(lins, jnp.int32)

    def v1(feat, lin):
        ids = jnp.full((g + 1,), V, jnp.int32)
        ids = ids.at[lin].set(jnp.arange(V, dtype=jnp.int32), mode="drop")
        fpad = jnp.concatenate([feat, jnp.zeros((1, C), feat.dtype)], 0)
        return fpad[ids[:g]].reshape(NY, NX, C)

    def v2(feat, lin):
        ids = jnp.full((g + 1,), V, jnp.int32)
        ids = ids.at[lin].set(
            jnp.arange(V, dtype=jnp.int32), mode="drop",
            unique_indices=True, indices_are_sorted=True,
        )
        fpad = jnp.concatenate([feat, jnp.zeros((1, C), feat.dtype)], 0)
        return fpad[ids[:g]].reshape(NY, NX, C)

    def v3(feat, lin):
        t = jnp.zeros((g + 1,), jnp.int32)
        t = t.at[lin].set(
            jnp.arange(1, V + 1, dtype=jnp.int32), mode="drop",
            unique_indices=True, indices_are_sorted=True,
        )[:g]
        s = jax.lax.cummax(t)  # monotone non-decreasing
        fpad = jnp.concatenate([jnp.zeros((1, C), feat.dtype), feat], 0)
        rows = jnp.take(fpad, s, axis=0, indices_are_sorted=True)
        out = jnp.where((t > 0)[:, None], rows, 0)
        return out.reshape(NY, NX, C)

    def v4(feat, lin):
        canvas = jnp.zeros((g + 1, C), feat.dtype)
        canvas = canvas.at[lin].set(
            feat, mode="drop", unique_indices=True, indices_are_sorted=True,
        )
        return canvas[:g].reshape(NY, NX, C)

    def v5(feat, lin):
        out = jax.ops.segment_sum(
            feat, lin, num_segments=g + 1, indices_are_sorted=True,
        )
        return out[:g].reshape(NY, NX, C)

    variants = {"v1_id_scatter_gather": v1, "v2_hinted_ids": v2,
                "v3_cummax_sorted_gather": v3, "v4_hinted_row_scatter": v4,
                "v5_sorted_segment_sum": v5}

    batched = {name: jax.jit(jax.vmap(fn)) for name, fn in variants.items()}

    from de6d_tpu.ops.pallas.canvas import scatter_canvas

    if jax.default_backend() == "tpu":  # interpret too slow to probe
        batched["v6_pallas_onehot_mxu"] = jax.jit(
            lambda f, l: scatter_canvas(f, l, NY, NX, 256, False)
        )

    # correctness vs v1 (single batch, on device)
    ref = np.asarray(batched["v1_id_scatter_gather"](feats, lins), np.float32)
    for name, fn in batched.items():
        got = np.asarray(fn(feats, lins), np.float32)
        ok = np.allclose(got, ref, atol=1e-2 if dt == jnp.bfloat16 else 1e-5)
        print(f"  {name}: correct={ok}")
        if not ok:
            bad = np.argwhere(~np.isclose(got, ref, atol=1e-2))[:3]
            print(f"    first mismatches at {bad.tolist()}")

    # chained: next input depends on previous output
    @jax.jit
    def chain(feat, out):
        eps = (out[0, 0, 0, 0] * 1e-9 + 1e-4).astype(feat.dtype)
        return feat + eps

    for name, fn in batched.items():
        f = feats
        out = fn(f, lins)
        f = chain(f, out)
        np.asarray(out[0, 0, 0, 0])  # warm + fence
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(f, lins)
            f = chain(f, out)
        np.asarray(out[0, 0, 0, 0])
        dt_ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"  {name}: {dt_ms:7.2f} ms/batch  "
              f"({dt_ms / args.batch:5.2f} ms/scan)")


if __name__ == "__main__":
    main()
