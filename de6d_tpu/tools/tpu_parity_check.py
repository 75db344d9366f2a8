"""On-hardware parity checks for Pallas kernels that interpret-mode
(CPU, full precision) cannot validate — chiefly MXU input-precision
hazards (ADVICE r4 high: the fused-NMS kept-list append matmul).

Runs on the REAL TPU (no interpret), compares against the exact
CPU-resolved greedy oracle. Usage:

    python -m de6d_tpu.tools.tpu_parity_check

Exit code 0 iff every case is bit-exact in the first-post_k-keeps
semantics documented in ops/pallas/nms_fused.py.
"""

from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp


def _greedy_oracle(boxes: np.ndarray, count: int, thresh: float):
    """Sequential greedy rotated NMS on CPU, float32, exact."""
    from de6d_tpu.ops import iou3d

    keep = np.zeros(boxes.shape[0], dtype=bool)
    kept_rows = []
    cpu = jax.devices("cpu")[0]
    bx = jax.device_put(jnp.asarray(boxes[:, :7]), cpu)
    iou_full = np.asarray(
        jax.jit(iou3d.boxes_iou_bev, device=cpu)(bx, bx)
    )
    for j in range(count):
        if any(iou_full[i, j] > thresh for i in kept_rows):
            continue
        keep[j] = True
        kept_rows.append(j)
    return keep


def _make_boxes(rng, b, p, spread=40.0):
    """Clustered boxes at realistic KITTI coordinate magnitudes so the
    bf16-rounding failure mode (large |x|, small box extent) is
    exercised: many boxes within NMS range of each other."""
    centers = rng.uniform(-spread, spread, size=(b, p // 8, 2))
    reps = np.repeat(centers, 8, axis=1)
    xy = reps + rng.normal(scale=1.0, size=(b, p, 2))
    z = rng.uniform(-2.0, 0.5, size=(b, p, 1))
    dxy = rng.uniform(1.5, 4.5, size=(b, p, 2))
    dz = rng.uniform(1.2, 2.0, size=(b, p, 1))
    yaw = rng.uniform(-np.pi, np.pi, size=(b, p, 1))
    return np.concatenate(
        [xy, z, dxy, dz, yaw], axis=-1
    ).astype(np.float32)


def check_fused_nms(seed=0, b=4, p=1024, thresh=0.1, post_k=500,
                    verbose=True):
    from de6d_tpu.ops.pallas.nms_fused import nms_keep_batched

    rng = np.random.RandomState(seed)
    boxes = _make_boxes(rng, b, p)
    counts = rng.randint(p // 2, p + 1, size=(b,)).astype(np.int32)

    dev = jax.devices()[0]
    keep_tpu = np.asarray(
        nms_keep_batched(
            jax.device_put(jnp.asarray(boxes), dev),
            jax.device_put(jnp.asarray(counts), dev),
            thresh, post_k=post_k,
        )
    )
    ok = True
    for s in range(b):
        oracle = _greedy_oracle(boxes[s], int(counts[s]), thresh)
        o_idx = np.nonzero(oracle)[0][:post_k]
        t_idx = np.nonzero(keep_tpu[s])[0][:post_k]
        same = (len(o_idx) == len(t_idx)) and np.array_equal(o_idx, t_idx)
        if verbose:
            print(
                f"  sample {s}: count={counts[s]} oracle_keeps="
                f"{oracle.sum()} tpu_keeps={keep_tpu[s].sum()} "
                f"first-{post_k} match={same}"
            )
        if not same:
            diff = np.setxor1d(o_idx, t_idx)
            print(f"    MISMATCH ids: {diff[:20]}")
            ok = False
    return ok


def check_lookup(seed=0, v=16000, q=27 * 4096, verbose=True):
    """On-hardware parity of the two-level Pallas sorted-key lookup
    (ops/pallas/lookup.py) vs the exact numpy searchsorted oracle.
    Exercises the one-hot MXU bucket fetch (hi/lo 16-bit split) at
    real submanifold-conv scale; interpret-mode cannot catch MXU
    rounding or Mosaic lowering issues here."""
    from de6d_tpu.ops.pallas.lookup import lookup_pallas
    from de6d_tpu.ops import sparse as sp

    rng = np.random.RandomState(seed)
    grid_max = 41 * 1600 * 1408
    u = np.unique(rng.randint(0, grid_max, v).astype(np.int32))
    table = np.full((v,), sp.INVALID, np.int32)
    table[: len(u)] = u
    present = u[rng.randint(0, len(u), q // 2)]
    absent = rng.randint(0, grid_max, q - q // 2).astype(np.int32)
    queries = np.concatenate([present, absent])
    rng.shuffle(queries)

    dev = jax.devices()[0]
    idx, hit = jax.jit(lookup_pallas)(
        jax.device_put(jnp.asarray(table), dev),
        jax.device_put(jnp.asarray(queries), dev),
    )
    idx, hit = np.asarray(idx), np.asarray(hit)
    # oracle
    pos = np.searchsorted(table, queries)
    pos_c = np.clip(pos, 0, v - 1)
    ref_hit = (table[pos_c] == queries) & (queries != sp.INVALID)
    ok = np.array_equal(hit, ref_hit) and np.array_equal(
        table[idx[ref_hit]], queries[ref_hit]
    )
    if verbose:
        print(f"  lookup: v={v} q={q} hits={ref_hit.sum()} "
              f"hit_match={np.array_equal(hit, ref_hit)} ok={ok}")
    if not ok:
        bad = np.nonzero(hit != ref_hit)[0]
        print(f"    MISMATCH at {bad[:10]} queries={queries[bad[:10]]}")
    return ok


def main():
    backend = jax.default_backend()
    print(f"backend: {backend}, devices: {jax.devices()}")
    if backend == "cpu":
        print("WARNING: running on CPU — this does NOT exercise the "
              "MXU precision path this check exists for.")
    all_ok = True
    for seed, v, q in [(0, 16000, 27 * 4096), (1, 700, 4096),
                       (2, 16384, 8192)]:
        print(f"pallas lookup: seed={seed} V={v} Q={q}")
        all_ok &= check_lookup(seed=seed, v=v, q=q)
    for seed, p, thresh, post_k in [
        (0, 1024, 0.1, 500),
        (1, 1024, 0.01, 500),   # heavy suppression, long chains
        (2, 512, 0.5, 64),      # truncation crossing mid-block
        (3, 2048, 0.1, 500),    # multiple kept-list tiles
    ]:
        print(f"fused NMS: seed={seed} P={p} thresh={thresh} "
              f"post_k={post_k}")
        all_ok &= check_fused_nms(seed=seed, p=p, thresh=thresh,
                                  post_k=post_k)
    print("PARITY OK" if all_ok else "PARITY FAILED")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
