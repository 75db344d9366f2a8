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


def main():
    backend = jax.default_backend()
    print(f"backend: {backend}, devices: {jax.devices()}")
    if backend == "cpu":
        print("WARNING: running on CPU — this does NOT exercise the "
              "MXU precision path this check exists for.")
    all_ok = True
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
