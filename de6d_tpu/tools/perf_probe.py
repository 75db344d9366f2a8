"""Per-stage perf probe on the real chip (single process!).

Times the flagship inference stages in isolation so optimization
effort follows measured leverage, not guesses:
  - voxelize (device, batch x 16k pts)
  - model forward without post-processing
  - NMS alone at several valid-candidate counts (worst case 4096 down
    to trained-model-like a few hundred)
  - full pipeline worst-case and with a realistic score gate

Usage:  python -m de6d_tpu.tools.perf_probe
"""

from __future__ import annotations

import time

import numpy as np


def bench(fn, *args, iters=20, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()} devices={jax.devices()}")

    from de6d_tpu.ops import nms as nms_ops
    from de6d_tpu.ops import voxelize as vox

    rng = np.random.RandomState(0)
    pc_range = [0.0, -39.68, -3.0, 69.12, 39.68, 1.0]

    # --- NMS alone, varying valid counts -------------------------------
    n = 4096
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0] = rng.uniform(pc_range[0], pc_range[3], n)
    boxes[:, 1] = rng.uniform(pc_range[1], pc_range[4], n)
    boxes[:, 2] = rng.uniform(-2, 0, n)
    boxes[:, 3] = rng.uniform(3.5, 4.5, n)
    boxes[:, 4] = rng.uniform(1.5, 1.8, n)
    boxes[:, 5] = 1.5
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    scores = rng.uniform(0.0, 1.0, n).astype(np.float32)
    boxes_j = jnp.asarray(boxes)
    scores_j = jnp.asarray(scores)

    for count in (4096, 1024, 512, 128):
        valid = jnp.arange(n) < count

        def run(b, s, v):
            return nms_ops.nms(
                b, s, thresh=0.01, pre_maxsize=4096, post_maxsize=500,
                valid_mask=v,
            )

        run_j = jax.jit(run)
        dt = bench(run_j, boxes_j, scores_j, valid)
        print(f"nms count={count}: {dt*1e3:.3f} ms")

    # --- voxelize alone -------------------------------------------------
    batch, npts = 4, 16384
    pts = np.zeros((batch, npts, 4), np.float32)
    pts[..., 0] = rng.uniform(pc_range[0], pc_range[3], (batch, npts))
    pts[..., 1] = rng.uniform(pc_range[1], pc_range[4], (batch, npts))
    pts[..., 2] = rng.uniform(pc_range[2], pc_range[5], (batch, npts))
    pts_j = jnp.asarray(pts)
    mask_j = jnp.ones((batch, npts), bool)

    def vox_one(p, m):
        return vox.voxelize(
            p, m, pc_range, [0.16, 0.16, 4.0],
            max_voxels=16000, max_points_per_voxel=32,
        )

    vox_b = jax.jit(jax.vmap(vox_one))
    dt = bench(vox_b, pts_j, mask_j)
    print(f"voxelize batch={batch}: {dt*1e3:.3f} ms total, "
          f"{dt*1e3/batch:.3f} ms/scan")

    # --- full model forward (no post-processing) ------------------------
    import sys

    sys.path.insert(0, "tests")
    from de6d_tpu.config import cfg_from_yaml_file
    from de6d_tpu.models import build_network
    from de6d_tpu.models.detectors.detector3d_template import (
        DatasetSpec, post_processing,
    )

    import copy

    cfg = cfg_from_yaml_file("configs/kitti_models/pointpillar.yaml")
    model_cfg = copy.deepcopy(dict(cfg.MODEL))
    import os
    if os.environ.get("PROBE_BF16", "1") == "1":
        model_cfg["COMPUTE_DTYPE"] = "bfloat16"
        print("model compute dtype: bfloat16")
    spec = DatasetSpec(
        class_names=tuple(cfg.CLASS_NAMES),
        point_feature_dim=4,
        point_cloud_range=tuple(cfg.DATA_CONFIG.POINT_CLOUD_RANGE),
        voxel_size=(0.16, 0.16, 4.0),
        max_voxels=16000,
        max_points_per_voxel=32,
    )
    num_class = len(cfg.CLASS_NAMES)
    model = build_network(model_cfg, num_class=num_class, dataset=spec)
    batch_d = {"points": pts_j, "points_mask": mask_j}
    variables = model.init(jax.random.PRNGKey(0), dict(batch_d), train=False)
    params, stats = variables["params"], variables["batch_stats"]

    @jax.jit
    def fwd_only(params, stats, b):
        v = {"params": params, "batch_stats": stats}
        out = model.apply(v, dict(b), train=False)
        return out["batch_cls_preds"], out["batch_box_preds"]

    dt = bench(fwd_only, params, stats, batch_d)
    print(f"forward (voxelize+vfe+backbone+head) batch={batch}: "
          f"{dt*1e3:.3f} ms total, {dt*1e3/batch:.3f} ms/scan")

    # --- full pipeline with post-processing ------------------------------
    # realistic gate: pick the score threshold that leaves ~768
    # candidates/sample (trained detectors leave a few hundred above
    # SCORE_THRESH; random-init scores cluster near 0.5, so a fixed 0.1
    # would be either all-pass or all-fail)
    cls_preds, _ = fwd_only(params, stats, batch_d)
    import jax.nn as jnn
    s = np.asarray(jnn.sigmoid(cls_preds).max(axis=-1))  # (B, A)
    gate = float(np.quantile(s, 1.0 - 768.0 / s.shape[1]))
    for label, score_thresh in (("worst (thresh=0)", 0.0),
                                (f"gated ~768 (thresh={gate:.4f})", gate)):
        pp = dict(model_cfg["POST_PROCESSING"])
        pp["SCORE_THRESH"] = score_thresh

        @jax.jit
        def full(params, stats, b):
            v = {"params": params, "batch_stats": stats}
            out = model.apply(v, dict(b), train=False)
            post = post_processing(out, pp, num_class)
            return post["pred_boxes"], post["pred_count"]

        dt = bench(full, params, stats, batch_d)
        _, cnt = full(params, stats, batch_d)
        print(f"full pipeline [{label}] batch={batch}: {dt*1e3:.3f} ms "
              f"total, {dt*1e3/batch:.3f} ms/scan, "
              f"scans/s={batch/dt:.1f}, pred_count={np.asarray(cnt)}")


if __name__ == "__main__":
    main()
