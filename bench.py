"""Benchmark: KITTI scans/sec (single chip) on the flagship inference
path — device voxelize → PillarVFE → scatter → BEV backbone → anchor
head → rotated NMS, full KITTI-scale shapes (16384 pts/scan, 432x496
BEV grid), bf16 compute / fp32 params+geometry.

Two candidate loads are measured:
  - realistic: a score gate leaving ~768 NMS candidates/sample (trained
    detectors leave a few hundred above SCORE_THRESH=0.1; with random
    init weights the gate is set at the matching score quantile). This
    is the headline number.
  - worst-case: no score gate, all 4096 pre-NMS slots live.

Each load is timed over several repetitions and the median is reported
(the TPU is reached through a shared tunnel with occasional contention;
medians de-noise it).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "scans/sec", "vs_baseline": N}

vs_baseline is against the BASELINE.json target of 2000 scans/sec on a
v5e-8 ⇒ 250 scans/sec/chip.
"""

from __future__ import annotations

import copy
import json
import statistics
import sys
import time

import numpy as np


BASELINE_SCANS_PER_SEC_PER_CHIP = 250.0  # 2000 / 8 chips (BASELINE.json)


def _time_scans_per_sec(infer, params, stats, batch, batch_size,
                        iters=10, reps=5):
    import jax

    per_rep = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = infer(params, stats, batch)
        jax.block_until_ready(out)
        per_rep.append(batch_size * iters / (time.perf_counter() - t0))
    return statistics.median(per_rep), per_rep


def main():
    import jax
    import jax.numpy as jnp

    from de6d_tpu.models import build_network
    from de6d_tpu.models.detectors.detector3d_template import (
        DatasetSpec, post_processing,
    )
    from de6d_tpu.config import cfg_from_yaml_file

    cfg = cfg_from_yaml_file("configs/kitti_models/pointpillar.yaml")
    model_cfg = copy.deepcopy(dict(cfg.MODEL))
    model_cfg["COMPUTE_DTYPE"] = "bfloat16"
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

    batch_size = 8
    n_points = 16384
    rng = np.random.RandomState(0)
    pc = spec.point_cloud_range
    pts = np.zeros((batch_size, n_points, 4), np.float32)
    pts[..., 0] = rng.uniform(pc[0], pc[3], (batch_size, n_points))
    pts[..., 1] = rng.uniform(pc[1], pc[4], (batch_size, n_points))
    pts[..., 2] = rng.uniform(pc[2], pc[5], (batch_size, n_points))
    pts[..., 3] = rng.uniform(0, 1, (batch_size, n_points))
    batch = {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((batch_size, n_points), bool),
    }

    variables = model.init(jax.random.PRNGKey(0), dict(batch), train=False)
    params, stats = variables["params"], variables["batch_stats"]

    def make_infer(post_cfg):
        @jax.jit
        def infer(params, batch_stats, batch):
            v = {"params": params, "batch_stats": batch_stats}
            out = model.apply(v, dict(batch), train=False)
            post = post_processing(out, post_cfg, num_class)
            return post["pred_boxes"], post["pred_scores"], post["pred_count"]

        return infer

    # calibrate the realistic score gate from the raw score distribution
    @jax.jit
    def fwd(params, batch_stats, batch):
        v = {"params": params, "batch_stats": batch_stats}
        out = model.apply(v, dict(batch), train=False)
        return out["batch_cls_preds"]

    t_c0 = time.perf_counter()
    cls_preds = fwd(params, stats, batch)
    scores = np.asarray(jax.nn.sigmoid(cls_preds).max(axis=-1))
    gate = float(np.quantile(scores, 1.0 - 768.0 / scores.shape[1]))
    print(f"# fwd compile+gate calib: {time.perf_counter()-t_c0:.1f}s "
          f"(gate={gate:.4f})", file=sys.stderr)

    results = {}
    for label, thresh in (("realistic", gate), ("worst_case", 0.0)):
        pp = dict(model_cfg["POST_PROCESSING"])
        pp["SCORE_THRESH"] = thresh
        infer = make_infer(pp)
        t_c0 = time.perf_counter()
        out = infer(params, stats, batch)
        jax.block_until_ready(out)
        print(f"# {label} compile+warmup: {time.perf_counter()-t_c0:.1f}s",
              file=sys.stderr)
        med, reps = _time_scans_per_sec(
            infer, params, stats, batch, batch_size
        )
        results[label] = med
        print(f"# {label}: median {med:.1f} scans/s, reps "
              f"{[f'{r:.1f}' for r in reps]}", file=sys.stderr)

    scans_per_sec = results["realistic"]
    print(
        json.dumps(
            {
                "metric": (
                    "KITTI scans/sec/chip (PointPillars bf16, synthetic "
                    "16k-pt scans, voxelize+NMS incl., ~768 NMS "
                    "candidates/sample)"
                ),
                "value": round(scans_per_sec, 2),
                "unit": "scans/sec",
                "vs_baseline": round(
                    scans_per_sec / BASELINE_SCANS_PER_SEC_PER_CHIP, 3
                ),
                "p50_latency_ms_per_scan": round(
                    1e3 / scans_per_sec, 3
                ),
                "worst_case_scans_per_sec": round(
                    results["worst_case"], 2
                ),
                "batch_size": batch_size,
            }
        )
    )


if __name__ == "__main__":
    main()
