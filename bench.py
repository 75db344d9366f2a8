"""Benchmark: KITTI scans/sec (single chip) on the flagship inference
path — device voxelize → PillarVFE → scatter → BEV backbone → anchor
head → rotated NMS, full KITTI-scale shapes (16384 pts/scan, 432x496
BEV grid).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "scans/sec", "vs_baseline": N}

vs_baseline is against the BASELINE.json target of 2000 scans/sec on a
v5e-8 ⇒ 250 scans/sec/chip.
"""

from __future__ import annotations

import json
import time

import numpy as np


BASELINE_SCANS_PER_SEC_PER_CHIP = 250.0  # 2000 / 8 chips (BASELINE.json)


def main():
    import jax
    import jax.numpy as jnp

    import sys
    sys.path.insert(0, "tests")
    from model_fixtures import tiny_pointpillar_cfg
    from de6d_tpu.models import build_network
    from de6d_tpu.models.detectors.detector3d_template import (
        DatasetSpec, post_processing,
    )
    from de6d_tpu.config import cfg_from_yaml_file

    cfg = cfg_from_yaml_file("configs/kitti_models/pointpillar.yaml")
    model_cfg = cfg.MODEL
    spec = DatasetSpec(
        class_names=tuple(cfg.CLASS_NAMES),
        point_feature_dim=4,
        point_cloud_range=tuple(cfg.DATA_CONFIG.POINT_CLOUD_RANGE),
        voxel_size=(0.16, 0.16, 4.0),
        max_voxels=16000,
        max_points_per_voxel=32,
    )
    num_class = len(cfg.CLASS_NAMES)
    # bench NMS under real load: no score gate (random-init scores
    # would otherwise leave zero candidates and trivialize NMS)
    model_cfg["POST_PROCESSING"]["SCORE_THRESH"] = 0.0
    model = build_network(model_cfg, num_class=num_class, dataset=spec)

    batch_size = 4
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

    @jax.jit
    def infer(params, batch_stats, batch):
        v = {"params": params, "batch_stats": batch_stats}
        out = model.apply(v, dict(batch), train=False)
        post = post_processing(out, model_cfg["POST_PROCESSING"], num_class)
        return post["pred_boxes"], post["pred_scores"], post["pred_count"]

    params, stats = variables["params"], variables["batch_stats"]
    # warmup + compile
    import sys
    t_c0 = time.perf_counter()
    out = infer(params, stats, batch)
    jax.block_until_ready(out)
    print(
        f"# compile+warmup: {time.perf_counter()-t_c0:.1f}s",
        file=sys.stderr,
    )

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(params, stats, batch)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    scans_per_sec = batch_size * iters / dt
    p50_latency_ms = dt / iters * 1e3 / batch_size

    print(
        json.dumps(
            {
                "metric": "KITTI scans/sec/chip (PointPillars, synthetic 16k-pt scans, incl. voxelize+NMS)",
                "value": round(scans_per_sec, 2),
                "unit": "scans/sec",
                "vs_baseline": round(
                    scans_per_sec / BASELINE_SCANS_PER_SEC_PER_CHIP, 3
                ),
                "p50_latency_ms_per_scan": round(p50_latency_ms, 3),
                "batch_size": batch_size,
            }
        )
    )


if __name__ == "__main__":
    main()
