"""Serving round-trip measurement on the streaming driver.

Feeds a stream of real scans through ``StreamingDetector`` (the
TPU-native equivalent of the reference ROS detection node's
subscribe→forward→publish loop with its per-frame latency print,
reference sim/gazebo/src/detection/script/detection.py:109-197) and
reports:

- per-frame round-trip latency p50/p90 at pipeline depth 1 (strictly
  synchronous: submit then block — what a request/response server sees)
- sustained throughput + p50 latency at depth 2 (double-buffered:
  frame t dispatches while t−1 computes — the production streaming
  mode the BASELINE north-star assumes)

Distinct per-frame inputs (real scans cycled with a per-frame jitter)
keep the tunnel from memoizing dispatches (NEXT.md protocol (a)).

Usage: python -m de6d_tpu.tools.serving_probe [--frames 64]
"""

from __future__ import annotations

import argparse
import statistics
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="configs/kitti_models/pointpillar.yaml")
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--max_points", type=int, default=16384)
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from de6d_tpu.config import cfg_from_yaml_file
    from de6d_tpu.models import build_network
    from de6d_tpu.models.detectors.detector3d_template import DatasetSpec
    from de6d_tpu.serving.streaming import StreamingDetector

    from pathlib import Path

    cfg = cfg_from_yaml_file(args.cfg)
    model_cfg = dict(cfg.MODEL)
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

    assets = Path(__file__).resolve().parents[2] / "bench_assets"
    scans_npz = assets / "scans.npz"
    params_npz = assets / "pointpillar_params.npz"
    rng = np.random.RandomState(0)
    if scans_npz.exists():
        scans = np.load(scans_npz)["points"]
        print(f"# {scans.shape[0]} real baked scans")
    else:
        pc = spec.point_cloud_range
        scans = np.zeros((8, args.max_points, 4), np.float32)
        scans[..., 0] = rng.uniform(pc[0], pc[3], scans.shape[:2])
        scans[..., 1] = rng.uniform(pc[1], pc[4], scans.shape[:2])
        scans[..., 2] = rng.uniform(pc[2], pc[5], scans.shape[:2])
        print("# no baked scans — random clouds")

    if params_npz.exists():
        import sys

        sys.path.insert(0, str(assets.parent))
        from bench import _load_params_npz

        params, stats = _load_params_npz(params_npz)
        variables = {
            "params": jax.device_put(params),
            "batch_stats": jax.device_put(stats),
        }
        print("# trained checkpoint")
    else:
        buf = scans[0]
        variables = jax.jit(
            lambda r, b: model.init(r, b, train=False)
        )(
            jax.random.PRNGKey(0),
            {
                "points": buf[None],
                "points_mask": ~np.all(buf == 0, axis=-1)[None],
            },
        )
        print("# random init")

    def frame(i):
        # cycle baked scans; sub-mm jitter keeps buffers bit-distinct
        s = scans[i % scans.shape[0]].copy()
        live = ~np.all(s == 0, axis=-1)
        s[live, :3] += np.float32(1e-4) * (1 + i)
        return s[live]

    for depth in (1, 2):
        det = StreamingDetector(
            model, variables, model_cfg, num_class,
            max_points=args.max_points, depth=depth,
        )
        det.detect(frame(0))  # compile + warmup
        lats, counts = [], []
        t0 = time.perf_counter()
        for i in range(args.frames):
            # submit() blocks on the oldest in-flight frame only when
            # more than `depth` would be outstanding — the double
            # buffering under test
            det.submit(frame(i + 1))
            while det._ready:
                r = det._ready.popleft()
                lats.append(r["latency_s"] * 1e3)
                counts.append(len(r["scores"]))
        # drain the tail
        while True:
            r = det.result()
            if r is None:
                break
            lats.append(r["latency_s"] * 1e3)
            counts.append(len(r["scores"]))
        wall = time.perf_counter() - t0
        lats_sorted = sorted(lats)
        p50 = statistics.median(lats_sorted)
        p90 = lats_sorted[int(0.9 * (len(lats_sorted) - 1))]
        print(
            f"depth={depth}: {args.frames / wall:7.1f} frames/s  "
            f"round-trip p50 {p50:6.2f} ms  p90 {p90:6.2f} ms  "
            f"mean dets/frame {np.mean(counts):.1f}"
        )


if __name__ == "__main__":
    main()
