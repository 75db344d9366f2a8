"""Online detection server — the ROS node equivalent.

Parity: reference sim/gazebo/src/detection/script/detection.py
(:109-197): subscribe point clouds → prepare → forward → publish boxes
+ per-frame latency. Without ROS in this image, frames arrive over a
newline-delimited JSON TCP socket (or stdin) and detections are
returned the same way; corners for 9-DoF boxes are included for
marker-style rendering (reference publishes LINE_LIST markers from
boxes3d_to_corners_3d).

Protocol (one JSON object per line):
  request:  {"points": [[x, y, z, intensity?], ...]} or
            {"points_b64": "<base64 float32 (N, 4)>", "n": N}
  response: {"boxes": [[x..9], ...], "scores": [...], "labels": [...],
             "corners": [[[x, y, z] x8], ...], "latency_ms": t}

Usage:
  python -m de6d_tpu.serving.detection_node \
      --cfg_file configs/slopedkitti_models/det6d_car.yaml \
      [--ckpt <dir>] [--port 8765 | --stdin]
"""

from __future__ import annotations

import argparse
import base64
import json
import socketserver
import sys

import numpy as np


def build_detector(cfg_file, ckpt=None, max_points=16384):
    import jax

    from ..config import cfg, cfg_from_yaml_file
    from ..models import build_network
    from ..models.detectors.detector3d_template import DatasetSpec
    from .streaming import StreamingDetector

    cfg_from_yaml_file(cfg_file, cfg)
    dp = cfg.DATA_CONFIG
    vox = next(
        (p for p in dp.DATA_PROCESSOR
         if p["NAME"] == "transform_points_to_voxels"), None,
    )
    spec = DatasetSpec(
        class_names=tuple(cfg.CLASS_NAMES),
        point_feature_dim=len(dp.POINT_FEATURE_ENCODING["used_feature_list"]),
        point_cloud_range=tuple(dp.POINT_CLOUD_RANGE),
        voxel_size=tuple(vox["VOXEL_SIZE"]) if vox else (0.16, 0.16, 4.0),
    )
    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), spec)
    sample = {
        "points": np.zeros((1, max_points, spec.point_feature_dim),
                           np.float32),
        "points_mask": np.ones((1, max_points), bool),
    }
    variables = model.init(jax.random.PRNGKey(0), dict(sample), train=False)
    if ckpt:
        from ..train import build_optimizer_and_schedule, create_train_state
        from ..train.checkpoint import restore_checkpoint

        optimizer, _ = build_optimizer_and_schedule(
            cfg.OPTIMIZATION, variables["params"], 1
        )
        state = create_train_state(model, optimizer, sample)
        state, _ = restore_checkpoint(ckpt, state)
        variables = {
            "params": state.params, "batch_stats": state.batch_stats,
        }
    det = StreamingDetector(
        model, variables, cfg.MODEL, len(cfg.CLASS_NAMES),
        max_points=max_points,
    )
    return det, cfg


def handle_frame(det, line: str) -> str:
    from ..utils import box_np_ops

    req = json.loads(line)
    if "points_b64" in req:
        pts = np.frombuffer(
            base64.b64decode(req["points_b64"]), np.float32
        ).reshape(int(req["n"]), -1).copy()
    else:
        pts = np.asarray(req["points"], np.float32)
    if pts.shape[1] == 3:
        pts = np.concatenate(
            [pts, np.zeros((pts.shape[0], 1), np.float32)], axis=1
        )
    out = det.detect(pts)
    boxes = out["boxes"]
    corners = (
        box_np_ops.boxes9d_to_corners_3d(boxes)
        if boxes.shape[0] and boxes.shape[1] >= 9
        else box_np_ops.boxes_to_corners_3d(boxes)
        if boxes.shape[0] else np.zeros((0, 8, 3))
    )
    return json.dumps(
        {
            "boxes": boxes.tolist(),
            "scores": out["scores"].tolist(),
            "labels": out["labels"].tolist(),
            "corners": corners.tolist(),
            "latency_ms": out["latency_s"] * 1e3,
        }
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg_file", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--stdin", action="store_true")
    ap.add_argument("--max_points", type=int, default=16384)
    args = ap.parse_args()

    det, _ = build_detector(args.cfg_file, args.ckpt, args.max_points)
    print("detector ready", file=sys.stderr)

    if args.stdin:
        for line in sys.stdin:
            line = line.strip()
            if not line:
                continue
            print(handle_frame(det, line), flush=True)
        return

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            for raw in self.rfile:
                line = raw.decode().strip()
                if not line:
                    continue
                resp = handle_frame(det, line)
                self.wfile.write((resp + "\n").encode())
                self.wfile.flush()

    with socketserver.ThreadingTCPServer(("0.0.0.0", args.port), Handler) as s:
        print(f"serving on :{args.port}", file=sys.stderr)
        s.serve_forever()


if __name__ == "__main__":
    main()
