"""Cumulative-prefix split of the Det6D eval pipeline on the real chip.

Same methodology as stage_probe.py (PointPillars): isolated stage
timings through the axon tunnel are meaningless (per-dispatch floor,
output streaming), so each tap jits the FULL forward but reduces only
the intermediate key for that prefix to a scalar — XLA dead-code
eliminates everything downstream, and the chained-dependency protocol
defeats tunnel memoization. Stage cost = delta between consecutive
prefixes at batch 8.

Prefixes (det6d_car: PointNet2FSMSG 16384→4096→1024→512 + vote head):
  P0 fps1        d-fps 16384→4096 + gather
  P1 +sa1        SA1 grouped MLPs + aggregation + confidence
  P2 +sa2        s-fps 4096→1024 + SA2
  P3 +backbone   s-fps 1024→512 + SA3 (full backbone features)
  P4 +vote head  vote FC + SA re-aggregation + cls/reg + decode
  P5 +post       NMS + final box selection
  P6 +recall     generate_recall_record vs gt

Usage: python -m de6d_tpu.tools.det6d_probe [--cfg configs/...yaml]
"""

from __future__ import annotations

import argparse
import copy
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--cfg", default="configs/slopedkitti_models/det6d_car.yaml"
    )
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--npts", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from de6d_tpu.config import cfg_from_yaml_file
    from de6d_tpu.models import build_network
    from de6d_tpu.models.detectors.detector3d_template import (
        DatasetSpec, generate_recall_record, post_processing,
    )

    print(f"backend={jax.default_backend()}", flush=True)
    cfg = cfg_from_yaml_file(args.cfg)
    model_cfg = copy.deepcopy(dict(cfg.MODEL))
    spec = DatasetSpec(
        class_names=tuple(cfg.CLASS_NAMES),
        point_feature_dim=4,
        point_cloud_range=tuple(cfg.DATA_CONFIG.POINT_CLOUD_RANGE),
    )
    num_class = len(cfg.CLASS_NAMES)
    model = build_network(model_cfg, num_class=num_class, dataset=spec)

    batch, npts = args.batch, args.npts
    rng = np.random.RandomState(0)
    pc = spec.point_cloud_range
    pts = np.zeros((batch, npts, 4), np.float32)
    pts[..., 0] = rng.uniform(pc[0], pc[3], (batch, npts))
    pts[..., 1] = rng.uniform(pc[1], pc[4], (batch, npts))
    pts[..., 2] = rng.uniform(pc[2], pc[5], (batch, npts))
    pts[..., 3] = rng.uniform(0, 1, (batch, npts))
    # plausible 9-DoF gt boxes + class col for the recall prefix
    ngt = 16
    gt = np.zeros((batch, ngt, 10), np.float32)
    gt[..., 0] = rng.uniform(5, 60, (batch, ngt))
    gt[..., 1] = rng.uniform(-30, 30, (batch, ngt))
    gt[..., 2] = rng.uniform(-1.5, 0.5, (batch, ngt))
    gt[..., 3:6] = np.array([3.9, 1.6, 1.56], np.float32)
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (batch, ngt))
    gt[..., 9] = 1.0
    batch_d = {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((batch, npts), bool),
        "gt_boxes": jnp.asarray(gt),
    }
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False)
    )(jax.random.PRNGKey(0), dict(batch_d))
    params, stats = variables["params"], variables["batch_stats"]

    post_cfg = dict(model_cfg["POST_PROCESSING"])
    thresh_list = tuple(post_cfg.get("RECALL_THRESH_LIST", (0.3, 0.5, 0.7)))

    def reduce_tap(out, tap):
        if tap == "fps1":
            return jnp.sum(out["point_coords_list"][0].astype(jnp.float32))
        if tap == "sa1":
            return jnp.sum(out["point_scores_list"][0].astype(jnp.float32))
        if tap == "sa2":
            return jnp.sum(out["point_scores_list"][1].astype(jnp.float32))
        if tap == "backbone":
            return jnp.sum(out["point_features"].astype(jnp.float32))
        if tap == "head":
            return (
                jnp.sum(out["batch_cls_preds"].astype(jnp.float32))
                + jnp.sum(out["batch_box_preds"].astype(jnp.float32))
            )
        if tap in ("post", "recall"):
            post = post_processing(out, post_cfg, num_class)
            s = (
                jnp.sum(post["pred_boxes"].astype(jnp.float32))
                + jnp.sum(post["pred_count"].astype(jnp.float32))
            )
            if tap == "recall":
                rec = generate_recall_record(
                    out, post["pred_boxes"], post["pred_count"],
                    thresh_list,
                )
                for v in rec.values():
                    s = s + jnp.sum(jnp.asarray(v, jnp.float32))
            return s
        raise KeyError(tap)

    def make_fn(tap):
        @jax.jit
        def f(params, stats, b):
            v = {"params": params, "batch_stats": stats}
            out = model.apply(v, dict(b), train=False)
            return reduce_tap(out, tap)

        return f

    @jax.jit
    def perturb(b, scalar):
        eps = (scalar * 1e-12 + 1e-4).astype(b["points"].dtype)
        return {**b, "points": b["points"] + eps}

    def bench(f, b, label, iters=args.iters, reps=args.reps):
        out = f(params, stats, b)
        b = perturb(b, out)
        float(out)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(params, stats, b)
                b = perturb(b, out)
            float(out)
            times.append((time.perf_counter() - t0) / iters)
        ms = min(times) * 1e3
        print(
            f"  {label}: {ms:8.2f} ms/batch ({ms/batch:7.3f} ms/scan)",
            flush=True,
        )
        return ms

    taps = [
        ("P0 fps1", "fps1"),
        ("P1 +sa1", "sa1"),
        ("P2 +sa2", "sa2"),
        ("P3 +backbone", "backbone"),
        ("P4 +vote head", "head"),
        ("P5 +post(NMS)", "post"),
        ("P6 +recall", "recall"),
    ]
    prev = 0.0
    for label, tap in taps:
        try:
            ms = bench(make_fn(tap), batch_d, label)
        except Exception as e:
            print(f"  {label}: failed ({type(e).__name__}: {e})", flush=True)
            continue
        print(
            f"      delta: {ms - prev:+8.2f} ms/batch "
            f"({(ms - prev) / batch:+.3f} ms/scan)",
            flush=True,
        )
        prev = ms


if __name__ == "__main__":
    main()
