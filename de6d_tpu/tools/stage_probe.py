"""Honest cumulative-prefix split of the PointPillars inference
pipeline on the real chip.

Isolated stage timings through the axon tunnel are meaningless: there
is a ~3-5 ms per-dispatch floor and large outputs are streamed back to
the host, so a stage that returns (B, 321k, 7) "costs" 45 ms. This
probe instead times CUMULATIVE PREFIXES of the real pipeline, each
reduced to a scalar on device (forces the compute, transfers 4 bytes),
all with the chained-dependency protocol. Stage cost = delta between
consecutive prefixes at batch 8 — same methodology the r2 ledger used,
but chained and transfer-free.

Prefixes:
  P0 voxelize
  P1 + VFE (pillar features)
  P2 + canvas scatter
  P3 + BEV backbone
  P4 + dense head (cls+box preds)
  P5 + post-processing (NMS) [gated / worst]

Usage: python -m de6d_tpu.tools.stage_probe
"""

from __future__ import annotations

import copy
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from de6d_tpu.config import cfg_from_yaml_file
    from de6d_tpu.models import build_network
    from de6d_tpu.models.detectors.detector3d_template import (
        DatasetSpec, post_processing,
    )

    print(f"backend={jax.default_backend()}", flush=True)
    cfg = cfg_from_yaml_file("configs/kitti_models/pointpillar.yaml")
    model_cfg = copy.deepcopy(dict(cfg.MODEL))
    if os.environ.get("PROBE_BF16", "1") == "1":
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

    batch, npts = 8, 16384
    rng = np.random.RandomState(0)
    pc = spec.point_cloud_range
    pts = np.zeros((batch, npts, 4), np.float32)
    pts[..., 0] = rng.uniform(pc[0], pc[3], (batch, npts))
    pts[..., 1] = rng.uniform(pc[1], pc[4], (batch, npts))
    pts[..., 2] = rng.uniform(pc[2], pc[5], (batch, npts))
    pts[..., 3] = rng.uniform(0, 1, (batch, npts))
    batch_d = {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((batch, npts), bool),
    }
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False)
    )(jax.random.PRNGKey(0), dict(batch_d))
    params, stats = variables["params"], variables["batch_stats"]

    # stage taps: every module writes its output into batch_dict under a
    # distinct key, and jit DCEs whatever doesn't feed the returned
    # scalar — so reducing intermediate key K times exactly the
    # pipeline prefix that produces K. No model changes needed.
    det = model

    taps = [
        ("P0 voxelize", "voxels"),
        ("P1 +vfe", "pillar_features"),
        ("P2 +canvas", "spatial_features"),
        ("P3 +backbone", "spatial_features_2d"),
        ("P4a +head convs (raw)", "raw"),
        ("P4 +head (decoded)", None),  # cls+box preds
    ]

    def make_fn(tap_key):
        @jax.jit
        def f(params, stats, b):
            v = {"params": params, "batch_stats": stats}
            out = det.apply(v, dict(b), train=False)
            if tap_key is None:
                return (
                    jnp.sum(out["batch_cls_preds"].astype(jnp.float32))
                    + jnp.sum(out["batch_box_preds"].astype(jnp.float32))
                )
            if tap_key == "raw":
                s = jnp.sum(out["cls_preds"]) + jnp.sum(out["box_preds"])
                if out.get("dir_cls_preds") is not None:
                    s = s + jnp.sum(out["dir_cls_preds"])
                return s
            return jnp.sum(out[tap_key].astype(jnp.float32))

        return f

    @jax.jit
    def perturb(b, scalar):
        eps = (scalar * 1e-12 + 1e-4).astype(b["points"].dtype)
        return {**b, "points": b["points"] + eps}

    def bench(f, b, label, iters=20, reps=3):
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
        print(f"  {label}: {ms:7.2f} ms/batch ({ms/batch:5.3f} ms/scan)",
              flush=True)
        return ms

    prev = 0.0
    for label, tap in taps:
        f = make_fn(tap)
        try:
            ms = bench(f, batch_d, label)
        except Exception as e:  # tap unsupported → skip
            print(f"  {label}: failed ({type(e).__name__}: {e})",
                  flush=True)
            continue
        print(f"      delta: {ms - prev:+7.2f} ms/batch "
              f"({(ms - prev)/batch:+.3f} ms/scan)", flush=True)
        prev = ms

    for label, thresh in (("P5 full gated", None), ("P5 full worst", 0.0)):
        pp = dict(model_cfg["POST_PROCESSING"])
        if thresh is not None:
            pp["SCORE_THRESH"] = thresh
        else:
            pp["SCORE_THRESH"] = 0.0206  # ~768 live (bench calib)

        @jax.jit
        def f(params, stats, b, pp=pp):
            v = {"params": params, "batch_stats": stats}
            out = det.apply(v, dict(b), train=False)
            post = post_processing(out, pp, num_class)
            return (
                jnp.sum(post["pred_boxes"])
                + jnp.sum(post["pred_count"].astype(jnp.float32))
            )

        ms = bench(f, batch_d, label)
        print(f"      delta vs P4: {ms - prev:+7.2f} ms/batch "
              f"({(ms - prev)/batch:+.3f} ms/scan)", flush=True)


if __name__ == "__main__":
    main()
