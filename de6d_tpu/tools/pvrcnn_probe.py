"""Cumulative-prefix split of the PV-RCNN eval pipeline on the chip.

Same protocol as det6d_probe.py: each tap jits the FULL forward but
reduces only the keys of its prefix to one scalar — XLA dead-code
eliminates everything the prefix does not depend on — and iterations
chain through an input perturbation so the tunnel cannot memoize.
Each tap's reduction SUMS all previous taps' reductions, so prefixes
stay cumulative even where the module DAG forks (the 2D BEV branch
does not depend on VSA).

Stage cost = delta between consecutive prefixes at batch 8. Targets
the VERDICT r5 item "PV-RCNN p50 < 200 ms".

Usage: python -m de6d_tpu.tools.pvrcnn_probe [--batch 8]
"""

from __future__ import annotations

import argparse
import copy
import time

import numpy as np

TAPS = (
    ("P0 voxelize+VFE", ("voxel_features",)),
    ("P1 +3d backbone", ("encoded_spconv_tensor",)),
    ("P2 +to BEV", ("spatial_features",)),
    ("P3 +2d backbone", ("spatial_features_2d",)),
    ("P4 +VSA keypoints", ("point_features", "point_coords")),
    ("P5 +heads (rcnn out)", ("batch_cls_preds", "batch_box_preds")),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="configs/kitti_models/pv_rcnn.yaml")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--npts", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from de6d_tpu.config import cfg_from_yaml_file
    from de6d_tpu.models import build_network
    from de6d_tpu.models.detectors.detector3d_template import (
        DatasetSpec, post_processing,
    )

    print(f"backend={jax.default_backend()}", flush=True)
    cfg = cfg_from_yaml_file(args.cfg)
    model_cfg = copy.deepcopy(dict(cfg.MODEL))
    dc = cfg.DATA_CONFIG
    vox = next(
        p for p in dc["DATA_PROCESSOR"]
        if p["NAME"] == "transform_points_to_voxels"
    )
    spec = DatasetSpec(
        class_names=tuple(cfg.CLASS_NAMES),
        point_feature_dim=4,
        point_cloud_range=tuple(dc["POINT_CLOUD_RANGE"]),
        voxel_size=tuple(vox["VOXEL_SIZE"]),
        max_voxels=int(vox["MAX_NUMBER_OF_VOXELS"]["test"]),
        max_points_per_voxel=int(vox["MAX_POINTS_PER_VOXEL"]),
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
    batch_d = {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((batch, npts), bool),
    }
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False)
    )(jax.random.PRNGKey(0), dict(batch_d))
    params, stats = variables["params"], variables.get("batch_stats", {})

    post_cfg = dict(model_cfg["POST_PROCESSING"])

    def make_fn(upto):
        keys = [k for _, ks in TAPS[: upto + 1] for k in ks]
        with_post = upto == len(TAPS)  # one past the end: + NMS

        @jax.jit
        def f(params, stats, b):
            v = {"params": params, "batch_stats": stats}
            out = model.apply(v, dict(b), train=False)
            s = jnp.float32(0)
            for k in (keys if not with_post else
                      [k for _, ks in TAPS for k in ks]):
                s = s + jnp.sum(out[k].astype(jnp.float32))
            if with_post:
                post = post_processing(out, post_cfg, num_class)
                s = s + jnp.sum(post["pred_boxes"].astype(jnp.float32))
                s = s + jnp.sum(post["pred_count"].astype(jnp.float32))
            return s

        return f

    @jax.jit
    def perturb(b, scalar):
        eps = (scalar * 1e-12 + 1e-4).astype(b["points"].dtype)
        return {**b, "points": b["points"] + eps}

    def bench(f, b, label):
        out = f(params, stats, b)
        b = perturb(b, out)
        float(out)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = f(params, stats, b)
                b = perturb(b, out)
            float(out)
            times.append((time.perf_counter() - t0) / args.iters)
        ms = min(times) * 1e3
        print(
            f"  {label}: {ms:8.2f} ms/batch ({ms/batch:7.3f} ms/scan)",
            flush=True,
        )
        return ms

    prev = 0.0
    for i, (label, _) in enumerate(list(TAPS) + [("P6 +post(NMS)", ())]):
        ms = bench(make_fn(i), batch_d, label)
        print(f"      delta: {ms - prev:+8.2f} ms/batch "
              f"({(ms - prev)/batch:+7.3f} ms/scan)", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
