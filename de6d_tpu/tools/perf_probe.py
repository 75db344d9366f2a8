"""Per-stage perf probe on the real chip (single process!).

Times the flagship inference stages in isolation so optimization
effort follows measured leverage, not guesses:
  - NMS alone at several valid-candidate counts (worst case 4096 down
    to trained-model-like a few hundred)
  - voxelize (device, batch x 16k pts)
  - model forward without post-processing
  - full pipeline worst-case and with a realistic score gate

Measurement protocol (STATUS.md): the axon tunnel memoizes repeated
identical dispatches and reorders async work; block_until_ready does
not actually block through the tunnel. Every loop CHAINS iterations
through a data dependency and ends with a host fetch.

Usage:  python -m de6d_tpu.tools.perf_probe
"""

from __future__ import annotations

import time

import numpy as np


def chained_bench(fn, perturb, *args, iters=10, reps=3):
    """fn(*args) -> out; perturb(args, out) -> new args tuple.
    Warmup (compile + 1 exec, fenced), then `reps` chained loops each
    ended by a host fetch; returns the min rep time per iteration."""

    import jax

    def fetch(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]

    cur = args
    out = fn(*cur)
    cur = perturb(cur, out)
    fetch(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*cur)
            cur = perturb(cur, out)
        fetch(out)
        times.append((time.perf_counter() - t0) / iters)
    return min(times)


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

    @jax.jit
    def nms_perturb(s, count):
        return s + (count.astype(jnp.float32) * 1e-12 + 1e-7)

    for count in (4096, 1024, 512, 128):
        valid = jnp.arange(n) < count

        run_j = jax.jit(
            lambda b, s, v: nms_ops.nms(
                b, s, thresh=0.01, pre_maxsize=4096, post_maxsize=500,
                valid_mask=v,
            )
        )
        dt = chained_bench(
            run_j,
            lambda args, out: (args[0], nms_perturb(args[1], out[1]), args[2]),
            boxes_j, scores_j, valid,
        )
        print(f"nms count={count}: {dt*1e3:.3f} ms")

    # --- voxelize alone -------------------------------------------------
    batch, npts = 8, 16384
    pts = np.zeros((batch, npts, 4), np.float32)
    pts[..., 0] = rng.uniform(pc_range[0], pc_range[3], (batch, npts))
    pts[..., 1] = rng.uniform(pc_range[1], pc_range[4], (batch, npts))
    pts[..., 2] = rng.uniform(pc_range[2], pc_range[5], (batch, npts))
    pts_j = jnp.asarray(pts)
    mask_j = jnp.ones((batch, npts), bool)

    vox_b = jax.jit(
        jax.vmap(
            lambda p, m: vox.voxelize(
                p, m, pc_range, [0.16, 0.16, 4.0],
                max_voxels=16000, max_points_per_voxel=32,
            )
        )
    )

    @jax.jit
    def pts_perturb(p, leaf):
        eps = (
            jnp.asarray(leaf, jnp.float32).ravel()[0] * 1e-9 + 1e-4
        ).astype(p.dtype)
        return p + eps

    dt = chained_bench(
        vox_b,
        lambda args, out: (
            pts_perturb(args[0], jax.tree_util.tree_leaves(out)[0]),
            args[1],
        ),
        pts_j, mask_j,
    )
    print(f"voxelize batch={batch}: {dt*1e3:.3f} ms total, "
          f"{dt*1e3/batch:.3f} ms/scan")

    # --- full model forward (no post-processing) ------------------------
    from de6d_tpu.config import cfg_from_yaml_file
    from de6d_tpu.models import build_network
    from de6d_tpu.models.detectors.detector3d_template import (
        DatasetSpec, post_processing,
    )

    import copy
    import os

    cfg = cfg_from_yaml_file("configs/kitti_models/pointpillar.yaml")
    model_cfg = copy.deepcopy(dict(cfg.MODEL))
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
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False)
    )(jax.random.PRNGKey(0), dict(batch_d))
    params, stats = variables["params"], variables["batch_stats"]

    @jax.jit
    def fwd_only(params, stats, b):
        v = {"params": params, "batch_stats": stats}
        out = model.apply(v, dict(b), train=False)
        return out["batch_cls_preds"], out["batch_box_preds"]

    def batch_perturb(args, out):
        p, s, b = args
        leaf = jax.tree_util.tree_leaves(out)[0]
        return p, s, {**b, "points": pts_perturb(b["points"], leaf)}

    dt = chained_bench(fwd_only, batch_perturb, params, stats, batch_d)
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

        dt = chained_bench(full, batch_perturb, params, stats, batch_d)
        _, cnt = full(params, stats, batch_d)
        print(f"full pipeline [{label}] batch={batch}: {dt*1e3:.3f} ms "
              f"total, {dt*1e3/batch:.3f} ms/scan, "
              f"scans/s={batch/dt:.1f}, pred_count={np.asarray(cnt)}")


if __name__ == "__main__":
    main()
