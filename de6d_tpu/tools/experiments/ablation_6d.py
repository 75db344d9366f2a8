"""Full-pose head ablation: vote head (Det6D) vs direct regression.

Reference parity: the reference's ablation study (docs/img/ablation.png,
SURVEY §6 — GOH/SA rows) compares the ground-aware vote head against a
direct-regression 6-DoF head. This runs that comparison end-to-end at
tiny scale on synthetic sloped scenes: both models see identical
oriented, heading-asymmetric cars (make_synth_kitti's renderer) tilted
by a pitch via the repo's own 9-DoF rotation convention, train for the
same number of steps, and are scored on matched-prediction errors
(center / size / yaw / pitch).

Usage:
  python -m de6d_tpu.tools.experiments.ablation_6d [--steps 400]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def make_sloped_batch(rng, spec, batch=4, n_points=1024, n_gt=3):
    """Oriented cars with pitch on synthetic slopes (host numpy)."""
    from ..make_synth_kitti import sample_car_points
    from ...utils.box_np_utils import boxes_to_rotation_matrix

    pc = spec.point_cloud_range
    pts = np.zeros((batch, n_points, 4), np.float32)
    gt = np.zeros((batch, n_gt, 10), np.float32)
    per_car = max(120, n_points // 8)
    for b in range(batch):
        # sparse ground points
        pts[b, :, 0] = rng.uniform(pc[0], pc[3], n_points)
        pts[b, :, 1] = rng.uniform(pc[1], pc[4], n_points)
        pts[b, :, 2] = rng.uniform(-1.9, -1.5, n_points)
        pts[b, :, 3] = rng.uniform(0, 0.3, n_points)
        for g in range(n_gt):
            box = np.zeros(10, np.float32)
            box[0] = rng.uniform(pc[0] + 6, pc[3] - 6)
            box[1] = rng.uniform(pc[1] + 5, pc[4] - 5)
            box[2] = rng.uniform(-1.2, -0.6)
            box[3:6] = [
                rng.uniform(3.6, 4.4), rng.uniform(1.5, 1.8),
                rng.uniform(1.4, 1.7),
            ]
            box[6] = rng.uniform(-np.pi, np.pi)
            box[7] = rng.uniform(-0.25, 0.25)  # pitch (sloped terrain)
            box[9] = 1.0
            gt[b, g] = box
            # canonical car surface points → full 9-DoF rotation →
            # translate (same convention as the repo's box utils)
            local = sample_car_points(
                np.array([0, 0, 0, box[3], box[4], box[5], 0.0]),
                per_car, rng,
            )
            rot = boxes_to_rotation_matrix(box[None])[0]
            world = local @ rot.T + box[0:3]
            sl = slice(g * per_car, (g + 1) * per_car)
            pts[b, sl, :3] = world
            pts[b, sl, 3] = rng.uniform(0.3, 0.9, per_car)
    return {
        "points": pts,
        "points_mask": np.ones((batch, n_points), bool),
        "gt_boxes": gt,
    }


def tiny_dr_cfg():
    """Direct-regression head on the same tiny backbone — the D.R.
    ablation arm (configs/slopedkitti_models/det6d_dr_car.yaml at tiny
    width)."""
    from ...utils.testing import tiny_det6d_cfg

    cfg = tiny_det6d_cfg()
    cfg["POINT_HEAD"] = {
        "NAME": "PointHeadBox6D",
        "CLASS_AGNOSTIC": False,
        "USE_BN": True,
        "CLS_FC": [32],
        "REG_FC": [32],
        "ROT_CLS_FC": [32],
        "ROT_REG_FC": [32],
        "TARGET_CONFIG": {
            "GT_EXTRA_WIDTH": [0.2, 0.2, 0.2],
            "BOX_CODER": "PointResidualCoder",
            "BOX_CODER_CONFIG": {
                "use_mean_size": True,
                "mean_size": [[3.9, 1.6, 1.56]],
            },
        },
        "LOSS_CONFIG": {
            "LOSS_REG": "WeightedSmoothL1Loss",
            "LOSS_WEIGHTS": {
                "point_cls_weight": 1.0,
                "point_box_weight": 1.0,
                "point_rot_cls_weight": 1.0,
                "point_rot_reg_weight": 1.0,
                "code_weights": [1.0] * 8,
            },
        },
    }
    return cfg


def train_and_score(name, model_cfg, batches, spec, steps, lr=0.003):
    import jax
    import jax.numpy as jnp
    import optax

    from ...models import build_network
    from ...models.detectors.detector3d_template import post_processing
    from ...train.train_state import create_train_state, make_train_step

    model = build_network(model_cfg, num_class=1, dataset=spec)
    bd0 = {k: jnp.asarray(v) for k, v in batches[0].items()}
    optimizer = optax.chain(
        optax.clip_by_global_norm(10.0), optax.adam(lr)
    )
    state = create_train_state(model, optimizer, bd0)
    step = make_train_step(model, optimizer)
    t0 = time.time()
    loss0 = loss = None
    for i in range(steps):
        b = batches[i % len(batches)]
        state, metrics = step(
            state, {k: jnp.asarray(v) for k, v in b.items()}
        )
        if i == 0:
            loss0 = float(metrics["loss"])
        loss = float(metrics["loss"])
    dt = time.time() - t0

    # matched-prediction errors over the training scenes (memorization
    # protocol — measures whether the head CAN represent/learn the pose)
    errs = {"center": [], "size": [], "yaw": [], "pitch": []}
    n_match = n_gt_total = 0
    for b in batches:
        bd = {k: jnp.asarray(v) for k, v in b.items()}
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            dict(bd), train=False,
        )
        post = post_processing(
            out, model_cfg["POST_PROCESSING"], num_class=1
        )
        boxes = np.asarray(post["pred_boxes"])
        counts = np.asarray(post["pred_count"])
        for bi in range(boxes.shape[0]):
            preds = boxes[bi, : counts[bi]]
            gts = b["gt_boxes"][bi]
            gts = gts[np.abs(gts).sum(-1) > 0]
            n_gt_total += len(gts)
            if not len(preds):
                continue
            for g in gts:
                d = np.linalg.norm(preds[:, :3] - g[:3], axis=1)
                j = int(np.argmin(d))
                if d[j] > 2.0:
                    continue
                n_match += 1
                errs["center"].append(d[j])
                errs["size"].append(
                    float(np.mean(np.abs(preds[j, 3:6] - g[3:6])))
                )
                dy = abs(float(preds[j, 6] - g[6])) % (2 * np.pi)
                errs["yaw"].append(min(dy, 2 * np.pi - dy))
                if preds.shape[1] >= 9:
                    errs["pitch"].append(abs(float(preds[j, 7] - g[7])))
    row = {
        "name": name,
        "steps": steps,
        "loss0": loss0,
        "loss": loss,
        "match_rate": n_match / max(n_gt_total, 1),
        "s_per_step": dt / steps,
    }
    for k, v in errs.items():
        row[f"{k}_err"] = float(np.mean(v)) if v else float("nan")
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--points", type=int, default=2048,
                    help="points/scene; the backbone sampling pyramid "
                    "scales with it so the D.R. arm sees enough fg "
                    "points to be a fair baseline")
    args = ap.parse_args()

    from ...utils.testing import tiny_det6d_cfg, tiny_det6d_spec

    spec = tiny_det6d_spec()
    rng = np.random.RandomState(0)
    batches = [
        make_sloped_batch(rng, spec, batch=2, n_points=args.points)
        for _ in range(args.frames)
    ]

    def scaled(cfg):
        n1 = max(64, args.points // 4)
        cfg["BACKBONE_3D"]["SA_CONFIG"]["NPOINT_LIST"] = [
            [n1], [n1 // 2], [n1 // 4]
        ]
        return cfg

    def no_goh():
        # vote head WITHOUT the ground-aware pitch observation (the
        # reference ablation's GOH row: direct pitch regression inside
        # the bin coder, det6d_pitch_car.yaml)
        cfg = tiny_det6d_cfg()
        cfg["POINT_HEAD"]["TARGET_CONFIG"]["BOX_CODER_CONFIG"][
            "ground_aware"
        ] = False
        return cfg

    rows = [
        train_and_score("vote (Det6D)", scaled(tiny_det6d_cfg()), batches,
                        spec, args.steps),
        train_and_score("vote, no GOH (pitch d.r.)", scaled(no_goh()),
                        batches, spec, args.steps),
        train_and_score("direct-reg (D.R.)", scaled(tiny_dr_cfg()), batches,
                        spec, args.steps),
    ]
    keys = ["name", "loss0", "loss", "match_rate", "center_err",
            "size_err", "yaw_err", "pitch_err", "s_per_step"]
    print("\t".join(keys))
    for r in rows:
        print("\t".join(
            f"{r[k]:.4f}" if isinstance(r[k], float) else str(r[k])
            for k in keys
        ))


if __name__ == "__main__":
    main()
