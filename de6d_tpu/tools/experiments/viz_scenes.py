"""Scene visualization CLI — headless equivalents of the reference's
open3d experiment figures (experiments/viz/backbone_sampling.py,
seg_and_head.py, and the 9-DoF lineset render in
open3d_vis_utils.py:199-260):

per frame writes
  <out>/<frame>_3d.png        3-D wireframe render (9-DoF boxes)
  <out>/<frame>_3view.png     BEV/side/front panels
  <out>/<frame>_sampling.png  per-SA-layer kept points (point backbones)
  <out>/<frame>_seg_head.png  fg scores + vote arrows + boxes

Usage:
  python -m de6d_tpu.tools.experiments.viz_scenes --cfg_file <yaml> \
      --ckpt <ckpt> [--frames 4] [--out viz_out] [--platform cpu] \
      [--set KEY VALUE ...]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg_file", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--out", default="viz_out")
    ap.add_argument("--turntable", type=int, default=0, metavar="N",
                    help="also save an N-frame rotating-view GIF per "
                         "frame (headless open3d-spin equivalent)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--set", dest="set_cfgs", default=None,
                    nargs=argparse.REMAINDER)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ...config import cfg, cfg_from_list, cfg_from_yaml_file
    from ...datasets import build_dataloader
    from ...models import build_network
    from ...models.detectors.detector3d_template import post_processing
    from ...train import build_optimizer_and_schedule, create_train_state
    from ...train.checkpoint import restore_checkpoint
    from ...utils import viz_utils
    from ...utils.common_utils import create_logger

    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs, cfg)
    logger = create_logger(None, rank=0)
    test_set, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, 1,
        root_path=cfg.DATA_CONFIG.get("DATA_PATH"),
        training=False, workers=0, logger=logger,
    )
    model = build_network(
        cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=test_set
    )
    device_keys = ("points", "points_mask", "gt_boxes")
    sample = test_set.collate_batch([test_set.getitem_prepared(0)])
    dev_sample = {k: sample[k] for k in device_keys if k in sample}
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False)
    )(jax.random.PRNGKey(0), dict(dev_sample))
    optimizer, _ = build_optimizer_and_schedule(
        cfg.OPTIMIZATION, variables["params"], steps_per_epoch=1
    )
    state = create_train_state(model, optimizer, dev_sample)
    state, _ = restore_checkpoint(args.ckpt, state)

    @jax.jit
    def run(params, stats, batch):
        out = model.apply(
            {"params": params, "batch_stats": stats}, dict(batch),
            train=False,
        )
        post = post_processing(
            out, cfg.MODEL["POST_PROCESSING"], len(cfg.CLASS_NAMES)
        )
        keep = {
            k: out[k]
            for k in (
                "point_coords_list", "point_scores_list",
                "point_valid_list", "point_candidate_coords",
                "point_vote_coords", "point_cls_scores", "point_coords",
            )
            if k in out
        }
        return post, keep

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    params = jax.tree_util.tree_map(np.asarray, state.params)
    stats = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    for fi in range(min(args.frames, len(test_set))):
        item = test_set.getitem_prepared(fi)
        batch = test_set.collate_batch([item])
        dev = {k: batch[k] for k in device_keys if k in batch}
        post, keep = run(params, stats, dev)
        post = jax.tree_util.tree_map(np.asarray, post)
        keep = jax.tree_util.tree_map(np.asarray, keep)
        cnt = int(post["pred_count"][0])
        boxes = post["pred_boxes"][0, :cnt]
        scores = post["pred_scores"][0, :cnt]
        pts = np.asarray(batch["points"][0])
        mask = np.asarray(batch.get(
            "points_mask", np.ones(pts.shape[:1], bool)
        ))
        pts = pts[mask[0].astype(bool)] if mask.ndim == 2 else pts
        gt = np.asarray(batch.get("gt_boxes", np.zeros((1, 0, 8))))[0]
        gt = gt[np.any(np.abs(gt[:, :7]) > 0, axis=1)][:, :-1]
        fid = item.get("frame_id", fi)

        viz_utils.save_wireframe_3d_png(
            pts, boxes, out_dir / f"{fid}_3d.png", gt_boxes=gt,
            scores=scores,
        )
        viz_utils.save_three_view_png(
            pts, boxes, out_dir / f"{fid}_3view.png", gt_boxes=gt
        )
        if args.turntable:
            viz_utils.save_turntable_gif(
                pts, boxes, out_dir / f"{fid}_spin.gif", gt_boxes=gt,
                scores=scores, n_frames=args.turntable,
            )
        if "point_coords_list" in keep:
            viz_utils.save_sampling_png(
                pts, [c[0] for c in keep["point_coords_list"]],
                out_dir / f"{fid}_sampling.png",
                valid_list=[v[0] for v in keep["point_valid_list"]]
                if "point_valid_list" in keep else None,
            )
        if "point_cls_scores" in keep and "point_vote_coords" in keep:
            # scores live at the vote positions (aligned shapes)
            seg_c = keep["point_vote_coords"][0]
            seg_s = keep["point_cls_scores"][0].max(axis=-1)
            viz_utils.save_seg_and_head_png(
                pts, seg_c, seg_s, out_dir / f"{fid}_seg_head.png",
                cand_coords=keep["point_candidate_coords"][0],
                vote_coords=keep["point_vote_coords"][0],
                boxes=boxes, gt_boxes=gt,
            )
        print(f"frame {fid}: {cnt} dets → {out_dir}")


if __name__ == "__main__":
    main()
