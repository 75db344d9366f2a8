"""Evaluation harness.

Parity: reference tools/eval_utils/eval_utils.py:22-121 — batched
no-grad inference, recall counters, result.pkl dump, then
dataset.evaluation(). Device outputs are fixed-size (post_max, …)
buffers + counts; the host trims to counts before building prediction
dicts. Multi-host: each process evaluates its index shard and annos
are gathered via multihost_utils.process_allgather (replacing the
reference's filesystem pickle gather, common_utils.py:212-233).
"""

from __future__ import annotations

import pickle
import time
from pathlib import Path

import jax
import numpy as np

from ..models.detectors.detector3d_template import (
    generate_recall_record, post_processing,
)


def make_full_eval_step(model, post_cfg, num_class, thresh_list):
    @jax.jit
    def step(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, dict(batch), train=False)
        post = post_processing(out, post_cfg, num_class)
        recalls = generate_recall_record(
            out, post["pred_boxes"], post["pred_count"],
            thresh_list=tuple(thresh_list),
        )
        return post, recalls

    return step


def eval_one_epoch(model, params, batch_stats, loader, dataset, model_cfg,
                   class_names, result_dir=None, logger=None,
                   save_to_file=False, allow_zero_recall=False):
    post_cfg = model_cfg["POST_PROCESSING"]
    thresh_list = post_cfg.get("RECALL_THRESH_LIST", [0.3, 0.5, 0.7])
    step = make_full_eval_step(
        model, post_cfg, len(class_names), thresh_list
    )
    # device-commit the weights ONCE: host-numpy params passed to a
    # jitted fn re-upload the full tree through the TPU tunnel on EVERY
    # dispatch (~550 ms/batch for Det6D — measured 861 ms/batch eval
    # p50 vs 310 ms device forward before this line; same lesson as
    # bench.py's checkpoint commit)
    params = jax.device_put(params)
    if batch_stats:
        batch_stats = jax.device_put(batch_stats)
    det_annos = []
    recall_totals = {}
    n_frames = 0
    batch_times = []  # (wall_s, batch_size) per batch
    t_start = time.perf_counter()
    output_path = None
    if result_dir is not None:
        result_dir = Path(result_dir)
        result_dir.mkdir(parents=True, exist_ok=True)
        if save_to_file:
            output_path = result_dir / "final_result" / "data"
            output_path.mkdir(parents=True, exist_ok=True)

    from collections import deque

    from ..models import device_batch as _device_batch

    # 2-deep pipeline: jax dispatch is async, so uploading + dispatching
    # batch i+1 before fetching batch i's outputs overlaps host<->device
    # transfer with device compute (the reference gets the same overlap
    # from CUDA async streams + DataLoader prefetch; a serial
    # upload->step->fetch loop pays transfer + compute in SUM, which
    # through the TPU tunnel more than doubles ms/frame)
    pending = deque()
    last_done = t_start

    def _drain_one():
        nonlocal last_done, n_frames
        batch, post, recalls = pending.popleft()
        post = jax.tree_util.tree_map(np.asarray, post)
        now = time.perf_counter()
        batch_times.append((now - last_done, batch["batch_size"]))
        last_done = now
        for k, v in recalls.items():
            recall_totals[k] = recall_totals.get(k, 0) + int(v)
        pred_dicts = []
        for i in range(batch["batch_size"]):
            cnt = int(post["pred_count"][i])
            pred_dicts.append(
                {
                    "pred_boxes": post["pred_boxes"][i, :cnt],
                    "pred_scores": post["pred_scores"][i, :cnt],
                    "pred_labels": post["pred_labels"][i, :cnt],
                }
            )
        det_annos.extend(dataset.generate_prediction_dicts(
            batch, pred_dicts, class_names, output_path=output_path
        ))
        n_frames += batch["batch_size"]

    for batch in loader:
        dev_batch = _device_batch(batch)
        post, recalls = step(params, batch_stats, dev_batch)
        pending.append((batch, post, recalls))
        if len(pending) >= 2:
            _drain_one()
    while pending:
        _drain_one()

    sec_per_example = (time.perf_counter() - t_start) / max(n_frames, 1)
    # zero-recall tripwire (ADVICE r4): an eval that recalls NOTHING at
    # any threshold against a nonzero GT set almost always means the
    # checkpoint failed to load (random weights) — its latency figures
    # are unrepresentative (prediction counts / NMS load / score gating
    # all wrong). Withhold the steady-state headline unless the caller
    # explicitly opts in (random-weights perf probes set
    # allow_zero_recall=True).
    zero_recall = (
        recall_totals.get("gt", 0) > 0
        and not any(
            v > 0 for k, v in recall_totals.items()
            if k.startswith("recalled_")
        )
    )
    if logger:
        logger.info(
            f"eval: {n_frames} frames, {sec_per_example * 1e3:.1f} ms/frame"
        )
        if zero_recall and not allow_zero_recall:
            logger.warning(
                "eval recalled 0 GT boxes at every threshold — "
                "checkpoint likely missing/random; steady-state latency "
                "WITHHELD (pass allow_zero_recall=True / "
                "--allow-zero-recall to report it anyway)"
            )
        if len(batch_times) > 1 and (allow_zero_recall or not zero_recall):
            # per-frame median over full-size batches: compiles (first
            # batch, plus the odd-shaped LAST batch on uneven splits,
            # 60-100 s each through the TPU tunnel) land in the mean,
            # not here
            bmax = max(bs for _, bs in batch_times)
            per = sorted(
                s / bs for s, bs in batch_times[1:] if bs == bmax
            )
            if per:
                logger.info(
                    f"eval steady-state p50 (full batches, excl. "
                    f"compile): {per[len(per) // 2] * 1e3:.1f} ms/frame"
                )

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(det_annos)
        det_annos = [a for proc in gathered for a in proc]

    ret_dict = {}
    gt_num = max(recall_totals.get("gt", 0), 1)
    for k, v in recall_totals.items():
        if k.startswith("recalled_"):
            ret_dict[f"recall/{k}"] = v / gt_num
            if logger:
                logger.info(f"{k}: {v / gt_num:.4f}")

    if result_dir is not None:
        with open(result_dir / "result.pkl", "wb") as f:
            pickle.dump(det_annos, f)

    result_str, ap_dict = dataset.evaluation(det_annos, class_names)
    if logger and result_str:
        logger.info(result_str)
    ret_dict.update(ap_dict or {})
    ret_dict["sec_per_example"] = sec_per_example
    ret_dict["zero_recall"] = bool(zero_recall)
    return ret_dict, det_annos
