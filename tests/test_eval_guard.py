"""Regression test for the zero-recall tripwire in eval_utils
(ADVICE r4 / VERDICT r4 weak #1): an eval whose recall is 0 against a
nonzero GT set (the signature of a wiped/random checkpoint) must NOT
publish a steady-state latency headline unless explicitly allowed."""

import logging

import jax.numpy as jnp
import numpy as np

import de6d_tpu.train.eval_utils as eval_utils


class _ListHandler(logging.Handler):
    def __init__(self):
        super().__init__()
        self.lines = []

    def emit(self, record):
        self.lines.append(record.getMessage())


class _StubModel:
    def apply(self, variables, batch, train=False):
        return {"batch_size": batch["points"].shape[0]}


class _StubDataset:
    def generate_prediction_dicts(self, batch, pred_dicts, class_names,
                                  output_path=None):
        return [dict(frame_id=i) for i in range(len(pred_dicts))]

    def evaluation(self, det_annos, class_names):
        return "", {}


def _run_eval(monkeypatch, recalled, allow=False):
    post_max = 8

    def stub_post(out, post_cfg, num_class):
        b = int(out["batch_size"])
        return {
            "pred_boxes": jnp.zeros((b, post_max, 7)),
            "pred_scores": jnp.zeros((b, post_max)),
            "pred_labels": jnp.zeros((b, post_max), jnp.int32),
            "pred_count": jnp.zeros((b,), jnp.int32),
        }

    def stub_recall(out, boxes, count, thresh_list):
        return {
            "gt": jnp.int32(5),
            "recalled_0.3": jnp.int32(recalled),
            "recalled_0.7": jnp.int32(0),
        }

    monkeypatch.setattr(eval_utils, "post_processing", stub_post)
    monkeypatch.setattr(eval_utils, "generate_recall_record", stub_recall)

    loader = [
        {"points": np.zeros((2, 16, 4), np.float32), "batch_size": 2}
        for _ in range(4)
    ]
    logger = logging.getLogger(f"eval_guard_{recalled}_{allow}")
    logger.setLevel(logging.DEBUG)
    handler = _ListHandler()
    logger.handlers = [handler]
    ret, _ = eval_utils.eval_one_epoch(
        _StubModel(), {}, {}, loader, _StubDataset(),
        {"POST_PROCESSING": {"RECALL_THRESH_LIST": [0.3, 0.7]}},
        ["Car"], logger=logger, allow_zero_recall=allow,
    )
    return ret, handler.lines


def test_zero_recall_withholds_latency(monkeypatch):
    ret, lines = _run_eval(monkeypatch, recalled=0)
    assert ret["zero_recall"] is True
    assert any("WITHHELD" in ln for ln in lines)
    assert not any("steady-state p50" in ln for ln in lines)


def test_zero_recall_explicit_override(monkeypatch):
    ret, lines = _run_eval(monkeypatch, recalled=0, allow=True)
    assert ret["zero_recall"] is True
    assert not any("WITHHELD" in ln for ln in lines)
    assert any("steady-state p50" in ln for ln in lines)


def test_nonzero_recall_reports_latency(monkeypatch):
    ret, lines = _run_eval(monkeypatch, recalled=3)
    assert ret["zero_recall"] is False
    assert not any("WITHHELD" in ln for ln in lines)
    assert any("steady-state p50" in ln for ln in lines)
