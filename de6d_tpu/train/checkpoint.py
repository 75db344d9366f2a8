"""Checkpoint save/restore (orbax).

Parity: reference train_utils checkpoint_state/save_checkpoint
(train_utils.py:145-178: {epoch, it, model_state, optimizer_state,
version}, ring pruning to max_ckpt_save_num) and
Detector3DTemplate.load_params_from_file (:330-411: partial load for
pretrained backbones). Orbax sharded checkpoints replace torch.save —
they restore with the same shardings on any mesh.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import orbax.checkpoint as ocp

from .. import version


def _checkpointer():
    return ocp.StandardCheckpointer()


def save_checkpoint(ckpt_dir, state, epoch: int, max_keep: int = 30):
    """Save TrainState under ckpt_dir/checkpoint_epoch_<n>."""
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = (ckpt_dir / f"checkpoint_epoch_{epoch}").resolve()
    with _checkpointer() as cp:
        cp.save(path, {"state": state}, force=True)
    # orbax StandardCheckpointer stores arrays only — meta rides a
    # json sidecar (epoch, framework version)
    with open(str(path) + ".meta.json", "w") as f:
        json.dump({"epoch": epoch, "version": version.__version__}, f)
    prune_checkpoints(ckpt_dir, max_keep)
    return path


def list_checkpoints(ckpt_dir):
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return []
    ckpts = []
    for p in ckpt_dir.glob("checkpoint_epoch_*"):
        m = re.fullmatch(r"checkpoint_epoch_(\d+)", p.name)
        if m:
            ckpts.append((int(m.group(1)), p))
    return [p for _, p in sorted(ckpts)]


def prune_checkpoints(ckpt_dir, max_keep: int):
    """Ring pruning (reference train_utils.py:125-130)."""
    import shutil

    ckpts = list_checkpoints(ckpt_dir)
    while len(ckpts) > max_keep:
        stale = ckpts.pop(0)
        shutil.rmtree(stale, ignore_errors=True)
        Path(str(stale) + ".meta.json").unlink(missing_ok=True)


def restore_checkpoint(path, abstract_state):
    """Restore into the structure of ``abstract_state`` (a TrainState
    built with create_train_state on matching shapes)."""
    path = Path(path).resolve()
    with _checkpointer() as cp:
        restored = cp.restore(path, {"state": abstract_state})
    meta = {"epoch": 0, "version": ""}
    meta_file = Path(str(path) + ".meta.json")
    if meta_file.exists():
        meta.update(json.loads(meta_file.read_text()))
    return restored["state"], meta


def latest_checkpoint(ckpt_dir):
    ckpts = list_checkpoints(ckpt_dir)
    return ckpts[-1] if ckpts else None


def load_pretrained(path, state, logger=None):
    """Shape-matched partial restore (reference
    detector3d_template.load_params_from_file semantics: copy every
    checkpoint tensor whose name AND shape match the fresh model,
    skip the rest — used to warm-start e.g. PV-RCNN from a trained
    SECOND backbone).

    Returns (state, n_loaded, n_skipped)."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    path = Path(path).resolve()
    with _checkpointer() as cp:
        raw = cp.restore(path)  # raw pytree, no target structure
    src = raw.get("state", raw)

    n_loaded = n_skipped = 0
    new_subtrees = {}
    for field in ("params", "batch_stats"):
        dst = getattr(state, field, None)
        if dst is None or field not in src:
            continue
        flat_dst = flatten_dict(dict(dst))
        flat_src = flatten_dict(dict(src[field]))
        out = {}
        for k, v in flat_dst.items():
            s = flat_src.get(k)
            if s is not None and tuple(s.shape) == tuple(v.shape):
                out[k] = s.astype(v.dtype)
                n_loaded += 1
            else:
                out[k] = v
                n_skipped += 1
        new_subtrees[field] = unflatten_dict(out)
    state = state.replace(**new_subtrees)
    if logger is not None:
        logger.info(
            f"pretrained: loaded {n_loaded} tensors from {path}, "
            f"kept {n_skipped} fresh"
        )
    return state, n_loaded, n_skipped
