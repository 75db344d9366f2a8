"""Cross-process communication helpers.

Parity: reference utils/commu_utils.py (NCCL wrappers: all_gather
:50, reduce_dict :114, average_reduce_value :143, concat_all_gather
:172) and common_utils.merge_results_dist (:212 — the filesystem
pickle gather). On TPU these are jax collectives / multihost utils —
no separate backend, no pickled tensors, no barrier files.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def get_dist_info():
    """(rank, world_size) — reference common_utils.get_dist_info."""
    return jax.process_index(), jax.process_count()


def all_gather(data):
    """Gather arbitrary python objects from every process (reference
    commu_utils.all_gather:50 — the same pickle-to-tensor trick, but
    over the jax runtime instead of NCCL). process_allgather needs
    identical leaf shapes on every process, which ragged per-host
    results (det_annos) don't satisfy — so serialize, pad to the
    global max length, gather once, and unpickle per process."""
    if jax.process_count() == 1:
        return [data]
    import pickle

    from jax.experimental import multihost_utils

    buf = np.frombuffer(
        pickle.dumps(data, protocol=pickle.HIGHEST_PROTOCOL), np.uint8
    )
    n = np.asarray(len(buf), np.int64)
    sizes = np.asarray(multihost_utils.process_allgather(n))
    padded = np.zeros(int(sizes.max()), np.uint8)
    padded[: len(buf)] = buf
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return [
        pickle.loads(gathered[i, : int(sizes[i])].tobytes())
        for i in range(jax.process_count())
    ]


def average_reduce_value(value: float) -> float:
    """Mean of a host scalar across processes (reference
    commu_utils.average_reduce_value)."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    vals = multihost_utils.process_allgather(np.asarray(value))
    return float(np.mean(vals))


def reduce_dict(d: dict, average: bool = True) -> dict:
    """Reduce a dict of host scalars across processes (reference
    commu_utils.reduce_dict)."""
    if jax.process_count() == 1:
        return dict(d)
    keys = sorted(d)
    stacked = np.asarray([float(d[k]) for k in keys])
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(stacked)
    total = np.sum(gathered, axis=0)
    if average:
        total = total / jax.process_count()
    return dict(zip(keys, total.tolist()))


def merge_results_dist(part_list, total_size=None):
    """Gather per-process result lists and concatenate in rank order
    (replaces the reference's tmp-dir pickle gather + barrier,
    common_utils.py:212-233)."""
    gathered = all_gather(part_list)
    merged = [item for proc in gathered for item in proc]
    return merged[:total_size] if total_size else merged


def psum_tree(tree, axis_name: str = "data"):
    """In-jit psum over the mesh axis (for shard_map-style code)."""
    return jax.tree_util.tree_map(
        lambda x: jax.lax.psum(x, axis_name), tree
    )
