"""Worker for the 2-process multi-host rig (test_multihost.py).

Run as: python tests/multihost_worker.py <pid> <nproc> <port> <outdir>

Exercises, at process_count=2 for real: loader per-process stride
sharding, ragged-object all_gather / merge_results_dist (the eval
det_annos merge), reduce_dict and average_reduce_value. Rank 0 writes
the merged view to <outdir>/result.json for the test to assert on.
"""

import json
import sys
from pathlib import Path

import numpy as np


def main():
    pid, nproc, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], Path(sys.argv[4])
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid,
    )
    assert jax.process_count() == nproc

    from de6d_tpu.datasets.loader import DataLoader
    from de6d_tpu.parallel.collectives import (
        average_reduce_value, merge_results_dist, reduce_dict,
    )

    class TinySet:
        def __len__(self):
            return 12

        def getitem_prepared(self, idx, rng=None):
            return {"frame_id": idx}

        def collate_batch(self, items):
            return {"frame_id": [it["frame_id"] for it in items]}

    loader = DataLoader(
        TinySet(), batch_size=2, shuffle=False, num_workers=1,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    local_frames = []
    for batch in loader:
        local_frames += batch["frame_id"]

    # ragged per-frame annos (different box counts per frame AND
    # different total counts per process)
    annos = [
        {"frame_id": f, "boxes": np.full((f % 3 + 1, 7), f, np.float32)}
        for f in local_frames
    ]
    merged = merge_results_dist(annos, total_size=12)
    red = reduce_dict({"loss": float(pid + 1)})
    avg = average_reduce_value(float(pid))

    if pid == 0:
        out = {
            "merged_frames": [a["frame_id"] for a in merged],
            "merged_box_counts": [int(len(a["boxes"])) for a in merged],
            "box_values_ok": all(
                bool(np.all(a["boxes"] == a["frame_id"])) for a in merged
            ),
            "reduced_loss": red["loss"],
            "avg": avg,
            "local_frames_p0": local_frames,
        }
        outdir.mkdir(parents=True, exist_ok=True)
        (outdir / "result.json").write_text(json.dumps(out))


if __name__ == "__main__":
    main()
