"""2-process jax.distributed rig on CPU.

The reference's multi-process path (DistributedSampler sharding +
merge_results_dist filesystem gather, common_utils.py:212-233) only
ever ran under launched DDP jobs; here the equivalent paths are
exercised for real at process_count=2: loader stride sharding,
ragged-object all_gather (det_annos merge), reduce_dict,
average_reduce_value."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_loader_and_gather(tmp_path):
    port = _free_port()
    worker = Path(__file__).parent / "multihost_worker.py"
    repo = Path(__file__).parent.parent
    env = dict(os.environ)
    env["PYTHONPATH"] = str(repo) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port),
             str(tmp_path)],
            cwd=str(repo), env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    result = json.loads((tmp_path / "result.json").read_text())
    # every frame exactly once after the rank-order merge
    assert sorted(result["merged_frames"]) == list(range(12))
    # process 0 got the even stride
    assert result["local_frames_p0"] == [0, 2, 4, 6, 8, 10]
    # ragged arrays survive the gather bit-exact
    assert result["box_values_ok"]
    assert result["merged_box_counts"] == [
        f % 3 + 1 for f in result["merged_frames"]
    ]
    assert result["reduced_loss"] == pytest.approx(1.5)
    assert result["avg"] == pytest.approx(0.5)
