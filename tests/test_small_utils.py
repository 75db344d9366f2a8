"""Small experiment utils: gen_split determinism and pcvt
bin/npy/pcd roundtrips (reference tools/experiments/utils/
{gen_split.py, pcvt.py})."""

import subprocess
import sys

import numpy as np

from de6d_tpu.tools.experiments.small_utils import load_cloud, save_cloud


def _cloud(n=257, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.randn(n, 4).astype(np.float32)
    pts[:, 3] = np.abs(pts[:, 3])
    return pts


def test_pcvt_roundtrips(tmp_path):
    pts = _cloud()
    for suffix in (".bin", ".npy", ".pcd"):
        p = tmp_path / f"c{suffix}"
        save_cloud(pts, p)
        got = load_cloud(p)
        np.testing.assert_array_equal(got, pts), suffix


def test_pcvt_ascii_pcd(tmp_path):
    pts = _cloud(64)
    p = tmp_path / "c.pcd"
    save_cloud(pts, p, pcd_mode="ascii")
    got = load_cloud(p)
    # ascii goes through %f text — 1e-6 absolute, like the reference's
    # numpy2pcd writer
    np.testing.assert_allclose(got, pts, atol=2e-6)


def test_pcvt_cli_dir_mode(tmp_path):
    src = tmp_path / "bins"
    src.mkdir()
    for i in range(3):
        save_cloud(_cloud(32, seed=i), src / f"{i:06d}.bin")
    out = tmp_path / "pcds"
    subprocess.run(
        [sys.executable, "-m",
         "de6d_tpu.tools.experiments.small_utils", "pcvt",
         "--src", str(src), "--dst", str(out)],
        check=True, capture_output=True,
    )
    files = sorted(out.glob("*.pcd"))
    assert len(files) == 3
    np.testing.assert_array_equal(load_cloud(files[1]), _cloud(32, seed=1))


def test_gen_split_deterministic(tmp_path):
    subprocess.run(
        [sys.executable, "-m",
         "de6d_tpu.tools.experiments.small_utils", "gen_split",
         "--data_path", str(tmp_path), "--num", "50"],
        check=True, capture_output=True,
    )
    train = (tmp_path / "ImageSets/train.txt").read_text().splitlines()
    val = (tmp_path / "ImageSets/val.txt").read_text().splitlines()
    assert len(train) == 40 and len(val) == 10
    assert not set(train) & set(val)
