"""Headless viz suite: the matplotlib equivalents of the reference's
open3d figures must render 7 and 9-DoF boxes without a display."""

import numpy as np

from de6d_tpu.utils import viz_utils


def _scene(rng):
    pts = np.zeros((2000, 4), np.float32)
    pts[:, 0] = rng.uniform(0, 40, 2000)
    pts[:, 1] = rng.uniform(-20, 20, 2000)
    pts[:, 2] = rng.uniform(-1.8, 1.0, 2000)
    boxes9 = np.array([
        [10, 2, -1, 4.0, 1.6, 1.5, 0.4, -0.2, 0.0],
        [20, -5, -0.8, 4.2, 1.7, 1.6, -1.2, 0.0, 0.1],
    ], np.float32)
    return pts, boxes9


def test_wireframe_3d_9dof(tmp_path):
    rng = np.random.RandomState(0)
    pts, boxes9 = _scene(rng)
    out = tmp_path / "w.png"
    viz_utils.save_wireframe_3d_png(
        pts, boxes9, out, gt_boxes=boxes9[:1, :7],
        scores=np.array([0.9, 0.7]),
    )
    assert out.exists() and out.stat().st_size > 10000


def test_sampling_figure(tmp_path):
    rng = np.random.RandomState(1)
    pts, _ = _scene(rng)
    layers = [pts[:: 2 ** (i + 1), :3] for i in range(3)]
    valid = [np.ones(len(c), bool) for c in layers]
    out = tmp_path / "s.png"
    viz_utils.save_sampling_png(pts, layers, out, valid_list=valid)
    assert out.exists() and out.stat().st_size > 10000


def test_seg_and_head_figure(tmp_path):
    rng = np.random.RandomState(2)
    pts, boxes9 = _scene(rng)
    seg_c = pts[::8, :3]
    seg_s = rng.rand(len(seg_c))
    cand = pts[::40, :3]
    votes = cand + rng.normal(0, 0.5, cand.shape)
    out = tmp_path / "sh.png"
    viz_utils.save_seg_and_head_png(
        pts, seg_c, seg_s, out, cand_coords=cand, vote_coords=votes,
        boxes=boxes9, gt_boxes=boxes9[:, :7],
    )
    assert out.exists() and out.stat().st_size > 10000


def test_turntable_gif(tmp_path):
    """Rotating-view GIF (headless open3d-spin equivalent): animated,
    multi-frame, nonempty."""
    from PIL import Image

    rng = np.random.RandomState(3)
    pts, boxes9 = _scene(rng)
    out = tmp_path / "spin.gif"
    viz_utils.save_turntable_gif(
        pts, boxes9, out, gt_boxes=boxes9[:, :7], n_frames=5
    )
    im = Image.open(out)
    assert getattr(im, "n_frames", 1) == 5
    assert out.stat().st_size > 10000
