"""Local pyramid augmentations (PA-AUG: dropout / sparsify / swap)."""

import numpy as np
import pytest

from de6d_tpu.datasets.augmentor import augmentor_utils as au


@pytest.fixture
def rng():
    return np.random.RandomState(13)


def _box_with_points(rng, n=400):
    box = np.array([[5.0, 2.0, 0.0, 4.0, 1.8, 1.6, 0.5]], np.float32)
    pts = np.zeros((n, 4), np.float32)
    # fill the box uniformly (local frame → world)
    lx = rng.uniform(-1.9, 1.9, n)
    ly = rng.uniform(-0.85, 0.85, n)
    lz = rng.uniform(-0.75, 0.75, n)
    c, s = np.cos(0.5), np.sin(0.5)
    pts[:, 0] = 5.0 + lx * c - ly * s
    pts[:, 1] = 2.0 + lx * s + ly * c
    pts[:, 2] = lz
    pts[:, 3] = rng.uniform(0, 1, n)
    return box, pts


def test_pyramids_partition_box(rng):
    """The 6 pyramids tile the box: every interior point belongs to
    >= 1 pyramid, and pyramid membership covers ~the whole box."""
    box, pts = _box_with_points(rng)
    pyr = au.boxes_to_pyramids(box)
    assert pyr.shape == (1, 6, 15)
    masks = au.points_in_pyramids_mask(pts, pyr.reshape(-1, 15))
    frac = masks.any(-1).mean()
    assert frac > 0.97, frac
    # points far outside belong to none
    far = pts.copy()
    far[:, 0] += 50
    m2 = au.points_in_pyramids_mask(far, pyr.reshape(-1, 15))
    assert not m2.any()


def test_pyramid_dropout_removes_points(rng):
    box, pts = _box_with_points(rng)
    _, out = au.local_pyramid_dropout(box, pts, 1.0, rng)
    assert out.shape[0] < pts.shape[0]
    assert out.shape[0] > 0


def test_pyramid_sparsify_caps_points(rng):
    box, pts = _box_with_points(rng)
    _, out = au.local_pyramid_sparsify(box, pts, 1.0, 10, rng)
    pyr = au.boxes_to_pyramids(box)
    masks = au.points_in_pyramids_mask(out, pyr.reshape(-1, 15))
    # at least one pyramid got capped to <= 10 points and points shrank
    assert out.shape[0] < pts.shape[0]


def test_pyramid_swap_preserves_counts(rng):
    boxes = np.array(
        [
            [5.0, 2.0, 0.0, 4.0, 1.8, 1.6, 0.5],
            [15.0, -3.0, 0.0, 4.0, 1.8, 1.6, -0.3],
        ],
        np.float32,
    )
    pts_list = []
    for b in boxes:
        c, s = np.cos(b[6]), np.sin(b[6])
        lx = rng.uniform(-1.9, 1.9, 300)
        ly = rng.uniform(-0.85, 0.85, 300)
        lz = rng.uniform(-0.75, 0.75, 300)
        p = np.zeros((300, 4), np.float32)
        p[:, 0] = b[0] + lx * c - ly * s
        p[:, 1] = b[1] + lx * s + ly * c
        p[:, 2] = b[2] + lz
        p[:, 3] = rng.uniform(0, 1, 300)
        pts_list.append(p)
    pts = np.concatenate(pts_list, 0)
    _, out = au.local_pyramid_swap(boxes, pts, 1.0, 5, rng)
    assert np.isfinite(out).all()
    # swapped points stay inside their (new) boxes' pyramids mostly
    pyr = au.boxes_to_pyramids(boxes).reshape(-1, 15)
    frac = au.points_in_pyramids_mask(out, pyr).any(-1).mean()
    assert frac > 0.9


def test_augmentor_queue_with_pyramid_aug(rng):
    from de6d_tpu.datasets.augmentor.data_augmentor import DataAugmentor
    from de6d_tpu.config import Config

    cfg = Config({
        "DISABLE_AUG_LIST": [],
        "AUG_CONFIG_LIST": [
            {
                "NAME": "random_local_pyramid_aug",
                "DROPOUT": {"all": {"PROB": 0.5}},
                "SPARSIFY": {"all": {"PROB": 0.5, "MAX_NUM": 20}},
                "SWAP": {"all": {"PROB": 0.5, "MAX_NUM": 5}},
            },
        ],
    })
    aug = DataAugmentor(
        root_path=None, augmentor_configs=cfg, class_names=["Car"],
    )
    box, pts = _box_with_points(rng)
    dd = {
        "gt_boxes": box, "points": pts,
        "gt_names": np.array(["Car"]),
    }
    out = aug.forward(dd, rng)
    assert np.isfinite(out["points"]).all()
