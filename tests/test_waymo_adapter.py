"""Waymo preprocessing contract + adapter, end-to-end and proto-free:
write_sequence produces exactly the npy/pkl layout WaymoDataset reads
(reference waymo_utils.py:159-246 / waymo_dataset get_lidar), so the
adapter is testable without the WOD proto stack."""

import numpy as np
import pytest

from de6d_tpu.config import Config
from de6d_tpu.datasets.waymo.waymo_dataset import WaymoDataset
from de6d_tpu.datasets.waymo.waymo_preprocess import (
    WAYMO_CLASSES, frame_record_to_info, labels_to_annotations,
    process_single_sequence, write_sequence,
)


def _frame(rng, seq, idx, n=500):
    pts = np.zeros((n, 6), np.float32)
    pts[:, 0] = rng.uniform(-60, 60, n)
    pts[:, 1] = rng.uniform(-60, 60, n)
    pts[:, 2] = rng.uniform(-2, 4, n)
    pts[:, 3] = rng.uniform(0, 30, n)       # raw intensity (pre-tanh)
    pts[:, 4] = rng.uniform(0, 1, n)        # elongation
    pts[: n // 10, 5] = -1                  # 10% no-label-zone points
    labels = [
        {
            "center": [float(rng.uniform(-40, 40)),
                       float(rng.uniform(-40, 40)), 0.5],
            "dims": [4.8, 2.1, 1.8],
            "heading": float(rng.uniform(-np.pi, np.pi)),
            "type": 1,  # Vehicle
            "difficulty": 0,
            "obj_id": f"{seq}-{idx}-0",
            "num_points_in_gt": 50,
        },
        {
            "center": [1.0, 2.0, 0.0], "dims": [0.9, 0.9, 1.8],
            "heading": 0.1, "type": 2, "difficulty": 2,
            "num_points_in_gt": 3,
        },
        {  # must be dropped
            "center": [0.0, 0.0, 0.0], "dims": [1, 1, 1],
            "heading": 0.0, "type": 0, "num_points_in_gt": 1,
        },
    ]
    return frame_record_to_info(
        seq, idx, pts, pose=np.eye(4), labels=labels,
        context_name=f"ctx-{seq}", timestamp=1000 + idx,
        image_shapes=[(1280, 1920)] * 5,
        num_points_of_each_lidar=[n - 40, 10, 10, 10, 10],
    )


@pytest.fixture
def waymo_tree(tmp_path):
    rng = np.random.RandomState(0)
    data_dir = tmp_path / "waymo_processed_data"
    seqs = ["segment-000_with_camera_labels", "segment-001_with_camera_labels"]
    for seq in seqs:
        frames = [_frame(rng, seq, i) for i in range(3)]
        write_sequence(data_dir, seq, frames)
    (tmp_path / "ImageSets").mkdir()
    (tmp_path / "ImageSets" / "train.txt").write_text("\n".join(seqs) + "\n")
    (tmp_path / "ImageSets" / "val.txt").write_text(seqs[0] + "\n")
    return tmp_path


def _cfg(root):
    return Config({
        "DATASET": "WaymoDataset",
        "DATA_PATH": str(root),
        "PROCESSED_DATA_TAG": "waymo_processed_data",
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "POINT_CLOUD_RANGE": [-75.2, -75.2, -2, 75.2, 75.2, 4],
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity", "elongation"],
            "src_feature_list": ["x", "y", "z", "intensity", "elongation"],
        },
        "MAX_GT": 16,
        "DATA_PROCESSOR": [
            {"NAME": "mask_points_and_boxes_outside_range",
             "REMOVE_OUTSIDE_BOXES": True},
            {"NAME": "sample_points", "NUM_POINTS": {
                "train": 1024, "test": 1024}},
            {"NAME": "pad_points", "MAX_POINTS": 1024},
        ],
    })


def test_labels_to_annotations_drops_unknown():
    ann = labels_to_annotations([
        {"center": [0, 0, 0], "dims": [1, 2, 3], "heading": 0.5, "type": 0},
        {"center": [1, 1, 1], "dims": [4, 2, 2], "heading": -0.5, "type": 1},
    ])
    assert list(ann["name"]) == ["Vehicle"]
    assert ann["gt_boxes_lidar"].shape == (1, 7)
    # lwh order and heading column
    np.testing.assert_allclose(ann["gt_boxes_lidar"][0, 3:6], [4, 2, 2])
    assert ann["gt_boxes_lidar"][0, 6] == -0.5


def test_adapter_reads_written_tree(waymo_tree):
    ds = WaymoDataset(
        _cfg(waymo_tree), class_names=["Vehicle", "Pedestrian", "Cyclist"],
        training=True, root_path=waymo_tree,
    )
    assert len(ds) == 6  # 2 sequences x 3 frames
    raw = ds.get_lidar("segment-000_with_camera_labels", 0)
    # NLZ filtering: 10% dropped; intensity tanh-squashed
    assert raw.shape == (450, 5)
    assert np.all(raw[:, 3] <= 1.0)
    item = ds.getitem_prepared(0)
    assert item is not None
    assert item["points"].shape == (1024, 5)
    assert item["gt_boxes"].shape[1] == 8  # 7 + class
    names = set(
        WAYMO_CLASSES[int(c)] for c in item["gt_boxes"][:, 7] if c > 0
    )
    assert "unknown" not in names


def test_adapter_eval_on_written_tree(waymo_tree):
    ds = WaymoDataset(
        _cfg(waymo_tree), class_names=["Vehicle"], training=False,
        root_path=waymo_tree,
    )
    assert len(ds) == 3
    # perfect detections straight from the infos
    det_annos = []
    for info in ds.infos:
        ann = info["annos"]
        m = ann["name"] == "Vehicle"
        det_annos.append({
            "frame_id": info["frame_id"],
            "name": ann["name"][m],
            "score": np.ones(int(m.sum())),
            "boxes_lidar": ann["gt_boxes_lidar"][m],
        })
    result_str, metric = ds.evaluation(det_annos, ["Vehicle"])
    assert metric["Vehicle/LEVEL_1/AP"] > 0.99
    assert metric["Vehicle/LEVEL_2/AP"] > 0.99


def test_tfrecord_path_guarded(tmp_path):
    with pytest.raises(ImportError, match="waymo"):
        process_single_sequence(tmp_path / "seq.tfrecord", tmp_path)
