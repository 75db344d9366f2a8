"""SDK-free Pandaset ingest on a synthetic native-layout fixture with
analytically known transforms."""

import gzip
import json
import pickle

import numpy as np
import pandas as pd
import pytest

from de6d_tpu.datasets.pandaset import pandaset_utils as pu


@pytest.fixture
def rng():
    return np.random.RandomState(23)


def _write_seq(root, rng):
    seq = "001"
    yaw = 0.4
    pose = {
        "position": {"x": 10.0, "y": -5.0, "z": 1.0},
        "heading": {
            "w": float(np.cos(yaw / 2)), "x": 0.0, "y": 0.0,
            "z": float(np.sin(yaw / 2)),
        },
    }
    lidar_dir = root / "dataset" / seq / "lidar"
    cub_dir = root / "dataset" / seq / "annotations" / "cuboids"
    lidar_dir.mkdir(parents=True)
    cub_dir.mkdir(parents=True)
    (lidar_dir / "poses.json").write_text(json.dumps([pose]))

    # world points = ego points pushed through the pose
    rot = pu.quat_to_matrix(pose["heading"])
    t = np.array([10.0, -5.0, 1.0])
    ego_pts = rng.uniform(-5, 5, (50, 3))
    world = ego_pts @ rot.T + t
    df = pd.DataFrame({
        "x": world[:, 0], "y": world[:, 1], "z": world[:, 2],
        "i": rng.uniform(0, 255, 50), "t": np.zeros(50),
        "d": np.zeros(50, int),
    })
    with gzip.open(lidar_dir / "00.pkl.gz", "wb") as f:
        pickle.dump(df, f)

    # one cuboid at a known world pose
    cub_world = rot @ np.array([3.0, 2.0, 0.0]) + t
    cub = pd.DataFrame({
        "label": ["Car"],
        "yaw": [0.7],
        "position.x": [cub_world[0]], "position.y": [cub_world[1]],
        "position.z": [cub_world[2]],
        "dimensions.x": [1.9], "dimensions.y": [4.5],
        "dimensions.z": [1.7],
        "cuboids.sensor_id": [0],
    })
    with gzip.open(cub_dir / "00.pkl.gz", "wb") as f:
        pickle.dump(cub, f)
    return seq, pose, ego_pts, yaw


def test_lidar_and_cuboid_ingest(tmp_path, rng):
    seq, pose, ego_pts, ego_yaw = _write_seq(tmp_path, rng)
    infos = pu.get_sequence_infos(tmp_path, [seq])
    assert len(infos) == 1
    info = infos[0]

    pts = pu.get_lidar_points(tmp_path / info["lidar_path"], pose)
    # normative frame: (x fwd, y left) = (ego_y, -ego_x)
    np.testing.assert_allclose(pts[:, 0], ego_pts[:, 1], atol=1e-5)
    np.testing.assert_allclose(pts[:, 1], -ego_pts[:, 0], atol=1e-5)
    np.testing.assert_allclose(pts[:, 2], ego_pts[:, 2], atol=1e-5)
    assert pts[:, 3].max() <= 1.0

    boxes, names, zrot = pu.get_annotations(
        tmp_path / info["cuboids_path"], pose
    )
    assert names.tolist() == ["Car"]
    # ego cuboid center (3, 2, 0) → normative (2, -3, 0)
    np.testing.assert_allclose(boxes[0, :3], [2.0, -3.0, 0.0], atol=1e-5)
    # dims swap: (dx, dy) = (dim_y, dim_x)
    np.testing.assert_allclose(boxes[0, 3:6], [4.5, 1.9, 1.7], atol=1e-6)
    # zrot corrects the ego yaw: world y-axis seen at -ego_yaw
    np.testing.assert_allclose(zrot, -ego_yaw, atol=1e-6)
    np.testing.assert_allclose(boxes[0, 6], 0.7 - ego_yaw, atol=1e-6)


def test_dataset_native_mode_and_gtdb(tmp_path, rng):
    from de6d_tpu.config import Config
    from de6d_tpu.datasets.pandaset.pandaset_dataset import PandasetDataset

    seq, pose, _, _ = _write_seq(tmp_path, rng)
    cfg = Config({
        "DATASET": "PandasetDataset",
        "DATA_PATH": str(tmp_path),
        "POINT_CLOUD_RANGE": [-10, -10, -4, 10, 10, 4],
        "INFO_PATH": {"train": ["pandaset_infos_train.pkl"],
                      "test": ["pandaset_infos_train.pkl"]},
        "LIDAR_DEVICE": 0,
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity"],
            "src_feature_list": ["x", "y", "z", "intensity"],
        },
        "DATA_PROCESSOR": [
            {"NAME": "mask_points_and_boxes_outside_range",
             "REMOVE_OUTSIDE_BOXES": True},
            {"NAME": "pad_points", "MAX_POINTS": 128},
        ],
    })
    ds = PandasetDataset(
        dataset_cfg=cfg, class_names=["Car"], root_path=tmp_path,
        training=False,
    )
    infos = ds.get_infos()
    with open(tmp_path / "pandaset_infos_train.pkl", "wb") as f:
        pickle.dump(infos, f)
    ds2 = PandasetDataset(
        dataset_cfg=cfg, class_names=["Car"], root_path=tmp_path,
        training=False,
    )
    assert len(ds2) == 1
    item = ds2[0]
    assert item["points"].shape[0] == 128
    assert "gt_boxes" in item

    db = ds2.create_groundtruth_database(
        tmp_path / "pandaset_infos_train.pkl", used_classes=["Car"]
    )
    dbinfos = pickle.load(open(db, "rb"))
    assert "Car" in dbinfos and len(dbinfos["Car"]) == 1
