"""Devkit-free nuScenes adapter: JSON-table ingest (fill_trainval_infos
round-trip on a synthetic fixture with known transforms) + the official
detection-metric reimplementation."""

import json

import numpy as np
import pytest

from de6d_tpu.datasets.nuscenes import nuscenes_tables as nt
from de6d_tpu.datasets.nuscenes.nuscenes_eval import evaluate_nuscenes


@pytest.fixture
def rng():
    return np.random.RandomState(31)


def _yaw_quat(yaw):
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


def _write_fixture(root, rng):
    """Two samples in one scene; ego pose translated+rotated, sensor
    mounted with an offset; one car annotation per sample whose
    sensor-frame pose we know analytically."""
    v = root / "v1.0-mini"
    v.mkdir(parents=True)

    ego_yaw = 0.3
    ego_t = [100.0, 50.0, 0.0]
    cs_t = [1.0, 0.0, 1.8]  # lidar mount offset in ego frame

    # car global pose: place it so the sensor-frame result is testable
    car_global = [110.0, 55.0, 1.0]
    car_yaw_global = 1.0

    tables = {
        "scene": [{
            "token": "scene0", "name": "scene-0001",
            "log_token": "log0", "nbr_samples": 2,
            "first_sample_token": "s0", "last_sample_token": "s1",
        }],
        "category": [{"token": "cat_car", "name": "vehicle.car"}],
        "instance": [{
            "token": "inst0", "category_token": "cat_car",
            "nbr_annotations": 2, "first_annotation_token": "a0",
            "last_annotation_token": "a1",
        }],
        "ego_pose": [
            {"token": "ep0", "translation": ego_t,
             "rotation": _yaw_quat(ego_yaw), "timestamp": 1_000_000},
            {"token": "ep1", "translation": [101.0, 50.0, 0.0],
             "rotation": _yaw_quat(ego_yaw), "timestamp": 1_500_000},
        ],
        "calibrated_sensor": [{
            "token": "cs0", "sensor_token": "sen0",
            "translation": cs_t, "rotation": _yaw_quat(0.0),
            "camera_intrinsic": [],
        }],
        "sample": [
            {"token": "s0", "timestamp": 1_000_000, "scene_token":
             "scene0", "next": "s1", "prev": "",
             "data": {"LIDAR_TOP": "sd0"}, "anns": ["a0"]},
            {"token": "s1", "timestamp": 1_500_000, "scene_token":
             "scene0", "next": "", "prev": "s0",
             "data": {"LIDAR_TOP": "sd1"}, "anns": ["a1"]},
        ],
        "sample_data": [
            {"token": "sd0", "sample_token": "s0",
             "calibrated_sensor_token": "cs0", "ego_pose_token": "ep0",
             "filename": "sweeps/LIDAR_TOP/sd0.bin",
             "timestamp": 1_000_000, "prev": "", "next": "sd1",
             "is_key_frame": True},
            {"token": "sd1", "sample_token": "s1",
             "calibrated_sensor_token": "cs0", "ego_pose_token": "ep1",
             "filename": "sweeps/LIDAR_TOP/sd1.bin",
             "timestamp": 1_500_000, "prev": "sd0", "next": "",
             "is_key_frame": True},
        ],
        "sample_annotation": [
            {"token": "a0", "sample_token": "s0",
             "instance_token": "inst0",
             "translation": car_global, "size": [1.9, 4.5, 1.7],
             "rotation": _yaw_quat(car_yaw_global),
             "prev": "", "next": "a1",
             "num_lidar_pts": 50, "num_radar_pts": 2},
            {"token": "a1", "sample_token": "s1",
             "instance_token": "inst0",
             "translation": [111.0, 55.0, 1.0],
             "size": [1.9, 4.5, 1.7],
             "rotation": _yaw_quat(car_yaw_global),
             "prev": "a0", "next": "",
             "num_lidar_pts": 40, "num_radar_pts": 0},
        ],
    }
    for name, rows in tables.items():
        (v / f"{name}.json").write_text(json.dumps(rows))
    # sweep files
    sweep_dir = root / "sweeps" / "LIDAR_TOP"
    sweep_dir.mkdir(parents=True)
    for fid in ("sd0", "sd1"):
        pts = rng.rand(100, 5).astype(np.float32)
        pts.tofile(sweep_dir / f"{fid}.bin")
    return ego_yaw, ego_t, cs_t, car_global, car_yaw_global


def test_fill_trainval_infos_roundtrip(tmp_path, rng):
    ego_yaw, ego_t, cs_t, car_global, car_yaw = _write_fixture(
        tmp_path, rng
    )
    tables = nt.NuScenesTables(tmp_path, "v1.0-mini")
    train, val = nt.fill_trainval_infos(
        tmp_path, tables, train_scene_names=["scene-0001"], max_sweeps=3
    )
    assert len(train) == 2 and len(val) == 0
    info = train[0]
    assert len(info["sweeps"]) == 2
    assert info["gt_names"].tolist() == ["car"]

    # analytic check: global → ego (yaw 0.3, t ego_t) → sensor (t cs_t)
    R = nt.quat_to_matrix(
        [np.cos(ego_yaw / 2), 0, 0, np.sin(ego_yaw / 2)]
    )
    expect_ego = R.T @ (np.asarray(car_global) - np.asarray(ego_t))
    expect_sensor = expect_ego - np.asarray(cs_t)
    got = info["gt_boxes"][0, :3]
    np.testing.assert_allclose(got, expect_sensor, atol=1e-6)
    # yaw in sensor frame = global yaw - ego yaw
    np.testing.assert_allclose(
        info["gt_boxes"][0, 6], car_yaw - ego_yaw, atol=1e-6
    )
    # dims: wlh (1.9, 4.5, 1.7) → dxdydz (4.5, 1.9, 1.7)
    np.testing.assert_allclose(
        info["gt_boxes"][0, 3:6], [4.5, 1.9, 1.7], atol=1e-6
    )
    # velocity: (111-110)/0.5 = 2 m/s along global x, rotated to sensor
    v_global = np.array([2.0, 0.0, 0.0])
    v_sensor = R.T @ v_global
    np.testing.assert_allclose(
        info["gt_boxes"][0, 7:9], v_sensor[:2], atol=1e-6
    )


def test_nuscenes_metric_perfect_and_degraded(rng):
    gts, dets_perfect, dets_shifted = [], [], []
    for f in range(6):
        g = np.zeros((3, 9))
        g[:, 0] = rng.uniform(-20, 20, 3)
        g[:, 1] = rng.uniform(-20, 20, 3)
        g[:, 3:6] = [4.5, 1.9, 1.7]
        g[:, 6] = rng.uniform(-np.pi, np.pi, 3)
        g[:, 7:9] = rng.uniform(-2, 2, (3, 2))
        gts.append({"gt_boxes": g,
                    "gt_names": np.array(["car"] * 3)})
        dets_perfect.append({
            "boxes_lidar": g.copy(),
            "score": np.linspace(0.9, 0.7, 3),
            "name": np.array(["car"] * 3),
        })
        d2 = g.copy()
        d2[:, 0] += 1.5  # 1.5 m off: misses 0.5/1.0 m thresholds
        dets_shifted.append({
            "boxes_lidar": d2,
            "score": np.linspace(0.9, 0.7, 3),
            "name": np.array(["car"] * 3),
        })

    s, m = evaluate_nuscenes(gts, dets_perfect, ["car"])
    assert m["car/AP@0.5"] > 0.95
    assert m["car/trans_err"] < 1e-6
    assert m["NDS"] > 0.95

    s2, m2 = evaluate_nuscenes(gts, dets_shifted, ["car"])
    assert m2["car/AP@0.5"] == 0.0
    assert m2["car/AP@1.0"] == 0.0
    assert m2["car/AP@2.0"] > 0.9
    assert abs(m2["car/trans_err"] - 1.5) < 1e-6
    assert m2["NDS"] < m["NDS"]


def test_create_infos_cli_and_gt_database(tmp_path, rng):
    import pickle
    import subprocess
    import sys

    _write_fixture(tmp_path, rng)
    r = subprocess.run(
        [sys.executable, "-m", "de6d_tpu.tools.create_nuscenes_infos",
         "--data_path", str(tmp_path), "--version", "v1.0-mini",
         "--max_sweeps", "3", "--with_gt_database"],
        capture_output=True, text=True, cwd=".",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    infos = pickle.load(
        open(tmp_path / "nuscenes_infos_3sweeps_train.pkl", "rb")
    )
    assert len(infos) == 2
    db = pickle.load(
        open(tmp_path / "nuscenes_dbinfos_3sweeps_withvelo.pkl", "rb")
    )
    assert "car" in db and len(db["car"]) == 2
