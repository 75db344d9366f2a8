"""Integration: synthetic KITTI tree on disk → infos → gt database →
augmented training batches → SlopedKITTI generation → eval protocol."""

import numpy as np
import pytest

from de6d_tpu.config import Config


CALIB_TXT = """P0: 700 0 600 0 0 700 180 0 0 0 1 0
P1: 700 0 600 0 0 700 180 0 0 0 1 0
P2: 700 0 600 44.85 0 700 180 0.21 0 0 1 0.003
P3: 700 0 600 -330 0 700 180 2.3 0 0 1 0.003
R0_rect: 0.9999 0.0098 -0.0074 -0.0098 0.9999 -0.0043 0.0074 0.0043 0.9999
Tr_velo_to_cam: 0.0075 -0.9999 -0.0002 -0.0027 0.0148 0.0002 -0.9998 -0.0576 0.9998 0.0075 0.0148 -0.2721
Tr_imu_to_velo: 1 0 0 0 0 1 0 0 0 0 1 0
"""


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    rng = np.random.RandomState(0)
    root = tmp_path_factory.mktemp("kitti")
    (root / "training" / "velodyne").mkdir(parents=True)
    (root / "training" / "calib").mkdir()
    (root / "training" / "label_2").mkdir()
    (root / "ImageSets").mkdir()

    from de6d_tpu.utils import box_np_ops, calibration_kitti

    ids = [f"{i:06d}" for i in range(4)]
    calib = calibration_kitti.Calibration(
        {
            k: np.array(v, np.float32)
            for k, v in {
                "P2": np.fromstring(
                    CALIB_TXT.splitlines()[2].split(": ")[1], sep=" "
                ).reshape(3, 4),
                "P3": np.zeros((3, 4)),
                "R0": np.fromstring(
                    CALIB_TXT.splitlines()[4].split(": ")[1], sep=" "
                ).reshape(3, 3),
                "Tr_velo2cam": np.fromstring(
                    CALIB_TXT.splitlines()[5].split(": ")[1], sep=" "
                ).reshape(3, 4),
            }.items()
        }
    )
    for fid in ids:
        n = 3000
        pts = np.zeros((n, 4), np.float32)
        pts[:, 0] = rng.uniform(0, 60, n)
        pts[:, 1] = rng.uniform(-25, 25, n)
        pts[:, 2] = rng.uniform(-1.8, 1.0, n)
        pts[:, 3] = rng.uniform(0, 1, n)

        # two cars per frame with points inside
        lines = []
        for g in range(2):
            box = np.array(
                [
                    rng.uniform(8, 40), rng.uniform(-8, 8),
                    rng.uniform(-1.2, -0.6),
                    4.0, 1.6, 1.5, rng.uniform(-np.pi, np.pi),
                ],
                np.float32,
            )
            sl = slice(g * 150, g * 150 + 150)
            pts[sl, 0] = box[0] + rng.uniform(-1.5, 1.5, 150)
            pts[sl, 1] = box[1] + rng.uniform(-0.7, 0.7, 150)
            pts[sl, 2] = box[2] + rng.uniform(-0.6, 0.6, 150)
            cam = box_np_ops.boxes3d_lidar_to_kitti_camera(
                box[None], calib
            )[0]
            img = box_np_ops.boxes3d_kitti_camera_to_imageboxes(
                cam[None], calib
            )[0]
            # ensure a tall-enough 2D box (difficulty gating)
            img = [
                max(img[0], 0), max(img[1], 0),
                max(img[2], img[0] + 80), max(img[3], img[1] + 60),
            ]
            lines.append(
                "Car 0.00 0 %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f "
                "%.2f %.2f %.2f %.2f"
                % (
                    -np.arctan2(-box[1], box[0]) + cam[6],
                    img[0], img[1], img[2], img[3],
                    cam[4], cam[5], cam[3],
                    cam[0], cam[1], cam[2], cam[6],
                )
            )
        pts.tofile(str(root / "training" / "velodyne" / f"{fid}.bin"))
        (root / "training" / "calib" / f"{fid}.txt").write_text(CALIB_TXT)
        (root / "training" / "label_2" / f"{fid}.txt").write_text(
            "\n".join(lines) + "\n"
        )
    (root / "ImageSets" / "train.txt").write_text("\n".join(ids[:3]) + "\n")
    (root / "ImageSets" / "val.txt").write_text(ids[3] + "\n")
    return root


def dataset_cfg(root):
    return Config(
        {
            "DATASET": "KittiDataset",
            "DATA_PATH": str(root),
            "POINT_CLOUD_RANGE": [0, -30, -3, 60, 30, 1],
            "DATA_SPLIT": {"train": "train", "test": "val"},
            "INFO_PATH": {
                "train": ["kitti_infos_train.pkl"],
                "test": ["kitti_infos_val.pkl"],
            },
            "FOV_POINTS_ONLY": False,
            "MAX_GT": 32,
            "POINT_FEATURE_ENCODING": {
                "encoding_type": "absolute_coordinates_encoding",
                "used_feature_list": ["x", "y", "z", "intensity"],
                "src_feature_list": ["x", "y", "z", "intensity"],
            },
            "DATA_AUGMENTOR": {
                "DISABLE_AUG_LIST": [],
                "AUG_CONFIG_LIST": [
                    {
                        "NAME": "gt_sampling",
                        "DB_INFO_PATH": ["kitti_dbinfos_train.pkl"],
                        "PREPARE": {
                            "filter_by_min_points": ["Car:5"],
                            "filter_by_difficulty": [-1],
                        },
                        "SAMPLE_GROUPS": ["Car:4"],
                        "NUM_POINT_FEATURES": 4,
                        "LIMIT_WHOLE_SCENE": True,
                    },
                    {
                        "NAME": "random_make_slope_in_scene",
                        "PROB": 1.0,
                        "DIST_MEAN": 20.0,
                        "DIST_VAR": 5.0,
                        "ANGLE_MEAN": 15.0,
                        "ANGLE_VAR": 5.0,
                    },
                    {"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x"]},
                    {
                        "NAME": "random_world_rotation",
                        "WORLD_ROT_ANGLE": [-0.785, 0.785],
                    },
                    {
                        "NAME": "random_world_scaling",
                        "WORLD_SCALE_RANGE": [0.95, 1.05],
                    },
                ],
            },
            "DATA_PROCESSOR": [
                {
                    "NAME": "mask_points_and_boxes_outside_range",
                    "REMOVE_OUTSIDE_BOXES": True,
                },
                {
                    "NAME": "shuffle_points",
                    "SHUFFLE_ENABLED": {"train": True, "test": False},
                },
                {"NAME": "pad_points", "MAX_POINTS": 4096},
            ],
        }
    )


def test_full_kitti_pipeline(kitti_root):
    from de6d_tpu.tools.create_kitti_infos import create_infos
    from de6d_tpu.datasets.kitti.kitti_dataset import KittiDataset
    from de6d_tpu.datasets.loader import DataLoader

    cfg = dataset_cfg(kitti_root)
    # 1) infos + gt database
    plain_cfg = Config(cfg.to_dict())
    plain_cfg.pop("DATA_AUGMENTOR")
    create_infos(KittiDataset, plain_cfg, ["Car"], kitti_root, workers=2)
    assert (kitti_root / "kitti_infos_train.pkl").exists()
    assert (kitti_root / "kitti_dbinfos_train.pkl").exists()

    # 2) training batches with gt-sampling + SlopeAug
    ds = KittiDataset(
        dataset_cfg=cfg, class_names=["Car"], training=True,
        root_path=kitti_root,
    )
    assert len(ds) == 3
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batch = next(iter(loader))
    assert batch["points"].shape == (2, 4096, 4)
    assert batch["gt_boxes"].shape[2] == 10  # SlopeAug → 9-DoF + class
    n_valid = (np.abs(batch["gt_boxes"][..., :7]).sum(-1) > 0).sum()
    assert n_valid >= 4  # originals + sampled
    # SlopeAug prob 1 → some nonzero pitch
    pitch = batch["gt_boxes"][..., 7]
    assert np.abs(pitch).max() > 1e-4

    # 3) eval protocol on perfect "predictions" from the val infos
    val = KittiDataset(
        dataset_cfg=cfg, class_names=["Car"], training=False,
        root_path=kitti_root,
    )
    det_annos = []
    for info in val.kitti_infos:
        annos = info["annos"]
        det_annos.append(
            {
                "name": annos["name"],
                "truncated": annos["truncated"],
                "occluded": annos["occluded"],
                "alpha": annos["alpha"],
                "bbox": annos["bbox"],
                "dimensions": annos["dimensions"],
                "location": annos["location"],
                "rotation_y": annos["rotation_y"],
                "score": np.ones(len(annos["name"])),
                "boxes_lidar": annos["gt_boxes_lidar"],
                "frame_id": info["point_cloud"]["lidar_idx"],
            }
        )
    result_str, ret = val.evaluation(det_annos, ["Car"])
    assert "Car_3d/moderate_R40" in ret
    # perfect predictions on a tiny set: AP>0 but below 100 (too few
    # gts to fill the 41-point recall ladder)
    assert ret["Car_3d/moderate_R40"] > 0


def test_make_slope_generator(kitti_root, tmp_path):
    import subprocess, sys

    out = tmp_path / "slopedkitti"
    r = subprocess.run(
        [
            sys.executable, "-m", "de6d_tpu.tools.make_slope",
            "--kitti", str(kitti_root), "--out", str(out),
            "--angle-mean", "15", "--angle-var", "5", "--seed", "1",
        ],
        capture_output=True, text=True, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    bins = list((out / "training" / "velodyne").glob("*.bin"))
    assert len(bins) == 4
    labels = list((out / "training" / "label_2").glob("*.txt"))
    assert len(labels) == 4
    # 17-col labels parse as full-pose objects
    from de6d_tpu.utils.object3d_kitti import get_objects3d_from_label

    objs = get_objects3d_from_label(labels[0])
    assert len(objs) == 2
    assert hasattr(objs[0], "rx")
    planes = list((out / "training" / "slope_planes").glob("*.txt"))
    assert len(planes) == 4


def test_packed_gt_database_and_shared_memory(kitti_root):
    """Packed gt-db npy + shared-memory sampler path (reference
    database_sampler.py:71-86 shm cache)."""
    import pickle

    from de6d_tpu.datasets.kitti.kitti_dataset import KittiDataset
    from de6d_tpu.datasets.augmentor.database_sampler import DataBaseSampler
    from de6d_tpu.config import Config

    cfg = dataset_cfg(kitti_root)
    ds = KittiDataset(
        dataset_cfg=cfg, class_names=["Car"], root_path=kitti_root,
        training=False,
    )
    ds.split = "train"
    ds.sample_id_list = [
        x.strip()
        for x in open(kitti_root / "ImageSets" / "train.txt").readlines()
    ]
    infos = ds.get_infos(num_workers=1, has_label=True,
                         count_inside_pts=True)
    info_path = kitti_root / "kitti_infos_train.pkl"
    with open(info_path, "wb") as f:
        pickle.dump(infos, f)
    ds.create_groundtruth_database(
        info_path, used_classes=["Car"], split="train", packed=True
    )
    npy = kitti_root / "kitti_gt_database_train_global.npy"
    assert npy.exists()
    db = pickle.load(open(kitti_root / "kitti_dbinfos_train.pkl", "rb"))
    assert all("global_data_offset" in x for x in db["Car"])

    sampler_cfg = Config({
        "NAME": "gt_sampling",
        "DB_INFO_PATH": ["kitti_dbinfos_train.pkl"],
        "DB_DATA_PATH": ["kitti_gt_database_train_global.npy"],
        "USE_SHARED_MEMORY": True,
        "PREPARE": {},
        "SAMPLE_GROUPS": ["Car:3"],
        "NUM_POINT_FEATURES": 4,
        "LIMIT_WHOLE_SCENE": False,
    })
    sampler = DataBaseSampler(
        root_path=kitti_root, sampler_cfg=sampler_cfg,
        class_names=["Car"],
    )
    try:
        rng = np.random.RandomState(0)
        pts = np.zeros((500, 4), np.float32)
        pts[:, 0] = rng.uniform(45, 60, 500)
        pts[:, 1] = rng.uniform(-25, 25, 500)
        dd = {
            "gt_boxes": np.zeros((0, 7), np.float32),
            "gt_names": np.array([], dtype="<U10"),
            "points": pts,
        }
        out = sampler(dict(dd), rng)
        assert (out["gt_names"] == "Car").sum() > 0
        assert out["points"].shape[0] > 500  # object points appended
        # shm content equals the on-disk packed data
        np.testing.assert_array_equal(
            np.asarray(sampler.gt_database_data), np.load(npy)
        )
    finally:
        sampler._shm.close()
        try:
            sampler._shm.unlink()
        except FileNotFoundError:
            pass
