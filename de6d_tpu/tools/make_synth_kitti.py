"""Generate a tiny synthetic KITTI tree for smoke training / CI.

Creates velodyne/.bin, calib, label_2 and ImageSets splits with planted
Car boxes (points clustered inside each box), then runs the infos +
gt-database build — the same tree shape `tests/test_kitti_pipeline.py`
builds in its fixture, but at a persistent path and configurable size.

Usage:
    python -m de6d_tpu.tools.make_synth_kitti --out /tmp/synthkitti \
        [--frames 8] [--train-frac 0.75] [--seed 0] [--points 3000]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

def sample_car_points(box7, n, rng):
    """Sample a lidar-like point cloud ON an oriented synthetic car.

    The car is a body cuboid plus a rear-shifted cabin cuboid, so the
    geometry is asymmetric front/back and the full heading (not just
    yaw mod pi) is recoverable from the points. Points are sampled on
    the surfaces (sides + top), rotated by the label yaw and translated
    to the label center — the labels are consistent with the geometry
    by construction (round 2's axis-aligned blobs made yaw unlearnable
    and sank Det6D's trained AOS to 0).
    """
    cx, cy, cz, l, w, h, yaw = [float(v) for v in box7[:7]]
    local = np.zeros((n, 3), np.float32)
    # split: 55% body sides, 20% body top/hood, 25% cabin
    n_side = int(n * 0.55)
    n_top = int(n * 0.20)
    n_cab = n - n_side - n_top
    u = rng.uniform(-0.5, 0.5, n_side)
    face = rng.randint(0, 4, n_side)
    zs = rng.uniform(-0.5, 0.1, n_side)  # sides: lower 60% of height
    local[:n_side, 0] = np.where(face < 2, u * l, np.where(face == 2, 0.5, -0.5) * l)
    local[:n_side, 1] = np.where(face < 2, np.where(face == 0, 0.5, -0.5) * w, u * w)
    local[:n_side, 2] = zs * h
    # top surface: LOW hood on the front half, higher trunk lid on the
    # rear — an x-dependent height step that keeps the full heading
    # recoverable even when slope pitch tilts the whole body (the
    # cabin cue alone proved marginal: a sloped200 run latched 42% of
    # yaws pi-flipped with AOS(TP) = 0.0 while 3D AP stayed 80)
    xs_top = rng.uniform(-0.5, 0.5, n_top)
    local[n_side:n_side + n_top, 0] = xs_top * l
    local[n_side:n_side + n_top, 1] = rng.uniform(-0.45, 0.45, n_top) * w
    local[n_side:n_side + n_top, 2] = (
        np.where(xs_top > 0.1, 0.02, 0.16) + rng.uniform(0, 0.06, n_top)
    ) * h
    # cabin: rear-shifted box, upper half (breaks front/back symmetry)
    cab_l, cab_off = 0.40 * l, -0.18 * l
    local[n_side + n_top:, 0] = cab_off + rng.uniform(-0.5, 0.5, n_cab) * cab_l
    local[n_side + n_top:, 1] = rng.uniform(-0.42, 0.42, n_cab) * w
    local[n_side + n_top:, 2] = rng.uniform(0.12, 0.5, n_cab) * h
    local += rng.normal(0, 0.02, local.shape)  # sensor noise
    c, s = np.cos(yaw), np.sin(yaw)
    out = np.empty_like(local)
    out[:, 0] = c * local[:, 0] - s * local[:, 1] + cx
    out[:, 1] = s * local[:, 0] + c * local[:, 1] + cy
    out[:, 2] = local[:, 2] + cz
    return out


def sample_ped_points(box7, n, rng):
    """Lidar-like points on a synthetic pedestrian: two leg columns,
    a torso ellipse and a head blob — tall + thin footprint is the
    class cue vs Car/Cyclist. Slight forward head/chest lean keeps a
    (weak, like reality) heading cue."""
    cx, cy, cz, l, w, h, yaw = [float(v) for v in box7[:7]]
    local = np.zeros((n, 3), np.float32)
    n_leg = int(n * 0.25)
    n_torso = int(n * 0.55)
    n_head = n - n_leg - n_torso
    side = np.where(rng.rand(n_leg) > 0.5, 1.0, -1.0)
    local[:n_leg, 0] = rng.normal(0, 0.04, n_leg)
    local[:n_leg, 1] = side * 0.09 + rng.normal(0, 0.03, n_leg)
    local[:n_leg, 2] = rng.uniform(-0.5, -0.15, n_leg) * h
    ang = rng.uniform(0, 2 * np.pi, n_torso)
    local[n_leg:n_leg + n_torso, 0] = 0.42 * l * np.cos(ang) * 0.5
    local[n_leg:n_leg + n_torso, 1] = 0.42 * w * np.sin(ang) * 0.5
    local[n_leg:n_leg + n_torso, 2] = rng.uniform(-0.15, 0.30, n_torso) * h
    local[n_leg + n_torso:, 0] = 0.04 * l + rng.normal(0, 0.05, n_head)
    local[n_leg + n_torso:, 1] = rng.normal(0, 0.05, n_head)
    local[n_leg + n_torso:, 2] = rng.uniform(0.32, 0.5, n_head) * h
    local += rng.normal(0, 0.015, local.shape)
    c, s = np.cos(yaw), np.sin(yaw)
    out = np.empty_like(local)
    out[:, 0] = c * local[:, 0] - s * local[:, 1] + cx
    out[:, 1] = s * local[:, 0] + c * local[:, 1] + cy
    out[:, 2] = local[:, 2] + cz
    return out


def sample_cyclist_points(box7, n, rng):
    """Synthetic cyclist: two wheel rings in the x-z plane, a frame
    bar, a transverse handlebar at the FRONT and a rider column over
    the rear half — long + thin + mid-height with a strong
    front/back asymmetry (heading cue)."""
    cx, cy, cz, l, w, h, yaw = [float(v) for v in box7[:7]]
    local = np.zeros((n, 3), np.float32)
    n_wheel = int(n * 0.35)
    n_frame = int(n * 0.10)
    n_bar = int(n * 0.15)
    n_rider = n - n_wheel - n_frame - n_bar
    # wheels: rings of radius 0.35 m centered z ~ bottom + 0.35
    which = np.where(rng.rand(n_wheel) > 0.5, 1.0, -1.0)
    ang = rng.uniform(0, 2 * np.pi, n_wheel)
    local[:n_wheel, 0] = which * 0.30 * l + 0.33 * np.cos(ang)
    local[:n_wheel, 1] = rng.normal(0, 0.02, n_wheel)
    local[:n_wheel, 2] = (-0.5 * h + 0.35) + 0.33 * np.sin(ang)
    i0 = n_wheel
    local[i0:i0 + n_frame, 0] = rng.uniform(-0.3, 0.3, n_frame) * l
    local[i0:i0 + n_frame, 1] = rng.normal(0, 0.02, n_frame)
    local[i0:i0 + n_frame, 2] = (-0.5 + rng.uniform(0.35, 0.55, n_frame)) * h
    i0 += n_frame
    # handlebar: transverse bar at the front (y-extended)
    local[i0:i0 + n_bar, 0] = 0.32 * l + rng.normal(0, 0.03, n_bar)
    local[i0:i0 + n_bar, 1] = rng.uniform(-0.5, 0.5, n_bar) * w
    local[i0:i0 + n_bar, 2] = (-0.5 + rng.uniform(0.58, 0.66, n_bar)) * h
    i0 += n_bar
    # rider torso + head over the rear half
    local[i0:, 0] = -0.12 * l + rng.normal(0, 0.07, n_rider)
    local[i0:, 1] = rng.normal(0, 0.07, n_rider)
    local[i0:, 2] = rng.uniform(0.0, 0.5, n_rider) * h
    local += rng.normal(0, 0.015, local.shape)
    c, s = np.cos(yaw), np.sin(yaw)
    out = np.empty_like(local)
    out[:, 0] = c * local[:, 0] - s * local[:, 1] + cx
    out[:, 1] = s * local[:, 0] + c * local[:, 1] + cy
    out[:, 2] = local[:, 2] + cz
    return out


# per-class (sampler, size ranges, z range, points fraction of a car)
CLASS_SPECS = {
    "Car": (
        sample_car_points,
        ((3.6, 4.6), (1.55, 1.75), (1.4, 1.7)), (-1.2, -0.6), 1.0,
    ),
    "Pedestrian": (
        sample_ped_points,
        ((0.7, 0.9), (0.55, 0.70), (1.6, 1.85)), (-0.95, -0.75), 0.25,
    ),
    "Cyclist": (
        sample_cyclist_points,
        ((1.6, 1.9), (0.5, 0.7), (1.6, 1.8)), (-1.0, -0.8), 0.3,
    ),
}


CALIB_TXT = """P0: 700 0 600 0 0 700 180 0 0 0 1 0
P1: 700 0 600 0 0 700 180 0 0 0 1 0
P2: 700 0 600 44.85 0 700 180 0.21 0 0 1 0.003
P3: 700 0 600 -330 0 700 180 2.3 0 0 1 0.003
R0_rect: 0.9999 0.0098 -0.0074 -0.0098 0.9999 -0.0043 0.0074 0.0043 0.9999
Tr_velo_to_cam: 0.0075 -0.9999 -0.0002 -0.0027 0.0148 0.0002 -0.9998 -0.0576 0.9998 0.0075 0.0148 -0.2721
Tr_imu_to_velo: 1 0 0 0 0 1 0 0 0 0 1 0
"""


def build_tree(root: Path, frames: int, train_frac: float, seed: int,
               n_points: int, cars_per_frame: int = 2,
               peds_per_frame: int = 0, cyclists_per_frame: int = 0):
    from de6d_tpu.utils import box_np_ops, calibration_kitti

    rng = np.random.RandomState(seed)
    (root / "training" / "velodyne").mkdir(parents=True, exist_ok=True)
    (root / "training" / "calib").mkdir(exist_ok=True)
    (root / "training" / "label_2").mkdir(exist_ok=True)
    (root / "ImageSets").mkdir(exist_ok=True)

    lines_ = CALIB_TXT.splitlines()
    calib = calibration_kitti.Calibration(
        {
            "P2": np.fromstring(
                lines_[2].split(": ")[1], sep=" ", dtype=np.float32
            ).reshape(3, 4),
            "P3": np.zeros((3, 4), np.float32),
            "R0": np.fromstring(
                lines_[4].split(": ")[1], sep=" ", dtype=np.float32
            ).reshape(3, 3),
            "Tr_velo2cam": np.fromstring(
                lines_[5].split(": ")[1], sep=" ", dtype=np.float32
            ).reshape(3, 4),
        }
    )

    ids = [f"{i:06d}" for i in range(frames)]
    for fid in ids:
        pts = np.zeros((n_points, 4), np.float32)
        # background: 70% ground plane at z ~ -1.7, 30% clutter
        n_gnd = int(n_points * 0.7)
        pts[:n_gnd, 0] = rng.uniform(0, 60, n_gnd)
        pts[:n_gnd, 1] = rng.uniform(-25, 25, n_gnd)
        pts[:n_gnd, 2] = -1.7 + rng.normal(0, 0.04, n_gnd)
        pts[n_gnd:, 0] = rng.uniform(0, 60, n_points - n_gnd)
        pts[n_gnd:, 1] = rng.uniform(-25, 25, n_points - n_gnd)
        pts[n_gnd:, 2] = rng.uniform(-1.7, 1.0, n_points - n_gnd)
        pts[:, 3] = rng.uniform(0, 1, n_points)

        lines = []
        roster = (
            ["Car"] * cars_per_frame
            + ["Pedestrian"] * peds_per_frame
            + ["Cyclist"] * cyclists_per_frame
        )
        per_car = max(60, n_points // (8 * max(1, len(roster))))
        # rejection-sampled centers: objects never overlap (>= 3 m
        # apart) so multi-class NMS/assignment sees clean instances
        centers = []
        off = 0
        for cls_name in roster:
            sampler, (lr, wr, hr), zr, frac = CLASS_SPECS[cls_name]
            for _ in range(40):
                cxy = np.array(
                    [rng.uniform(8, 40), rng.uniform(-8, 8)], np.float32
                )
                if all(np.linalg.norm(cxy - c) > 3.0 for c in centers):
                    break
            centers.append(cxy)
            box = np.array(
                [
                    cxy[0], cxy[1], rng.uniform(*zr),
                    rng.uniform(*lr), rng.uniform(*wr), rng.uniform(*hr),
                    rng.uniform(-np.pi, np.pi),
                ],
                np.float32,
            )
            m = max(48, int(per_car * frac))
            sl = slice(off, off + m)
            off += m
            pts[sl, :3] = sampler(box, m, rng)
            cam = box_np_ops.boxes3d_lidar_to_kitti_camera(
                box[None], calib
            )[0]
            img = box_np_ops.boxes3d_kitti_camera_to_imageboxes(
                cam[None], calib
            )[0]
            img = [
                max(img[0], 0), max(img[1], 0),
                max(img[2], img[0] + 80), max(img[3], img[1] + 60),
            ]
            lines.append(
                "%s 0.00 0 %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f "
                "%.2f %.2f %.2f %.2f"
                % (
                    cls_name,
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
    n_train = max(1, int(round(frames * train_frac)))
    (root / "ImageSets" / "train.txt").write_text(
        "\n".join(ids[:n_train]) + "\n"
    )
    (root / "ImageSets" / "val.txt").write_text(
        "\n".join(ids[n_train:] or ids[-1:]) + "\n"
    )
    return ids[:n_train], ids[n_train:]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--train-frac", type=float, default=0.75)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--points", type=int, default=3000)
    ap.add_argument("--cars", type=int, default=2)
    ap.add_argument("--peds", type=int, default=0)
    ap.add_argument("--cyclists", type=int, default=0)
    args = ap.parse_args()

    root = Path(args.out)
    tr, va = build_tree(
        root, args.frames, args.train_frac, args.seed, args.points,
        args.cars, args.peds, args.cyclists,
    )
    print(f"tree at {root}: {len(tr)} train / {len(va)} val frames")

    from de6d_tpu.config import Config, cfg_from_yaml_file
    from de6d_tpu.datasets.kitti.kitti_dataset import KittiDataset
    from de6d_tpu.tools.create_kitti_infos import create_infos

    dataset_cfg = cfg_from_yaml_file(
        "configs/dataset_configs/kitti_dataset.yaml"
    )
    dataset_cfg["DATA_PATH"] = str(root)
    dataset_cfg.pop("DATA_AUGMENTOR", None)
    classes = ["Car"]
    if args.peds:
        classes.append("Pedestrian")
    if args.cyclists:
        classes.append("Cyclist")
    create_infos(
        KittiDataset, Config(dataset_cfg), classes, str(root), workers=2
    )
    print("infos + gt database written")


if __name__ == "__main__":
    main()
