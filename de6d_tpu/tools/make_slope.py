"""SlopedKITTI dataset generator.

Parity: reference core/tools/experiments/make_slope.py:81-258 — for
every KITTI frame: apply random_global_make_slope to points + 7-DoF gt
boxes, then write
  velodyne/<id>.bin        sloped cloud,
  slope_planes/<id>.txt    hinge point + rotation vector,
  label_2/<id>.txt         17-col labels (kitti 15 + lidar pitch, roll),
and symlink calib/image/planes + ImageSets from the source KITTI tree.
Finish with create-infos + gt-database (run via
`python -m de6d_tpu.tools.create_kitti_infos --dataset slopedkitti`).

Usage:
  python -m de6d_tpu.tools.make_slope --kitti data/kitti \
      --out data/slopedkitti --dist-mean 20 --dist-var 10 \
      --angle-mean 20 --angle-var 8 [--smooth] [--seed 0]
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np

from ..datasets.augmentor.augmentor_utils import random_global_make_slope
from ..utils import box_np_ops, calibration_kitti, object3d_kitti


def kitti_label_line(obj, pitch, roll):
    """15-field kitti line + lidar pitch/roll (reference
    make_slope.py:196-212 label writing)."""
    return (
        "%s %.2f %d %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f "
        "%.2f %.2f %f %f"
        % (
            obj.cls_type, obj.truncation, int(obj.occlusion), obj.alpha,
            obj.box2d[0], obj.box2d[1], obj.box2d[2], obj.box2d[3],
            obj.h, obj.w, obj.l, obj.loc[0], obj.loc[1], obj.loc[2],
            obj.ry, pitch, roll,
        )
    )


def process_frame(frame_id, kitti_root, out_root, params, rng,
                  smooth=False):
    split = "training"
    velo = kitti_root / split / "velodyne" / f"{frame_id}.bin"
    points = np.fromfile(str(velo), dtype=np.float32).reshape(-1, 4)
    calib = calibration_kitti.Calibration(
        kitti_root / split / "calib" / f"{frame_id}.txt"
    )
    objs = object3d_kitti.get_objects_from_label(
        kitti_root / split / "label_2" / f"{frame_id}.txt"
    )
    real = [o for o in objs if o.cls_type != "DontCare"]
    if real:
        loc = np.stack([o.loc for o in real])
        dims = np.array([[o.l, o.h, o.w] for o in real])
        rots = np.array([o.ry for o in real])
        loc_lidar = calib.rect_to_lidar(loc)
        loc_lidar[:, 2] += dims[:, 1] / 2
        gt_boxes = np.concatenate(
            [loc_lidar, dims[:, 0:1], dims[:, 2:3], dims[:, 1:2],
             -(np.pi / 2 + rots[:, None])], axis=1,
        )
    else:
        gt_boxes = np.zeros((0, 7))

    new_boxes, new_points, rp, ra = random_global_make_slope(
        gt_boxes, points, params, rng, smooth=smooth
    )

    (out_root / "velodyne").mkdir(parents=True, exist_ok=True)
    (out_root / "slope_planes").mkdir(parents=True, exist_ok=True)
    (out_root / "label_2").mkdir(parents=True, exist_ok=True)

    new_points.astype(np.float32).tofile(
        str(out_root / "velodyne" / f"{frame_id}.bin")
    )
    with open(out_root / "slope_planes" / f"{frame_id}.txt", "w") as f:
        print("%f %f %f\n%f %f %f" % (*rp, *ra), file=f)

    with open(out_root / "label_2" / f"{frame_id}.txt", "w") as f:
        k = 0
        for obj in objs:
            if obj.cls_type != "DontCare":
                box = new_boxes[k]
                k += 1
                cam = box_np_ops.boxes3d_lidar_to_kitti_camera(
                    box[None, :7], calib
                )
                img_box = box_np_ops.boxes3d_kitti_camera_to_imageboxes(
                    cam, calib
                )
                obj.box2d = img_box[0]
                obj.l, obj.h, obj.w = cam[0, 3], cam[0, 4], cam[0, 5]
                obj.loc = cam[0, 0:3]
                obj.ry = cam[0, 6]
                print(kitti_label_line(obj, box[7], box[8]), file=f)
            else:
                print(kitti_label_line(obj, -10, -10), file=f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kitti", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--dist-mean", type=float, default=20.0)
    ap.add_argument("--dist-var", type=float, default=10.0)
    ap.add_argument("--angle-mean", type=float, default=20.0)
    ap.add_argument("--angle-var", type=float, default=8.0)
    ap.add_argument("--smooth", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    kitti_root = Path(args.kitti)
    out_root = Path(args.out) / "training"
    out_root.mkdir(parents=True, exist_ok=True)
    params = (
        args.dist_mean, args.dist_var,
        np.deg2rad(args.angle_mean), np.deg2rad(args.angle_var),
    )
    rng = np.random.RandomState(args.seed)

    # symlink unchanged assets
    for name in ("calib", "image_2", "image_3", "planes"):
        src = (kitti_root / "training" / name).absolute()
        dst = out_root / name
        if src.exists() and not dst.exists():
            os.symlink(src, dst)
    sets_src = kitti_root / "ImageSets"
    sets_dst = Path(args.out) / "ImageSets"
    if sets_src.exists() and not sets_dst.exists():
        os.symlink(sets_src.absolute(), sets_dst)

    ids = sorted(
        p.stem for p in (kitti_root / "training" / "velodyne").glob("*.bin")
    )
    for i, frame_id in enumerate(ids):
        process_frame(frame_id, kitti_root, out_root, params, rng,
                      smooth=args.smooth)
        if i % 200 == 0:
            print(f"{i}/{len(ids)}")
    print(f"done: {len(ids)} frames → {out_root}")


if __name__ == "__main__":
    main()
