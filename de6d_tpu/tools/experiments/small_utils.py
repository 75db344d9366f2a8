"""Small experiment utilities, collected as subcommands.

Parity: reference tools/experiments/utils/{gen_split.py:1-30,
image2gif.py:1-35, calculate_kitti.py:1-29,
calculate_slopedkitti.py:1-30}. (pcvt.py is a ROS pointcloud2↔bin
converter — ROS-specific, out of scope per SURVEY §2.7.)

  gen_split    — write train.txt/val.txt ImageSets for a KITTI-layout
                 dataset root (seeded, reproducible; ratio arg instead
                 of the reference's hardcoded 1/5).
  image2gif    — fold a directory of frames into an animated GIF
                 (PIL-only; imageio is not in this image).
  rescore      — re-run the KITTI / SlopedKITTI eval protocol offline
                 on a saved result.pkl against the split's infos pkl.

Usage:
  python -m de6d_tpu.tools.experiments.small_utils gen_split \
      --data_path /tmp/synthkitti200 --num 200 [--val_ratio 0.2]
  python -m de6d_tpu.tools.experiments.small_utils image2gif \
      --dir renders/ --out out.gif [--fps 20] [--every 6]
  python -m de6d_tpu.tools.experiments.small_utils rescore \
      --result output/.../result.pkl --infos .../kitti_infos_val.pkl \
      [--protocol kitti|slopedkitti] [--classes Car ...]
"""

from __future__ import annotations

import argparse
import copy
import pickle
from pathlib import Path

import numpy as np


def gen_split(args):
    rng = np.random.RandomState(args.seed)
    ids = np.arange(args.num)
    val = np.sort(rng.choice(args.num, int(args.num * args.val_ratio),
                             replace=False))
    train = np.setdiff1d(ids, val)
    out = Path(args.data_path) / "ImageSets"
    out.mkdir(parents=True, exist_ok=True)
    for name, arr in (("train", train), ("val", val)):
        (out / f"{name}.txt").write_text(
            "\n".join(f"{i:06d}" for i in arr)
        )
        print(f"{out / name}.txt: {len(arr)} ids")


def image2gif(args):
    from PIL import Image

    files = sorted(Path(args.dir).iterdir())
    frames = [Image.open(f).convert("P") for f in files[:: args.every]
              if f.suffix.lower() in (".png", ".jpg", ".jpeg")]
    if not frames:
        raise SystemExit(f"no images in {args.dir}")
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    frames[0].save(
        out, save_all=True, append_images=frames[1:],
        duration=int(1000 / args.fps), loop=0,
    )
    print(f"saved {out} ({len(frames)} frames @ {args.fps} fps)")


def rescore(args):
    with open(args.result, "rb") as f:
        dt_annos = pickle.load(f)
    with open(args.infos, "rb") as f:
        infos = pickle.load(f)
    gt_annos = [copy.deepcopy(info["annos"]) for info in infos]
    n_dt = int(sum(a["name"].shape[0] for a in dt_annos))
    n_gt = int(sum(a["name"].shape[0] for a in gt_annos))
    print(f"num_scenes: {len(dt_annos)}  num_dt_obj: {n_dt}  "
          f"num_gt_obj: {n_gt}")
    if args.protocol == "slopedkitti":
        from ...datasets.eval.slopedkitti_eval import (
            get_official_eval_result,
        )
    else:
        from ...datasets.eval.kitti_eval import get_official_eval_result
    result_str, result_dict = get_official_eval_result(
        gt_annos, dt_annos, args.classes
    )
    print(result_str)
    return result_dict


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen_split")
    g.add_argument("--data_path", required=True)
    g.add_argument("--num", type=int, required=True)
    g.add_argument("--val_ratio", type=float, default=0.2)
    g.add_argument("--seed", type=int, default=0)
    g.set_defaults(fn=gen_split)

    i = sub.add_parser("image2gif")
    i.add_argument("--dir", required=True)
    i.add_argument("--out", default="out.gif")
    i.add_argument("--fps", type=float, default=20.0)
    i.add_argument("--every", type=int, default=6,
                   help="keep every Nth frame (reference uses [::6])")
    i.set_defaults(fn=image2gif)

    r = sub.add_parser("rescore")
    r.add_argument("--result", required=True)
    r.add_argument("--infos", required=True)
    r.add_argument("--protocol", default="kitti",
                   choices=("kitti", "slopedkitti"))
    r.add_argument("--classes", nargs="*",
                   default=("Car", "Pedestrian", "Cyclist"))
    r.set_defaults(fn=rescore)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
