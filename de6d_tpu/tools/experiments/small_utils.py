"""Small experiment utilities, collected as subcommands.

Parity: reference tools/experiments/utils/{gen_split.py:1-30,
image2gif.py:1-35, calculate_kitti.py:1-29,
calculate_slopedkitti.py:1-30}. (reference pcvt.py:1-185 covered
ros↔bin↔pcd; the file-format legs live here as `pcvt`.)

  gen_split    — write train.txt/val.txt ImageSets for a KITTI-layout
                 dataset root (seeded, reproducible; ratio arg instead
                 of the reference's hardcoded 1/5).
  image2gif    — fold a directory of frames into an animated GIF
                 (PIL-only; imageio is not in this image).
  rescore      — re-run the KITTI / SlopedKITTI eval protocol offline
                 on a saved result.pkl against the split's infos pkl.
  pcvt         — convert point clouds between .bin (KITTI float32
                 xyzi), .npy, and .pcd v0.7 (ascii or binary; reads
                 both). The reference pcvt.py additionally bridges
                 live ROS PointCloud2 topics — ROS transport is out of
                 scope here; the streaming JSON-over-TCP node
                 (serving/detection_node.py) is this framework's
                 online path.

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


_PCD_TYPE = {("F", 4): "f4", ("F", 8): "f8", ("I", 4): "i4",
             ("I", 2): "i2", ("I", 1): "i1", ("U", 4): "u4",
             ("U", 2): "u2", ("U", 1): "u1"}


def load_cloud(path):
    """Load an (N, 4) float32 xyzi cloud from .bin / .npy / .pcd."""
    path = Path(path)
    if path.suffix == ".bin":
        return np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    if path.suffix == ".npy":
        pts = np.load(path).astype(np.float32)
        if pts.shape[1] < 4:  # pad missing intensity
            pts = np.concatenate(
                [pts, np.zeros((len(pts), 4 - pts.shape[1]), np.float32)],
                axis=1)
        return pts[:, :4]
    if path.suffix == ".pcd":
        return _load_pcd(path)
    raise SystemExit(f"unsupported input format: {path.suffix}")


def _load_pcd(path):
    raw = Path(path).read_bytes()
    header_end = raw.index(b"DATA")
    nl = raw.index(b"\n", header_end)
    header = raw[:nl].decode("ascii", "replace").splitlines()
    meta = {}
    for line in header:
        if line.startswith("#") or not line.strip():
            continue
        key, *vals = line.split()
        meta[key] = vals
    fields = meta["FIELDS"]
    sizes = [int(s) for s in meta["SIZE"]]
    types = meta["TYPE"]
    counts = [int(c) for c in meta.get("COUNT", ["1"] * len(fields))]
    npts = int(meta["POINTS"][0])
    mode = meta["DATA"][0]
    dtype = np.dtype([
        (f if c == 1 else f"{f}_{j}", _PCD_TYPE[(t, s)])
        for f, s, t, c in zip(fields, sizes, types, counts)
        for j in range(c)
    ])
    if mode == "ascii":
        body = raw[nl + 1:].decode("ascii")
        flat = np.array(body.split(), dtype=np.float64)
        rec = flat.reshape(npts, len(dtype.names))
        cols = {n: rec[:, i] for i, n in enumerate(dtype.names)}
    elif mode == "binary":
        rec = np.frombuffer(raw[nl + 1:], dtype=dtype, count=npts)
        cols = {n: rec[n] for n in dtype.names}
    else:
        raise SystemExit(f"unsupported PCD DATA mode: {mode}")
    pts = np.zeros((npts, 4), np.float32)
    for i, name in enumerate(("x", "y", "z")):
        pts[:, i] = cols[name]
    if "intensity" in cols:
        pts[:, 3] = cols["intensity"]
    elif "i" in cols:
        pts[:, 3] = cols["i"]
    return pts


def save_cloud(pts, path, pcd_mode="binary"):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    pts = np.ascontiguousarray(pts[:, :4], np.float32)
    if path.suffix == ".bin":
        pts.tofile(path)
    elif path.suffix == ".npy":
        np.save(path, pts)
    elif path.suffix == ".pcd":
        header = (
            "# .PCD v0.7 - Point Cloud Data file format\n"
            "VERSION 0.7\n"
            "FIELDS x y z intensity\nSIZE 4 4 4 4\nTYPE F F F F\n"
            "COUNT 1 1 1 1\n"
            f"WIDTH {len(pts)}\nHEIGHT 1\n"
            "VIEWPOINT 0 0 0 1 0 0 0\n"
            f"POINTS {len(pts)}\nDATA {pcd_mode}\n"
        )
        with open(path, "wb") as f:
            f.write(header.encode("ascii"))
            if pcd_mode == "binary":
                f.write(pts.tobytes())
            else:
                np.savetxt(f, pts, fmt="%f")
    else:
        raise SystemExit(f"unsupported output format: {path.suffix}")


def pcvt(args):
    src = Path(args.src)
    files = sorted(src.glob(f"*{args.src_suffix}")) if src.is_dir() \
        else [src]
    if not files:
        raise SystemExit(f"no {args.src_suffix} files in {src}")
    dst = Path(args.dst)
    for f in files:
        out = (dst / (f.stem + args.dst_suffix)) if len(files) > 1 \
            or dst.suffix == "" else dst
        pts = load_cloud(f)
        save_cloud(pts, out, pcd_mode=args.pcd_mode)
        print(f"{f} -> {out} ({len(pts)} pts)")


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

    p = sub.add_parser("pcvt")
    p.add_argument("--src", required=True,
                   help="file or directory of clouds")
    p.add_argument("--dst", required=True,
                   help="output file, or directory when src is a dir")
    p.add_argument("--src_suffix", default=".bin",
                   choices=(".bin", ".npy", ".pcd"))
    p.add_argument("--dst_suffix", default=".pcd",
                   choices=(".bin", ".npy", ".pcd"))
    p.add_argument("--pcd_mode", default="binary",
                   choices=("binary", "ascii"))
    p.set_defaults(fn=pcvt)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
