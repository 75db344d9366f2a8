"""Benchmark: KITTI scans/sec (single chip) on the flagship inference
path — device voxelize → PillarVFE → scatter → BEV backbone → anchor
head → rotated NMS, full KITTI-scale shapes (16384 pts/scan, 432x496
BEV grid), bf16 compute / fp32 params+geometry.

Measurement protocol (see STATUS.md): the axon tunnel memoizes
repeated identical dispatches and reorders async work, so every
timing loop CHAINS iterations through a data dependency (the next
input is perturbed by a function of the previous output) and ends
with a host fetch. Un-chained loops report fantasy numbers.

Weights: if bench_assets/ holds a trained checkpoint
(pointpillar_params.npz + scans.npz, written by
de6d_tpu/tools/bake_bench_assets.py), the realistic load comes from
REAL trained scores on real scans at the config SCORE_THRESH — the
headline number is then un-gameable. Fallback without assets: random
init with a score gate at the ~768-candidates/sample quantile.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "scans/sec", "vs_baseline": N}

vs_baseline is against the BASELINE.json target of 2000 scans/sec on a
v5e-8 ⇒ 250 scans/sec/chip.
"""

from __future__ import annotations

import copy
import json
import os
import statistics
import sys
import time
from pathlib import Path

import numpy as np

_BENCH_T0 = time.perf_counter()


BASELINE_SCANS_PER_SEC_PER_CHIP = 250.0  # 2000 / 8 chips (BASELINE.json)
ASSETS = Path(__file__).parent / "bench_assets"


def _time_scans_per_sec(infer, chain, params, stats, batch, batch_size,
                        iters=10, reps=7):
    """Chained timing: iteration i+1's input depends on iteration i's
    output, so the tunnel can neither memoize nor overlap across the
    chain; each rep ends with a blocking host fetch."""
    import jax

    per_rep = []
    cur = batch
    # warmup the chain step itself
    out = infer(params, stats, cur)
    cur = chain(cur, out[1])
    jax.block_until_ready(cur["points"])
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = infer(params, stats, cur)
            cur = chain(cur, out[1])
        np.asarray(out[2])  # host fetch closes the rep
        per_rep.append(batch_size * iters / (time.perf_counter() - t0))
    return statistics.median(per_rep), per_rep


def _time_scans_per_sec_pipelined(infer, params, stats, batch, batch_size,
                                  iters=10, reps=7):
    """Pipelined throughput (the BASELINE north-star is double-buffered
    batched inference): each iteration gets a DISTINCT pre-staged input
    (fresh per rep, so the tunnel cannot memoize any dispatch), there is
    no cross-iteration data dependency (adjacent batches may overlap on
    device, exactly like the production streaming server), and EVERY
    output is host-fetched at the end of the rep (no dispatched work can
    be skipped)."""
    import jax
    import jax.numpy as jnp

    def staged(rep):
        # distinct buffers per iteration AND per rep
        salt = np.float32(1e-4) * (np.arange(1, iters + 1, dtype=np.float32)
                                   + np.float32(rep) * 0.37)
        bs = [
            {**batch, "points": batch["points"] + jnp.float32(s)}
            for s in salt
        ]
        jax.block_until_ready(bs[-1]["points"])
        return bs

    outs = [infer(params, stats, b) for b in staged(-1)]  # warmup
    [np.asarray(o[2]) for o in outs]
    per_rep = []
    for rep in range(reps):
        bs = staged(rep)
        t0 = time.perf_counter()
        outs = [infer(params, stats, b) for b in bs]
        for o in outs:
            np.asarray(o[2])  # fetch every output
        per_rep.append(batch_size * iters / (time.perf_counter() - t0))
    return statistics.median(per_rep), per_rep


def _device_chain_latency_ms(jax, jnp, model, post_processing, num_class,
                             post_cfg, params, stats, batch,
                             k=12, reps=5):
    """Per-scan device latency via an in-executable chained loop.

    Runs K (and 2K) forward+postprocess iterations inside ONE jitted
    program — iteration i+1's points are perturbed by iteration i's
    top score, so XLA cannot elide or reorder any iteration — and
    reports (t_2K − t_K) / K, which cancels dispatch/fetch overhead.
    """
    import time as _time

    def make(n_iters):
        @jax.jit
        def run(params, stats, batch):
            def body(_, carry):
                pts, acc = carry
                b = {"points": pts, "points_mask": batch["points_mask"]}
                v = {"params": params, "batch_stats": stats}
                out = model.apply(v, b, train=False)
                post = post_processing(out, post_cfg, num_class)
                eps = (post["pred_scores"][0, 0] * 1e-9 + 1e-4
                       ).astype(pts.dtype)
                return pts + eps, acc + post["pred_scores"].sum()

            _, acc = jax.lax.fori_loop(
                0, n_iters, body,
                (batch["points"], jnp.float32(0.0)),
            )
            return acc

        return run

    def med_time(fn):
        out = fn(params, stats, batch)  # compile + warmup
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = _time.perf_counter()
            np.asarray(fn(params, stats, batch))
            ts.append(_time.perf_counter() - t0)
        return statistics.median(ts)

    t_k = med_time(make(k))
    t_2k = med_time(make(2 * k))
    return max(t_2k - t_k, 1e-6) / k * 1e3


PER_CONFIGS = (
    # BASELINE.json "configs" coverage (the headline PointPillars
    # number is reused, not re-measured)
    ("second", "configs/kitti_models/second.yaml"),
    ("pointrcnn", "configs/kitti_models/pointrcnn.yaml"),
    ("det6d_car", "configs/kitti_models/det6d_car.yaml"),
    ("pv_rcnn", "configs/kitti_models/pv_rcnn.yaml"),
)


def _spec_from_cfg(cfg):
    from de6d_tpu.datasets.processor.data_processor import DataProcessor
    from de6d_tpu.models.detectors.detector3d_template import DatasetSpec

    dc = cfg.DATA_CONFIG
    pcr = tuple(float(x) for x in dc["POINT_CLOUD_RANGE"])
    dp = DataProcessor(
        dc["DATA_PROCESSOR"], point_cloud_range=np.array(pcr, np.float32),
        training=False, num_point_features=4,
    )
    vp = dp.voxel_params or {}
    return DatasetSpec(
        class_names=tuple(cfg.CLASS_NAMES),
        point_feature_dim=4,
        point_cloud_range=pcr,
        voxel_size=tuple(vp.get("voxel_size", (0.16, 0.16, 4.0))),
        max_voxels=int(vp.get("max_voxels", 16000)),
        max_points_per_voxel=int(vp.get("max_points_per_voxel", 32)),
    )


def _bench_one_config(name, cfg_path, scan_pts, batch_size=8,
                      n_points=16384):
    """Inference throughput/latency for one zoo config. Weights come
    from bench_assets/{name}_params.npz when baked (trained — the NMS
    load is then a real score distribution); fallback is random init
    with the quantile score gate. Returns a result dict."""
    import gc

    import jax
    import jax.numpy as jnp

    from de6d_tpu.config import cfg_from_yaml_file
    from de6d_tpu.models import build_network
    from de6d_tpu.models.detectors.detector3d_template import post_processing

    cfg = cfg_from_yaml_file(cfg_path)
    model_cfg = copy.deepcopy(dict(cfg.MODEL))
    model_cfg["COMPUTE_DTYPE"] = "bfloat16"
    spec = _spec_from_cfg(cfg)
    num_class = len(cfg.CLASS_NAMES)
    model = build_network(model_cfg, num_class=num_class, dataset=spec)

    # a config trained on a different domain (e.g. det6d_car on
    # SlopedKITTI) scores ~0 on the shared flat-KITTI scans; prefer
    # config-specific baked scans so the NMS load stays real
    own_scans = ASSETS / f"{name}_scans.npz"
    if own_scans.exists():
        scan_pts = np.load(own_scans)["points"]

    pts = scan_pts[:batch_size, :n_points].copy()
    # zero-row padding must be masked out (NOT clipped into range —
    # see the padding note in main()); clip only the real points
    mask_np = ~np.all(pts == 0, axis=-1)
    pc = spec.point_cloud_range
    for d in range(3):
        pts[..., d] = np.clip(pts[..., d], pc[d] + 0.01, pc[d + 3] - 0.01)
    pts[~mask_np] = 0.0
    batch = {
        "points": jnp.asarray(pts),
        "points_mask": jnp.asarray(mask_np),
    }
    baked = _load_params_npz(ASSETS / f"{name}_params.npz")
    if baked is not None:
        params, stats = baked
    else:
        variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
            jax.random.PRNGKey(0), dict(batch)
        )
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        del variables

    post_cfg = dict(model_cfg["POST_PROCESSING"])

    @jax.jit
    def infer(params, batch_stats, batch):
        v = {"params": params, "batch_stats": batch_stats}
        out = model.apply(v, dict(batch), train=False)
        post = post_processing(out, post_cfg, num_class)
        return post["pred_boxes"], post["pred_scores"], post["pred_count"]

    @jax.jit
    def chain(batch, scores):
        eps = (
            jnp.max(scores) * 1e-9 + 1e-4
        ).astype(batch["points"].dtype)
        return {**batch, "points": batch["points"] + eps}

    t0 = time.perf_counter()
    out = infer(params, stats, batch)
    jax.block_until_ready(out)
    print(f"# per_config {name}: compile+warmup "
          f"{time.perf_counter()-t0:.1f}s, mean pred_count "
          f"{float(np.mean(np.asarray(out[2]))):.0f}", file=sys.stderr)

    serial, _ = _time_scans_per_sec(
        infer, chain, params, stats, batch, batch_size, iters=5, reps=3
    )
    piped, _ = _time_scans_per_sec_pipelined(
        infer, params, stats, batch, batch_size, iters=5, reps=3
    )
    print(f"# per_config {name}: {piped:.1f} scans/s pipelined, "
          f"{serial:.1f} serial, p50 {1e3/serial:.1f} ms", file=sys.stderr)
    res = {
        "scans_per_sec": round(piped, 2),
        "serial_chained_scans_per_sec": round(serial, 2),
        "p50_latency_ms_per_scan": round(1e3 / serial, 3),
        "trained_ckpt": baked is not None,
        "mean_pred_count": round(float(np.mean(np.asarray(out[2]))), 1),
    }
    del params, stats, batch, out
    gc.collect()
    return res


def _load_params_npz(path):
    """bench_assets *_params.npz → (params, batch_stats) or None."""
    if not Path(path).exists():
        return None
    from flax.traverse_util import unflatten_dict

    raw = np.load(path, allow_pickle=False)
    tree = unflatten_dict(
        {tuple(k.split("/")): raw[k].astype(np.float32) for k in raw.files}
    )
    return tree["params"], tree.get("batch_stats", {})


def _load_assets():
    p = _load_params_npz(ASSETS / "pointpillar_params.npz")
    s = ASSETS / "scans.npz"
    if p is None or not s.exists():
        return None
    scans = np.load(s)
    return p[0], p[1], scans["points"]


def main():
    import jax
    import jax.numpy as jnp

    from de6d_tpu.models import build_network
    from de6d_tpu.models.detectors.detector3d_template import (
        DatasetSpec, post_processing,
    )
    from de6d_tpu.config import cfg_from_yaml_file

    cfg = cfg_from_yaml_file("configs/kitti_models/pointpillar.yaml")
    model_cfg = copy.deepcopy(dict(cfg.MODEL))
    model_cfg["COMPUTE_DTYPE"] = "bfloat16"
    spec = DatasetSpec(
        class_names=tuple(cfg.CLASS_NAMES),
        point_feature_dim=4,
        point_cloud_range=tuple(cfg.DATA_CONFIG.POINT_CLOUD_RANGE),
        voxel_size=(0.16, 0.16, 4.0),
        max_voxels=16000,
        max_points_per_voxel=32,
    )
    num_class = len(cfg.CLASS_NAMES)
    model = build_network(model_cfg, num_class=num_class, dataset=spec)

    batch_size = 8
    n_points = 16384
    assets = _load_assets()
    rng = np.random.RandomState(0)
    pc = spec.point_cloud_range
    if assets is not None:
        params, stats, scan_pts = assets
        # device-commit the checkpoint ONCE: numpy params passed to a
        # jitted fn re-upload ~19 MB of weights through the tunnel on
        # EVERY dispatch (~280 ms/batch measured — 10x the whole model)
        params = jax.device_put(params)
        stats = jax.device_put(stats)
        reps = int(np.ceil(batch_size / scan_pts.shape[0]))
        pts = np.tile(scan_pts, (reps, 1, 1))[:batch_size]
        print(f"# trained checkpoint + {scan_pts.shape[0]} real scans",
              file=sys.stderr)
    else:
        pts = np.zeros((batch_size, n_points, 4), np.float32)
        pts[..., 0] = rng.uniform(pc[0], pc[3], (batch_size, n_points))
        pts[..., 1] = rng.uniform(pc[1], pc[4], (batch_size, n_points))
        pts[..., 2] = rng.uniform(pc[2], pc[5], (batch_size, n_points))
        pts[..., 3] = rng.uniform(0, 1, (batch_size, n_points))
        print("# no bench_assets — random init + quantile gate",
              file=sys.stderr)
    # real scans carry zero-row padding out to 16384 — mask it exactly
    # like the loader's collate does. An all-True mask turned the
    # ~3900 padding rows into one artificial mega-cell that tripped
    # the binned-SA spill fallback in the det6d per-config bench
    # (measured 178 ms/scan brute vs 38.5 fused on the same chip).
    pts = pts[:, :n_points]
    mask_np = ~np.all(pts == 0, axis=-1)
    batch = {
        "points": jnp.asarray(pts),
        "points_mask": jnp.asarray(mask_np),
    }

    if assets is None:
        variables = jax.jit(
            lambda r, b: model.init(r, b, train=False)
        )(jax.random.PRNGKey(0), dict(batch))
        params, stats = variables["params"], variables["batch_stats"]

    def make_infer(post_cfg):
        @jax.jit
        def infer(params, batch_stats, batch):
            v = {"params": params, "batch_stats": batch_stats}
            out = model.apply(v, dict(batch), train=False)
            post = post_processing(out, post_cfg, num_class)
            return post["pred_boxes"], post["pred_scores"], post["pred_count"]

        return infer

    @jax.jit
    def chain(batch, scores):
        # data dependency; the +1e-4 m keeps buffers bit-distinct (a
        # pure *1e-9 eps rounds away in fp32 at KITTI coordinate
        # magnitudes and the tunnel memoizes identical dispatches)
        eps = (scores[0, 0] * 1e-9 + 1e-4).astype(batch["points"].dtype)
        return {**batch, "points": batch["points"] + eps}

    if assets is not None:
        gate = float(model_cfg["POST_PROCESSING"]["SCORE_THRESH"])
    else:
        @jax.jit
        def fwd(params, batch_stats, batch):
            v = {"params": params, "batch_stats": batch_stats}
            out = model.apply(v, dict(batch), train=False)
            return out["batch_cls_preds"]

        t_c0 = time.perf_counter()
        cls_preds = fwd(params, stats, batch)
        scores = np.asarray(jax.nn.sigmoid(cls_preds).max(axis=-1))
        gate = float(np.quantile(scores, 1.0 - 768.0 / scores.shape[1]))
        print(f"# fwd compile+gate calib: {time.perf_counter()-t_c0:.1f}s "
              f"(gate={gate:.4f})", file=sys.stderr)

    results = {}
    all_reps = {}
    for label, thresh in (("realistic", gate), ("worst_case", 0.0)):
        pp = dict(model_cfg["POST_PROCESSING"])
        pp["SCORE_THRESH"] = thresh
        infer = make_infer(pp)
        t_c0 = time.perf_counter()
        out = infer(params, stats, batch)
        jax.block_until_ready(out)
        print(f"# {label} compile+warmup: {time.perf_counter()-t_c0:.1f}s, "
              f"mean pred_count {float(np.mean(np.asarray(out[2]))):.0f}",
              file=sys.stderr)
        med, reps = _time_scans_per_sec(
            infer, chain, params, stats, batch, batch_size
        )
        results[label] = med
        all_reps[label] = reps
        print(f"# {label}: median {med:.1f} scans/s (serial-chained), reps "
              f"{[f'{r:.1f}' for r in reps]}", file=sys.stderr)
        medp, repsp = _time_scans_per_sec_pipelined(
            infer, params, stats, batch, batch_size
        )
        results[label + "_pipelined"] = medp
        print(f"# {label}: median {medp:.1f} scans/s (pipelined), reps "
              f"{[f'{r:.1f}' for r in repsp]}", file=sys.stderr)

    # batch sweep on the realistic load (chained, shorter)
    sweep = {}
    pp = dict(model_cfg["POST_PROCESSING"])
    pp["SCORE_THRESH"] = gate
    for bs in (1, 4, 16):
        if bs <= batch_size:
            sub = {
                "points": batch["points"][:bs],
                "points_mask": batch["points_mask"][:bs],
            }
        else:
            reps = bs // batch_size
            sub = {
                "points": jnp.tile(batch["points"], (reps, 1, 1)),
                "points_mask": jnp.tile(batch["points_mask"], (reps, 1)),
            }
        infer = make_infer(pp)
        out = infer(params, stats, sub)
        jax.block_until_ready(out)
        med, _ = _time_scans_per_sec(
            infer, chain, params, stats, sub, bs, iters=10, reps=5
        )
        sweep[f"batch_{bs}"] = round(med, 2)
        print(f"# sweep batch={bs}: {med:.1f} scans/s", file=sys.stderr)
        if bs == 1:
            # the streaming/ROS-node use case (VERDICT r4 #8): frames
            # arrive continuously, adjacent frames may overlap on
            # device — same executable, pipelined protocol
            medp, _ = _time_scans_per_sec_pipelined(
                infer, params, stats, sub, bs, iters=10, reps=5
            )
            sweep["batch_1_pipelined"] = round(medp, 2)
            print(f"# sweep batch=1 pipelined: {medp:.1f} scans/s",
                  file=sys.stderr)
            # true on-device per-scan latency: K chained iterations
            # INSIDE one executable (NEXT.md protocol (c)); the tunnel's
            # ~6.5 ms per-dispatch cost would otherwise dominate a
            # ~3 ms scan. Delta between 2K- and K-iteration programs
            # cancels the residual dispatch + fetch overhead exactly.
            dev_ms = _device_chain_latency_ms(
                jax, jnp, model, post_processing, num_class, pp,
                params, stats, sub
            )
            sweep["batch_1_device_ms"] = round(dev_ms, 3)
            print(f"# sweep batch=1 on-device: {dev_ms:.2f} ms/scan "
                  f"({1e3 / dev_ms:.1f} scans/s equivalent)",
                  file=sys.stderr)
    sweep[f"batch_{batch_size}"] = round(results["realistic"], 2)

    # per-config matrix over the BASELINE.json "configs" list (scan
    # points reused; random init + quantile gate — see _bench_one_config)
    per_config = {
        "pointpillar": {
            "scans_per_sec": round(results["realistic_pipelined"], 2),
            "serial_chained_scans_per_sec": round(results["realistic"], 2),
            "p50_latency_ms_per_scan": round(1e3 / results["realistic"], 3),
            "trained_ckpt": assets is not None,
        }
    }
    # the headline JSON line must land even under a caller timeout:
    # each per-config entry costs a 60-100 s tunnel compile, so stop
    # fanning out once the wall-clock budget is spent. BENCH_BUDGET_S
    # bounds ONLY the per-config fan-out (clock starts here, after the
    # headline bench — ADVICE r4); 0 = skip the matrix entirely.
    # Non-numeric per_config entries always use the {"error": ...}
    # shape so JSON consumers have exactly two shapes to handle.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1200"))
    t_matrix0 = time.perf_counter()
    for name, cfg_path in PER_CONFIGS:
        if time.perf_counter() - t_matrix0 > budget_s or budget_s == 0:
            print(f"# per_config {name} skipped: matrix budget "
                  f"{budget_s:.0f}s spent", file=sys.stderr)
            per_config[name] = {"error": "skipped: matrix budget"}
            continue
        try:
            per_config[name] = _bench_one_config(name, cfg_path, pts)
        except Exception as e:  # one config must not sink the headline
            print(f"# per_config {name} FAILED: {e!r}", file=sys.stderr)
            per_config[name] = {"error": str(e)[:200]}

    # headline = pipelined throughput (BASELINE north-star:
    # "double-buffered batched single-frame inference"); the
    # serial-chained number (each scan's input depends on the previous
    # output — no overlap possible) is reported alongside and also
    # yields the per-scan latency figures
    scans_per_sec = results["realistic_pipelined"]
    serial = results["realistic"]
    worst_rep = min(all_reps["realistic"])
    print(
        json.dumps(
            {
                "metric": (
                    "KITTI scans/sec/chip (PointPillars bf16, 16k-pt "
                    "scans, voxelize+NMS incl., double-buffered, "
                    + ("trained ckpt + real scans"
                       if assets is not None else "random init, ~768 "
                       "NMS candidates/sample")
                    + ")"
                ),
                "value": round(scans_per_sec, 2),
                "unit": "scans/sec",
                "vs_baseline": round(
                    scans_per_sec / BASELINE_SCANS_PER_SEC_PER_CHIP, 3
                ),
                "serial_chained_scans_per_sec": round(serial, 2),
                "p50_latency_ms_per_scan": round(1e3 / serial, 3),
                "p99_latency_ms_per_scan": round(1e3 / worst_rep, 3),
                "worst_case_scans_per_sec": round(
                    results["worst_case"], 2
                ),
                "worst_case_pipelined": round(
                    results["worst_case_pipelined"], 2
                ),
                "batch_sweep": sweep,
                "per_config": per_config,
                "batch_size": batch_size,
                "trained_ckpt": assets is not None,
            }
        )
    )


if __name__ == "__main__":
    main()
