"""Localize the Det6D backbone-bf16 training degradation.

Computes the training-loss gradient twice on the SAME batch and SAME
fp32 parameters — once fully fp32, once with BACKBONE_3D compute in
bf16 — and reports per-parameter-subtree cosine similarity and norm
ratio. A subtree whose gradient direction collapses under bf16 names
the dtype boundary (VERDICT r4 #3 / r5 bisect follow-up: arm H
(POINT_HEAD bf16) trains healthy, arm B (BACKBONE_3D bf16) degrades —
runs/train_det6d_bf16_arm{H,B}_r5.log).

CPU-safe (forced platform): no TPU contention with training runs.

Usage: python -m de6d_tpu.tools.bf16_grad_probe [--batch 2]
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--cfg", default="configs/slopedkitti_models/det6d_car.yaml"
    )
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--slot", default="BACKBONE_3D",
                    help="model slot to flip to bf16")
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from de6d_tpu.config import cfg, cfg_from_yaml_file
    from de6d_tpu.datasets import build_dataloader
    from de6d_tpu.models import build_network, device_batch
    from de6d_tpu.utils.common_utils import create_logger

    cfg_from_yaml_file(args.cfg, cfg)
    logger = create_logger(None, rank=0)
    _, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, args.batch,
        root_path=cfg.DATA_CONFIG.get("DATA_PATH"),
        training=True, workers=0, logger=logger,
    )
    batch = device_batch(next(iter(loader)))

    def grads_for(dtype_name):
        import copy

        mc = copy.deepcopy(dict(cfg.MODEL))
        if dtype_name != "float32":
            mc[args.slot]["_COMPUTE_DTYPE"] = dtype_name
        model = build_network(
            mc, num_class=len(cfg.CLASS_NAMES),
            dataset=loader.dataset,
        )
        variables = model.init(
            jax.random.PRNGKey(0), dict(batch), train=False
        )

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params,
                 "batch_stats": variables.get("batch_stats", {})},
                dict(batch), train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            loss, _ = model.get_training_loss(out)
            return loss

        loss, g = jax.value_and_grad(loss_fn)(variables["params"])
        return float(loss), g, variables["params"]

    loss32, g32, p32 = grads_for("float32")
    loss16, g16, _ = grads_for("bfloat16")
    print(f"loss fp32={loss32:.4f}  {args.slot}-bf16={loss16:.4f}")

    from flax.traverse_util import flatten_dict

    f32 = flatten_dict(g32)
    f16 = flatten_dict(g16)
    rows = []
    for k in f32:
        a = np.asarray(f32[k], np.float64).ravel()
        b = np.asarray(f16[k], np.float64).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        cos = float(a @ b / (na * nb)) if na > 0 and nb > 0 else 1.0
        rows.append(("/".join(k), cos, nb / max(na, 1e-20), na))
    rows.sort(key=lambda r: r[1])
    print(f"{'param':60s} {'cos':>7s} {'|g16|/|g32|':>12s} {'|g32|':>10s}")
    for name, cos, ratio, na in rows[:25]:
        print(f"{name:60s} {cos:7.4f} {ratio:12.3f} {na:10.2e}")
    # subtree rollup
    agg = {}
    for name, cos, ratio, na in rows:
        top = "/".join(name.split("/")[:2])
        c, w = agg.get(top, (0.0, 0.0))
        agg[top] = (c + cos * na, w + na)
    print("\nsubtree weighted-mean cos:")
    for top, (c, w) in sorted(agg.items(), key=lambda kv: kv[1][0] / max(kv[1][1], 1e-20)):
        print(f"  {top:50s} {c / max(w, 1e-20):7.4f}")


if __name__ == "__main__":
    main()
