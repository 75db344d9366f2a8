"""Post-processing sub-stage split on the real chip.

Times cumulative prefixes of the (restructured, r3) post_processing
pipeline from synthetic head outputs, chained, scalar-reduced:

  Q1 sigmoid + max/argmax over (B, A, nc)
  Q2 + batched top_k (B, A) -> (B, P)
  Q3 + candidate gathers + lazy residual decode (P rows)
  Q4 + nms_candidates under lax.map (Pallas mask + blocked resolve)

Gated (~768 live) and worst (all live) variants for Q4.

Usage: python -m de6d_tpu.tools.post_probe
"""

from __future__ import annotations

import time

import numpy as np


B, A, NC, P = 8, 321408, 3, 4096


def main():
    import jax
    import jax.numpy as jnp

    from de6d_tpu.ops import nms as nms_ops
    from de6d_tpu.utils.box_coder_utils import ResidualCoder
    from de6d_tpu.models.dense_heads.anchor_head import (
        decode_boxes_with_dir,
    )

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    cls_logits = jnp.asarray(
        rng.randn(B, A, NC).astype(np.float32) * 0.3 - 4.0
    )
    raw = jnp.asarray(rng.randn(B, A, 7).astype(np.float32) * 0.1)
    dirp = jnp.asarray(rng.randn(B, A, 2).astype(np.float32))
    anchors = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(0, 70, (A, 3)),
                rng.uniform(1, 4, (A, 3)),
                rng.uniform(-3, 3, (A, 1)),
            ],
            axis=1,
        ).astype(np.float32)
    )
    coder = ResidualCoder()
    dir_cfg = (0.78539, 0.0, 2)

    def q1(cl):
        p = jax.nn.sigmoid(cl)
        return jnp.max(p, -1), jnp.argmax(p, -1) + 1

    def q2(cl, gate):
        s, l = q1(cl)
        m = jnp.where(s >= gate, s, nms_ops.NEG_INF)
        ts, o = jax.lax.top_k(m, P)
        return ts, o, l

    def q3(cl, gate):
        ts, o, l = q2(cl, gate)
        rr = jnp.take_along_axis(raw, o[..., None], axis=1)
        dr = jnp.take_along_axis(dirp, o[..., None], axis=1)
        ar = jnp.take(anchors, o, axis=0)
        boxes = decode_boxes_with_dir(coder, dir_cfg, rr, dr, ar)
        return ts, boxes, l

    def q4(cl, gate):
        ts, boxes, l = q3(cl, gate)

        def single(args):
            cand_b, top_s = args
            sel, count = nms_ops.nms_candidates(
                cand_b, top_s, thresh=0.01, post_maxsize=500
            )
            return jnp.sum(cand_b[sel]) + count

        per = jax.lax.map(single, (boxes, ts))
        return jnp.sum(per.astype(jnp.float32))

    # quantile gates for ~768 live and all-live
    s_host = np.asarray(jax.nn.sigmoid(cls_logits).max(-1))
    gate768 = float(np.quantile(s_host, 1 - 768 / A))
    print(f"gate768={gate768:.4f}", flush=True)

    fns = {
        "Q1 sigmoid+max": jax.jit(
            lambda cl: jnp.sum(q1(cl)[0])
            + jnp.sum(q1(cl)[1].astype(jnp.float32))
        ),
        "Q2 +topk": jax.jit(
            lambda cl: jnp.sum(q2(cl, gate768)[0])
        ),
        "Q3 +gather+decode": jax.jit(
            lambda cl: jnp.sum(q3(cl, gate768)[1])
        ),
        "Q4 full gated": jax.jit(lambda cl: q4(cl, gate768)),
        "Q4 full worst": jax.jit(lambda cl: q4(cl, 0.0)),
    }

    @jax.jit
    def perturb(cl, scalar):
        return cl + scalar * 1e-12 + 1e-6

    prev = 0.0
    for label, f in fns.items():
        cl = cls_logits
        out = f(cl)
        cl = perturb(cl, out)
        float(out)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(15):
                out = f(cl)
                cl = perturb(cl, out)
            float(out)
            times.append((time.perf_counter() - t0) / 15)
        ms = min(times) * 1e3
        print(
            f"  {label}: {ms:7.2f} ms/batch ({ms/B:5.3f} ms/scan)  "
            f"delta {ms-prev:+.2f}",
            flush=True,
        )
        prev = ms


if __name__ == "__main__":
    main()
