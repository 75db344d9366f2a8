"""BEV backbone layer-split probe (real chip, single process).

The measured backbone+head slice is ~2.0 ms/scan at batch 8 for
~65 GF bf16 — ~6x off the v5e MXU roofline (~0.33 ms/scan). This
probe isolates where that goes:

  - full BaseBEVBackbone forward at bench shapes
  - each ConvBlock and each upsample branch separately
  - nn.ConvTranspose vs an equivalent pixel-shuffle matmul
    (kernel k == stride s transposed conv is exactly a 1x1
    matmul to s*s*C_out followed by depth-to-space)
  - C=64 NHWC conv vs C=128 (lane-occupancy check)

Chained-dependency timing protocol throughout (see STATUS.md: the
tunnel memoizes identical dispatches and reorders async work).

Usage: python -m de6d_tpu.tools.bev_probe [--batch 8]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def chain_time(fn, x0, iters=8, reps=3):
    import jax
    import jax.numpy as jnp

    out = fn(x0)
    np.asarray(jnp.sum(out).astype(jnp.float32))

    times = []
    for rep in range(reps):
        x = x0 + jnp.asarray(1e-4 * (rep + 1), x0.dtype)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
            # feed a scalar of the output back into the next input:
            # serializes iterations, defeats memoization
            x = x + out.reshape(-1)[0].astype(x.dtype) * jnp.asarray(
                1e-9, x.dtype
            )
        np.asarray(jnp.sum(out).astype(jnp.float32))
        times.append((time.perf_counter() - t0) / iters)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--tiny", action="store_true",
                    help="1/8-scale shapes (CPU smoke)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from ..models.backbones_2d.base_bev_backbone import (
        BaseBEVBackbone, ConvBlock,
    )

    print(f"backend={jax.default_backend()}")
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    b = args.batch
    ny, nx, c0 = (64, 48, 64) if args.tiny else (496, 432, 64)
    model_cfg = {
        "LAYER_NUMS": [4, 6, 6],
        "LAYER_STRIDES": [2, 2, 2],
        "NUM_FILTERS": [64, 128, 256],
        "UPSAMPLE_STRIDES": [1, 2, 4],
        "NUM_UPSAMPLE_FILTERS": [128, 128, 128],
        "COMPUTE_DTYPE": args.dtype,
    }
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(b, ny, nx, c0), dt)

    bb = BaseBEVBackbone(model_cfg=model_cfg, input_channels=c0)
    vs = jax.jit(
        lambda r, xx: bb.init(r, {"spatial_features": xx}, train=False)
    )(jax.random.PRNGKey(0), x)

    @jax.jit
    def full(xx):
        out = bb.apply(vs, {"spatial_features": xx}, train=False)
        return out["spatial_features_2d"]

    t = chain_time(full, x)
    gf = 65.0 * b  # approx, per STATUS split
    print(f"full backbone: {t * 1e3:8.2f} ms/batch "
          f"({t / b * 1e3:.2f} ms/scan, ~{gf / t / 1e12:.0f} TF/s)")

    # per-block
    shapes = [(ny // 2, nx // 2, 64, 64, 4 + 1),
              (ny // 4, nx // 4, 64, 128, 6 + 1),
              (ny // 8, nx // 8, 128, 256, 6 + 1)]
    for i, (h, w, cin, cout, layers) in enumerate(shapes):
        blk = ConvBlock(cout, 1, layers - 1, dtype=dt)
        xin = jnp.asarray(rng.rand(b, h, w, cin), dt)
        v = blk.init(jax.random.PRNGKey(i), xin, train=False)
        f = jax.jit(lambda xx, blk=blk, v=v: blk.apply(v, xx, train=False))
        t = chain_time(f, xin)
        flops = 2 * 9 * cin * cout * h * w * b + \
            2 * 9 * cout * cout * h * w * b * (layers - 1)
        print(f"block{i} ({h}x{w} c{cin}->c{cout} x{layers}): "
              f"{t * 1e3:8.2f} ms ({flops / t / 1e12:.0f} TF/s)")

    # ConvTranspose vs pixel-shuffle matmul at the block-2 upsample
    h, w, cin, cout, s = ny // 4, nx // 4, 128, 128, 2
    xin = jnp.asarray(rng.rand(b, h, w, cin), dt)
    ct = nn.ConvTranspose(cout, (s, s), strides=(s, s), use_bias=False,
                          dtype=dt)
    vct = ct.init(jax.random.PRNGKey(9), xin)
    t = chain_time(jax.jit(lambda xx: ct.apply(vct, xx)), xin)
    fl = 2 * s * s * cin * cout * h * w * b
    print(f"ConvTranspose s{s} ({h}x{w} c{cin}->c{cout}): "
          f"{t * 1e3:8.2f} ms ({fl / t / 1e12:.0f} TF/s)")

    k = vct["params"]["kernel"][::-1, ::-1]  # flax flips spatially
    km = jnp.transpose(k, (2, 0, 1, 3)).reshape(cin, s * s * cout).astype(dt)

    @jax.jit
    def pixel_shuffle(xx):
        y = xx @ km  # (b, h, w, s*s*cout)
        y = y.reshape(b, h, w, s, s, cout)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
        return y.reshape(b, h * s, w * s, cout)

    t = chain_time(pixel_shuffle, xin)
    print(f"pixel-shuffle eq.: {t * 1e3:8.2f} ms ({fl / t / 1e12:.0f} TF/s)")
    # correctness
    d = float(jnp.max(jnp.abs(
        (ct.apply(vct, xin) - pixel_shuffle(xin)).astype(jnp.float32)
    )))
    print(f"  max |diff| = {d:.2e}")

    # lane occupancy: C=64 vs C=128 3x3 conv at block-1 shape
    for cc in (64, 128):
        conv = nn.Conv(cc, (3, 3), padding="SAME", use_bias=False, dtype=dt)
        xin = jnp.asarray(rng.rand(b, ny // 2, nx // 2, cc), dt)
        v = conv.init(jax.random.PRNGKey(cc), xin)
        t = chain_time(jax.jit(lambda xx, v=v, conv=conv: conv.apply(v, xx)),
                       xin)
        fl = 2 * 9 * cc * cc * (ny // 2) * (nx // 2) * b
        print(f"3x3 conv c{cc}: {t * 1e3:8.2f} ms ({fl / t / 1e12:.0f} TF/s)")


if __name__ == "__main__":
    main()
