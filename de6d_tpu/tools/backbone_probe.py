"""BEV backbone stage-split micro-bench on the real chip.

The r2 split charges ~2.0 ms/scan to backbone+head for ~65 GF bf16 —
~3x off the v5e roofline. This probe times cumulative prefixes of
BaseBEVBackbone (KITTI PointPillars shape: 8x496x432x64 bf16) plus
deconv-vs-resize alternatives to localize the inefficiency:

  p1  block1 (stride2 conv + 3 convs, C64)
  p2  + up1 (ConvTranspose k2 s2 C128)
  p3  + block2 (stride2 + 5 convs, C128)
  p4  + up2 (ConvTranspose k2 s2 C128)
  p5  + block3 (stride2 + 5 convs, C256)
  p6  full backbone (+ up3 k4 s4 + concat)
  alt deconv k2s2 -> reshape depth-to-space matmul

Chained-dependency protocol throughout (STATUS.md).

Usage: python -m de6d_tpu.tools.backbone_probe
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from de6d_tpu.models.backbones_2d.base_bev_backbone import ConvBlock

    B, NY, NX, C = 8, 496, 432, 64
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(B, NY, NX, C), dt)

    class Prefix(nn.Module):
        upto: int  # 1..6

        @nn.compact
        def __call__(self, x):
            train = False
            outs = []
            x = ConvBlock(64, 2, 3, dtype=dt)(x, train)
            if self.upto >= 2:
                u = nn.ConvTranspose(128, (2, 2), strides=(2, 2),
                                     use_bias=False, dtype=dt)(x)
                u = nn.BatchNorm(use_running_average=True, momentum=0.99,
                                 epsilon=1e-3, dtype=dt)(u)
                outs.append(nn.relu(u))
            if self.upto >= 3:
                x = ConvBlock(128, 2, 5, dtype=dt)(x, train)
            if self.upto >= 4:
                u = nn.ConvTranspose(128, (2, 2), strides=(2, 2),
                                     use_bias=False, dtype=dt)(x)
                u = nn.BatchNorm(use_running_average=True, momentum=0.99,
                                 epsilon=1e-3, dtype=dt)(u)
                outs.append(nn.relu(u))
            if self.upto >= 5:
                x = ConvBlock(256, 2, 5, dtype=dt)(x, train)
            if self.upto >= 6:
                u = nn.ConvTranspose(128, (4, 4), strides=(4, 4),
                                     use_bias=False, dtype=dt)(x)
                u = nn.BatchNorm(use_running_average=True, momentum=0.99,
                                 epsilon=1e-3, dtype=dt)(u)
                outs.append(nn.relu(u))
                return jnp.concatenate(outs, axis=-1)
            return x if not outs else (x, *outs)

    def timed(fn, x, label):
        @jax.jit
        def chain(x, out):
            leaf = out
            while isinstance(leaf, (tuple, list)):
                leaf = leaf[0]
            eps = (leaf[0, 0, 0, 0].astype(jnp.float32) * 1e-9
                   + 1e-3).astype(x.dtype)
            return x + eps

        out = fn(x)
        x = chain(x, out)
        leaf = out
        while isinstance(leaf, (tuple, list)):
            leaf = leaf[0]
        np.asarray(leaf[0, 0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(x)
            x = chain(x, out)
        leaf = out
        while isinstance(leaf, (tuple, list)):
            leaf = leaf[0]
        np.asarray(leaf[0, 0, 0, 0])
        ms = (time.perf_counter() - t0) / 20 * 1e3
        print(f"  {label}: {ms:7.2f} ms/batch ({ms/B:5.3f} ms/scan)",
              flush=True)
        return ms

    print(f"backend={jax.default_backend()} input {x0.shape} {dt}",
          flush=True)
    prev = 0.0
    for upto, label in ((1, "p1 block1"), (2, "p2 +up1"), (3, "p3 +block2"),
                        (4, "p4 +up2"), (5, "p5 +block3"), (6, "p6 full")):
        mod = Prefix(upto=upto)
        var = jax.jit(mod.init)(jax.random.PRNGKey(0), x0)
        fn = jax.jit(lambda v, x: mod.apply(v, x))
        ms = timed(lambda x: fn(var, x), x0, label)
        print(f"      delta vs prev: {ms - prev:+.2f} ms", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
