"""Compute-dtype plumbing (bf16 inference/training on the MXU).

The reference runs everything in fp32 CUDA; on TPU the matmul/conv
path should run in bfloat16 (MXU native) with fp32 parameters and
fp32 geometry/decode math. Opt in per model with

    MODEL:
      COMPUTE_DTYPE: bfloat16

The detector template injects the choice into each module-slot cfg as
``_COMPUTE_DTYPE``; modules read it via :func:`compute_dtype` and pass
it as flax ``dtype`` (params stay fp32 via ``param_dtype``). Heads must
cast their raw predictions back to fp32 before decode/NMS.
"""

from __future__ import annotations

import jax.numpy as jnp

_DTYPES = {
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
}


def compute_dtype(model_cfg) -> jnp.dtype:
    """Compute dtype for a module-slot cfg (default fp32).

    Unknown names raise instead of silently training fp32 — a typo'd
    COMPUTE_DTYPE should fail loudly at build time.
    """
    name = str(model_cfg.get("_COMPUTE_DTYPE", "float32")).lower()
    if name not in _DTYPES:
        raise ValueError(
            f"Unknown COMPUTE_DTYPE {name!r}; expected one of {sorted(_DTYPES)}"
        )
    return _DTYPES[name]
