"""de6d_tpu — TPU-native (JAX/XLA/Pallas) LiDAR 3D detection framework.

A brand-new framework with the capabilities of HITSZ-NRSL/De6D (Det6D,
an OpenPCDet fork): full-pose (6-DoF) 3D detection on sloped terrain,
plus the OpenPCDet detector zoo spine — redesigned TPU-first:

- fixed shapes + validity masks everywhere (no ragged tensors),
- pure-XLA / Pallas compute kernels (no CUDA),
- SPMD data parallelism via jax.sharding over a device Mesh,
- yaml-driven model/dataset composition compatible with the
  reference's config schema (reference: /root/reference/core/pcdet).
"""

from .version import __version__

__all__ = ["__version__"]
