"""Load the REFERENCE KITTI/SlopedKITTI eval implementations from
/root/reference as importable modules, with numba stubbed out (pure-
python execution) and the CUDA rotated-IoU kernel replaced by this
repo's numpy implementation (itself oracle-tested bit-identical to the
reference kernel's construction).

This lets the test suite cross-validate our vectorized eval protocol
against the reference's own matching/AP/score logic on identical
inputs — NOT against a re-implementation in the same repo.
"""

from __future__ import annotations

import importlib.util
import sys
import types

REF_KITTI = (
    "/root/reference/core/pcdet/datasets/kitti/kitti_object_eval_python"
)
REF_SLOPED = (
    "/root/reference/core/pcdet/datasets/slopedkitti/"
    "kitti_object_eval_python"
)


def _numba_stub():
    numba = types.ModuleType("numba")

    def jit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]
        return lambda f: f

    numba.jit = jit
    numba.njit = jit
    numba.prange = range
    return numba


def _rotate_iou_shim():
    from de6d_tpu.datasets.eval.rotate_iou_np import rotate_iou_matrix

    mod = types.ModuleType("rotate_iou")

    def rotate_iou_gpu_eval(boxes, query_boxes, criterion=-1, device_id=0):
        import numpy as np

        return rotate_iou_matrix(
            np.asarray(boxes, np.float64),
            np.asarray(query_boxes, np.float64),
            int(criterion),
        )

    mod.rotate_iou_gpu_eval = rotate_iou_gpu_eval
    return mod


def load_reference_eval(which: str):
    """which: 'kitti' | 'slopedkitti' → the reference eval module."""
    base = REF_KITTI if which == "kitti" else REF_SLOPED
    pkg_name = f"ref_eval_{which}"
    if f"{pkg_name}.eval" in sys.modules:
        return sys.modules[f"{pkg_name}.eval"]

    if "numba" not in sys.modules:
        sys.modules["numba"] = _numba_stub()

    pkg = types.ModuleType(pkg_name)
    pkg.__path__ = [base]
    sys.modules[pkg_name] = pkg
    sys.modules[f"{pkg_name}.rotate_iou"] = _rotate_iou_shim()

    spec = importlib.util.spec_from_file_location(
        f"{pkg_name}.eval", f"{base}/eval.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"{pkg_name}.eval"] = mod
    spec.loader.exec_module(mod)
    return mod
