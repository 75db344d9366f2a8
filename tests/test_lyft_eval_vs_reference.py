"""Cross-validate the Lyft mAP protocol against the REFERENCE
implementation (lyft_mAP_eval/lyft_eval.py) executed pure-python from
/root/reference with minimal stand-ins for its pyquaternion/shapely
imports (absent from this image). Same trick as
test_eval_vs_reference.py for the KITTI protocol: the reference's own
code is the oracle, so the re-derivation can't silently drift."""

import importlib.util
import math
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path(
    "/root/reference/core/pcdet/datasets/lyft/lyft_mAP_eval/lyft_eval.py"
)


class _Quaternion:
    def __init__(self, elements):
        self.elements = list(elements)

    @property
    def rotation_matrix(self):
        w, x, y, z = self.elements
        n = w * w + x * x + y * y + z * z
        s = 0.0 if n == 0 else 2.0 / n
        return np.array([
            [1 - s * (y * y + z * z), s * (x * y - z * w), s * (x * z + y * w)],
            [s * (x * y + z * w), 1 - s * (x * x + z * z), s * (y * z - x * w)],
            [s * (x * z - y * w), s * (y * z + x * w), 1 - s * (x * x + y * y)],
        ])


class _Polygon:
    """Convex polygon with Sutherland–Hodgman intersection — enough
    surface for the reference's ground_bbox_coords usage."""

    def __init__(self, pts):
        pts = [tuple(p) for p in pts]
        if len(pts) > 1 and pts[0] == pts[-1]:
            pts = pts[:-1]
        # normalize to CCW
        if self._signed_area(pts) < 0:
            pts = pts[::-1]
        self.pts = pts

    @staticmethod
    def _signed_area(pts):
        a = 0.0
        for i in range(len(pts)):
            x0, y0 = pts[i]
            x1, y1 = pts[(i + 1) % len(pts)]
            a += x0 * y1 - x1 * y0
        return a / 2.0

    @property
    def area(self):
        return abs(self._signed_area(self.pts))

    def intersection(self, other):
        out = list(self.pts)
        clip = other.pts
        for i in range(len(clip)):
            if not out:
                break
            a, b = clip[i], clip[(i + 1) % len(clip)]

            def inside(p):
                return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (
                    p[0] - a[0]
                ) >= -1e-12

            def inter(p, q):
                dc = (a[0] - b[0], a[1] - b[1])
                dp = (p[0] - q[0], p[1] - q[1])
                n1 = a[0] * b[1] - a[1] * b[0]
                n2 = p[0] * q[1] - p[1] * q[0]
                den = dc[0] * dp[1] - dc[1] * dp[0]
                return (
                    (n1 * dp[0] - n2 * dc[0]) / den,
                    (n1 * dp[1] - n2 * dc[1]) / den,
                )

            nxt = []
            for j in range(len(out)):
                p, q = out[j], out[(j + 1) % len(out)]
                pin, qin = inside(p), inside(q)
                if pin:
                    nxt.append(p)
                    if not qin:
                        nxt.append(inter(p, q))
                elif qin:
                    nxt.append(inter(p, q))
            out = nxt
        return _Polygon(out) if len(out) >= 3 else _EmptyPoly()


class _EmptyPoly:
    area = 0.0


@pytest.fixture(scope="module")
def ref_mod():
    if not REF.exists():
        pytest.skip("reference tree unavailable")
    pq = types.ModuleType("pyquaternion")
    pq.Quaternion = _Quaternion
    sh = types.ModuleType("shapely")
    shg = types.ModuleType("shapely.geometry")
    shg.Polygon = _Polygon
    sh.geometry = shg
    saved = {
        k: sys.modules.get(k)
        for k in ("pyquaternion", "shapely", "shapely.geometry")
    }
    sys.modules["pyquaternion"] = pq
    sys.modules["shapely"] = sh
    sys.modules["shapely.geometry"] = shg
    try:
        spec = importlib.util.spec_from_file_location("ref_lyft_eval", REF)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _random_boxes(rng, n, tokens, names, with_score):
    out = []
    for _ in range(n):
        yaw = rng.uniform(-math.pi, math.pi)
        d = {
            "sample_token": str(rng.choice(tokens)),
            "translation": [
                float(rng.uniform(-20, 20)), float(rng.uniform(-20, 20)),
                float(rng.uniform(-2, 0)),
            ],
            "size": [
                float(rng.uniform(1.5, 2.1)), float(rng.uniform(3.5, 5.0)),
                float(rng.uniform(1.4, 1.9)),
            ],
            "rotation": [math.cos(yaw / 2), 0.0, 0.0, math.sin(yaw / 2)],
            "name": str(rng.choice(names)),
        }
        if with_score:
            d["score"] = float(rng.uniform(0, 1))
        out.append(d)
    return out


def _jittered(gt, rng, keep=0.8):
    dets = []
    for g in gt:
        if rng.rand() > keep:
            continue
        d = dict(g)
        d["translation"] = [
            t + float(rng.normal(0, 0.3)) for t in g["translation"]
        ]
        d["size"] = [s * float(rng.uniform(0.9, 1.1)) for s in g["size"]]
        d["score"] = float(rng.uniform(0.3, 1.0))
        dets.append(d)
    return dets


def test_ap_matches_reference(ref_mod):
    from de6d_tpu.datasets.lyft.lyft_eval_np import get_average_precisions

    rng = np.random.RandomState(7)
    tokens = [f"tok{i}" for i in range(6)]
    names = ["car", "truck", "pedestrian"]
    gt = _random_boxes(rng, 60, tokens, names, with_score=False)
    dets = _jittered(gt, rng) + _random_boxes(
        rng, 15, tokens, names, with_score=True
    )
    ious = [0.5, 0.6, 0.7]
    ours = get_average_precisions(gt, dets, names, ious)
    theirs = ref_mod.get_average_precisions(gt, dets, names, ious)
    np.testing.assert_allclose(ours, theirs, atol=1e-9)
    assert ours.max() > 0.2  # non-degenerate fixture


def test_ap_matches_reference_exact_dets(ref_mod):
    from de6d_tpu.datasets.lyft.lyft_eval_np import get_average_precisions

    rng = np.random.RandomState(11)
    tokens = [f"s{i}" for i in range(3)]
    gt = _random_boxes(rng, 20, tokens, ["car"], with_score=False)
    dets = []
    for g in gt:
        d = dict(g)
        d["score"] = float(rng.uniform(0, 1))
        dets.append(d)
    ours = get_average_precisions(gt, dets, ["car"], [0.5, 0.9])
    theirs = ref_mod.get_average_precisions(gt, dets, ["car"], [0.5, 0.9])
    np.testing.assert_allclose(ours, theirs, atol=1e-9)
    assert ours[0] > 0.95
