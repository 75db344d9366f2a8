"""Streaming single-frame inference driver.

TPU-native equivalent of the reference's ROS detection node
(sim/gazebo/src/detection/script/detection.py:109-197: subscribe
PointCloud2 → prepare → forward → publish markers, per-frame latency
print) — without the ROS/Gazebo dependency: a `StreamingDetector` you
feed raw (N, 3|4) clouds and get fixed-latency detections back.

Double buffering (BASELINE.json north-star): JAX dispatch is async, so
``submit()`` returns immediately after enqueueing frame t while frame
t−1 is still on device; ``result()`` blocks only on the oldest
in-flight frame. Host preprocessing of frame t+1 overlaps device
compute of frame t.
"""

from __future__ import annotations

import collections
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models.detectors.detector3d_template import post_processing


class StreamingDetector:
    def __init__(self, model, variables, model_cfg, num_class: int,
                 max_points: int = 16384, depth: int = 2):
        self.model = model
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.max_points = max_points
        self.depth = depth
        self._queue: collections.deque = collections.deque()
        self._ready: collections.deque = collections.deque()
        post_cfg = model_cfg["POST_PROCESSING"]

        @jax.jit
        def infer(params, stats, points, mask):
            bd = {"points": points[None], "points_mask": mask[None]}
            v = {"params": params}
            if stats:
                v["batch_stats"] = stats
            out = self.model.apply(v, bd, train=False)
            post = post_processing(out, post_cfg, num_class)
            return (
                post["pred_boxes"][0],
                post["pred_scores"][0],
                post["pred_labels"][0],
                post["pred_count"][0],
            )

        self._infer = infer

    def _prepare(self, points: np.ndarray):
        n = points.shape[0]
        if points.shape[1] == 3:
            points = np.concatenate(
                [points, np.zeros((n, 1), points.dtype)], axis=1
            )
        if n >= self.max_points:
            sel = np.random.choice(n, self.max_points, replace=False)
            buf = points[sel]
            n = self.max_points
        else:
            buf = np.concatenate(
                [points,
                 np.zeros((self.max_points - n, points.shape[1]),
                          points.dtype)],
            )
        mask = np.arange(self.max_points) < n
        return buf.astype(np.float32), mask

    def submit(self, points: np.ndarray):
        """Enqueue a frame; returns immediately (async dispatch)."""
        buf, mask = self._prepare(points)
        t0 = time.perf_counter()
        out = self._infer(
            self.params, self.batch_stats, jnp.asarray(buf), jnp.asarray(mask)
        )
        self._queue.append((t0, out))
        # keep at most `depth` frames in flight; completed frames are
        # stashed for result() so nothing is dropped
        while len(self._queue) > self.depth:
            self._ready.append(self._drain_one())

    def _drain_one(self):
        t0, (boxes, scores, labels, count) = self._queue.popleft()
        count = int(count)
        latency = time.perf_counter() - t0
        return {
            "boxes": np.asarray(boxes)[:count],
            "scores": np.asarray(scores)[:count],
            "labels": np.asarray(labels)[:count],
            "latency_s": latency,
        }

    def result(self):
        """Return the oldest completed frame, blocking on the device if
        necessary; None when nothing is pending."""
        if self._ready:
            return self._ready.popleft()
        if not self._queue:
            return None
        return self._drain_one()

    def detect(self, points: np.ndarray):
        """Synchronous convenience: submit + drain everything."""
        self.submit(points)
        out = None
        while True:
            r = self.result()
            if r is None:
                break
            out = r
        return out
