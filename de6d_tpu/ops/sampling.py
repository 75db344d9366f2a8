"""Point sampling kernels: farthest-point-sampling family.

TPU-native replacement for the reference CUDA samplers
(/root/reference/core/pcdet/ops/pointnet2/pointnet2_batch/src/sampling_gpu.cu):

- ``farthest_point_sample``            ≙ farthest_point_sampling_kernel (:102)
- ``matrix_farthest_point_sample``     ≙ furthest_point_sampling_matrix_kernel (:269), f-fps
- ``weighted_farthest_point_sample``   ≙ furthest_point_sampling_weights_kernel (:420), s-fps

Semantics match the CUDA kernels exactly:
- plain/matrix FPS seed with index 0; weighted FPS seeds with
  argmax(weight);
- weighted FPS scores candidates by ``min_dist * max(w, 1e-12)`` but
  updates the running min-distance unweighted.

Design: the npoint loop is inherently sequential; each step is a fully
vectorized distance update + argmax over the (padded) point dim — the
classic TPU FPS pattern. Under jit it compiles to a single fori_loop
whose body is pure VPU work. Batch dim via vmap. Fixed shapes + a
validity mask replace the reference's ragged "stack" API
(pointnet2_stack/src/sampling_gpu.cu:188-348): invalid slots carry a
sentinel key and are never selected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INF = 1e10


def _fps_loop(npoint, n, init_last, init_key_fn, dist_fn, valid):
    """Shared FPS skeleton for one sample.

    dist_fn(last_idx) -> (N,) squared distances to the last pick.
    init_key_fn(min_dist) -> selection key per step.
    """
    min_dist0 = jnp.where(valid, INF, -1.0)
    idxs0 = jnp.zeros((npoint,), dtype=jnp.int32).at[0].set(init_last)

    def body(j, state):
        min_dist, idxs, last = state
        d = dist_fn(last)
        min_dist = jnp.where(valid, jnp.minimum(min_dist, d), -1.0)
        key = init_key_fn(min_dist)
        nxt = jnp.argmax(key).astype(jnp.int32)
        return min_dist, idxs.at[j].set(nxt), nxt

    _, idxs, _ = jax.lax.fori_loop(
        1, npoint, body, (min_dist0, idxs0, init_last)
    )
    return idxs


def _use_pallas_fps() -> bool:
    # whole-loop-in-one-kernel Pallas FPS on TPU (each fori_loop
    # iteration otherwise pays ~O(100 µs) launch overhead — a Det6D
    # forward runs 5.6k sequential picks); jnp path elsewhere and as
    # the bit-parity oracle
    return jax.default_backend() == "tpu"


@functools.partial(jax.jit, static_argnames=("npoint",))
def _farthest_point_sample_jnp(xyz, npoint: int, valid_mask):
    b, n, _ = xyz.shape

    def single(xyz_i, valid_i):
        def dist_fn(last):
            diff = xyz_i - xyz_i[last]
            return jnp.sum(diff * diff, axis=-1)

        return _fps_loop(
            npoint, n, jnp.int32(0), lambda md: md, dist_fn, valid_i
        )

    return jax.vmap(single)(xyz, valid_mask)


def farthest_point_sample(xyz, npoint: int, valid_mask=None):
    """(B, N, 3) → (B, npoint) int32 indices. Seeds at index 0
    (CUDA parity). Invalid points are never selected (given enough
    valid points)."""
    b, n, _ = xyz.shape
    if valid_mask is None:
        valid_mask = jnp.ones((b, n), dtype=bool)
    if _use_pallas_fps():
        from .pallas.fps import fps_pallas

        # indices are discrete — no gradient flows through pick
        # computation on the jnp path either (argmax has none);
        # stop_gradient lets autodiff skip the pallas_call
        return fps_pallas(
            jax.lax.stop_gradient(xyz), valid_mask, npoint
        )
    return _farthest_point_sample_jnp(xyz, npoint, valid_mask)


@functools.partial(jax.jit, static_argnames=("npoint",))
def _weighted_farthest_point_sample_jnp(xyz, weights, npoint: int,
                                        valid_mask):
    b, n, _ = xyz.shape

    def single(xyz_i, w_i, valid_i):
        w_eff = jnp.maximum(w_i, 1e-12)
        seed = jnp.argmax(jnp.where(valid_i, w_i, -INF)).astype(jnp.int32)

        def dist_fn(last):
            diff = xyz_i - xyz_i[last]
            return jnp.sum(diff * diff, axis=-1)

        def key_fn(md):
            return jnp.where(md >= 0, md * w_eff, md)

        return _fps_loop(npoint, n, seed, key_fn, dist_fn, valid_i)

    return jax.vmap(single)(xyz, weights, valid_mask)


def weighted_farthest_point_sample(xyz, weights, npoint: int, valid_mask=None):
    """s-fps: semantics-weighted FPS (SASA). (B, N, 3), (B, N) →
    (B, npoint). Seeds with argmax(weight)."""
    b, n, _ = xyz.shape
    if valid_mask is None:
        valid_mask = jnp.ones((b, n), dtype=bool)
    if _use_pallas_fps():
        from .pallas.fps import fps_pallas

        return fps_pallas(
            jax.lax.stop_gradient(xyz), valid_mask, npoint,
            weights=jax.lax.stop_gradient(weights), weighted=True,
        )
    return _weighted_farthest_point_sample_jnp(xyz, weights, npoint,
                                               valid_mask)


@functools.partial(jax.jit, static_argnames=("npoint",))
def _matrix_farthest_point_sample_jnp(dist_matrix, npoint: int, valid_mask):
    b, n, _ = dist_matrix.shape

    def single(dm, valid_i):
        return _fps_loop(
            npoint, n, jnp.int32(0), lambda md: md, lambda last: dm[last],
            valid_i,
        )

    return jax.vmap(single)(dist_matrix, valid_mask)


def matrix_farthest_point_sample(dist_matrix, npoint: int, valid_mask=None):
    """f-fps: FPS over a precomputed (B, N, N) distance matrix."""
    b, n, _ = dist_matrix.shape
    if valid_mask is None:
        valid_mask = jnp.ones((b, n), dtype=bool)
    if _use_pallas_fps():
        from .pallas.fps import matrix_fps_pallas

        return matrix_fps_pallas(
            jax.lax.stop_gradient(dist_matrix), valid_mask, npoint
        )
    return _matrix_farthest_point_sample_jnp(dist_matrix, npoint, valid_mask)


def calc_dist_matrix_for_sampling(xyz, features=None, gamma: float = 1.0):
    """Fused xyz+feature distance matrix for f-fps (parity:
    pointnet2_batch/pointnet2_utils.py:37-47 calc_dist_matrix_for_sampling:
    ``dist = dist_xyz + gamma * dist_feature``, both squared euclidean).

    xyz: (B, N, 3); features: (B, N, C) or None → (B, N, N).
    """

    def sqdist(a):
        # |x|^2 + |y|^2 - 2 x.y — the cross term rides the MXU
        norm = jnp.sum(a * a, axis=-1)
        cross = jnp.einsum(
            "bnc,bmc->bnm", a, a, precision=jax.lax.Precision.HIGHEST
        )
        d = norm[:, :, None] + norm[:, None, :] - 2 * cross
        return jnp.maximum(d, 0.0)

    dist = sqdist(xyz)
    if features is not None:
        dist = dist + gamma * sqdist(features)
    return dist


def sample_top_k_by_score(scores, npoint: int, valid_mask=None):
    """c-fps / ctr-aware sampling: top-npoint indices by score
    (parity: pointnet2_modules.py:425-430)."""
    if valid_mask is not None:
        scores = jnp.where(valid_mask, scores, -INF)
    _, idx = jax.lax.top_k(scores, npoint)
    return idx.astype(jnp.int32)


def gather_points(points, idx):
    """points: (B, N, C), idx: (B, M) → (B, M, C). Replaces
    gather_points_kernel (+grad is automatic via jnp autodiff)."""
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)
