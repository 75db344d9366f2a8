"""Ball query, grouping and 3-NN interpolation — vectorized XLA.

TPU-native replacement for the reference CUDA kernels
(/root/reference/core/pcdet/ops/pointnet2/pointnet2_batch/src/
 ball_query_gpu.cu, group_points_gpu.cu, interpolate_gpu.cu).

Parity notes (ball_query_kernel_fast, :15-51):
- selects the FIRST ``nsample`` points (in point order) with
  d² < radius², pads remaining slots with the first hit, zero if no
  hit — we reproduce this exactly via a smallest-k selection on the
  key ``where(in_ball, point_index, N)``.
- the dilated variant (:53-90) uses an annulus [r_in, r_out) and also
  returns per-center hit counts (capped at nsample), used by
  QueryWithCntAndGroup to mask empty balls
  (pointnet2_modules.py:463-467).

Design: pairwise distances are computed as |c|² + |p|² − 2c·p so the
cross term is an MXU matmul; the center dim is processed in chunks via
lax.map so the (M, N) distance tile never exceeds a few MB of VMEM-
friendly scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST
INF = 1e10


def _pairwise_sqdist(a, b):
    """(M, 3) x (N, 3) → (M, N) squared euclidean distance."""
    na = jnp.sum(a * a, axis=-1)
    nb = jnp.sum(b * b, axis=-1)
    cross = jnp.dot(a, b.T, precision=_HI)
    return jnp.maximum(na[:, None] + nb[None, :] - 2.0 * cross, 0.0)


@functools.partial(
    jax.jit, static_argnames=("nsample", "center_chunk")
)
def ball_query(
    xyz,
    new_xyz,
    radius: float,
    nsample: int,
    valid_mask=None,
    new_valid_mask=None,
    radius_in: float = 0.0,
    center_chunk: int = 512,
):
    """Args:
        xyz: (B, N, 3) source points.
        new_xyz: (B, M, 3) query centers.
        radius / radius_in: outer/inner radius (annulus if radius_in>0).
        nsample: group size.
        valid_mask: (B, N) optional source validity.
        new_valid_mask: (B, M) optional center validity.

    Returns:
        idx: (B, M, nsample) int32 — first hits, padded with hit 0.
        cnt: (B, M) int32 — hits (≤ nsample); 0 for invalid centers.
    """
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    r2_out = radius * radius
    r2_in = radius_in * radius_in

    if valid_mask is None:
        valid_mask = jnp.ones((b, n), dtype=bool)
    if new_valid_mask is None:
        new_valid_mask = jnp.ones((b, m), dtype=bool)

    chunk = min(center_chunk, m)
    pad = (-m) % chunk

    def single(xyz_i, new_xyz_i, valid_i, new_valid_i):
        centers = jnp.pad(new_xyz_i, ((0, pad), (0, 0)))
        cvalid = jnp.pad(new_valid_i, (0, pad))
        centers = centers.reshape(-1, chunk, 3)
        cvalid = cvalid.reshape(-1, chunk)

        def per_chunk(args):
            c, cv = args
            d2 = _pairwise_sqdist(c, xyz_i)  # (chunk, N)
            in_ball = (
                (d2 < r2_out) & (d2 >= r2_in) & valid_i[None, :] & cv[:, None]
            )
            # First-k hits WITHOUT a sort: the inclusive hit-rank
            # cumsum is nondecreasing per row, so the k-th hit position
            # is searchsorted(rank, k) — K·log2(N) batched gathers
            # instead of a full (chunk, N) top_k sort (which measured
            # ~40x slower at SA1 scale: 16384 source points, k=64).
            # The cumsum is the traffic hot spot (log-depth passes over
            # a (chunk, N) tile); ranks are bounded by N, so i16 halves
            # the bytes whenever N < 2^15 (exact — integer math).
            rank_t = jnp.int16 if n < 2**15 else jnp.int32
            rank = jnp.cumsum(in_ball.astype(rank_t), axis=-1)
            ks = jnp.arange(1, nsample + 1, dtype=rank_t)
            # unrolled vectorized binary search: searchsorted-left of k
            # in each row's rank (jnp.searchsorted vmaps poorly here)
            rows = rank.shape[0]
            lo = jnp.zeros((rows, nsample), jnp.int32)
            hi = jnp.full((rows, nsample), n, jnp.int32)
            # iterations to converge from interval size n:
            # T(s) = 1 + T(floor(s/2)) => T(n) = n.bit_length().
            # ((n-1).bit_length() is one short when n is a power of
            # two — the terminal lo cell went untested and first-hits
            # landing there came back off by one.)
            for _ in range(max(1, n.bit_length())):
                mid = (lo + hi) >> 1
                rv = jnp.take_along_axis(rank, mid, axis=-1)
                go_right = rv < ks[None, :]
                lo = jnp.where(go_right, mid + 1, lo)
                hi = jnp.where(go_right, hi, mid)
            first_idx = hi  # (chunk, nsample), n = miss
            found = first_idx < n
            cnt = jnp.minimum(rank[:, -1], nsample).astype(jnp.int32)
            fill = jnp.where(cnt > 0, first_idx[:, 0], 0)
            idx = jnp.where(found, first_idx, fill[:, None])
            return idx.astype(jnp.int32), cnt

        idx, cnt = jax.lax.map(per_chunk, (centers, cvalid))
        return idx.reshape(-1, nsample)[:m], cnt.reshape(-1)[:m]

    return jax.vmap(single)(xyz, new_xyz, valid_mask, new_valid_mask)


def group_points(features, idx):
    """features: (B, N, C), idx: (B, M, ns) → (B, M, ns, C).
    Replaces group_points_kernel_fast (+grad via autodiff scatter-add)."""
    b, _, c = features.shape
    m, ns = idx.shape[1], idx.shape[2]
    flat = idx.reshape(b, m * ns)
    out = jnp.take_along_axis(
        features, flat[..., None].astype(jnp.int32), axis=1
    )
    return out.reshape(b, m, ns, c)


def query_and_group(
    xyz,
    new_xyz,
    features,
    radius: float,
    nsample: int,
    valid_mask=None,
    new_valid_mask=None,
    radius_in: float = 0.0,
    use_xyz: bool = True,
):
    """QueryAndGroup / QueryWithCntAndGroup parity
    (pointnet2_utils.py:354-463): ball query + relative-xyz grouping.

    Returns (grouped (B, M, ns, 3+C | C), cnt (B, M)).
    """
    idx, cnt = ball_query(
        xyz, new_xyz, radius, nsample, valid_mask, new_valid_mask, radius_in
    )
    return group_with_idx(xyz, new_xyz, features, idx, use_xyz), cnt


def group_with_idx(xyz, new_xyz, features, idx, use_xyz: bool = True):
    """Relative-xyz grouping for precomputed ball-query indices
    (the grouping half of query_and_group; callers with a shared
    multi-scale query — ops.binned.binned_msg_query — reuse it)."""
    if features is not None and use_xyz:
        # ONE wide gather of concat[xyz, feat] instead of two narrow
        # ones: TPU row-gather cost scales with row COUNT, not bytes
        # (cell-granularity lesson, detector3d_template.py), and the
        # SA1-scale gather is ~170 ms/call for 2M rows on the tunnel
        # chip. Bit-identical: the center subtraction commutes with
        # the gather split.
        src = jnp.concatenate([xyz, features], axis=-1)
        g = group_points(src, idx)
        grouped_xyz = g[..., :3] - new_xyz[:, :, None, :]
        grouped = jnp.concatenate([grouped_xyz, g[..., 3:]], axis=-1)
    elif features is not None:
        grouped = group_points(features, idx)
    else:
        grouped = group_points(xyz, idx) - new_xyz[:, :, None, :]
    return grouped


@functools.partial(jax.jit, static_argnames=("center_chunk",))
def three_nn(unknown, known, valid_mask=None, center_chunk: int = 1024):
    """Brute-force 3-NN (interpolate_gpu.cu three_nn_kernel_fast parity).

    unknown: (B, M, 3) query points; known: (B, N, 3).
    Returns dist (B, M, 3) sqrt-distances and idx (B, M, 3) int32.
    """
    b, n, _ = known.shape
    m = unknown.shape[1]
    if valid_mask is None:
        valid_mask = jnp.ones((b, n), dtype=bool)
    chunk = min(center_chunk, m)
    pad = (-m) % chunk

    def single(unk, kn, valid_i):
        q = jnp.pad(unk, ((0, pad), (0, 0))).reshape(-1, chunk, 3)

        def per_chunk(c):
            d2 = _pairwise_sqdist(c, kn)
            d2 = jnp.where(valid_i[None, :], d2, INF)
            # 3 masked argmin passes instead of a full-row top_k sort
            # (k=3 << N; argmin takes the first occurrence on ties,
            # matching stable top_k order)
            dists, idxs = [], []
            cols = jnp.arange(d2.shape[-1])
            for _ in range(3):
                i = jnp.argmin(d2, axis=-1)
                dists.append(jnp.take_along_axis(d2, i[:, None], -1)[:, 0])
                idxs.append(i.astype(jnp.int32))
                d2 = jnp.where(cols[None, :] == i[:, None], INF, d2)
            dist = jnp.stack(dists, axis=-1)
            idx = jnp.stack(idxs, axis=-1)
            return jnp.sqrt(jnp.maximum(dist, 0.0)), idx

        dist, idx = jax.lax.map(per_chunk, q)
        return dist.reshape(-1, 3)[:m], idx.reshape(-1, 3)[:m]

    return jax.vmap(single)(unknown, known, valid_mask)


def three_interpolate(features, idx, weight):
    """features: (B, N, C); idx/weight: (B, M, 3) → (B, M, C).
    Parity: three_interpolate_kernel_fast (+grad via autodiff)."""
    gathered = group_points(features, idx)  # (B, M, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=2)


def three_nn_interpolate_weights(dist):
    """Inverse-distance weights used by FP layers
    (pointnet2_modules.py FP forward): w = (1/d) / Σ(1/d)."""
    recip = 1.0 / jnp.maximum(dist, 1e-8)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)
