"""Point-axis sharding for dense scans.

SURVEY §5.7: this codebase has no attention, so the honest equivalent
of sequence parallelism is making the POINT dimension a shardable
axis, letting very dense scans (Waymo ~180k points) split across
chips. The reference handles density only algorithmically (FPS
budgets, `sample_points`); here the grouping stage — the O(M·N)
pairwise work that dominates a dense SA layer — runs under
``shard_map`` with the query axis sharded and the support set
replicated, so each chip computes an M/n_dev slice with zero
collectives and bit-identical numerics to the unsharded op.

Composition with data parallelism: use a 2-D mesh
``Mesh(devices.reshape(dp, pp), ('data', 'points'))`` and the same
specs — batch on 'data', queries on 'points'.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.ball_query import ball_query, query_and_group, three_nn

POINT_AXIS = "points"


def make_point_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (POINT_AXIS,))


def _pad_queries(m: int, n_shards: int) -> int:
    return (-m) % n_shards


def sharded_ball_query(mesh, xyz, new_xyz, radius, nsample,
                       valid_mask=None, new_valid_mask=None,
                       radius_in: float = 0.0):
    """ball_query with the query axis sharded over ``mesh``'s
    'points' axis. Same contract as ops.ball_query; the query count is
    padded to a multiple of the shard count internally."""
    b, m, _ = new_xyz.shape
    n_sh = mesh.shape[POINT_AXIS]
    pad = _pad_queries(m, n_sh)
    if new_valid_mask is None:
        new_valid_mask = jnp.ones((b, m), bool)
    if valid_mask is None:
        valid_mask = jnp.ones(xyz.shape[:2], bool)
    new_xyz_p = jnp.pad(new_xyz, ((0, 0), (0, pad), (0, 0)))
    new_valid_p = jnp.pad(new_valid_mask, ((0, 0), (0, pad)))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(None, POINT_AXIS), P(), P(None, POINT_AXIS)),
        out_specs=(P(None, POINT_AXIS), P(None, POINT_AXIS)),
    )
    def run(xyz_f, q, vm, qv):
        return ball_query(
            xyz_f, q, radius, nsample, vm, qv, radius_in
        )

    idx, cnt = run(xyz, new_xyz_p, valid_mask, new_valid_p)
    return idx[:, :m], cnt[:, :m]


def sharded_query_and_group(mesh, xyz, new_xyz, features, radius, nsample,
                            valid_mask=None, new_valid_mask=None,
                            radius_in: float = 0.0, use_xyz: bool = True):
    """query_and_group (ball query + relative-xyz grouping) with the
    query axis sharded. Support points/features replicated; output
    (B, M, ns, C') sharded on M."""
    b, m, _ = new_xyz.shape
    n_sh = mesh.shape[POINT_AXIS]
    pad = _pad_queries(m, n_sh)
    if new_valid_mask is None:
        new_valid_mask = jnp.ones((b, m), bool)
    if valid_mask is None:
        valid_mask = jnp.ones(xyz.shape[:2], bool)
    new_xyz_p = jnp.pad(new_xyz, ((0, 0), (0, pad), (0, 0)))
    new_valid_p = jnp.pad(new_valid_mask, ((0, 0), (0, pad)))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(None, POINT_AXIS), P(), P(), P(None, POINT_AXIS)),
        out_specs=(P(None, POINT_AXIS), P(None, POINT_AXIS)),
    )
    def run(xyz_f, q, feats, vm, qv):
        return query_and_group(
            xyz_f, q, feats, radius, nsample, vm, qv, radius_in,
            use_xyz=use_xyz,
        )

    grouped, cnt = run(xyz, new_xyz_p, features, valid_mask, new_valid_p)
    return grouped[:, :m], cnt[:, :m]


def sharded_three_nn(mesh, unknown, known, valid_mask=None):
    """three_nn with the unknown/query axis sharded."""
    b, m, _ = unknown.shape
    n_sh = mesh.shape[POINT_AXIS]
    pad = _pad_queries(m, n_sh)
    unknown_p = jnp.pad(unknown, ((0, 0), (0, pad), (0, 0)))
    if valid_mask is None:
        valid_mask = jnp.ones(known.shape[:2], bool)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, POINT_AXIS), P(), P()),
        out_specs=(P(None, POINT_AXIS), P(None, POINT_AXIS)),
    )
    def run(u, k, vm):
        return three_nn(u, k, vm)

    dist, idx = run(unknown_p, known, valid_mask)
    return dist[:, :m], idx[:, :m]
