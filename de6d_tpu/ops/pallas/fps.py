"""Pallas TPU kernels: farthest-point sampling (plain, weighted, matrix).

The jnp FPS in ``ops/sampling.py`` compiles to a ``fori_loop`` whose
body is a handful of small VPU kernels; on TPU every loop iteration
pays ~O(100 µs) of per-kernel launch/sequencing overhead, so a Det6D
forward (4096 + 1024 + 512 sequential picks) spends most of its ~2 s
step time just iterating. These kernels run the WHOLE sequential pick
loop inside one Pallas launch with every operand VMEM-resident.

Layout: samples ride the SUBLANE axis — the batch is processed in
blocks of 8 samples shaped (8, Npad), so each per-iteration op is a
full VPU tile (a (1, N) formulation wastes 7/8 sublanes AND
serializes the batch through the sequential TPU grid — measured 3-4x
slower than the jnp path; this layout is ~20x faster than that).
Per pick: one-hot select of the last picks' coords (masked reduce
along lanes), distance update, per-row argmax with first-max tie
semantics (min index among maxima).

Parity: bit-identical to `sampling._fps_loop` in interpret mode
(pinned in tests/test_sampling.py) — identical seed rules (plain
seeds index 0, weighted seeds first-argmax of the raw weight —
sampling_gpu.cu:102/420 CUDA parity), identical distance association
((dx²+dy²)+dz²), identical key rule, identical first-max ties. On
device, cross-lowering FMA/reduction differences can break BITWISE
key ties differently (observed once at pick 651 of a 1024-pick run),
so on-TPU validation is functional: every pick maximizes its step key
in a float32 numpy replay (see tools/fps_check.py).

Reference: /root/reference/core/pcdet/ops/pointnet2/pointnet2_batch/
src/sampling_gpu.cu (farthest_point_sampling_kernel :102,
furthest_point_sampling_matrix_kernel :269,
furthest_point_sampling_weights_kernel :420).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1e10
_LANE = 128
_SUB = 8  # samples per grid step = f32 sublane count


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _split_xyz(xyz):
    """(B, N, 3) → three (B, N) planes WITHOUT a minor-dim-3
    transpose: XLA lowers moveaxis(-1, 0) here as a 3/128-lane-
    occupancy gather costing ~100 ms serial at (8, 16384, 3) on the
    tunnel chip; a one-hot (3,) matvec on the MXU is exact
    (value*1 + zeros) and runs at full tile occupancy."""
    eye = jnp.eye(3, dtype=xyz.dtype)
    return [
        jnp.einsum(
            "bnc,c->bn", xyz, eye[i],
            precision=jax.lax.Precision.HIGHEST,
        )
        for i in range(3)
    ]


def _pad2(a, b_pad, npad):
    b, n = a.shape
    if b == b_pad and n == npad:
        return a
    return jnp.pad(a, ((0, b_pad - b), (0, npad - n)))


def _make_fps_kernel(npoint: int, npad: int, np_pad: int, weighted: bool):
    def kernel(data_ref, out_ref):
        x = data_ref[0]  # (8, Npad)
        y = data_ref[1]
        z = data_ref[2]
        valid = data_ref[3] > 0.0
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (_SUB, npad), 1)
        oob = jnp.int32(npad)

        def first_argmax(key):
            # per-row first max: min index among maxima, carried as
            # (8, 1) keepdims — squeezing to (8,) and re-broadcasting
            # forces a Mosaic relayout that costs ~2 ms/iteration
            # (measured 800x: 1906 -> 2.3 us/iter)
            m = jnp.max(key, axis=1, keepdims=True)
            return jnp.min(
                jnp.where(key == m, iota_n, oob), axis=1, keepdims=True
            ).astype(jnp.int32)

        if weighted:
            w_eff = data_ref[4]
            w_raw = data_ref[5]
            seed = first_argmax(jnp.where(valid, w_raw, -INF))
        else:
            seed = jnp.zeros((_SUB, 1), jnp.int32)

        min_dist0 = jnp.where(valid, INF, -1.0)
        pick_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, np_pad), 1)
        picks0 = jnp.where(pick_iota == 0, seed, 0)

        def body(j, state):
            md, picks, last = state
            onehot = (iota_n == last).astype(jnp.float32)
            xs = jnp.sum(x * onehot, axis=1, keepdims=True)  # (8, 1)
            ys = jnp.sum(y * onehot, axis=1, keepdims=True)
            zs = jnp.sum(z * onehot, axis=1, keepdims=True)
            dx = x - xs
            dy = y - ys
            dz = z - zs
            d = (dx * dx + dy * dy) + dz * dz
            md = jnp.where(valid, jnp.minimum(md, d), -1.0)
            if weighted:
                key = jnp.where(md >= 0, md * w_eff, md)
            else:
                key = md
            nxt = first_argmax(key)
            picks = jnp.where(pick_iota == j, nxt, picks)
            return md, picks, nxt

        _, picks, _ = jax.lax.fori_loop(
            1, npoint, body, (min_dist0, picks0, seed)
        )
        out_ref[:, :] = picks

    return kernel


@functools.partial(
    jax.jit, static_argnames=("npoint", "weighted", "interpret")
)
def fps_pallas(xyz, valid_mask, npoint: int, weights=None,
               weighted: bool = False, interpret: bool = False):
    """(B, N, 3) xyz + (B, N) valid → (B, npoint) int32 picks.

    `weighted=True` needs `weights` (B, N) and reproduces
    weighted_farthest_point_sample (s-fps) exactly; otherwise plain
    d-fps seeded at index 0.
    """
    b, n, _ = xyz.shape
    npad = _round_up(n, _LANE)
    np_pad = _round_up(npoint, _LANE)
    b_pad = _round_up(b, _SUB)
    planes = _split_xyz(xyz.astype(jnp.float32))
    planes.append(valid_mask.astype(jnp.float32))
    if weighted:
        w = weights.astype(jnp.float32)
        planes.append(jnp.maximum(w, 1e-12))
        planes.append(w)
    nplanes = len(planes)
    packed = jnp.stack([_pad2(p, b_pad, npad) for p in planes])

    out = pl.pallas_call(
        _make_fps_kernel(int(npoint), npad, np_pad, bool(weighted)),
        grid=(b_pad // _SUB,),
        in_specs=[
            pl.BlockSpec(
                (nplanes, _SUB, npad), lambda g: (0, g, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (_SUB, np_pad), lambda g: (g, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, np_pad), jnp.int32),
        interpret=interpret,
    )(packed)
    return out[:b, :npoint]


# ---------------------------------------------------------------------------
# f-fps: FPS over a precomputed (N, N) distance matrix
# ---------------------------------------------------------------------------


def _make_matrix_fps_kernel(npoint: int, npad: int, np_pad: int,
                            nsub: int):
    def kernel(valid_ref, dm_ref, out_ref, rows_vmem, sems):
        g = pl.program_id(0)
        valid = valid_ref[:, :] > 0.0  # (8, Npad)
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (_SUB, npad), 1)
        iota64 = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _SUB * 8), 1)
        oob = jnp.int32(npad)

        def first_argmax(key):
            # keepdims (8, 1): see _make_fps_kernel — squeezing the
            # reduce result forces a catastrophic Mosaic relayout
            m = jnp.max(key, axis=1, keepdims=True)
            return jnp.min(
                jnp.where(key == m, iota_n, oob), axis=1, keepdims=True
            ).astype(jnp.int32)

        min_dist0 = jnp.where(valid, INF, -1.0)
        pick_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, np_pad), 1)
        picks0 = jnp.where(pick_iota == 0, 0, 0)

        def body(j, state):
            md, picks, last = state  # last: (8, 1)
            # HBM slices must be 8-sublane aligned: DMA each sample's
            # aligned 8-row block, then one-hot-select the row.
            # Issue all copies, then wait all (latency overlaps).
            for s in range(nsub):
                st = pl.multiple_of((last[s, 0] // 8) * 8, 8)
                pltpu.make_async_copy(
                    dm_ref.at[g * _SUB + s, pl.ds(st, 8), :],
                    rows_vmem.at[pl.ds(s * 8, 8), :],
                    sems.at[s],
                ).start()
            for s in range(nsub):
                st = pl.multiple_of((last[s, 0] // 8) * 8, 8)
                pltpu.make_async_copy(
                    dm_ref.at[g * _SUB + s, pl.ds(st, 8), :],
                    rows_vmem.at[pl.ds(s * 8, 8), :],
                    sems.at[s],
                ).wait()
            # rows_vmem is (8 samples * 8 block rows, Npad); sample s
            # wants global row s*8 + last[s]%8 — select all 8 rows at
            # once as a one-hot (8, 64) x (64, Npad) MXU pass-through
            # (one-hot dot is exact: value*1 + zeros)
            sub_iota8 = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 1), 0)
            want = sub_iota8 * 8 + (last % 8)  # (8, 1)
            sel = (iota64 == want).astype(jnp.float32)
            # HIGHEST precision: the default MXU f32 path rounds
            # through bf16 passes, corrupting the selected row values
            d = jax.lax.dot_general(
                sel, rows_vmem[:, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # (8, Npad)
            md = jnp.where(valid, jnp.minimum(md, d), -1.0)
            nxt = first_argmax(md)
            picks = jnp.where(pick_iota == j, nxt, picks)
            return md, picks, nxt

        _, picks, _ = jax.lax.fori_loop(
            1, npoint, body,
            (min_dist0, picks0, jnp.zeros((_SUB, 1), jnp.int32)),
        )
        out_ref[:, :] = picks

    return kernel


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def matrix_fps_pallas(dist_matrix, valid_mask, npoint: int,
                      interpret: bool = False):
    """(B, N, N) distance matrix + (B, N) valid → (B, npoint) picks.

    Same pick rule as sampling._fps_loop over ``dm[last]`` rows
    (f-fps, furthest_point_sampling_matrix_kernel :269 parity):
    identical row values stream in by DMA from HBM.
    """
    b, n, _ = dist_matrix.shape
    npad = _round_up(n, _LANE)
    np_pad = _round_up(npoint, _LANE)
    b_pad = _round_up(b, _SUB)
    dm = dist_matrix.astype(jnp.float32)
    if npad != n or b_pad != b:
        dm = jnp.pad(
            dm, ((0, b_pad - b), (0, npad - n), (0, npad - n))
        )
    valid = _pad2(valid_mask.astype(jnp.float32), b_pad, npad)

    out = pl.pallas_call(
        _make_matrix_fps_kernel(int(npoint), npad, np_pad, _SUB),
        grid=(b_pad // _SUB,),
        in_specs=[
            pl.BlockSpec(
                (_SUB, npad), lambda g: (g, 0),
                memory_space=pltpu.VMEM,
            ),
            # ANY-space blocks must be the full array with a trivial
            # index map (Mosaic restriction); the kernel slices rows
            # via program_id + dynamic DMA instead
            pl.BlockSpec(
                (b_pad, npad, npad), lambda g: (0, 0, 0),
                memory_space=pl.ANY,
            ),
        ],
        out_specs=pl.BlockSpec(
            (_SUB, np_pad), lambda g: (g, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, np_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((_SUB * 8, npad), jnp.float32),
            pltpu.SemaphoreType.DMA((_SUB,)),
        ],
        interpret=interpret,
    )(valid, dm)
    return out[:b, :npoint]
