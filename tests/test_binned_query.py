"""Binned ball query must match the brute-force oracle bit-for-bit on
boundary-free inputs.

The oracle is ops.ball_query.ball_query (itself pinned against the
reference CUDA semantics: first nsample in-ball points in original
point order, first-hit padding, zero fill on empty).

Boundary caveat (same class as the FPS kernels' on-device functional
parity): both paths compute fp32 d^2 = |c|^2 + |p|^2 - 2 c.p, but XLA
fuses the combine arithmetic differently in the two programs (FMA
forms), so points sitting within ~1e-3 of a radius boundary can flip
membership — a compiler-rounding artifact, not a semantic difference.
The tests therefore scrub inputs so no (center, point) distance lies
within MARGIN of any radius (verified in float64), where parity must
then hold EXACTLY, selection order and padding included.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from de6d_tpu.ops import ball_query as bq
from de6d_tpu.ops.binned import binned_msg_query

PC_RANGE = (0.0, -40.0, -3.0, 70.4, 40.0, 1.0)
MARGIN = 2e-2  # distance-space guard band around every radius


def _random_cloud(rng, b, n, clustered=False, out_of_range=False):
    pts = np.stack(
        [
            rng.uniform(0, 70.4, (b, n)),
            rng.uniform(-40, 40, (b, n)),
            rng.uniform(-3, 1, (b, n)),
        ],
        axis=-1,
    ).astype(np.float32)
    if clustered:
        k = n // 2
        centers = rng.uniform(5, 40, (b, 8, 3)).astype(np.float32)
        which = rng.randint(0, 8, (b, k))
        for i in range(b):
            pts[i, :k] = centers[i, which[i]] + rng.normal(
                0, 0.3, (k, 3)
            ).astype(np.float32)
    if out_of_range:
        j = n // 8
        pts[:, :j, 0] += 80.0  # beyond x_hi
        pts[:, j : 2 * j, 1] -= 90.0  # beyond y_lo
    return pts


def _scrub_boundaries(pts, ctrs, radii):
    """Push points off every radius boundary (float64-verified).

    Random jitter (growing amplitude) instead of a deterministic
    radial nudge: nudging an offender off one center's shell can land
    it on another's and oscillate; a random draw re-hits the (measure
    ~0, MARGIN-thin) union of shells with vanishing probability.
    """
    radii = [r for r in radii if r > 0]
    jrng = np.random.RandomState(0xC0FFEE)
    for bi in range(pts.shape[0]):
        p = pts[bi].astype(np.float64)
        c = ctrs[bi].astype(np.float64)
        for it in range(60):
            d = np.linalg.norm(p[None, :, :] - c[:, None, :], axis=-1)
            bad = np.zeros(p.shape[0], bool)
            for r in radii:
                bad |= (np.abs(d - r) < MARGIN).any(axis=0)
            if not bad.any():
                break
            amp = 3 * MARGIN * (1 + it // 5)
            p[bad] += jrng.uniform(-amp, amp, (int(bad.sum()), 3))
        else:
            raise AssertionError("could not scrub boundaries")
        pts[bi] = p.astype(np.float32)
    return pts


def _check(pts, ctrs, radii, nsamples, r_in=None, valid=None,
           cvalid=None, cap=256):
    r_in = r_in or (0.0,) * len(radii)
    pts = _scrub_boundaries(pts, ctrs, list(radii) + list(r_in))
    res, overflow = binned_msg_query(
        jnp.asarray(pts), jnp.asarray(ctrs), tuple(radii), tuple(nsamples),
        valid_mask=None if valid is None else jnp.asarray(valid),
        new_valid_mask=None if cvalid is None else jnp.asarray(cvalid),
        radius_in_list=tuple(r_in), pc_range=PC_RANGE, cell_cap=cap,
    )
    assert int(np.max(np.asarray(overflow))) == 0, "cap overflow"
    for (idx, cnt), r, ri, ns in zip(res, radii, r_in, nsamples):
        ref_idx, ref_cnt = bq.ball_query(
            jnp.asarray(pts), jnp.asarray(ctrs), float(r), int(ns),
            valid_mask=None if valid is None else jnp.asarray(valid),
            new_valid_mask=None if cvalid is None else jnp.asarray(cvalid),
            radius_in=float(ri),
        )
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(ref_cnt))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


@pytest.mark.parametrize("clustered", [False, True])
def test_parity_msg_scales(clustered):
    rng = np.random.RandomState(0 if not clustered else 1)
    pts = _random_cloud(rng, 2, 2048, clustered=clustered)
    ctrs = pts[:, rng.choice(2048, 256, replace=False)].copy()
    _check(pts, ctrs, radii=(0.2, 0.4, 0.8), nsamples=(8, 16, 32))


def test_parity_dilated_annulus():
    rng = np.random.RandomState(2)
    pts = _random_cloud(rng, 2, 1024, clustered=True)
    ctrs = pts[:, :128].copy()
    _check(
        pts, ctrs, radii=(0.4, 0.8, 1.6), nsamples=(16, 16, 32),
        r_in=(0.0, 0.4, 0.8),
    )


def test_parity_out_of_range_points_and_centers():
    rng = np.random.RandomState(3)
    pts = _random_cloud(rng, 2, 1024, out_of_range=True)
    ctrs = pts[:, :256].copy()  # includes out-of-range centers
    _check(pts, ctrs, radii=(0.8, 1.6), nsamples=(16, 32))


def test_parity_masks_and_empty_balls():
    rng = np.random.RandomState(4)
    pts = _random_cloud(rng, 2, 512)
    # far-apart centers: some balls empty
    ctrs = np.stack(
        [
            rng.uniform(0, 70, (2, 64)),
            rng.uniform(-40, 40, (2, 64)),
            rng.uniform(-3, 1, (2, 64)),
        ],
        axis=-1,
    ).astype(np.float32)
    valid = rng.rand(2, 512) > 0.3
    cvalid = rng.rand(2, 64) > 0.3
    _check(pts, ctrs, radii=(0.5, 1.0), nsamples=(8, 16),
           valid=valid, cvalid=cvalid)


def test_overflow_reported_after_spill():
    rng = np.random.RandomState(5)
    pts = np.full((1, 512, 3), 10.0, np.float32)  # all in one cell
    pts += rng.normal(0, 0.01, pts.shape).astype(np.float32)
    ctrs = pts[:, :8].copy()
    _, overflow = binned_msg_query(
        jnp.asarray(pts), jnp.asarray(ctrs), (0.8,), (16,),
        pc_range=PC_RANGE, cell_cap=64, spill_cap=128,
    )
    # 512 - 64 = 448 spill 128 -> 320 dropped
    assert int(np.asarray(overflow)[0]) == 512 - 64 - 128
    _, overflow = binned_msg_query(
        jnp.asarray(pts), jnp.asarray(ctrs), (0.8,), (16,),
        pc_range=PC_RANGE, cell_cap=64, spill_cap=0,
    )
    assert int(np.asarray(overflow)[0]) == 512 - 64


def test_spill_parity_dense_cells():
    """Cells overflowing the cap route excess points through the
    global spill table; results must stay bit-identical to the
    oracle as long as the spill holds them (overflow == 0)."""
    rng = np.random.RandomState(6)
    pts = _random_cloud(rng, 2, 1024, clustered=True)
    ctrs = pts[:, rng.choice(1024, 128, replace=False)].copy()
    radii, nsamples = (0.4, 0.8), (16, 32)
    pts = _scrub_boundaries(pts, ctrs, radii)
    res, overflow = binned_msg_query(
        jnp.asarray(pts), jnp.asarray(ctrs), radii, nsamples,
        pc_range=PC_RANGE, cell_cap=8, spill_cap=1024,
    )
    # tiny cap guarantees the spill is actually exercised
    from de6d_tpu.ops.binned import cell_overflow
    spilled = cell_overflow(
        jnp.asarray(pts), jnp.ones((2, 1024), bool), PC_RANGE, 0.8, 8
    )
    assert int(np.asarray(spilled).max()) > 0
    assert int(np.max(np.asarray(overflow))) == 0
    for (idx, cnt), r, ns in zip(res, radii, nsamples):
        ref_idx, ref_cnt = bq.ball_query(
            jnp.asarray(pts), jnp.asarray(ctrs), float(r), int(ns)
        )
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(ref_cnt))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def _sa_fixture():
    import jax
    from de6d_tpu.models.backbones_3d.pointnet2_modules import (
        PointnetSAModuleFSMSG,
    )

    rng = np.random.RandomState(7)
    pts = _random_cloud(rng, 2, 2048)
    radii = (0.4, 0.8, 1.6)
    pts = _scrub_boundaries(pts, pts[:, :512].copy(), radii)
    xyz = jnp.asarray(pts)
    feats = jnp.asarray(rng.randn(2, 2048, 4).astype(np.float32))
    valid = jnp.asarray(rng.rand(2, 2048) > 0.1)

    kw = dict(
        radii=radii, nsamples=(8, 16, 16),
        mlps=((8, 16), (8, 16), (8, 16)),
        npoint_list=(512,), sample_range_list=((0, -1),),
        sample_method_list=("d-fps",), dilated_radius_group=True,
        aggregation_mlp=(16,), confidence_mlp=(8,),
    )
    brute = PointnetSAModuleFSMSG(**kw)
    binned64 = PointnetSAModuleFSMSG(pc_range=PC_RANGE, bin_cell_cap=64, **kw)
    # spill_cap=0: any dense cell forces the in-graph brute fallback
    binned2 = PointnetSAModuleFSMSG(
        pc_range=PC_RANGE, bin_cell_cap=2, bin_spill_cap=0, **kw
    )
    # big spill: every beyond-cap point rides the spill table instead
    spill2 = PointnetSAModuleFSMSG(
        pc_range=PC_RANGE, bin_cell_cap=2, bin_spill_cap=1500, **kw
    )
    params = brute.init(jax.random.PRNGKey(0), xyz, feats, valid, train=False)
    return (xyz, feats, valid), params, (brute, binned64, binned2, spill2)


def _cmp(ref, got, exact: bool):
    for a, b in zip(ref, got):
        if a is None:
            assert b is None
        elif exact:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        else:
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
            )


def test_sa_module_binned_parity_train():
    """Training path (binned query selection, standard MLP): outputs
    must be bit-identical to the brute-force module — including the
    in-graph overflow fallback (tiny cap + no spill) and the spill
    path (tiny cap + big spill)."""
    args, params, (brute, binned64, binned2, spill2) = _sa_fixture()

    def run(m):
        out, _ = m.apply(
            params, *args, train=True, mutable=["batch_stats"]
        )
        return out

    ref = run(brute)
    _cmp(ref, run(binned64), exact=True)
    _cmp(ref, run(binned2), exact=True)
    _cmp(ref, run(spill2), exact=True)


def test_sa_module_fused_eval_parity():
    """Eval path: the fused binned SA (BN folded to affine, MLP+pool
    inside the chunk loop) must match the standard eval path to fp32
    fold-rounding tolerance; cap=2/spill=0 routes through the
    brute_sa_infer fallback, cap=2/spill=1500 through the fused
    spill-table path — same folded math either way."""
    args, params, (brute, binned64, binned2, spill2) = _sa_fixture()
    ref = brute.apply(params, *args, train=False)
    _cmp(ref, binned64.apply(params, *args, train=False), exact=False)
    _cmp(ref, binned2.apply(params, *args, train=False), exact=False)
    _cmp(ref, spill2.apply(params, *args, train=False), exact=False)
