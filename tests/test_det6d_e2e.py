"""Det6D end-to-end (tiny shapes, CPU): PointNet2FSMSG backbone with
d-fps/s-fps fusion sampling → vote head → 6-DoF decode → losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from de6d_tpu.models import build_network
from de6d_tpu.models.detectors.detector3d_template import (
    DatasetSpec, post_processing,
)


from de6d_tpu.utils.testing import tiny_det6d_cfg  # noqa: E402


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_det6d_cfg()
    spec = DatasetSpec(
        class_names=("Car",),
        point_feature_dim=4,
        point_cloud_range=(0.0, -16.0, -3.0, 32.0, 16.0, 4.0),
    )
    model = build_network(cfg, num_class=1, dataset=spec)
    rng = np.random.RandomState(0)
    b, n = 2, 512
    pts = np.zeros((b, n, 4), np.float32)
    pts[..., 0] = rng.uniform(0, 32, (b, n))
    pts[..., 1] = rng.uniform(-16, 16, (b, n))
    pts[..., 2] = rng.uniform(-2, 2, (b, n))
    pts[..., 3] = rng.uniform(0, 1, (b, n))
    gt = np.zeros((b, 4, 10), np.float32)  # 9-DoF + class
    gt[..., 0] = rng.uniform(5, 27, (b, 4))
    gt[..., 1] = rng.uniform(-10, 10, (b, 4))
    gt[..., 2] = rng.uniform(-1, 0.5, (b, 4))
    gt[..., 3] = rng.uniform(3.5, 4.5, (b, 4))
    gt[..., 4] = rng.uniform(1.5, 1.8, (b, 4))
    gt[..., 5] = rng.uniform(1.4, 1.7, (b, 4))
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (b, 4))
    gt[..., 7] = rng.uniform(-0.4, 0.1, (b, 4))  # pitch, some < -10°
    gt[..., 9] = 1
    gt[:, -1] = 0  # padded row
    # drop some points into the boxes so fg targets exist
    for bi in range(b):
        for gi in range(3):
            sl = slice(gi * 40, gi * 40 + 40)
            pts[bi, sl, 0] = gt[bi, gi, 0] + rng.uniform(-1.5, 1.5, 40)
            pts[bi, sl, 1] = gt[bi, gi, 1] + rng.uniform(-0.7, 0.7, 40)
            pts[bi, sl, 2] = gt[bi, gi, 2] + rng.uniform(-0.6, 0.6, 40)
    batch = {
        "points": pts,
        "points_mask": np.ones((b, n), bool),
        "gt_boxes": gt,
    }
    variables = model.init(jax.random.PRNGKey(0), dict(batch), train=False)
    return cfg, spec, model, batch, variables


def test_train_forward_loss_and_grads(setup):
    cfg, spec, model, batch, variables = setup
    out, _ = model.apply(
        variables, dict(batch), train=True, mutable=["batch_stats"]
    )
    assert out["point_box_preds"].shape[-1] == 9  # full pose decode
    assert (np.asarray(out["vote_cls_labels"]) > 0).sum() > 0
    assert (np.asarray(out["point_cls_labels"]) >= 0).any()
    loss, tb = model.get_training_loss(out)
    assert np.isfinite(float(loss)) and float(loss) > 0
    for k in ("vote_loss_reg", "point_loss_cls", "point_loss_box",
              "point_loss_sasa"):
        assert k in tb and np.isfinite(float(tb[k])), k

    def loss_fn(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            dict(batch), train=True, mutable=["batch_stats"],
        )
        l, _ = model.get_training_loss(o)
        return l

    grads = jax.grad(loss_fn)(variables["params"])
    total = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads)
    )
    assert np.isfinite(total) and total > 0


def test_eval_and_postprocess_9dof(setup):
    cfg, spec, model, batch, variables = setup
    out = model.apply(variables, dict(batch), train=False)
    assert out["batch_box_preds"].shape[-1] == 9
    # roll decodes to exactly 0 at inference (ground-aware coder)
    assert np.allclose(np.asarray(out["batch_box_preds"])[..., 8], 0.0)
    post = post_processing(out, cfg["POST_PROCESSING"], 1)
    assert post["pred_boxes"].shape[-1] == 9


def test_pitch_decode_gating(setup):
    """sigmoid(pitch_cls) < 0.5 must zero the decoded pitch."""
    from de6d_tpu.utils.box_coder_utils import PointBinResidual6DCoder

    coder = PointBinResidual6DCoder(
        use_mean_size=False, angle_bin_num=12, ground_aware=True
    )
    pts = jnp.zeros((2, 3))
    enc = jnp.zeros((2, coder.code_size))
    enc = enc.at[:, 3:6].set(0.1)
    enc = enc.at[0, 6 + 24].set(10.0)   # pitch cls logit high
    enc = enc.at[0, 6 + 25].set(0.5)    # residual
    enc = enc.at[1, 6 + 24].set(-10.0)  # gated off
    enc = enc.at[1, 6 + 25].set(0.5)
    boxes = coder.decode(enc, pts)
    assert float(boxes[1, 7]) == 0.0
    expected = -np.deg2rad(10) - 0.5 * np.deg2rad(45)
    assert float(boxes[0, 7]) == pytest.approx(expected, abs=1e-5)
    assert np.allclose(np.asarray(boxes)[:, 8], 0.0)  # roll always 0
