"""Lazy candidate decode parity: post_processing with the head's
`lazy_box_decode` marker (decode only the gathered top-`pre` rows)
must produce bit-identical predictions to the full 321k-anchor decode
path (reference generate_predicted_boxes semantics, anchor_head.py
:228-275 of the reference).

Also pins that the marker is only set when no downstream module
consumes batch_box_preds (predict_boxes_when_training toggles it)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from de6d_tpu.models import build_network  # noqa: E402
from de6d_tpu.models.detectors.detector3d_template import (  # noqa: E402
    post_processing,
)

from model_fixtures import tiny_pointpillar_cfg, random_batch  # noqa: E402


@pytest.fixture(scope="module")
def setup():
    model_cfg, spec = tiny_pointpillar_cfg()
    model = build_network(model_cfg, num_class=3, dataset=spec)
    rng = np.random.RandomState(0)
    batch = random_batch(rng, spec)
    variables = model.init(
        jax.random.PRNGKey(0), dict(batch), train=False
    )
    return model_cfg, model, batch, variables


def test_lazy_decode_matches_full(setup):
    model_cfg, model, batch, variables = setup
    # random init + focal bias puts all sigmoid scores near 0.01, so
    # gate low enough that candidates survive
    pp = dict(model_cfg["POST_PROCESSING"])
    pp["SCORE_THRESH"] = 0.001

    def run(params_batch, lazy):
        variables, batch = params_batch
        out = model.apply(variables, dict(batch), train=False)
        assert "lazy_box_decode" in out, "head did not set the marker"
        if not lazy:
            out.pop("lazy_box_decode")
        return post_processing(out, pp, 3)

    a = jax.jit(lambda pb: run(pb, True))((variables, batch))
    b = jax.jit(lambda pb: run(pb, False))((variables, batch))
    for k in ("pred_boxes", "pred_scores", "pred_labels", "pred_count"):
        np.testing.assert_array_equal(
            np.asarray(a[k]), np.asarray(b[k]), err_msg=k
        )
    assert int(np.asarray(a["pred_count"]).sum()) > 0


def test_marker_absent_when_downstream_consumes(setup):
    """predict_boxes_when_training=True (ROI-head detectors) must NOT
    publish the lazy marker — downstream modules rewrite
    batch_box_preds and the stale raw preds would decode wrong boxes."""
    model_cfg, model, batch, variables = setup
    import dataclasses

    head = model.bind(variables).dense_head
    assert not head.predict_boxes_when_training

    cfg2, spec = tiny_pointpillar_cfg()
    from de6d_tpu.models.dense_heads.anchor_head import AnchorHeadSingle

    head2 = AnchorHeadSingle(
        model_cfg=cfg2["DENSE_HEAD"],
        num_class=3,
        class_names=("Car", "Pedestrian", "Cyclist"),
        grid_size=spec.grid_size,
        point_cloud_range=tuple(spec.point_cloud_range),
        predict_boxes_when_training=True,
    )
    # run the head standalone on fake BEV features
    rng = np.random.RandomState(1)
    nx, ny = spec.grid_size[0] // 2, spec.grid_size[1] // 2
    feats = jax.numpy.asarray(
        rng.randn(2, ny, nx, 32).astype(np.float32)
    )
    bd = {"spatial_features_2d": feats}
    var2 = head2.init(jax.random.PRNGKey(0), bd, train=False)
    out2 = head2.apply(var2, bd, train=False)
    assert "lazy_box_decode" not in out2
    assert "batch_box_preds" in out2
