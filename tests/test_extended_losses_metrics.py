import jax
import jax.numpy as jnp
import numpy as np
import pytest

import antmmf_tpu.modules.losses  # registry side effects
import antmmf_tpu.modules.metrics
from antmmf_tpu.common.registry import registry
from antmmf_tpu.modules.losses.losses import Losses
from antmmf_tpu.modules.metrics.extended import (
    bbox_average_precision,
    bleu4,
    rouge_l,
    span_f1,
)
from antmmf_tpu.modules.metrics.metrics import Metrics


def test_loss_registry_counts():
    names = registry.list_names("loss")
    assert len(names) >= 30, names  # reference ships 34
    for expected in ("asymmetric_loss", "cos_amssoftmax", "cosarc", "eet",
                     "hier_loss", "kg_margin_contrastive", "mce_loss",
                     "m4c_decoding_bce_with_mask", "multi", "ordinal_loss",
                     "pairwise_loss", "weighted_softmax"):
        assert expected in names, expected


def test_metric_registry_counts():
    names = registry.list_names("metric")
    for expected in ("macro_f1", "micro_f1", "roc_auc", "recall@k", "mean_r",
                     "mean_rr", "multilabel_f1"):
        assert expected in names, expected


def test_asymmetric_and_mce():
    batch = {"targets": jnp.array([[1.0, 0.0], [0.0, 1.0]])}
    out = {"logits": jnp.array([[5.0, -5.0], [-5.0, 5.0]])}
    vals = Losses(["asymmetric_loss", "mce_loss"])(batch, out)
    assert float(vals["asymmetric_loss"]) < 0.1
    assert float(vals["mce_loss"]) < 0.1


def test_margin_softmax_losses_penalise_margin():
    batch = {"targets": jnp.array([0])}
    cos = {"logits": jnp.array([[0.8, 0.75]])}
    plain = Losses(["cross_entropy"])(batch, cos)["cross_entropy"]
    ams = Losses([{"type": "cos_amssoftmax",
                   "params": {"margin": 0.35, "scale": 30}}])(batch, cos)
    arc = Losses([{"type": "cosarc"}])(batch, cos)
    assert float(ams["cos_amssoftmax"]) > float(plain)
    assert float(arc["cosarc"]) > float(plain)


def test_ordinal_loss_prefers_close_ranks():
    batch_far = {"targets": jnp.array([0])}
    batch_near = {"targets": jnp.array([3])}
    out = {"logits": jnp.array([[4.0, 3.0, 2.0, 1.0]])}  # predicts high rank
    l = Losses(["ordinal_loss"])
    assert float(l(batch_near, out)["ordinal_loss"]) < \
        float(l(batch_far, out)["ordinal_loss"])


def test_pairwise_and_kg_margin():
    out = {"sim": jnp.eye(3) * 5.0}
    v = Losses(["pairwise_loss"])({}, out)
    assert float(v["pairwise_loss"]) < 1e-6
    kg = Losses(["kg_margin_contrastive"])(
        {}, {"pos_score": jnp.array([0.1]), "neg_score": jnp.array([2.0])})
    assert float(kg["kg_margin_contrastive"]) == 0.0


def test_hier_and_multi_loss():
    batch = {"hier_targets": jnp.array([[0, 1], [1, -1]])}
    out = {"level_0_logits": jnp.array([[5.0, -5.0], [-5.0, 5.0]]),
           "level_1_logits": jnp.array([[-5.0, 5.0], [0.0, 0.0]])}
    v = Losses(["hier_loss"])(batch, out)
    assert float(v["hier_loss"]) < 0.1
    multi = Losses([{"type": "multi", "params": {"losses": [
        {"type": "hier_loss", "weight": 2.0}]}}])(batch, out)
    np.testing.assert_allclose(float(multi["multi"]),
                               2 * float(v["hier_loss"]), rtol=1e-6)


def test_m4c_decoding_masked():
    logits = jnp.full((1, 2, 3), -10.0)
    targets = jnp.zeros((1, 2, 3))
    batch = {"targets": targets, "train_loss_mask": jnp.array([[1.0, 0.0]])}
    v = Losses(["m4c_decoding_bce_with_mask"])(batch, {"logits": logits})
    assert float(v["m4c_decoding_bce_with_mask"]) < 0.01


def test_roc_auc_metric():
    m = Metrics(["roc_auc"])
    out = m({"targets": jnp.array([0, 0, 1, 1])},
            {"logits": jnp.array([0.1, 0.4, 0.35, 0.8])})
    np.testing.assert_allclose(float(out["roc_auc"]), 0.75, atol=1e-6)


def test_f1_and_rank_metrics():
    m = Metrics(["macro_f1", "micro_f1", "mean_r", "mean_rr",
                 {"type": "recall@k", "params": {"k": 1}}])
    logits = jnp.array([[2.0, 1.0, 0.0], [0.0, 2.0, 1.0]])
    out = m({"targets": jnp.array([0, 2])}, {"logits": logits})
    assert float(out["micro_f1"]) == 0.5
    assert float(out["mean_r"]) == 1.5
    np.testing.assert_allclose(float(out["mean_rr"]), 0.75)
    assert float(out["recall@k"]) == 0.5


def test_bleu_rouge_span():
    assert bleu4([["a", "b", "c", "d", "e"]], [["a", "b", "c", "d", "e"]]) == \
        pytest.approx(1.0)
    assert bleu4([["x", "y"]], [["a", "b", "c"]]) == 0.0
    assert rouge_l("abcde", "abde") > 0.7
    assert span_f1([(0, 2), (3, 5)], [(0, 2)]) == pytest.approx(2 / 3, rel=1e-3)


def test_bbox_ap():
    pred = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    scores = np.array([0.9, 0.8])
    gt = np.array([[0, 0, 10, 10]], np.float32)
    ap = bbox_average_precision(pred, scores, gt)
    assert 0.9 <= ap <= 1.0 + 1e-6  # 11-point sum accumulates float error


def test_round2_metric_surface_complete():
    """Every metric name the reference registers exists here (SURVEY §2.1)."""
    import antmmf_tpu.modules.metrics.detection  # noqa: F401
    import antmmf_tpu.modules.metrics.extended  # noqa: F401
    from antmmf_tpu.common.registry import registry

    reference_names = [
        "SpanF1", "accuracy", "asm_metric", "bbox_ap", "binary_f1", "bleu4",
        "caption_bleu4", "edge_accuracy", "f1", "global_retrieval_recall",
        "hier_label_accuracy", "hier_multilabel_f1", "ks", "link_accuracy",
        "macro_f1", "macro_roc_auc", "mean_r", "mean_rr", "micro_f1",
        "micro_roc_auc", "mm_retrieval_median_rank", "mm_retrieval_recall",
        "mm_retrieval_recall@1", "mm_retrieval_recall@10",
        "mm_retrieval_recall@5", "multi_accuracy", "multi_label_metric",
        "multi_label_threshold_metric", "multi_macro_f1", "multilabel_f1",
        "named_accuracy", "node_accuracy", "rank_and_hits", "recall@k",
        "roc_auc", "rouge", "rule_multi_label_metric",
    ]
    for name in reference_names:
        assert registry.get_metric_class(name, default=None) is not None, name


def test_new_metric_semantics():
    import jax.numpy as jnp
    import numpy as np

    from antmmf_tpu.common.registry import registry

    # KS on a perfect separator = 1
    ks = registry.get_metric_class("ks")()
    v = ks({"targets": np.array([0, 0, 1, 1])},
           {"logits": np.array([0.1, 0.2, 0.8, 0.9])})
    assert float(v) == 1.0

    # span F1 exact match
    sf = registry.get_metric_class("span_f1")()
    tags = np.array([[1, 2, 0, 3, 0]])
    v = sf({"targets": tags, "input_mask": np.ones_like(tags)},
           {"logits": tags})
    assert float(v) == 1.0

    # rank_and_hits filters known positives
    rh = registry.get_metric_class("rank_and_hits")()
    logits = np.array([[0.9, 0.8, 0.1, 0.0]])
    v = rh({"targets": np.array([1]),
            "all_targets": np.array([[1, 0, 0, 0]])},
           {"logits": logits})
    # entity 0 filtered out -> target ranks 1st -> MRR 1.0
    assert float(v) == 1.0

    # ks/f1 front dispatch
    f1 = registry.get_metric_class("f1")({"average": "macro"})
    v = f1({"targets": jnp.array([0, 1])},
           {"logits": jnp.array([[2.0, 0.0], [0.0, 2.0]])})
    assert float(v) == 1.0

    # multi-label F1
    ml = registry.get_metric_class("multi_label_metric")()
    v = ml({"targets": jnp.array([[1, 0, 1]])},
           {"logits": jnp.array([[3.0, -3.0, 3.0]])})
    assert float(v) == 1.0

    # mm_retrieval_recall@k variants
    r1 = registry.get_metric_class("mm_retrieval_recall@1")()
    sim = jnp.eye(4) * 2.0
    assert float(r1({}, {"sim": sim})) == 1.0
    mr = registry.get_metric_class("mm_retrieval_median_rank")()
    assert float(mr({}, {"sim": sim})) == 1.0
