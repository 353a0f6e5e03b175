import jax
import jax.numpy as jnp
import numpy as np
import pytest

from antmmf_tpu.modules.losses.contrastive import (
    cross_en,
    make_block_diag_pos_mask,
    mil_nce,
    moco_nce,
    neg_nce,
    symmetric_cross_en,
)
from antmmf_tpu.modules.losses.losses import Losses
from antmmf_tpu.modules.metrics.evaluators import (
    GlobalRetrievalRecallEvaluator,
    build_evaluator,
)
from antmmf_tpu.modules.metrics.metrics import Metrics


def test_cross_entropy_known_value():
    losses = Losses([{"type": "cross_entropy"}])
    logits = jnp.log(jnp.array([[0.7, 0.3], [0.4, 0.6]]))
    out = losses({"targets": jnp.array([0, 1])}, {"logits": logits})
    expected = -(np.log(0.7) + np.log(0.6)) / 2
    np.testing.assert_allclose(float(out["cross_entropy"]), expected, rtol=1e-5)


def test_loss_weight_and_prefix():
    losses = Losses([{"type": "mse", "weight": 2.0}])
    out = losses({"targets": jnp.zeros((2,))}, {"logits": jnp.ones((2,))},
                 prefix="train/d/")
    assert float(out["train/d/mse"]) == 2.0


def test_label_smoothing_between_bounds():
    losses = Losses([{"type": "label_smooth_ce", "params": {"smoothing": 0.1}}])
    logits = jnp.array([[10.0, 0.0]])
    out = losses({"targets": jnp.array([0])}, {"logits": logits})
    plain = Losses([{"type": "cross_entropy"}])(
        {"targets": jnp.array([0])}, {"logits": logits})
    assert float(out["label_smooth_ce"]) > float(plain["cross_entropy"])


def test_logit_bce_matches_manual():
    logits = jnp.array([0.5, -1.0])
    targets = jnp.array([1.0, 0.0])
    out = Losses(["logit_bce"])({"targets": targets}, {"logits": logits})
    manual = np.mean([np.log1p(np.exp(-0.5)), np.log1p(np.exp(-1.0))])
    np.testing.assert_allclose(float(out["logit_bce"]), manual, rtol=1e-5)


def test_caption_ce_ignores_pad():
    V = 5
    logits = jax.nn.one_hot(jnp.array([[1, 2, 0]]), V) * 100.0
    targets = jnp.array([[1, 2, -1]])
    out = Losses(["caption_cross_entropy"])({"targets": targets}, {"logits": logits})
    assert float(out["caption_cross_entropy"]) < 1e-3


# ------------------------------------------------------------- contrastive
def test_cross_en_prefers_diagonal():
    good = jnp.eye(4) * 10.0
    bad = jnp.ones((4, 4))
    assert float(cross_en(good)) < float(cross_en(bad))
    assert float(symmetric_cross_en(good)) < 0.01


def test_mil_nce_multi_positive():
    sim = jnp.array([[5.0, 5.0, -5.0], [-5.0, -5.0, 5.0]])
    mask = jnp.array([[1, 1, 0], [0, 0, 1]])
    assert float(mil_nce(sim, mask)) < 0.01
    # mask mismatch → high loss
    bad_mask = jnp.array([[0, 0, 1], [1, 0, 0]])
    assert float(mil_nce(sim, bad_mask)) > 5.0


def test_block_diag_pos_mask():
    m = make_block_diag_pos_mask(2, 3)
    assert m.shape == (2, 6)
    assert m[0].tolist() == [1, 1, 1, 0, 0, 0]


def test_neg_nce_focuses_hard_negatives():
    # one hard negative (row0 col1 close to positive), easy elsewhere
    sim = jnp.array([[5.0, 4.9, -5.0], [-5.0, 5.0, -5.0], [-5.0, -5.0, 5.0]])
    l_plain = float(cross_en(sim))
    l_hard = float(neg_nce(sim, margin=0.5, neg_weight=2.0))
    assert l_hard > l_plain  # upweighted hard negative hurts more
    # without any hard negatives, neg_nce ≈ 0
    easy = jnp.eye(3) * 10.0
    assert float(neg_nce(easy, margin=0.5)) < 0.01


def test_moco_nce_gradients_stop_at_keys():
    q = jnp.array([[1.0, 0.0]])
    k = jnp.array([[1.0, 0.0]])
    queue = jnp.array([[0.0, 1.0], [-1.0, 0.0]])

    def loss_wrt_keys(k):
        return moco_nce(q, k, queue)

    g = jax.grad(loss_wrt_keys)(k)
    np.testing.assert_allclose(np.asarray(g), 0.0)


# ----------------------------------------------------------------- metrics
def test_accuracy_and_topk():
    m = Metrics(["accuracy", {"type": "topk_accuracy", "params": {"k": 2}}])
    logits = jnp.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    out = m({"targets": jnp.array([1, 2])}, {"logits": logits})
    assert float(out["accuracy"]) == 0.5
    assert float(out["topk_accuracy"]) == 0.5


def test_mm_retrieval_recall_batch():
    m = Metrics([
        {"type": "mm_retrieval_recall", "name": "r1", "params": {"topk": 1}},
        {"type": "mm_retrieval_recall", "name": "medr",
         "params": {"topk": "median-rank"}},
    ])
    sim = jnp.array([[0.9, 0.1, 0.0], [0.8, 0.7, 0.1], [0.0, 0.1, 0.9]])
    out = m({}, {"sim": sim})
    assert float(out["r1"]) == pytest.approx(2 / 3)
    assert float(out["medr"]) == 1.0


def test_global_retrieval_evaluator_multi_gt():
    ev = GlobalRetrievalRecallEvaluator()
    # 4 texts, 2 videos; texts 0,1 → video 0; texts 2,3 → video 1
    t = np.array([[1, 0], [1, 0], [0, 1], [0, 1]], dtype=np.float32)
    v = np.array([[1, 0], [0, 1]], dtype=np.float32)
    batch = {"caption_vid_list": [[0], [0], [1], [1]],
             "image_tid_list": [[0, 1], [2, 3]]}
    ev.collect(batch, {"text_embed": t, "visual_embed": v})
    out = ev.summarize()
    assert out["t2v-r@1"] == 100.0
    assert out["v2t-r@1"] == 100.0  # min-rank over the gt set
    assert out["mean_recall"] == 100.0


def test_evaluator_identity_pairing_default():
    ev = build_evaluator("global_retrieval_recall")
    t = np.eye(3, dtype=np.float32)
    ev.collect({}, {"text_embed": t, "visual_embed": t})
    out = ev.summarize()
    assert out["t2v-r@1"] == 100.0
    assert out["t2v-median_rank"] == 1.0


def test_vqa_accuracy_evaluator():
    from antmmf_tpu.modules.metrics.evaluators import VQAAccuracyEvaluator

    ev = VQAAccuracyEvaluator()
    logits = np.array([[5.0, 0.0, 0.0], [0.0, 5.0, 0.0]])
    soft = np.array([[0.9, 0.0, 0.3], [0.0, 0.0, 1.0]])
    ev.collect({"targets": soft}, {"logits": logits})
    out = ev.summarize()
    np.testing.assert_allclose(out["vqa_accuracy"], (0.9 + 0.0) / 2)
