import jax
import jax.numpy as jnp
import numpy as np
import pytest

from antmmf_tpu.modules.decoders import LanguageDecoder, TransformerDecoder, causal_bias
from antmmf_tpu.modules.matcher import HungarianMatcher, hungarian_assignment
from antmmf_tpu.modules.transformers.heads.detr import DETRHead
from antmmf_tpu.datasets.database.features_database import FeaturesDatabase
from antmmf_tpu.utils.general import batched_index_select, count_parameters
from antmmf_tpu.utils.image_ops import pad_to_shape, patchify, ten_crop
from antmmf_tpu.utils.vocab import Vocab

KEY = jax.random.PRNGKey(0)


def test_hungarian_assignment_optimal():
    cost = jnp.array([[[10.0, 1.0], [1.0, 10.0]]])
    assign = hungarian_assignment(cost)
    assert assign.tolist() == [[1, 0]]


def test_matcher_respects_validity():
    m = HungarianMatcher()
    logits = jnp.zeros((1, 2, 3))
    boxes = jnp.array([[[0.25, 0.25, 0.2, 0.2], [0.75, 0.75, 0.2, 0.2]]])
    gt_boxes = jnp.array([[[0.75, 0.75, 0.2, 0.2], [0.0, 0.0, 0.0, 0.0]]])
    gt_labels = jnp.array([[1, 0]])
    gt_valid = jnp.array([[True, False]])
    assign = m(logits, boxes, gt_labels, gt_boxes, gt_valid)
    assert assign[0, 1] == 0  # query 1 matched to the only valid gt


def test_detr_head_loss_perfect_predictions():
    head = DETRHead(num_classes=3, hidden_dim=16)
    queries = jnp.ones((1, 2, 8))
    params = head.init(KEY, queries)
    gt_labels = jnp.array([[1, 2]])
    gt_boxes = jnp.array([[[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.2, 0.2]]])
    gt_valid = jnp.array([[True, True]])
    preds = {
        "pred_logits": jax.nn.one_hot(jnp.array([[1, 2]]), 4) * 50.0,
        "pred_boxes": gt_boxes,
    }
    lm = DETRHead.loss_metric(preds, gt_labels, gt_boxes, gt_valid)
    assert float(lm["losses"]["detr_class_loss"]) < 0.01
    assert float(lm["losses"]["detr_bbox_loss"]) < 0.01
    assert float(lm["metrics"]["detr_matched_acc"]) == 1.0
    # head forward shape
    out = head.apply(params, queries)
    assert out["pred_logits"].shape == (1, 2, 4)
    assert out["pred_boxes"].shape == (1, 2, 4)


def test_causal_decoder_no_future_leak():
    dec = TransformerDecoder(num_layers=1, num_heads=2, dtype=jnp.float32)
    memory = jnp.ones((1, 3, 16))
    x1 = jax.random.normal(KEY, (1, 4, 16))
    x2 = x1.at[:, 3].set(99.0)  # change the LAST position only
    params = dec.init(KEY, x1, memory)
    o1 = dec.apply(params, x1, memory)
    o2 = dec.apply(params, x2, memory)
    np.testing.assert_allclose(np.asarray(o1[:, :3]), np.asarray(o2[:, :3]),
                               atol=1e-5)


def test_language_decoder_with_beam_search():
    from antmmf_tpu.utils.text_utils import beam_search

    dec = LanguageDecoder(vocab_size=20, hidden_size=16, num_layers=1,
                          num_heads=2, max_length=8, dtype=jnp.float32)
    memory = jnp.ones((2, 3, 16))
    tokens = jnp.zeros((2, 8), jnp.int32)
    params = dec.init(KEY, tokens, memory)

    def logits_fn(prefix):
        full = dec.apply(params, prefix, jnp.repeat(memory,
                         prefix.shape[0] // 2, axis=0))
        filled = jnp.sum(prefix != 3, axis=-1) - 1
        return jnp.take_along_axis(
            full, filled[:, None, None].clip(0), axis=1)[:, 0]

    seqs, scores = beam_search(logits_fn, jnp.array([1, 1]), eos_id=3,
                               max_length=6, num_beams=2)
    assert seqs.shape == (2, 6)


def test_features_database_npy(tmp_path):
    np.save(tmp_path / "item1.npy", np.ones((5, 8), np.float32))
    db = FeaturesDatabase(str(tmp_path), max_regions=8)
    out = db("item1")
    assert out["image_feature"].shape == (8, 8)
    assert out["image_feature_mask"].tolist() == [1] * 5 + [0] * 3


def test_utils_misc():
    vals = jnp.arange(24.0).reshape(2, 4, 3)
    idx = jnp.array([[0, 2], [1, 3]])
    sel = batched_index_select(vals, idx)
    assert sel.shape == (2, 2, 3)
    np.testing.assert_allclose(np.asarray(sel[1, 1]), np.asarray(vals[1, 3]))

    v = Vocab(words=["cat", "dog"])
    assert v.to_indices(["cat", "zebra"]) == [4, 3]  # 4 specials first, unk=3
    assert v.to_tokens([4]) == ["cat"]

    img = np.ones((10, 12, 3), np.float32)
    padded, mask = pad_to_shape(img, 16, 16)
    assert padded.shape == (16, 16, 3) and mask[0, 0] == False  # noqa: E712
    assert mask[15, 15] == True  # noqa: E712
    assert len(ten_crop(np.ones((20, 20, 3)), 8)) == 10
    assert patchify(np.ones((8, 8, 3)), 4).shape == (4, 48)
    assert count_parameters({"a": jnp.ones((2, 3))}) == 6
