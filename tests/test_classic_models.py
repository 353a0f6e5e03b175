import jax
import jax.numpy as jnp
import numpy as np
import pytest

from antmmf_tpu.common.registry import registry
from antmmf_tpu.models.base_model import build_model


def _batch(B=2, size=32, L=8, R=4):
    rng = np.random.default_rng(0)
    return {
        "image_data": rng.standard_normal((B, size, size, 3)).astype(np.float32),
        "image_feature": rng.standard_normal((B, R, 16)).astype(np.float32),
        "input_ids": rng.integers(0, 30522, (B, L)).astype(np.int64),
        "input_mask": np.ones((B, L), np.int64),
        "segment_ids": np.zeros((B, L), np.int64),
        "lm_label_ids": np.where(np.arange(L) == 2,
                                 rng.integers(0, 30522, (B, L)), -1).astype(np.int64),
        "targets": np.array([0, 1], np.int64),
    }


TINY = {"vit_preset": "vit_tiny_test", "bert_preset": "bert_tiny_test",
        "image_size": 32, "dtype_str": "float32"}


def _run(name, extra=None, batch=None):
    cfg = {"model_attributes": {name: {**TINY, **(extra or {})}}}
    shell = build_model(cfg)
    b = batch or _batch()
    variables = shell.init(jax.random.PRNGKey(0), b)
    return shell.apply(variables, b)


def test_two_tower_vqa():
    out = _run("ant_mmf", {"num_labels": 10})
    assert out["logits"].shape == (2, 10)


def test_two_tower_ablations():
    assert _run("ant_mmf", {"num_labels": 4, "modality": "text_only"})[
        "logits"].shape == (2, 4)
    assert _run("ant_mmf", {"num_labels": 4, "modality": "image_only"})[
        "logits"].shape == (2, 4)


def test_mmbt():
    out = _run("mmbt", {"num_labels": 3, "num_image_tokens": 4})
    assert out["logits"].shape == (2, 3)


def test_visual_bert_classification():
    out = _run("visual_bert", {"num_labels": 5, "visual_dim": 16,
                               "bert_preset": "bert_tiny_test"})
    assert out["logits"].shape == (2, 5)


def test_visual_bert_pretraining_mlm():
    out = _run("visual_bert", {"training_head_type": "pretraining",
                               "visual_dim": 16})
    assert "masked_lm_loss" in out["losses"]
    assert np.isfinite(float(out["losses"]["masked_lm_loss"]))


def test_concat_bert():
    out = _run("concat_bert", {"num_labels": 2})
    assert out["logits"].shape == (2, 2)


def test_openai_clip_dual_tower():
    out = _run("openai_clip", {"embed_dim": 16})
    assert out["sim"].shape == (2, 2)
    assert "clip_contrastive_loss" in out["losses"]


def test_cnn_lstm():
    cfg = {"model_attributes": {"cnn_lstm": {"num_labels": 4,
                                             "text_embed_dim": 16,
                                             "lstm_dim": 16}}}
    shell = build_model(cfg)
    b = _batch()
    variables = shell.init(jax.random.PRNGKey(0), b)
    out = shell.apply(variables, b)
    assert out["logits"].shape == (2, 4)


def test_multitask_model():
    out = _run("multitask_model", {"task_heads": (2, 3)})
    assert out["task_0_logits"].shape == (2, 2)
    assert out["task_1_logits"].shape == (2, 3)


def test_all_expected_models_registered():
    for name in ("ant_mmf", "mmbt", "visual_bert", "concat_bert", "openai_clip",
                 "cnn_lstm", "multitask_model", "univl", "univl_retrieval",
                 "univl_pretrain"):
        assert registry.get_model_class(name, default=None) is not None, name


def test_simple_models():
    import numpy as np

    b = _batch()
    out = _run("bert", {"num_labels": 3})
    assert out["logits"].shape == (2, 3)
    cfg = {"model_attributes": {"cnn": {"num_labels": 2}}}
    shell = build_model(cfg)
    v = shell.init(jax.random.PRNGKey(0), b)
    assert shell.apply(v, b)["logits"].shape == (2, 2)
    out = _run("image_model", {"num_labels": 7})
    assert out["logits"].shape == (2, 7)


def test_top_down_bottom_up_attention():
    out = _run("top_down_bottom_up", {"visual_dim": 16, "hidden": 16,
                                      "num_labels": 5})
    assert out["logits"].shape == (2, 5)
    att = np.asarray(out["attention"])
    np.testing.assert_allclose(att.sum(-1), 1.0, rtol=1e-5)


def test_attri_mmbt():
    b = _batch()
    b["attribute_ids"] = np.random.default_rng(0).integers(
        0, 30522, (2, 3)).astype(np.int64)
    cfg = {"model_attributes": {"attri_mmbt": {**TINY, "num_labels": 2,
                                               "num_image_tokens": 4}}}
    shell = build_model(cfg)
    v = shell.init(jax.random.PRNGKey(0), b)
    assert shell.apply(v, b)["logits"].shape == (2, 2)
