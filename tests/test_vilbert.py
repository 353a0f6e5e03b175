import jax
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.models.base_model import build_model

TINY = {"vocab_size": 1000, "text_hidden": 32, "visual_hidden": 32,
        "visual_dim": 16, "num_text_layers": 1, "num_visual_layers": 1,
        "num_co_layers": 1, "num_heads_text": 2, "num_heads_visual": 2,
        "dtype_str": "float32"}


def _batch(B=2, L=6, R=4):
    rng = np.random.default_rng(0)
    return {
        "input_ids": rng.integers(0, 1000, (B, L)).astype(np.int64),
        "input_mask": np.ones((B, L), np.int64),
        "image_feature": rng.standard_normal((B, R, 16)).astype(np.float32),
        "image_boxes": rng.random((B, R, 5)).astype(np.float32),
        "lm_label_ids": np.where(np.arange(L) == 1,
                                 rng.integers(0, 1000, (B, L)), -1).astype(np.int64),
        "masked_regions": np.zeros((B, R), np.int64),
        "alignment_labels": np.array([0, 1], np.int64),
        "targets": np.array([0, 1], np.int64),
    }


def test_vilbert_classification():
    shell = build_model({"model_attributes": {"vilbert": {**TINY,
                                                          "num_labels": 3}}})
    b = _batch()
    variables = shell.init(jax.random.PRNGKey(0), b)
    out = shell.apply(variables, b)
    assert out["logits"].shape == (2, 3)
    assert out["pooled_output"].shape == (2, 64)


def test_vilbert_pretraining_heads():
    shell = build_model({"model_attributes": {"vilbert": {
        **TINY, "training_head_type": "pretraining"}}})
    b = _batch()
    b["masked_regions"][:, 1] = 1
    variables = shell.init(jax.random.PRNGKey(0), b)
    out = shell.apply(variables, b)
    for key in ("masked_lm_loss", "masked_region_loss", "alignment_loss"):
        assert key in out["losses"], key
        assert np.isfinite(float(out["losses"][key]))


def test_vilbert_coattention_uses_visual():
    shell = build_model({"model_attributes": {"vilbert": {**TINY}}})
    b = _batch()
    variables = shell.init(jax.random.PRNGKey(0), b)
    o1 = shell.apply(variables, b)
    b2 = dict(b)
    b2["image_feature"] = b["image_feature"] + 10.0
    o2 = shell.apply(variables, b2)
    assert float(np.abs(np.asarray(o1["logits"]) -
                        np.asarray(o2["logits"])).max()) > 1e-4


def test_vilbert_pretraining_mrc_kl_task():
    import jax
    import numpy as np

    from antmmf_tpu.models.vilbert import ViLBERT

    model = ViLBERT(training_head_type="pretraining", vocab_size=300,
                    text_hidden=32, visual_hidden=32, visual_dim=16,
                    num_text_layers=1, num_visual_layers=1, num_co_layers=1,
                    num_heads_text=2, num_heads_visual=2, region_classes=5,
                    dtype_str="float32")
    rng = np.random.default_rng(0)
    B, L, R = 2, 6, 4
    batch = {
        "input_ids": rng.integers(1, 300, (B, L)).astype(np.int64),
        "input_mask": np.ones((B, L), np.int64),
        "image_feature": rng.standard_normal((B, R, 16)).astype(np.float32),
        "lm_label_ids": np.full((B, L), -1, np.int64),
        "masked_regions": rng.integers(0, 2, (B, R)).astype(np.int64),
        "region_cls_dis": rng.dirichlet(np.ones(5), (B, R)).astype(np.float32),
        "alignment_labels": rng.integers(0, 2, (B,)).astype(np.int64),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, deterministic=True)
    out = model.apply(variables, batch, deterministic=True)
    assert "masked_region_classification" in out["losses"]
    assert "masked_region_loss" in out["losses"]
    assert "alignment_loss" in out["losses"]
    assert np.isfinite(float(sum(
        np.mean(v) for v in out["losses"].values())))
