import jax
import jax.numpy as jnp
import numpy as np
import pytest

from antmmf_tpu.models.base_model import build_model
from antmmf_tpu.models.univl import UnivlForVideoTextRetrieval
from antmmf_tpu.models.univl_pretrain import UnivlForVideoPretraining


def _batch(B=4, F=2, size=32, L=12, vocab=30522, with_mlm=True):
    rng = np.random.default_rng(0)
    b = {
        "image_data": rng.standard_normal((B, F, size, size, 3)).astype(np.float32),
        "video_mask": np.ones((B, F), np.int64),
        "caption_input_ids": rng.integers(0, vocab, (B, L)).astype(np.int64),
        "caption_input_mask": np.ones((B, L), np.int64),
        "caption_segment_ids": np.zeros((B, L), np.int64),
    }
    if with_mlm:
        lm = np.full((B, L), -1, np.int64)
        lm[:, 2] = b["caption_input_ids"][:, 2]
        b["caption_lm_label_ids"] = lm
    return b


TINY = dict(vit_preset="vit_tiny_test", bert_preset="bert_tiny_test",
            image_size=32, embed_dim=32, dtype_str="float32")


def test_retrieval_model_shapes_and_losses():
    model = UnivlForVideoTextRetrieval(**TINY)
    batch = _batch()
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch)
    out = model.apply(variables, batch)
    assert out["l1_simi"].shape == (4, 4)
    assert out["text_embed"].shape == (4, 32)
    assert "level1_similarity_loss" in out["losses"]
    # embeddings are L2-normalised
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["text_embed"]), axis=-1), 1.0, atol=1e-3)


def test_retrieval_model_clip_pooling():
    model = UnivlForVideoTextRetrieval(**{**TINY, "n_clips": 2})
    batch = _batch(F=4)  # 2 clips × 2 frames
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch)
    out = model.apply(variables, batch)
    assert out["l1_simi"].shape == (4, 4)


def test_retrieval_cross_encoder_path():
    model = UnivlForVideoTextRetrieval(**{**TINY, "with_cross_encoder": True,
                                          "cross_layers": 1})
    batch = _batch()
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch)
    out = model.apply(variables, batch)
    assert out["l2_simi"].shape == (4, 4)
    assert "level2_similarity_loss" in out["losses"]


def test_pretrain_model_all_objectives():
    model = UnivlForVideoPretraining(
        **TINY, cross_layers=1, with_vtc=True, with_vtm=True, with_mlm=True,
        dual_mlm=True, with_fom=True)
    batch = _batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, batch)
    out = model.apply(variables, batch, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    for key in ("vtc_loss", "itm_loss", "masked_lm_loss", "text_masked_lm_loss",
                "fom_loss"):
        assert key in out["losses"], key
        assert np.isfinite(float(out["losses"][key])), key
    assert "masked_lm_acc" in out["metrics"]


def test_pretrain_gradients_flow_everywhere():
    model = UnivlForVideoPretraining(
        **TINY, cross_layers=1, with_vtc=True, with_vtm=True, with_mlm=True)
    batch = _batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, batch)

    def total(params):
        out = model.apply({"params": params}, batch, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(2)})
        return sum(jnp.mean(v) for v in out["losses"].values())

    grads = jax.grad(total)(variables["params"])
    norms = jax.tree_util.tree_map(lambda g: float(jnp.abs(g).sum()), grads)
    flat = jax.tree_util.tree_leaves(norms)
    nonzero = sum(1 for n in flat if n > 0)
    assert nonzero / len(flat) > 0.9  # nearly all params receive gradient


def test_build_model_from_config_registry():
    shell = build_model({"model_attributes": {"univl_pretrain": {
        **TINY, "cross_layers": 1}}})
    batch = _batch()
    variables = shell.init(jax.random.PRNGKey(0), batch)
    loss, (out, scalars) = shell.loss_fn(variables, batch,
                                         rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(float(loss))
    assert "total_loss" in scalars


def test_moco_queue_training_path():
    import antmmf_tpu.modules.moco as moco_mod  # noqa: F401

    model = UnivlForVideoTextRetrieval(**TINY, with_queue=True, queue_size=8)
    batch = _batch()
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch)
    assert "moco" in variables
    out, updated = model.apply(variables, batch, deterministic=False,
                               mutable=["moco"])
    assert np.isfinite(float(out["losses"]["level1_similarity_loss"]))
    assert int(updated["moco"]["text_queue"]["filled"]) == 4

    # through the shell: updated collections surface in the output
    from antmmf_tpu.models.base_model import ModelShell

    shell = ModelShell(model)
    loss, (output, scalars) = shell.loss_fn(variables, batch)
    upd = output["_updated_collections"]
    assert int(upd["moco"]["video_queue"]["filled"]) == 4
    # eval path: no queue mutation
    loss2, (output2, _) = shell.loss_fn(variables, batch, deterministic=True)
    assert "_updated_collections" not in output2
