import jax
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.models.base_model import build_model
from antmmf_tpu.models.dmae import wti_similarity


def _batch(B=3, F=2, size=32, L=8):
    rng = np.random.default_rng(0)
    return {
        "image_data": rng.standard_normal((B, F, size, size, 3)).astype(np.float32),
        "video_mask": np.ones((B, F), np.int64),
        "caption_input_ids": rng.integers(0, 21128, (B, L)).astype(np.int64),
        "caption_input_mask": np.ones((B, L), np.int64),
        "caption_segment_ids": np.zeros((B, L), np.int64),
    }


def test_wti_similarity_math():
    # 1 text with 2 tokens, 2 videos with 1 token each
    t = jnp.array([[[1.0, 0.0], [0.0, 1.0]]])
    tw = jnp.array([[0.5, 0.5]])
    v = jnp.array([[[1.0, 0.0]], [[0.0, -1.0]]])
    vw = jnp.array([[1.0], [1.0]])
    tm = jnp.ones((1, 2)); vm = jnp.ones((2, 1))
    sim = wti_similarity(t, tw, v, vw, tm, vm)
    # video0: t2v = 0.5*1 + 0.5*0 = 0.5 ; v2t = max(1,0)=1 → 0.75
    # video1: t2v = 0.5*0 + 0.5*(-1) = -0.5 ; v2t = max(0,-1)=0 → -0.25
    np.testing.assert_allclose(np.asarray(sim), [[0.75, -0.25]], atol=1e-6)


def test_wti_respects_masks():
    t = jnp.array([[[1.0, 0.0], [9.0, 9.0]]])  # token 1 masked out
    tw = jnp.array([[1.0, 0.0]])
    v = jnp.array([[[1.0, 0.0], [5.0, 5.0]]])  # video token 1 masked
    vw = jnp.array([[1.0, 0.0]])
    sim = wti_similarity(t, tw, v, vw, jnp.array([[1, 0]]), jnp.array([[1, 0]]))
    np.testing.assert_allclose(np.asarray(sim), [[1.0]], atol=1e-6)


def test_dmae_model_losses_and_outputs():
    cfg = {"model_attributes": {"dmae_retrieval": {
        "vit_preset": "vit_tiny_test", "bert_preset": "bert_tiny_test",
        "image_size": 32, "embed_dim": 32, "temporal_layers": 1,
        "dtype_str": "float32", "neg_nce_margin": 0.2, "neg_nce_weight": 2.0}}}
    shell = build_model(cfg)
    b = _batch()
    variables = shell.init(jax.random.PRNGKey(0), b)
    out = shell.apply(variables, b)
    assert out["l1_simi"].shape == (3, 3) and out["l3_simi"].shape == (3, 3)
    assert "level1_similarity_loss" in out["losses"]
    assert "level3_similarity_loss" in out["losses"]
    loss, (o, scalars) = shell.loss_fn(variables, b)
    assert np.isfinite(float(loss))


def test_m2_encoder_dense_and_moe():
    base = {"preset": "m2_tiny_test", "image_size": 32, "patch_size": 16,
            "max_text_len": 8, "embed_dim_out": 16, "dtype_str": "float32"}
    b = _batch()
    for extra in ({}, {"moe_layers": (1,), "moe_num_experts": 2}):
        cfg = {"model_attributes": {"m2_encoder": {**base, **extra}}}
        shell = build_model(cfg)
        variables = shell.init(jax.random.PRNGKey(0), b)
        out = shell.apply(variables, b)
        assert out["sim"].shape == (3, 3)
        assert "contrastive_loss" in out["losses"]
        if extra:
            assert "moe_aux_loss" in out["losses"]


def test_m2_encoder_chunked_loss_matches_dense():
    base = {"preset": "m2_tiny_test", "image_size": 32, "patch_size": 16,
            "embed_dim_out": 16, "dtype_str": "float32"}
    b = _batch()
    dense = build_model({"model_attributes": {"m2_encoder": base}})
    chunked = build_model({"model_attributes": {"m2_encoder": {
        **base, "use_chunked_loss": True, "chunk_size": 2}}})
    v = dense.init(jax.random.PRNGKey(0), b)
    o1 = dense.apply(v, b)
    o2 = chunked.apply(v, b)
    np.testing.assert_allclose(float(o1["losses"]["contrastive_loss"]),
                               float(o2["losses"]["contrastive_loss"]), rtol=1e-5)


def test_m2_multiway_fusion_stream_and_itm():
    """VLMo depth: fused VL stream (segment routing → vl expert) + ITM head
    + per-expert norms + LayerScale."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from antmmf_tpu.models.m2_encoder import M2Encoder

    model = M2Encoder(preset="m2_tiny_test", image_size=32, patch_size=16,
                      max_text_len=8, embed_dim_out=16, with_itm=True,
                      vlffn_start_layer=1, layerscale_init=0.1,
                      dtype_str="float32")
    rng = np.random.default_rng(0)
    B = 4
    batch = {
        "image_data": rng.standard_normal((B, 32, 32, 3)).astype(np.float32),
        "input_ids": rng.integers(0, 21128, (B, 8)).astype(np.int64),
        "input_mask": np.ones((B, 8), np.int64),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch, deterministic=True)
    assert out["itm_logits"].shape == (2 * B, 2)
    assert "itm_loss" in out["losses"]
    assert np.isfinite(float(out["losses"]["itm_loss"]))
    # param structure proves the multiway depth: 3 experts with separate
    # norms appear in the vlffn block; layerscale gammas exist
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    paths = {"/".join(str(getattr(p, "key", p)) for p in path)
             for path, _ in flat}
    assert any("block_1/ffn_expert_2" in p for p in paths), "no VL expert"
    assert any("norm2_expert_0" in p for p in paths)
    assert any("norm2_expert_1" in p for p in paths)
    assert any("gamma_1" in p for p in paths)


def test_m2_fusion_segment_routing_before_vlffn():
    """Before vlffn_start_layer the fused stream routes text/image segments
    through their own experts — gradients from a text-segment loss must reach
    the language expert of block 0, not the vision expert's weights only."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from antmmf_tpu.models.m2_encoder import M2Encoder

    model = M2Encoder(preset="m2_tiny_test", image_size=32, patch_size=16,
                      max_text_len=8, embed_dim_out=16, with_itm=True,
                      vlffn_start_layer=1, dtype_str="float32")
    rng = np.random.default_rng(1)
    B = 2
    batch = {
        "image_data": rng.standard_normal((B, 32, 32, 3)).astype(np.float32),
        "input_ids": rng.integers(0, 21128, (B, 8)).astype(np.int64),
        "input_mask": np.ones((B, 8), np.int64),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)

    def loss(params):
        out = model.apply({"params": params}, batch, deterministic=True)
        return out["losses"]["itm_loss"]

    grads = jax.grad(loss)(variables["params"])
    b0 = grads["encoder"]["block_0"]
    g_lang = sum(float(jnp.abs(x).sum()) for x in
                 jax.tree_util.tree_leaves(b0[f"ffn_expert_1"]))
    g_vis = sum(float(jnp.abs(x).sum()) for x in
                jax.tree_util.tree_leaves(b0[f"ffn_expert_0"]))
    assert g_lang > 0 and g_vis > 0


def test_dmae_l3_corpus_metric_and_early_stopping(tmp_path):
    """The dmae monitored metric val/l3_simi_t2v-mean_recall flows end-to-end:
    WTI components cached by the retrieval trainer -> corpus L3 grid ->
    EarlyStopping tracks it (round-1 Weak #10)."""
    import os

    import numpy as np

    from antmmf_tpu.common.build import build_config
    from antmmf_tpu.trainers.build import build_trainer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = build_config(
        os.path.join(root, "projects", "dmae_vtp", "configs",
                     "msrvtt_retrieval.local.yml"),
        opts=["training_parameters.save_dir", str(tmp_path),
              "training_parameters.max_iterations", "4",
              "training_parameters.snapshot_interval", "4",
              "training_parameters.monitored_metric", "l3_simi_t2v-mean_recall",
              "training_parameters.metric_minimize", "false",
              "training_parameters.seed", "5"])
    trainer = build_trainer(cfg)
    trainer.load()
    trainer.train()
    metrics = trainer.evaluate_set("val")
    assert "l3_simi_t2v-mean_recall" in metrics, sorted(metrics)
    assert "l3_simi_t2v-r@1" in metrics and "l3_simi_v2t-r@1" in metrics
    assert 0.0 <= metrics["l3_simi_t2v-mean_recall"] <= 100.0
    # early stopping actually consumed the monitored metric
    assert trainer.early_stopping.monitored_metric == \
        "val/l3_simi_t2v-mean_recall"
    assert np.isfinite(trainer.early_stopping.best_value)
    assert trainer.early_stopping.best_value > -np.inf


def test_zero_shot_eval_harness():
    """Zero-shot classification harness (M2-Encoder headline metric): class
    prompt ensembling + cosine argmax; a model whose text/image embeds align
    on class 0/1 scores 100%."""
    import numpy as np

    from antmmf_tpu.scripts.zero_shot_eval import (
        build_class_embeddings,
        zero_shot_accuracy,
    )

    D = 8
    rng = np.random.default_rng(0)
    basis = np.eye(2, D, dtype=np.float32)

    def tokenize(text):
        cls = 0 if "cat" in text else 1
        return {"input_ids": np.full((4,), cls, np.int64),
                "input_mask": np.ones((4,), np.int64)}

    def encode_text(ids, mask):
        cls = ids[:, 0]
        noise = rng.normal(0, 0.01, (len(cls), D)).astype(np.float32)
        e = basis[cls] + noise
        return e / np.linalg.norm(e, axis=-1, keepdims=True)

    class_embeds = build_class_embeddings(
        encode_text, tokenize, ["cat", "dog"], batch_size=3)
    assert class_embeds.shape == (2, D)
    np.testing.assert_allclose(np.linalg.norm(class_embeds, axis=-1), 1.0,
                               rtol=1e-5)

    img = np.concatenate([np.tile(basis[0], (5, 1)),
                          np.tile(basis[1], (5, 1))])
    targets = np.array([0] * 5 + [1] * 5)
    m = zero_shot_accuracy(img, class_embeds, targets)
    assert m["zero_shot_top1"] == 100.0
    # flipped targets → 0%
    m2 = zero_shot_accuracy(img, class_embeds, 1 - targets)
    assert m2["zero_shot_top1"] == 0.0


def test_m2_encoder_predictor_serving():
    """Serving surface (reference prj/M2_Encoder/m2_encoder.py NN4K executor +
    ms_wrapper): text/image embedding extraction + zero-shot similarity."""
    import numpy as np

    import antmmf_tpu.predictors  # noqa: F401 — registry side effects
    from antmmf_tpu.common.registry import registry

    cfg = {
        "model_attributes": {"m2_encoder": {
            "preset": "m2_tiny_test", "image_size": 32,
            "dtype_str": "float32"}},
        "predictor_parameters": {"image_size": 32, "max_text_len": 16},
    }
    cls = registry.get_predictor_class("m2_encoder_predictor")
    pred = cls(cfg).load(with_ckpt=False)

    texts = ["a dog", "a cat"]
    images = np.zeros((2, 32, 32, 3), np.float32)
    t = pred.predict({"texts": texts, "extract_feat": "text"})
    assert np.asarray(t["text_embeddings"]).shape[0] == 2
    # embeddings are L2-normalized
    assert abs(np.linalg.norm(t["text_embeddings"][0]) - 1.0) < 1e-3

    i = pred.predict({"images": images, "extract_feat": "image"})
    assert np.asarray(i["image_embeddings"]).shape[0] == 2

    zs = pred.predict({"texts": texts, "images": images[0]})
    probs = np.asarray(zs["probs"])
    assert probs.shape == (1, 2)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
