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
