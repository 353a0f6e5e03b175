"""L2 hard-negative mining (reference _cross_similarity_hard_mining,
univl_video_ret.py:91-144): training cross-encodes B·k pairs, not B²."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from antmmf_tpu.models.univl import UnivlForVideoTextRetrieval


@pytest.fixture(scope="module")
def model_and_batch():
    model = UnivlForVideoTextRetrieval(
        vit_preset="vit_tiny_test", bert_preset="bert_tiny_test",
        image_size=32, embed_dim=32, n_clips=1, dtype_str="float32",
        with_cross_encoder=True, cross_layers=1, hard_mining_k=3)
    rng = np.random.default_rng(0)
    B = 6
    batch = {
        "image_data": rng.standard_normal((B, 2, 32, 32, 3)).astype(np.float32),
        "video_mask": np.ones((B, 2), np.int64),
        "caption_input_ids": rng.integers(0, 30522, (B, 8)).astype(np.int64),
        "caption_input_mask": np.ones((B, 8), np.int64),
        "caption_segment_ids": np.zeros((B, 8), np.int64),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, deterministic=True)
    return model, variables, batch


def test_training_uses_mined_pairs(model_and_batch):
    model, variables, batch = model_and_batch
    out = model.apply(variables, batch, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    B = batch["caption_input_ids"].shape[0]
    assert "l2_pair_scores" in out and out["l2_pair_scores"].shape == (B, 3)
    cols = np.asarray(out["l2_pair_cols"])
    # positive in column 0; negatives never equal the positive
    np.testing.assert_array_equal(cols[:, 0], np.arange(B))
    assert (cols[:, 1:] != np.arange(B)[:, None]).all()
    assert np.isfinite(float(out["losses"]["level2_similarity_loss"]))


def test_eval_still_full_grid(model_and_batch):
    model, variables, batch = model_and_batch
    out = model.apply(variables, batch, deterministic=True)
    B = batch["caption_input_ids"].shape[0]
    assert out["l2_simi"].shape == (B, B)


def test_gradient_flows_to_cross_encoder(model_and_batch):
    model, variables, batch = model_and_batch

    def loss_fn(params):
        out = model.apply({"params": params}, batch, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(3)})
        return out["losses"]["level2_similarity_loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    cross = [jnp.abs(v).sum() for p, v in flat
             if "cross" in "/".join(str(getattr(x, "key", x)) for x in p)]
    assert cross, "no cross-encoder params found"
    assert float(sum(cross)) > 0.0, "no gradient reached the cross encoder"


def test_mined_negatives_are_hardest(model_and_batch):
    model, variables, batch = model_and_batch
    out = model.apply(variables, batch, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    sim = np.asarray(out["l1_simi"])
    cols = np.asarray(out["l2_pair_cols"])
    B = sim.shape[0]
    for i in range(B):
        masked = sim[i].copy()
        masked[i] = -np.inf
        expect = set(np.argsort(-masked)[:2].tolist())
        assert set(cols[i, 1:].tolist()) == expect
