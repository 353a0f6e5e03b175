"""ToMe token merging (arXiv:2210.09461): bipartite soft matching unit
behavior + ViT integration (static shapes shrink by r per block)."""

import jax
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.modules.vision.token_merging import tome_merge
from antmmf_tpu.modules.vision.vit import build_vit


def test_tome_merges_most_similar_pair():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 8, 4)).astype(np.float32)
    x[0, 3] = x[0, 2] * 2.0  # token 3 (odd=dst set) ∝ token 2 (even=src set)
    xj = jnp.asarray(x)
    size = jnp.ones((1, 8), jnp.float32)
    out, sizes = tome_merge(xj, size, r=1)
    assert out.shape == (1, 7, 4) and sizes.shape == (1, 7)
    # token 2 merged into token 3's slot: one size-2 token, weighted mean
    assert float(sizes.max()) == 2.0
    merged_row = np.asarray(out)[0][np.asarray(sizes)[0] == 2.0][0]
    np.testing.assert_allclose(
        merged_row, (x[0, 2] + x[0, 3]) / 2.0, rtol=1e-5)


def test_tome_protects_cls():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 10, 8)).astype(np.float32)
    # make CLS identical to an odd token — it must STILL never merge
    x[:, 0] = x[:, 1]
    xj = jnp.asarray(x)
    out, sizes = tome_merge(xj, jnp.ones((2, 10), jnp.float32), r=2)
    assert out.shape == (2, 8, 8)
    np.testing.assert_allclose(np.asarray(out)[:, 0], x[:, 0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sizes)[:, 0], 1.0)


def test_tome_r_zero_is_identity():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 6, 4)),
                    jnp.float32)
    s = jnp.ones((1, 6), jnp.float32)
    out, sizes = tome_merge(x, s, r=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_vit_token_merge_shapes_and_baseline():
    imgs = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 32, 32, 3)),
        jnp.float32)
    base = build_vit("vit_tiny_test", image_size=32, dtype=jnp.float32)
    tome = build_vit("vit_tiny_test", image_size=32, dtype=jnp.float32,
                     token_merge_r=2)
    v = base.init(jax.random.PRNGKey(0), imgs)
    out_base = base.apply(v, imgs)
    out_tome = tome.apply(v, imgs)  # same params — ToMe adds none
    # tiny ViT: 2 layers, (32/16)^2+1 = 5 tokens; one merge of r=2 → 3
    assert out_base["sequence"].shape == (2, 5, 64)
    assert out_tome["sequence"].shape == (2, 3, 64)
    assert np.isfinite(np.asarray(out_tome["pooled"])).all()
    # CLS readout stays index 0; with merging the pooled embedding should
    # stay correlated with the unmerged one
    a = np.asarray(out_base["pooled"], np.float32).reshape(2, -1)
    b = np.asarray(out_tome["pooled"], np.float32).reshape(2, -1)
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                             * np.linalg.norm(b, axis=-1) + 1e-8)
    assert (cos > 0.8).all(), cos


def test_retrieval_model_with_token_merging():
    from antmmf_tpu.models.univl import UnivlForVideoTextRetrieval

    m = UnivlForVideoTextRetrieval(
        vit_preset="vit_tiny_test", bert_preset="bert_tiny_test",
        image_size=32, embed_dim=32, dtype_str="float32", token_merge_r=1)
    rng = np.random.default_rng(4)
    batch = {
        "image_data": rng.standard_normal((2, 2, 32, 32, 3)).astype(
            np.float32),
        "video_mask": np.ones((2, 2), np.int64),
        "caption_input_ids": rng.integers(0, 30522, (2, 8)).astype(np.int64),
        "caption_input_mask": np.ones((2, 8), np.int64),
        "caption_segment_ids": np.zeros((2, 8), np.int64),
    }
    v = m.init(jax.random.PRNGKey(0), batch)
    out = m.apply(v, batch, deterministic=True)
    assert out["l1_simi"].shape == (2, 2)
    assert np.isfinite(np.asarray(out["l1_simi"])).all()
