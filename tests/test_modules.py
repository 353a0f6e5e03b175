import jax
import jax.numpy as jnp
import numpy as np
import pytest

from antmmf_tpu.modules.encoders.text_encoder import BertEncoder, build_bert
from antmmf_tpu.modules.layers import make_attention_mask
from antmmf_tpu.modules.transformers.base import TransformerEncoder
from antmmf_tpu.modules.transformers.heads.fom import FOMHead
from antmmf_tpu.modules.transformers.heads.itm import ITMHead
from antmmf_tpu.modules.transformers.heads.mlm import MLMHead
from antmmf_tpu.modules.vision.vit import build_vit

F32 = jnp.float32


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


def test_transformer_encoder_shapes(rng):
    enc = TransformerEncoder(num_layers=2, num_heads=2, dtype=F32)
    x = jnp.ones((2, 10, 32))
    params = enc.init(rng, x)
    out = enc.apply(params, x)
    assert out.shape == (2, 10, 32)


def test_padding_mask_invariance(rng):
    """Valid-token outputs must not depend on padding-token content (post-LN BERT)."""
    enc = BertEncoder(vocab_size=100, hidden_size=32, num_layers=2, num_heads=2,
                      dtype=F32)
    ids1 = jnp.array([[5, 6, 7, 0, 0]])
    ids2 = jnp.array([[5, 6, 7, 99, 42]])  # different padding content
    mask = jnp.array([[1, 1, 1, 0, 0]])
    params = enc.init(rng, ids1, mask)
    o1 = enc.apply(params, ids1, mask)["sequence_output"]
    o2 = enc.apply(params, ids2, mask)["sequence_output"]
    np.testing.assert_allclose(np.asarray(o1[:, :3]), np.asarray(o2[:, :3]),
                               atol=1e-5)


def test_vit_forward_and_pos_interp(rng):
    vit = build_vit("vit_tiny_test", image_size=32, output_dim=16, dtype=F32)
    imgs = jnp.ones((2, 32, 32, 3))
    params = vit.init(rng, imgs)
    out = vit.apply(params, imgs)
    assert out["sequence"].shape == (2, 1 + 4, 64)
    assert out["pooled"].shape == (2, 16)
    # off-resolution input reuses the same params via 2D pos interpolation
    out48 = vit.apply(params, jnp.ones((2, 48, 48, 3)))
    assert out48["sequence"].shape == (2, 1 + 9, 64)


def test_bert_presets():
    b = build_bert("bert_tiny_test")
    assert b.num_layers == 2 and b.vocab_size == 30522


def test_mlm_head_tied_and_loss(rng):
    head = MLMHead(vocab_size=50, hidden_size=16, dtype=F32)
    seq = jnp.ones((2, 4, 16))
    table = jax.random.normal(rng, (50, 16))
    params = head.init(rng, seq, table)
    logits = head.apply(params, seq, table)
    assert logits.shape == (2, 4, 50) and logits.dtype == jnp.float32

    labels = jnp.array([[3, -1, -1, 7], [-1, -1, -1, -1]])
    lm = MLMHead.loss_metric(logits, labels)
    assert lm["losses"]["masked_lm_loss"].shape == ()
    # all-ignored rows contribute nothing; loss is finite
    assert np.isfinite(float(lm["losses"]["masked_lm_loss"]))

    # perfect logits give ~zero loss and accuracy 1
    perfect = jax.nn.one_hot(jnp.maximum(labels, 0), 50) * 100.0
    lm2 = MLMHead.loss_metric(perfect, labels)
    assert float(lm2["metrics"]["masked_lm_acc"]) == 1.0
    assert float(lm2["losses"]["masked_lm_loss"]) < 1e-3


def test_itm_head(rng):
    head = ITMHead(hidden_size=8, dtype=F32)
    pooled = jnp.ones((4, 8))
    params = head.init(rng, pooled)
    logits = head.apply(params, pooled)
    labels = jnp.array([0, 1, 0, 1])
    lm = ITMHead.loss_metric(logits, labels)
    assert 0.0 <= float(lm["metrics"]["itm_acc"]) <= 1.0


def test_fom_head_loss():
    logits = jax.nn.one_hot(jnp.array([[2, 0, 1]]), 4) * 50.0
    targets = jnp.array([[2, 0, 1]])
    valid = jnp.array([[True, True, False]])
    lm = FOMHead.loss_metric(logits, targets, valid)
    assert float(lm["metrics"]["fom_acc"]) == 1.0


def test_attention_bias_blocks_padding():
    bias = make_attention_mask(jnp.array([[1, 1, 0]]))
    assert bias.shape == (1, 1, 1, 3)
    assert float(bias[0, 0, 0, 2]) < -1e30 and float(bias[0, 0, 0, 0]) == 0.0


def test_scan_layers_matches_loop():
    """scan-over-layers output matches the unrolled loop when weights are
    copied across (same per-layer params)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 32))
    loop_enc = TransformerEncoder(num_layers=3, num_heads=2, dtype=F32,
                                  final_norm=False)
    scan_enc = TransformerEncoder(num_layers=3, num_heads=2, dtype=F32,
                                  final_norm=False, scan_layers=True)
    lp = loop_enc.init(jax.random.PRNGKey(1), x)["params"]
    # stack loop params [layer_0, layer_1, layer_2] into the scan layout
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves),
        *[lp[f"layer_{i}"] for i in range(3)])
    out_loop = loop_enc.apply({"params": lp}, x)
    out_scan = scan_enc.apply({"params": {"layers": stacked}}, x)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_loop),
                               atol=1e-5)


def test_saliency_export_files(tmp_path):
    import json

    import numpy as np

    from antmmf_tpu.modules.interpret.saliency import export_saliency

    results = [{
        "saliency": np.array([[0.7, 0.2, 0.1], [0.1, 0.8, 0.1]], np.float32),
        "input_ids": np.array([[101, 2003, 102], [101, 2054, 102]]),
    }]
    paths = export_saliency(results, str(tmp_path))
    assert any(p.endswith(".json") for p in paths)
    assert any(p.endswith(".html") for p in paths)
    rec = json.load(open(paths[0]))
    assert len(rec["saliency"]) == 2
    html = open(paths[-1]).read()
    assert "rgba(255,80,80,1.000" in html  # the peak token is fully shaded


def test_modules_utils_helpers():
    """get_mask / tiny_value_of_dtype / time_distributed
    (reference modules/utils.py:14-524)."""
    import pytest

    from antmmf_tpu.modules.utils import (
        get_mask,
        time_distributed,
        tiny_value_of_dtype,
    )

    m = get_mask(jnp.asarray([0, 2, 3]), 3)
    assert m.tolist() == [[0, 0, 0], [1, 1, 0], [1, 1, 1]]

    assert tiny_value_of_dtype(jnp.float32) == 1e-13
    assert tiny_value_of_dtype(jnp.bfloat16) == 1e-4
    with pytest.raises(TypeError):
        tiny_value_of_dtype(jnp.int32)

    x = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 4)
    out = time_distributed(lambda v: v.sum(-1), x)
    assert out.shape == (2, 3)
    assert float(out[0, 0]) == float(x[0, 0].sum())


def test_classifier_bert_and_transformer_decoder_types():
    """bert + transformer_decoder classifier types (reference
    modules/classifier/bert_classifier_head.py:13, transformer_decoder.py:11)."""
    import jax

    from antmmf_tpu.modules.classifier import ClassifierLayer

    x = jnp.ones((3, 64))
    for ctype in ("bert", "transformer_decoder"):
        clf = ClassifierLayer(ctype, num_labels=5, dtype=jnp.float32)
        v = clf.init(jax.random.PRNGKey(0), x)
        out = clf.apply(v, x)
        assert out.shape == (3, 5), ctype


def test_learned_position_and_image_bert_embeddings():
    """LearnedPositionEmbedding2D (reference
    detr_position_embedding_learned.py:10) + ImageBertEmbeddings
    (image_bert_embeddings.py:10)."""
    import jax
    import numpy as np

    from antmmf_tpu.modules.embeddings import (
        ImageBertEmbeddings,
        LearnedPositionEmbedding2D,
    )

    grid = jnp.ones((2, 5, 7, 16))
    pe = LearnedPositionEmbedding2D(num_pos_feats=8)
    v = pe.init(jax.random.PRNGKey(0), grid)
    pos = pe.apply(v, grid)
    assert pos.shape == (2, 5, 7, 16)
    # row plane varies along h, col plane along w
    assert not np.allclose(pos[0, 0, :, 8:], pos[0, 1, :, 8:])
    np.testing.assert_allclose(pos[0, 0, :, :8], pos[0, 1, :, :8])

    C, V = 16, 30
    rng = np.random.default_rng(0)
    word = jnp.asarray(rng.standard_normal((V, C)), jnp.float32)
    positions = jnp.asarray(rng.standard_normal((12, C)), jnp.float32)
    types = jnp.asarray(rng.standard_normal((2, C)), jnp.float32)
    ibe = ImageBertEmbeddings(hidden_size=C)
    feats = jnp.ones((2, 4, 10))
    vv = ibe.init(jax.random.PRNGKey(0), feats, word, positions, types,
                  cls_id=1, sep_id=2)
    out = ibe.apply(vv, feats, word, positions, types, cls_id=1, sep_id=2)
    assert out.shape == (2, 6, C)  # CLS + 4 + SEP


def test_position_enhanced_transformer():
    """Positions injected into q/k at every layer + detr/generation multi
    decode (reference transformers/position_enhance.py:14-325)."""
    import jax
    import numpy as np

    from antmmf_tpu.modules.transformers.position_enhance import (
        PositionEnhancedTransformer,
    )

    rng = np.random.default_rng(0)
    B, L, C = 2, 6, 32
    src = jnp.asarray(rng.standard_normal((B, L, C)), jnp.float32)
    pos = jnp.asarray(rng.standard_normal((B, L, C)), jnp.float32)
    mask = jnp.asarray(np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]]))
    tgt = jnp.asarray(rng.standard_normal((B, 5, C)), jnp.float32)

    model = PositionEnhancedTransformer(
        num_layers=1, num_decoder_layers=1, num_heads=4, num_queries=7,
        decoding_type="detr+generation")
    v = model.init(jax.random.PRNGKey(0), src, pos, mask, tgt)
    out = model.apply(v, src, pos, mask, tgt)
    assert out["memory"].shape == (B, L, C)
    assert out["detr"].shape == (B, 7, C)
    assert out["generation"].shape == (B, 5, C)

    # positions matter: shifting pos changes the encoder memory
    out2 = model.apply(v, src, pos + 1.0, mask, tgt)
    assert not np.allclose(out["memory"], out2["memory"])

    # generation branch is causal: changing a late tgt token leaves
    # earlier outputs unchanged
    tgt2 = tgt.at[:, -1].add(5.0)
    out3 = model.apply(v, src, pos, mask, tgt2)
    np.testing.assert_allclose(np.asarray(out["generation"][:, :4]),
                               np.asarray(out3["generation"][:, :4]),
                               atol=1e-5)


def test_fused_qkv_matches_unfused(rng):
    """fuse_qkv=True keeps the exact param tree of three nn.Dense projections
    (checkpoint/torch-import compatible) and computes identical outputs."""
    from antmmf_tpu.modules.attention import MultiHeadAttention

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 9, 32)),
                    jnp.float32)
    bias = make_attention_mask(jnp.asarray([[1] * 7 + [0] * 2,
                                            [1] * 9], jnp.int32))
    plain = MultiHeadAttention(num_heads=4, dtype=jnp.float32, fuse_qkv=False)
    fused = MultiHeadAttention(num_heads=4, dtype=jnp.float32, fuse_qkv=True)
    v = plain.init(jax.random.PRNGKey(0), x)
    v2 = fused.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)

    out_plain = plain.apply(v, x, bias=bias)
    out_fused = fused.apply(v, x, bias=bias)  # same params, fused compute
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_fused),
                               atol=1e-5, rtol=1e-5)

    # gradients flow to every projection through the fused GEMM
    def loss(p):
        return jnp.sum(fused.apply({"params": p}, x, bias=bias) ** 2)

    g = jax.grad(loss)(v["params"])
    for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
        assert float(jnp.abs(g[name]["kernel"]).max()) > 0

    # cross-attention ignores the flag (separate q vs kv projections)
    kv = jnp.asarray(np.random.default_rng(1).standard_normal((2, 5, 32)),
                     jnp.float32)
    v3 = fused.init(jax.random.PRNGKey(0), x, kv)
    out3 = fused.apply(v3, x, kv)
    assert out3.shape == (2, 9, 32)
