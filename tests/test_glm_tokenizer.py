"""GLM Chinese tokenizer (sentencepiece-lite BPE engine).

The reference tokenizes M2-Encoder Chinese text with GLMChineseTokenizer
(prj/M2_Encoder/vlmo/tokenizer/tokenization_glm.py) over the sp.model that
ships with the reference; the sentencepiece package is absent here, so
utils/sentencepiece_lite.py implements the BPE segmentation directly. These
tests run against the REAL reference sp.model.
"""

import os

import numpy as np
import pytest

SP_MODEL = "/root/reference/prj/M2_Encoder/vlmo/tokenizer/sp.model"
pytestmark = pytest.mark.skipif(not os.path.isfile(SP_MODEL),
                                reason="reference sp.model not present")


@pytest.fixture(scope="module")
def tok():
    from antmmf_tpu.utils.sentencepiece_lite import GLMChineseTokenizer

    return GLMChineseTokenizer(SP_MODEL)


def test_model_parses(tok):
    assert len(tok) == 115244  # the shipped CogPretrain-extended BPE vocab
    assert tok.cls_token_id > 0 and tok.gmask_token_id > 0
    assert tok.sop_token_id > 0


def test_chinese_bpe_merges_and_roundtrip(tok):
    for text in ["一个可以说中文的模型", "今天天气很好。",
                 "hello world", "图文检索模型 CLIP"]:
        ids = tok.encode(text)
        assert ids[0] == tok.cls_token_id and ids[-1] == tok.sep_token_id
        assert tok.decode(ids[1:-1]) == text
    # multi-char merges actually happen (BPE, not char-level)
    pieces = tok.tokenize("一个可以说中文的模型")
    assert any(len(p) > 2 for p in pieces)


def test_whitespace_runs_become_blank_tokens(tok):
    pieces = tok.tokenize("a  b   c")
    assert "<|blank_2|>" in pieces and "<|blank_3|>" in pieces
    ids = tok.encode("a  b   c")
    assert tok.decode(ids[1:-1]) == "a  b   c"


def test_glm_processor_registered():
    from antmmf_tpu.common.registry import registry
    import antmmf_tpu.datasets.processors.text_processors_ext  # noqa

    proc = registry.get_processor_class("glm_chinese")({
        "sp_model": SP_MODEL, "max_seq_length": 16})
    out = proc({"text": "中文图文检索"})
    assert out["input_ids"].shape == (16,)
    assert out["input_mask"].sum() >= 3
    # padding uses the GLM pad id
    pad = out["input_ids"][int(out["input_mask"].sum()):]
    assert (pad == pad[0]).all()


def test_glm_feeds_m2_encoder_ref_text_path():
    """End-to-end Chinese text: GLM ids → the BEiT3 eval twin's text tower
    (the M2-Encoder bilingual retrieval query path)."""
    import jax
    import jax.numpy as jnp

    from antmmf_tpu.common.registry import registry
    import antmmf_tpu.datasets.processors.text_processors_ext  # noqa
    from antmmf_tpu.models.m2_encoder_ref import M2EncoderRef

    proc = registry.get_processor_class("glm_chinese")({
        "sp_model": SP_MODEL, "max_seq_length": 12})
    out = proc({"text": "一只狗在草地上奔跑"})

    model = M2EncoderRef(vocab_size=115244, image_size=32, patch_size=16,
                         embed_dim=32, num_layers=2, num_heads=2,
                         mlp_ratio=2.0, vl_layers=0, out_dim=16,
                         max_text_len=12)
    rng = jax.random.PRNGKey(0)
    ids = jnp.asarray(out["input_ids"][None], jnp.int32)
    mask = jnp.asarray(out["input_mask"][None], jnp.int32)
    batch = {"input_ids": ids, "input_mask": mask,
             "image": jnp.zeros((1, 32, 32, 3))}
    variables = model.init(rng, batch)
    res = model.apply(variables, ids, mask,
                      method=lambda m, i, k: m.encode_text(i, k))
    feats = np.asarray(res["cls_feats"], np.float32)
    assert feats.shape == (1, 16)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0,
                               atol=1e-5)
