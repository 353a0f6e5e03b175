"""Checkpoint-conversion CLI: torch state_dict → Orbax dir round-trip."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_convert_bert_roundtrip(tmp_path):
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=128,
        max_position_embeddings=64, type_vocab_size=2)
    torch.manual_seed(0)
    model = BertModel(cfg).eval()
    ckpt = tmp_path / "bert.pth"
    torch.save(model.state_dict(), ckpt)

    from antmmf_tpu.scripts.convert_checkpoint import convert
    from antmmf_tpu.utils.torch_import import bert_state_dict_to_params

    out = tmp_path / "model_dir"
    info = convert(str(ckpt), "bert", str(out), bert_layers=2)
    assert os.path.isdir(info["out"])
    assert info["param_leaves"] > 0

    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ck:
        restored = ck.restore(info["out"])
    expect = bert_state_dict_to_params(
        {k: v.detach().numpy() for k, v in model.state_dict().items()}, 2)

    # spot-check a leaf survives the orbax round trip bit-exactly
    got = restored["params"]["embeddings"]["word_embeddings"]["embedding"]
    want = expect["embeddings"]["word_embeddings"]["embedding"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_convert_copies_config(tmp_path):
    from transformers import BertConfig, BertModel

    model = BertModel(BertConfig(
        vocab_size=50, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32, type_vocab_size=2)).eval()
    ckpt = tmp_path / "b.pth"
    torch.save(model.state_dict(), ckpt)
    yml = tmp_path / "exp.yml"
    yml.write_text("model_attributes: {}\n")

    from antmmf_tpu.scripts.convert_checkpoint import convert

    out = tmp_path / "dir2"
    convert(str(ckpt), "bert", str(out), bert_layers=1, config=str(yml))
    assert (out / "config.yaml").exists()


def test_quantize_checkpoint_cli(tmp_path):
    """convert → quantize pipeline: torch ckpt → Orbax dir → int8 artifact
    that round-trips through load_quantized."""
    from transformers import BertConfig, BertModel

    model = BertModel(BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=128,
        max_position_embeddings=32, type_vocab_size=2)).eval()
    ckpt = tmp_path / "b.pth"
    torch.save(model.state_dict(), ckpt)

    from antmmf_tpu.scripts.convert_checkpoint import convert

    out = tmp_path / "dir"
    convert(str(ckpt), "bert", str(out), bert_layers=1)

    import sys

    from antmmf_tpu.scripts.quantize_checkpoint import main as qmain

    art = tmp_path / "model_int8.npz"
    argv, sys.argv = sys.argv, ["q", "--model_dir", str(out),
                                "--out", str(art), "--min_size", "512"]
    try:
        qmain()
    finally:
        sys.argv = argv
    assert art.exists()

    from antmmf_tpu.predictors.quantization import load_quantized

    restored = load_quantized(str(art))
    assert "params" in restored
    enc = restored["params"]["encoder"]["layer_0"]["attention"]
    assert np.asarray(enc["q_proj"]["kernel"]).dtype == np.float32
