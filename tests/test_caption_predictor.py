"""Caption serving: video in -> generated caption string out."""

import numpy as np
import pytest


def test_caption_predictor_generates_text():
    from antmmf_tpu.predictors.caption_predictor import CaptionPredictor

    pred = CaptionPredictor({
        "model_attributes": {"univl_caption": {
            "vit_preset": "vit_tiny_test", "bert_preset": "bert_tiny_test",
            "image_size": 32, "embed_dim": 32, "decoder_layers": 1,
            "decoder_heads": 2, "max_caption_len": 8,
            "dtype_str": "float32"}},
        "predictor_parameters": {
            "num_beams": 2,
            "processors": {"caption_processor": {
                "type": "masked_bert_tokenizer",
                "params": {"max_seq_length": 8, "mask_probability": 0}}},
        },
    })
    pred.load(with_ckpt=False)  # random init (the reference unit-test mode)
    out = pred.predict({
        "image_data": np.zeros((2, 32, 32, 3), np.float32),
        "caption": "a dog"})
    assert "caption" in out and isinstance(out["caption"], str)
    assert out["generated_ids"].shape[-1] <= 9
    assert np.isfinite(np.asarray(out["scores"], np.float32)).all()


def test_ids_to_caption_postprocess():
    from antmmf_tpu.predictors.caption_predictor import ids_to_caption
    from antmmf_tpu.utils.tokenization import BertTokenizer

    tok = BertTokenizer(
        "tests/data/vocabs/bert-base-uncased_30522_vocab.txt")
    ids = tok.convert_tokens_to_ids(
        ["[CLS]", "a", "little", "girl", "##s", "[SEP]", "[PAD]"])
    assert ids_to_caption(tok, ids) == "a little girls"


def test_generation_predictor_pink():
    """generation_predictor serves PinkModel through the CLI surface:
    prompt template -> KV-cache generate -> detokenized text."""
    from antmmf_tpu.common.registry import registry
    import antmmf_tpu.predictors  # noqa: F401

    cls = registry.get_predictor_class("generation_predictor")
    pred = cls({
        "model_attributes": {"pink": {
            "lm_preset": "omni_tiny_test", "vit_preset": "vit_tiny_test",
            "image_size": 32, "lora_rank": 2, "dtype_str": "float32"}},
        "predictor_parameters": {"max_new_tokens": 4, "max_prompt_len": 12,
                                 "num_beams": 2}})
    pred.load(with_ckpt=False)
    out = pred.predict({"text": "what is in the image?",
                        "image": np.zeros((32, 32, 3), np.float32)})
    assert "generated_text" in out and isinstance(
        out["generated_text"], str)
    assert out["generated_ids"].shape[0] == 1


def test_generation_predictor_m2omni_conversation():
    """Bailing2-parity serving flow: conversation → chat template → in-place
    dynamic-resolution token expansion → spliced KV-cache generate
    (reference user flow: Bailing2Processor + HF generate)."""
    from antmmf_tpu.common.registry import registry
    import antmmf_tpu.predictors  # noqa: F401

    cls = registry.get_predictor_class("generation_predictor")
    pred = cls({
        "model_attributes": {"m2_omni": {
            "lm_preset": "omni_tiny_test", "visual_tower": "qwen2",
            "qwen2_preset": "qwen2_vit_tiny_test",
            "image_token_id": 1, "audio_token_id": 2,
            "dtype_str": "float32"}},
        "predictor_parameters": {
            "max_new_tokens": 4,
            "unified_processor": {
                "text": {"vocab_file":
                         "tests/data/vocabs/bert-base-uncased_30522_vocab.txt",
                         "max_seq_length": 48},
                "image": {"min_pixels": 576, "max_pixels": 576,
                          "patch_size": 4, "merge_size": 2},
            }}})
    pred.load(with_ckpt=False)
    img = np.zeros((24, 24, 3), np.uint8)
    out = pred.predict({"text": "what is in <image> here", "images": [img]})
    assert isinstance(out["generated_text"], str)

    # full conversation (reference chat format) drives the same path
    out2 = pred.predict({"conversation": [
        {"role": "user", "content": [
            {"type": "image", "image": img},
            {"type": "text", "text": "describe the image"}]}]})
    assert isinstance(out2["generated_text"], str)
    assert out2["generated_ids"].shape[0] == 1


def test_generation_predictor_decode_quant_int4():
    """`predictor_parameters.decode_quant: int4` serves through nibble-packed
    weight records (per-step dequant in the decode loop)."""
    from antmmf_tpu.common.registry import registry
    from antmmf_tpu.predictors.quantization import is_decode_quantized
    import antmmf_tpu.predictors  # noqa: F401

    cls = registry.get_predictor_class("generation_predictor")
    pred = cls({
        "model_attributes": {"pink": {
            "lm_preset": "omni_tiny_test", "vit_preset": "vit_tiny_test",
            "image_size": 32, "lora_rank": 2, "dtype_str": "float32"}},
        "predictor_parameters": {"max_new_tokens": 4, "max_prompt_len": 12,
                                 "decode_quant": "int4",
                                 "decode_quant_min_size": 1024}})
    pred.load(with_ckpt=False)
    assert is_decode_quantized(pred.variables)
    out = pred.predict({"text": "what is in the image?",
                        "image": np.zeros((32, 32, 3), np.float32)})
    assert "generated_text" in out and out["generated_ids"].shape[0] == 1
