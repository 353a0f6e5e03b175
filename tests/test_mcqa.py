import os

import jax
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.datasets.mcqa_dataset import MultiChoiceQADataset
from antmmf_tpu.datasets.processors.mm_processors import (
    VQAAnswerProcessor,
    normalize_answer,
)
from antmmf_tpu.models.base_model import build_model
from antmmf_tpu.structures.sample import SampleList

DATA = os.path.join(os.path.dirname(__file__), "data", "video")


def test_vqa_answer_processor():
    proc = VQAAnswerProcessor({"answer_vocab": ["yes", "no", "2", "blue cat"]})
    out = proc({"answers": ["yes"] * 6 + ["no"] * 3 + ["maybe"]})
    assert out["targets"].shape == (4,)
    assert out["targets"][0] == 1.0   # 6 * 0.3 capped
    np.testing.assert_allclose(out["targets"][1], 0.9)
    assert normalize_answer("The Blue Cat!") == "blue cat"
    assert proc.idx("blue cat.") == 3


def test_mcqa_dataset_and_model():
    ds = MultiChoiceQADataset("mcqa", "test", {
        "data_root_dir": DATA,
        "annotations": {"test": "msrvtt_multi_choice_qa.jsonl"},
        "video_root": "data/mp4",
        "frames_per_clip": 2,
        "image": {"size": 32, "resize": 36},
        "max_text_len": 16,
    })
    assert len(ds) == 2
    batch = SampleList.from_samples([ds[0], ds[1]])
    assert batch["options_input_ids"].shape == (2, 5, 16)
    assert batch["image_data"].shape[0] == 2

    cfg = {"model_attributes": {"univl_mcqa": {
        "vit_preset": "vit_tiny_test", "bert_preset": "bert_tiny_test",
        "image_size": 32, "embed_dim": 32, "dtype_str": "float32"}}}
    shell = build_model(cfg)
    arrays = {k: jnp.asarray(v) for k, v in batch.arrays().items()}
    variables = shell.init(jax.random.PRNGKey(0), arrays)
    out = shell.apply(variables, arrays)
    assert out["logits"].shape == (2, 5)
    assert "mcqa_loss" in out["losses"]
    assert 0.0 <= float(out["metrics"]["mcqa_acc"]) <= 1.0


def test_univl_classification_model():
    cfg = {"model_attributes": {"univl_classification": {
        "vit_preset": "vit_tiny_test", "bert_preset": "bert_tiny_test",
        "image_size": 32, "embed_dim": 32, "num_labels": 4,
        "dtype_str": "float32"}}}
    shell = build_model(cfg)
    rng = np.random.default_rng(0)
    b = {"image_data": rng.standard_normal((2, 2, 32, 32, 3)).astype(np.float32),
         "video_mask": np.ones((2, 2), np.int64),
         "caption_input_ids": rng.integers(0, 30522, (2, 8)).astype(np.int64),
         "caption_input_mask": np.ones((2, 8), np.int64),
         "caption_segment_ids": np.zeros((2, 8), np.int64),
         "targets": np.array([1, 3], np.int64)}
    variables = shell.init(jax.random.PRNGKey(0), b)
    out = shell.apply(variables, b)
    assert out["logits"].shape == (2, 4)
    assert "cls_loss" in out["losses"]


def test_mixed_image_video_and_asr_dataset():
    from antmmf_tpu.datasets.video_text_dataset import VideoTextDataset

    ds = VideoTextDataset("mixed", "train", {
        "data_root_dir": DATA,
        "annotations": {"train": "univl_img.jsonl"},
        "video_root": "",
        "image_root": "../image",
        "media_format": "mixed",
        "frames_per_clip": 2,
        "image": {"size": 32, "resize": 36},
        "max_text_len": 16,
    })
    s = ds[0]  # dog.jpg record repeated to frame count
    assert s["image_data"].shape == (2, 32, 32, 3)

    ds2 = VideoTextDataset("asr", "train", {
        "data_root_dir": DATA,
        "annotations": {"train": "univl_video.jsonl"},
        "video_root": "data/mp4",
        "asr_root": "data/asr_files",
        "frames_per_clip": 2,
        "image": {"size": 32, "resize": 36},
        "max_text_len": 16,
        "text": {"vocab_file":
                 "tests/data/vocabs/bert-base-chinese_21128_vocab.txt"},
    })
    # force empty caption to exercise the ASR fallback
    ds2.annotations.data[0]["caption"] = ""
    s2 = ds2[0]
    assert s2["caption_text"] != ""  # ASR transcript substituted


def test_univl_roi_model():
    cfg = {"model_attributes": {"univl_roi": {
        "vit_preset": "vit_tiny_test", "bert_preset": "bert_tiny_test",
        "image_size": 32, "embed_dim": 32, "cross_layers": 1,
        "region_dim": 16, "dtype_str": "float32"}}}
    shell = build_model(cfg)
    rng = np.random.default_rng(0)
    L = 8
    lm = np.full((2, L), -1, np.int64); lm[:, 2] = 5
    b = {"image_data": rng.standard_normal((2, 1, 32, 32, 3)).astype(np.float32),
         "video_mask": np.ones((2, 1), np.int64),
         "region_feature": rng.standard_normal((2, 4, 16)).astype(np.float32),
         "region_boxes": rng.random((2, 4, 4)).astype(np.float32),
         "region_mask": np.ones((2, 4), np.int64),
         "ocr_input_ids": rng.integers(0, 30522, (2, 5)).astype(np.int64),
         "ocr_input_mask": np.ones((2, 5), np.int64),
         "caption_input_ids": rng.integers(0, 30522, (2, L)).astype(np.int64),
         "caption_input_mask": np.ones((2, L), np.int64),
         "caption_segment_ids": np.zeros((2, L), np.int64),
         "caption_lm_label_ids": lm}
    variables = shell.init(jax.random.PRNGKey(0), b)
    out = shell.apply(variables, b)
    assert "masked_lm_loss" in out["losses"]
    assert "itm_loss" in out["losses"]
    for v in out["losses"].values():
        assert np.isfinite(float(v))


def test_univl_caption_training_and_generation():
    cfg = {"model_attributes": {"univl_caption": {
        "vit_preset": "vit_tiny_test", "bert_preset": "bert_tiny_test",
        "image_size": 32, "embed_dim": 32, "decoder_layers": 1,
        "decoder_heads": 2, "max_caption_len": 8, "dtype_str": "float32"}}}
    shell = build_model(cfg)
    rng = np.random.default_rng(0)
    b = {"image_data": rng.standard_normal((2, 1, 32, 32, 3)).astype(np.float32),
         "video_mask": np.ones((2, 1), np.int64),
         "caption_input_ids": rng.integers(0, 30522, (2, 8)).astype(np.int64),
         "caption_input_mask": np.ones((2, 8), np.int64)}
    variables = shell.init(jax.random.PRNGKey(0), b)
    out = shell.apply(variables, b)
    assert "caption_cross_entropy" in out["losses"]
    assert np.isfinite(float(out["losses"]["caption_cross_entropy"]))

    model = shell.module
    seqs, scores = model.generate(variables, b, num_beams=2, max_length=6)
    assert seqs.shape == (2, 6)
    assert np.isfinite(np.asarray(scores)).all()
