"""Extended processor family (reference registry surface completion)."""

import json
import os

import numpy as np
import pytest

from antmmf_tpu.common.registry import registry
import antmmf_tpu.datasets.processors  # noqa: F401  (registration)

DATA = os.path.join(os.path.dirname(__file__), "data")
EN_VOCAB = os.path.join(DATA, "vocabs", "bert-base-uncased_30522_vocab.txt")
CN_VOCAB = os.path.join(DATA, "vocabs", "bert-base-chinese_21128_vocab.txt")


def test_registry_surface_matches_reference():
    expected = [
        "vocab", "glove", "fasttext", "multi_hot_answer_from_vocab",
        "soft_copy_answer", "simple_word", "simple_sentence", "caption",
        "masked_token", "masked_layoutlm_tokenizer", "masked_bert_tokenizer",
        "masked_roberta_tokenizer", "phoc", "bert_tokenizer",
        "roberta_tokenizer", "clip_tokenizer", "cn_clip_tokenizer",
        "bbox", "normalized_image", "torchvision_transforms",
        "GrayScaleTo3Channels", "custom_transforms", "random_flip",
        "detr_processor", "vqa_answer", "copy", "hier_label_encoder",
    ]
    for name in expected:
        assert registry.get_processor_class(name, default=None) is not None, name


def _small_vocab(tmp_path):
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(["hello", "world", "a", "girl", "does",
                               "gymnastics"]))
    return str(path)


def test_vocab_processor(tmp_path):
    cls = registry.get_processor_class("vocab")
    proc = cls({"max_length": 6, "vocab": {"vocab_file": _small_vocab(tmp_path)}})
    out = proc({"text": "hello world zzz"})
    assert out["text"].shape == (6,)
    assert out["text"][0] != out["text"][1]
    # unknown word → <unk> index 3
    assert out["text"][2] == 3
    assert int(out["length"]) == 3


def test_glove_processor_local_vectors(tmp_path):
    vecs = tmp_path / "glove.txt"
    vecs.write_text("hello 1 0 0\nworld 0 1 0\n")
    cls = registry.get_processor_class("glove")
    proc = cls({"max_length": 4, "vocab": {
        "vocab_file": _small_vocab(tmp_path), "vectors_file": str(vecs)}})
    out = proc({"text": "hello world"})
    assert out["text"].shape == (4, 3)
    np.testing.assert_allclose(out["text"][0], [1, 0, 0])
    np.testing.assert_allclose(out["text"][1], [0, 1, 0])


def test_fasttext_oov_deterministic():
    cls = registry.get_processor_class("fasttext")
    proc = cls({"max_length": 3, "dim": 16})
    a = proc({"text": "frobnicate"})["text"]
    b = proc({"text": "frobnicate"})["text"]
    np.testing.assert_array_equal(a, b)
    assert a.shape == (3, 16) and np.abs(a[0]).sum() > 0


def test_simple_word_and_sentence():
    w = registry.get_processor_class("simple_word")()
    s = registry.get_processor_class("simple_sentence")()
    assert w({"text": "Dog's,"})["text"] == "dog 's"
    assert s({"text": "A little Girl"})["text"] == ["a", "little", "girl"]


def test_caption_processor(tmp_path):
    cls = registry.get_processor_class("caption")
    proc = cls({"vocab": {"vocab_file": _small_vocab(tmp_path)}})
    # specials take ids 0-3; "hello"=4, "world"=5
    out = proc([1, 4, 5, 2, 0, 0])
    assert out["caption"] == "hello world"


def test_phoc_processor():
    proc = registry.get_processor_class("phoc")({"max_length": 4})
    out = proc({"text": "hello world"})
    assert out["text"].shape == (4, 604)
    assert out["text"][0].sum() > 0 and out["text"][2].sum() == 0


def _roberta_files(tmp_path):
    from antmmf_tpu.utils.bpe_tokenization import bytes_to_unicode

    u = {chr(b): c for b, c in
         ((b, bytes_to_unicode()[b]) for b in range(256))}
    base = [u[chr(c)] for c in range(33, 127)]
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "<mask>": 4}
    for tok in base:
        vocab.setdefault(tok, len(vocab))
    vocab[u[" "] if " " in u else "Ġ"] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")
    return str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt")


def test_masked_roberta_tokenizer(tmp_path):
    vocab, merges = _roberta_files(tmp_path)
    cls = registry.get_processor_class("masked_roberta_tokenizer")
    proc = cls({"vocab_json": vocab, "merges_file": merges,
                "max_seq_length": 12, "mask_probability": 0.99, "seed": 0})
    out = proc({"text": "ab"})
    assert out["input_ids"][0] == 0  # <s>
    assert out["input_ids"][out["source_len"] - 1] == 2  # </s>
    assert (out["segment_ids"] == 0).all()
    assert (out["lm_label_ids"][1:out["source_len"] - 1] != -1).any()
    raw = cls({"vocab_json": vocab, "merges_file": merges,
               "max_seq_length": 12})({"text": "ab"}, probability=0.0)
    assert (raw["lm_label_ids"] == -1).all()


def test_masked_layoutlm_tokenizer():
    cls = registry.get_processor_class("masked_layoutlm_tokenizer")
    proc = cls({"vocab_file": EN_VOCAB, "max_seq_length": 10,
                "mask_probability": 0.0})
    out = proc({"words": ["hello", "world"],
                "boxes": [(1, 2, 3, 4), (5, 6, 7, 8)]})
    assert out["bbox"].shape == (10, 4)
    np.testing.assert_array_equal(out["bbox"][0], [0, 0, 0, 0])      # CLS
    np.testing.assert_array_equal(out["bbox"][1], [1, 2, 3, 4])
    np.testing.assert_array_equal(out["bbox"][2], [5, 6, 7, 8])
    np.testing.assert_array_equal(out["bbox"][3], [1000] * 4)        # SEP


def test_cn_clip_tokenizer():
    cls = registry.get_processor_class("cn_clip_tokenizer")
    proc = cls({"vocab_file": CN_VOCAB, "context_length": 52})
    out = proc({"text": "一个小女孩在做体操"})
    assert out["input_ids"].shape == (52,)
    assert out["input_ids"][0] > 0 and out["input_mask"].sum() >= 4
    # CLS then per-char tokens then SEP
    n = int(out["input_mask"].sum())
    assert out["input_ids"][n - 1] == proc.tokenizer.vocab["[SEP]"]


def test_multi_hot_and_soft_copy_answers():
    mh = registry.get_processor_class("multi_hot_answer_from_vocab")(
        {"answer_vocab": ["yes", "no", "cat"]})
    out = mh({"answers": ["yes", "yes", "cat"]})
    assert set(np.unique(out["answers_scores"])) <= {0.0, 1.0}
    assert out["answers_scores"][0] == 1.0 and out["answers_scores"][2] == 1.0

    sc = registry.get_processor_class("soft_copy_answer")(
        {"answer_vocab": ["yes", "no"], "max_length": 4})
    assert sc.get_vocab_size() == 6
    out = sc({"answers": ["stop"] * 9 + ["go"], "tokens": ["stop", "sign"]})
    assert out["answers_scores"].shape == (6,)
    assert out["answers_scores"][2] == 1.0  # "stop" copied from OCR slot 0


def test_bbox_processor():
    proc = registry.get_processor_class("bbox")({"max_length": 3})
    out = proc({"info": [
        {"bounding_box": {"top_left_x": 10, "top_left_y": 20,
                          "width": 30, "height": 40}}]})
    np.testing.assert_allclose(out["bbox"][0], [10, 20, 40, 60])
    assert out["bbox_mask"].tolist() == [True, False, False]


def test_custom_transforms_sequential():
    cls = registry.get_processor_class("custom_transforms")
    proc = cls({"mode": "sequential", "seed": 0, "transforms": [
        {"type": "ImageLongsideScaleAndPad",
         "params": {"max_size": 32, "random_scale": False, "pad": False}},
        {"type": "GroupNormalize",
         "params": {"mean": [0.485, 0.456, 0.406], "std": [0.229, 0.224, 0.225]}},
    ]})
    img = np.random.default_rng(0).uniform(size=(48, 64, 3)).astype(np.float32)
    out = proc({"image": img})["image"]
    assert max(out.shape[:2]) == 32
    assert out.min() < 0  # normalized


def test_custom_transforms_augmenters_run():
    cls = registry.get_processor_class("custom_transforms")
    proc = cls({"mode": "sequential", "seed": 0, "transforms": [
        {"type": "random_crop", "params": {"four_side_ratios": [0.1]}},
        {"type": "random_flip"},
        {"type": "random_gray", "params": {"prob": 1.0}},
        {"type": "random_noise"},
        {"type": "random_blur", "params": {"prob": 1.0}},
        {"type": "random_black"},
        {"type": "random_color2"},
    ]})
    img = np.random.default_rng(1).uniform(size=(40, 40, 3)).astype(np.float32)
    out = proc(img)
    assert out.ndim == 3 and np.isfinite(out).all()


def test_detr_processor_boxes_and_scales():
    cls = registry.get_processor_class("detr_processor")
    proc = cls({"scales": [64], "max_size": 100, "num_box_max": 4,
                "pad_value": 91, "seed": 0})
    img = np.random.default_rng(0).uniform(size=(80, 120, 3)).astype(np.float32)
    out = proc({"image": img, "target": {
        "bbox": [[10, 10, 50, 50], [200, 200, 100, 100]],  # 2nd degenerate
        "objects": [3, 5]}})
    h1, w1 = out["size"]
    assert min(h1, w1) <= 64 and max(h1, w1) <= 100
    tgt = out["target"]
    assert int(tgt["num_box"]) == 1       # degenerate box filtered
    assert tgt["boxes"].shape == (4, 4)   # padded to num_box_max
    assert tgt["labels"][1] == 91         # pad_value
    # box scaled by the resize ratio
    ratio = w1 / 120
    np.testing.assert_allclose(tgt["boxes"][0][0], 10 * ratio, rtol=1e-5)


def test_full_augmentation_zoo_via_custom_transforms():
    cls = registry.get_processor_class("custom_transforms")
    proc = cls({"mode": "sequential", "seed": 0, "transforms": [
        {"type": "random_affine2"},
        {"type": "salt_pepper_noise", "params": {"amount": 0.05}},
        {"type": "poisson_noise"},
        {"type": "speckle_noise"},
        {"type": "rand_text"},
    ]})
    img = np.random.default_rng(2).uniform(size=(48, 48, 3)).astype(np.float32)
    out = proc(img)
    assert out.shape == (48, 48, 3) and np.isfinite(out).all()
