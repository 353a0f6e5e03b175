"""Pink instruction-tuning dataset: per-format adapters, probability
interleave, and the end-to-end train loop on fixtures.

Reference parity: prj/Pink/pink/datasets/ — per-benchmark dataset classes
(VQAv2.py, VisualGrounding.py, COCOCaption.py, PointingVQALocal.py,
LLaVA.py) + ProbMergeDataset.py interleaving; prj/Pink/scripts/stage2.sh
trains the mixture with answer-only LM supervision.
"""

import os

import numpy as np
import pytest

from antmmf_tpu.datasets.pink_instruct_dataset import (
    build_conversations,
    interleave_index,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(ROOT, "projects", "pink", "configs",
                   "pink_instruct.local.yml")

first = lambda pool: pool[0]  # noqa: E731


class TestInterleaveIndex:
    def test_round_robin_first_exhausted(self):
        # no probabilities: cycle sources, stop at the shortest
        idx = interleave_index([2, 3], None, stopping_strategy="first_exhausted")
        np.testing.assert_array_equal(idx, [0, 2, 1, 3])

    def test_round_robin_all_exhausted_wraps_short_sources(self):
        idx = interleave_index([2, 3], None, stopping_strategy="all_exhausted")
        np.testing.assert_array_equal(idx, [0, 2, 1, 3, 0, 4])

    def test_probabilistic_all_exhausted_covers_every_row(self):
        idx = interleave_index([3, 5], [0.5, 0.5], seed=7)
        # every global index of both sources appears at least once
        assert set(range(8)) <= set(idx.tolist())
        # deterministic under the same seed, different under another
        np.testing.assert_array_equal(idx, interleave_index([3, 5], [0.5, 0.5], seed=7))
        assert not np.array_equal(idx, interleave_index([3, 5], [0.5, 0.5], seed=8))

    def test_probabilistic_first_exhausted_stops_at_first_empty(self):
        idx = interleave_index([2, 50], [0.9, 0.1], seed=0,
                               stopping_strategy="first_exhausted")
        # source 0 (global rows 0..1) is consumed exactly once, then stop
        assert idx.tolist().count(0) == 1 and idx.tolist().count(1) == 1
        assert idx[-1] in (0, 1)

    def test_weights_bias_the_mixture(self):
        idx = interleave_index([100, 100], [0.9, 0.1], seed=1,
                               stopping_strategy="first_exhausted")
        from_a = (idx < 100).mean()
        assert from_a > 0.75

    def test_zero_prob_first_exhausted_rejected(self):
        with pytest.raises(ValueError):
            interleave_index([2, 2], [1.0, 0.0],
                             stopping_strategy="first_exhausted")


class TestBuildConversations:
    def test_vqa_marks_and_answer(self):
        convs, has_img = build_conversations(
            "vqa", {"question": "what?", "answer": "red", "image": "a.jpg"},
            first)
        assert has_img
        assert "<qes>what?</qes>" in convs[0]["value"]
        assert convs[1] == {"from": "gpt", "value": "red"}

    def test_vqa_no_marks_single_word_hint(self):
        convs, _ = build_conversations(
            "vqa", {"question": "what?", "answers": ["two", "2"]},
            first, add_marks=False)
        assert convs[0]["value"] == (
            "what?\nAnswer the question using a single word or phrase.")
        assert convs[1]["value"] == "two"

    def test_grounding_serializes_box_answer(self):
        convs, _ = build_conversations(
            "grounding", {"expr": "the dog", "bbox": [0, 0, 28, 40],
                          "width": 56, "height": 40}, first)
        assert "<des>the dog</des>" in convs[0]["value"]
        # expand2square: 56x40 → 56-side square, y offset (56-40)/2 = 8
        assert convs[1]["value"] == "<loc>[0.000,0.143,0.500,0.857]</loc>"

    def test_region_caption_inverts_roles(self):
        convs, _ = build_conversations(
            "region_caption", {"caption": "a dog", "bbox": [0, 0, 28, 40],
                               "width": 56, "height": 40}, first)
        assert "<loc>[0.000,0.143,0.500,0.857]</loc>" in convs[0]["value"]
        assert convs[1]["value"] == "a dog"

    def test_pointing_raw_normalization(self):
        convs, _ = build_conversations(
            "pointing", {"question": "what is here?", "point": [28, 20],
                         "width": 56, "height": 40, "answer": "a hat"},
            first)
        assert convs[0]["value"] == "what is here? <loc>[0.500,0.500]</loc>"

    def test_conversations_passthrough_text_only(self):
        convs, has_img = build_conversations(
            "conversations",
            {"conversations": [{"from": "human", "value": "hi"},
                               {"from": "gpt", "value": "hello"}]}, first)
        assert not has_img and convs[1]["value"] == "hello"


def test_dataset_samples_and_label_masking():
    """Samples carry padded ids/mask/labels + a [1, H, W, C] frame; answer
    tokens are supervised and instruction tokens are not."""
    from antmmf_tpu.common.configuration import Configuration

    cfg = Configuration({
        "data_root_dir": os.path.join(ROOT, "tests", "data", "pink"),
        "sources": [
            {"annotations": "vqa.jsonl", "image_dir": "images",
             "format": "vqa", "weight": 2},
            {"annotations": "grounding.jsonl", "image_dir": "images",
             "format": "grounding", "weight": 1},
        ],
        "seed": 3,
        "image": {"size": 32, "resize": 36},
        "conversation": {
            "template": "llamav1", "max_length": 96,
            "text": {"vocab_file": os.path.join(
                ROOT, "tests", "data", "vocabs",
                "bert-base-uncased_30522_vocab.txt")}},
    })
    from antmmf_tpu.datasets.pink_instruct_dataset import PinkInstructDataset

    ds = PinkInstructDataset("pink_instruct", "train", cfg)
    assert len(ds) >= 5  # all_exhausted over 3 + 2 rows
    formats = set()
    for i in range(len(ds)):
        s = ds[i]
        assert s["input_ids"].shape == (96,)
        assert s["labels"].shape == (96,)
        assert s["image_data"].shape == (1, 32, 32, 3)
        sup = s["labels"] >= 0
        assert sup.any(), "answer tokens must be supervised"
        # supervised positions sit inside the valid region
        assert (s["input_mask"][sup] == 1).all()
        # the instruction prefix is never supervised
        assert s["labels"][0] < 0
        formats.add(ds._route(int(ds.index_mapping[i]))[0]["format"])
    assert formats == {"vqa", "grounding"}  # the interleave hits both
    # determinism: same index → same ids
    np.testing.assert_array_equal(ds[0]["input_ids"], ds[0]["input_ids"])


def test_pink_instruct_trains_on_fixtures(tmp_path):
    """End-to-end: config → builder → trainer → finite decreasing loss
    (the stage-2 loop of prj/Pink/scripts/stage2.sh on fixture scale)."""
    from antmmf_tpu.common.build import build_config
    from antmmf_tpu.trainers.build import build_trainer

    cfg = build_config(CFG, opts=[
        "training_parameters.save_dir", str(tmp_path),
        "training_parameters.seed", "5",
    ])
    trainer = build_trainer(cfg)
    trainer.load()
    trainer.train()
    assert np.isfinite(
        trainer.meter.meters["train/total_loss"].get_latest())
    scalars = trainer.meter.get_scalar_dict()
    assert any("lm_loss" in k for k in scalars)
