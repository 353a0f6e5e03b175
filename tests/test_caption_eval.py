import numpy as np

from antmmf_tpu.modules.metrics.evaluators import CaptioningEvaluator, build_evaluator


def test_captioning_evaluator_perfect_and_noisy():
    ev = CaptioningEvaluator()
    refs = np.array([[101, 5, 6, 7, 8, 102, 0, 0]])
    ev.collect({"caption_raw_input_ids": refs}, {"generated_ids": refs})
    out = ev.summarize()
    assert out["bleu4"] == 1.0 and out["rouge_l"] == 1.0

    ev.reset()
    gen = np.array([[101, 5, 6, 9, 9, 102, 0, 0]])
    ev.collect({"caption_raw_input_ids": refs}, {"generated_ids": gen})
    out = ev.summarize()
    assert 0.0 <= out["bleu4"] < 1.0
    assert 0.0 < out["rouge_l"] < 1.0


def test_captioning_evaluator_registered():
    assert build_evaluator("captioning") is not None
