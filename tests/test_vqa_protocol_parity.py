"""Official-VQA-protocol parity: our ``pink_eval`` normalization + accuracy
math vs the reference's vendored VQA evaluation API
(``/root/reference/prj/Pink/pink/eval/vqa_tools/vqa_eval.py``) run in-process.

The reference's eval_vqav2.py / eval_gqa.py score generations through
``VQAEval.processPunctuation`` / ``processDigitArticle`` and the
leave-one-annotator-out min(1, matches/3) average (vqa_eval.py:193-246);
pink_eval.{process_punctuation,process_digit_article,vqa_score} must agree
string-for-string and score-for-score.
"""

import importlib.util
import os
import sys
from types import SimpleNamespace

import pytest

sys.path.insert(0, os.path.dirname(__file__))
from reference_compat import REFERENCE_ROOT, reference_available  # noqa: E402

from antmmf_tpu.scripts.pink_eval import (  # noqa: E402
    normalize_answer,
    process_digit_article,
    process_punctuation,
    vqa_score,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not present")


def _load_ref_vqa_eval():
    path = os.path.join(
        REFERENCE_ROOT, "prj/Pink/pink/eval/vqa_tools/vqa_eval.py")
    spec = importlib.util.spec_from_file_location("ref_vqa_eval", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.VQAEval()


# Strings chosen to hit every normalization branch: glued vs free-standing
# punctuation, digit commas, decimal periods, number words, articles,
# contractions (incl. the somebody'd inversion), whitespace/newlines.
TRICKY = [
    "A dog.",
    "the answer is 2.",
    "one, two, three!",
    "1,000 dollars",
    "3.5 meters",
    "isnt it?",
    "dont know",
    "somebody'd",
    "he's  the one",
    "semi-circle",
    "right - hand side",
    "a/b testing",
    "what's this ?",
    "none",
    "ten apples",
    "yes\nno\tmaybe",
    "an  elephant's trunk.",
    "o'clock",
    '"quoted"',
    "(parenthetical) remark",
]


def test_normalization_matches_reference():
    ref = _load_ref_vqa_eval()
    for s in TRICKY:
        assert process_punctuation(s) == ref.processPunctuation(s), s
        assert process_digit_article(s) == ref.processDigitArticle(s), s
        full = ref.processDigitArticle(ref.processPunctuation(
            s.replace("\n", " ").replace("\t", " ").strip()))
        assert normalize_answer(s) == full, s


def _ref_accuracy(prediction: str, answers):
    """Drive the reference VQAEval.evaluate on one question."""
    ref = _load_ref_vqa_eval()
    qid = 1
    ref.vqa = SimpleNamespace(qa={qid: {
        "answers": [{"answer": a, "answer_id": i}
                    for i, a in enumerate(answers)],
        "question_type": "what", "answer_type": "other",
    }})
    ref.vqaRes = SimpleNamespace(qa={qid: {"answer": prediction}})
    ref.params = {"question_id": [qid]}
    ref.evaluate()
    return ref.evalQA[qid] / 100.0  # setEvalQA stores round(100*acc, 2)


CASES = [
    # unanimous annotators: gt answers skip punctuation normalization
    ("A dog.", ["dog"] * 10),
    ("dog", ["dog."] * 10),
    # disagreeing annotators: gt answers get processPunctuation only
    ("2", ["two", "2", "2", "three", "2.", "2", "4", "two", "2", "two"]),
    ("isnt", ["isn't", "isnt", "is not", "isn't", "isn't",
              "no", "isn't", "isnt", "yes", "isn't"]),
    ("1,000", ["1000", "1,000", "one thousand", "1000", "1,000",
               "1000", "100", "1,000", "1000", "1000"]),
    # partial agreement → fractional accuracy
    ("cat", ["cat", "cat", "dog", "dog", "dog",
             "dog", "dog", "dog", "dog", "dog"]),
    ("blue", ["blue", "blue", "blue", "light blue", "navy",
              "blue", "teal", "aqua", "dark blue", "blue"]),
    # 5-answer sets (OKVQA protocol uses the same math on 5)
    ("yes", ["yes", "yes", "no", "yes", "no"]),
    # no match at all
    ("zebra", ["horse"] * 10),
]


def test_vqa_accuracy_matches_reference():
    for pred, answers in CASES:
        ours = vqa_score(pred, answers)
        theirs = _ref_accuracy(pred, answers)
        # the reference stores round(100*acc, 2) → compare at that precision
        assert ours == pytest.approx(theirs, abs=5.1e-5), (pred, answers)


def test_single_answer_exact_match():
    assert vqa_score("A dog.", ["dog"]) == 1.0
    assert vqa_score("two dogs", ["2 dogs"]) == 1.0
    assert vqa_score("cat", ["dog"]) == 0.0
