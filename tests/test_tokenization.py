import os

import numpy as np
import pytest

from antmmf_tpu.utils.tokenization import BertTokenizer
from antmmf_tpu.datasets.processors.text_processors import (
    BertTokenizerProcessor,
    MaskedTokenProcessor,
)

VOCAB = "tests/data/vocabs/bert-base-uncased_30522_vocab.txt"


@pytest.fixture(scope="module")
def tok():
    return BertTokenizer(VOCAB)


def test_wordpiece_basic(tok):
    out = tok.tokenize("A little girl does gymnastics!")
    assert out[0] == "a" and "girl" in out
    assert out[-1] == "!"
    # wordpiece continuation must reassemble in decode
    ids = tok.convert_tokens_to_ids(out)
    assert tok.decode(ids) == "a little girl does gymnastics !"


def test_wordpiece_unknown_and_subwords(tok):
    pieces = tok.tokenize("qwertzuiopasdfgh")
    ids = tok.convert_tokens_to_ids(pieces)
    assert all(isinstance(i, int) for i in ids)
    sub = tok.tokenize("gymnasticsful")
    assert any(p.startswith("##") for p in sub)


def test_cjk_chars_isolated():
    tok_cn = BertTokenizer("tests/data/vocabs/bert-base-chinese_21128_vocab.txt")
    out = tok_cn.tokenize("你好世界")
    assert len(out) == 4


def test_masked_processor_contract():
    proc = MaskedTokenProcessor(
        {"vocab_file": VOCAB, "max_seq_length": 16, "mask_probability": 0.15, "seed": 0}
    )
    out = proc({"text": "a person is connecting something to system"})
    for key in ("input_ids", "input_mask", "segment_ids", "lm_label_ids"):
        assert out[key].shape == (16,)
        assert out[key].dtype == np.int64
    # [CLS] first; pad zeros after [SEP]
    assert out["input_ids"][0] == proc.tokenizer.cls_token_id
    n = out["source_len"]
    assert out["input_ids"][n - 1] == proc.tokenizer.sep_token_id
    assert (out["input_ids"][n:] == 0).all()
    assert (out["input_mask"][:n] == 1).all() and (out["input_mask"][n:] == 0).all()
    # lm labels: -1 outside masked positions
    assert (out["lm_label_ids"][n:] == -1).all()


def test_masked_processor_prob_zero_is_raw():
    proc = MaskedTokenProcessor({"vocab_file": VOCAB, "max_seq_length": 16, "seed": 0})
    out = proc({"text": "a person is connecting"}, probability=0.0)
    assert (out["lm_label_ids"] == -1).all()
    mask_id = proc.tokenizer.mask_token_id
    assert mask_id not in out["input_ids"].tolist()


def test_masking_actually_masks():
    proc = MaskedTokenProcessor(
        {"vocab_file": VOCAB, "max_seq_length": 32, "mask_probability": 0.99, "seed": 0}
    )
    out = proc({"text": "a little girl does gymnastics near people watching her"})
    masked_positions = (out["lm_label_ids"] != -1).sum()
    assert masked_positions >= 5
    # labels hold ORIGINAL ids at masked positions
    raw = proc({"text": "a little girl does gymnastics near people watching her"},
               probability=0.0)
    pos = np.where(out["lm_label_ids"] != -1)[0]
    assert (out["lm_label_ids"][pos] == raw["input_ids"][pos]).all()


def test_sentence_pair_segments():
    proc = BertTokenizerProcessor({"vocab_file": VOCAB, "max_seq_length": 16})
    out = proc({"text": "a person", "text_b": "the system"})
    seg = out["segment_ids"]
    ids = out["input_ids"]
    sep = proc.tokenizer.sep_token_id
    sep_positions = np.where(ids == sep)[0]
    assert len(sep_positions) == 2
    assert seg[sep_positions[0]] == 0 and seg[sep_positions[1]] == 1


def test_whole_word_masking_spans():
    proc = MaskedTokenProcessor(
        {"vocab_file": VOCAB, "max_seq_length": 32, "mask_probability": 0.99,
         "seed": 1, "wwm": True}
    )
    raw = proc({"text": "gymnasticsful"}, probability=0.0)
    out = proc({"text": "gymnasticsful"})
    # all pieces of the word masked together
    n_pieces = int((raw["input_mask"] == 1).sum()) - 2
    assert (out["lm_label_ids"] != -1).sum() == n_pieces


def test_significant_semantic_masking():
    """SNP-S3: content words masked preferentially over stopwords."""
    proc = MaskedTokenProcessor(
        {"vocab_file": VOCAB, "max_seq_length": 32, "mask_probability": 0.3,
         "seed": 0, "significant_masking": True,
         "significant_terms": ["gymnastics", "girl"], "significant_boost": 3.0})
    text = "the girl does gymnastics in the gym"
    sig_hits = 0
    stop_hits = 0
    raw = proc({"text": text}, probability=0.0)
    toks = proc.tokenizer.convert_ids_to_tokens(raw["input_ids"].tolist())
    for trial in range(60):
        out = proc({"text": text})
        for pos in np.where(out["lm_label_ids"] != -1)[0]:
            orig = proc.tokenizer.convert_ids_to_tokens(
                [int(out["lm_label_ids"][pos])])[0]
            if orig.replace("##", "") in ("gym", "##nas", "gymnastics", "girl",
                                          "gymnast", "##nastics"):
                sig_hits += 1
            if orig == "the":
                stop_hits += 1
    assert sig_hits > stop_hits * 2, (sig_hits, stop_hits)
