import json

import numpy as np

from antmmf_tpu.utils.bpe_tokenization import BPETokenizer, bytes_to_unicode
from antmmf_tpu.datasets.processors.processors import Processor


def _write_files(tmp_path):
    # tiny BPE: bytes for "low", "er", "lo", "w" etc.
    b2u = bytes_to_unicode()
    def u(s):
        return "".join(b2u[b] for b in s.encode())
    vocab = {}
    for tok in [u("l"), u("o"), u("w"), u("e"), u("r"), u(" "), u("lo"),
                u("low"), u("er"), u(" l"), u(" lo"), u(" low"),
                "<|endoftext|>"]:
        vocab.setdefault(tok, len(vocab))
    merges = [f"{u('l')} {u('o')}", f"{u('lo')} {u('w')}",
              f"{u('e')} {u('r')}", f"{u(' ')} {u('l')}",
              f"{u(' l')} {u('o')}", f"{u(' lo')} {u('w')}"]
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n" + "\n".join(merges))
    return str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt")


def test_bpe_merges_and_roundtrip(tmp_path):
    vocab, merges = _write_files(tmp_path)
    tok = BPETokenizer(vocab, merges)
    pieces = tok.tokenize("lower")
    assert pieces[0] == "low"  # merged l+o, lo+w
    ids = tok.encode("low")
    assert tok.decode(ids) == "low"
    assert tok.decode(tok.encode("lower low")) == "lower low"


def test_bpe_processor_registry(tmp_path):
    vocab, merges = _write_files(tmp_path)
    p = Processor({"type": "bpe_tokenizer", "params": {
        "vocab_json": vocab, "merges_file": merges, "max_seq_length": 8}})
    out = p({"text": "low lower"})
    assert out["input_ids"].shape == (8,)
    assert out["input_mask"].sum() >= 2
