"""Host-side text/vocab/general utility surface.

Covers the reference helpers added for parity:
/root/reference/antmmf/utils/text_utils.py:48-739 (q2b, CJK predicates,
ngrams, classic tokenizer, VocabDict/VocabFromText, tag→span converters),
/root/reference/antmmf/utils/vocab.py:13-480 (vocab class family), and
/root/reference/antmmf/utils/general.py:71-412 (naming/reshape/archive
helpers).
"""

import os
import zipfile

import numpy as np
import pytest

from antmmf_tpu.utils import text_utils as T
from antmmf_tpu.utils import vocab as V
from antmmf_tpu.utils import general as G


# ---------------------------------------------------------------------- text

def test_str_q2b():
    assert T.str_q2b("ＡＢＣ１２３") == "ABC123"
    assert T.str_q2b("你好　世界。") == "你好 世界."
    assert T.str_q2b("abc") == "abc"


def test_chinese_predicates():
    assert T.is_chinese("身高") == 1
    assert T.is_chinese("180") == 0
    assert T.is_chinese("神a") == 0
    assert not T.not_hanzi_digit_english("a")
    assert not T.not_hanzi_digit_english("7")
    assert not T.not_hanzi_digit_english("中")
    assert T.not_hanzi_digit_english("!")


def test_entity_process_strips_symbols():
    assert T.entity_process("!!周杰伦--") == "周杰伦"
    assert T.entity_process("(abc)") == "abc"


def test_replace_simple_entity():
    s = "see http://x.co/a and a@b.com now"
    out = T.replace_simple_entity_with(s, "<E>")
    assert "http" not in out and "@" not in out and out.count("<E>") == 2


def test_ngrams():
    toks = ["a", "b", "c"]
    assert list(T.generate_ngrams(toks, 2)) == ["a b", "b c"]
    assert list(T.generate_ngrams_range(toks, (1, 3))) == [
        "a", "b", "c", "a b", "b c"]


def test_tokenize_classic_vqa():
    # the (\W+) split regex separates the apostrophe (reference behavior)
    assert T.tokenize("What's the dog, doing?") == \
        ["what", "'", "s", "the", "dog", "doing"]
    assert T.word_tokenize("Dog's,") == "dog 's"


def test_keep_till_eos():
    assert T.keep_till_eos([5, 9, T.EOS_INDEX, 7]) == [5, 9]
    assert T.keep_till_eos([5, 9]) == [5, 9]


def test_vocab_dict_and_from_text(tmp_path):
    vf = tmp_path / "words.txt"
    vf.write_text("the\ndog\nran\n")
    vd = T.VocabDict(str(vf))
    assert vd.word_list[0] == T.UNK_TOKEN  # auto-prepended
    assert vd.word2idx("dog") == 2
    assert vd.word2idx("zebra") == vd.UNK_INDEX
    assert vd.tokenize_and_index("the dog") == [1, 2]

    vt = T.VocabFromText(["a b b", "b c"], min_count=2)
    assert "b" in vt.stoi and "a" not in vt.stoi and "c" not in vt.stoi
    assert vt.word_list[:4] == T.VocabFromText.DEFAULT_TOKENS


@pytest.mark.parametrize("fn,tags,expected", [
    (T.bio_tag_to_spans, ["O", "B-x", "I-x", "I-x", "O"], [("x", (1, 4))]),
    (T.bioes_tag_to_spans, ["O", "B-x", "I-x", "E-x", "O"], [("x", (1, 4))]),
    (T.bmeso_tag_to_spans, ["O", "B-x", "M-x", "E-x", "O"], [("x", (1, 4))]),
])
def test_tag_to_spans_reference_examples(fn, tags, expected):
    assert fn(tags) == expected


def test_tag_to_spans_edge_cases():
    # S- singleton, label switch mid-span, pad skipping, ignore_labels
    assert T.bioes_tag_to_spans(["S-a", "B-b", "E-b"]) == \
        [("a", (0, 1)), ("b", (1, 3))]
    assert T.bio_tag_to_spans(["B-a", "I-b"]) == [("a", (0, 1)), ("b", (1, 2))]
    assert T.bio_tag_to_spans(["<pad>", "B-a"]) == [("a", (1, 2))]
    assert T.bio_tag_to_spans(["B-a", "B-b"], ignore_labels=["b"]) == \
        [("a", (0, 1))]
    # orphan I- starts a new span (reference else-branch)
    assert T.bio_tag_to_spans(["O", "I-a"]) == [("a", (1, 2))]


def test_span_f1_metric_with_tag_scheme():
    from antmmf_tpu.modules.metrics.extended import SpanF1Metric

    id2tag = ["O", "B-per", "I-per"]
    m = SpanF1Metric({"tag_scheme": "bio", "id2tag": id2tag})
    gold = np.array([[1, 2, 0, 0]])
    perfect = np.array([[1, 2, 0, 0]])
    miss = np.array([[0, 0, 1, 0]])
    mask = np.ones((1, 4))
    assert float(m({"targets": gold, "input_mask": mask},
                   {"logits": perfect})) == 1.0
    assert float(m({"targets": gold, "input_mask": mask},
                   {"logits": miss})) == 0.0


# --------------------------------------------------------------------- vocab

def test_custom_vocab(tmp_path):
    vf = tmp_path / "v.txt"
    vf.write_text("dog\ncat\n")
    emb = np.arange(2 * 3, dtype=np.float32).reshape(2, 3)
    ef = tmp_path / "e.npy"
    np.save(ef, emb)
    cv = V.CustomVocab(str(vf), str(ef))
    vecs = cv.get_vectors()
    assert vecs.shape == (6, 3)  # 4 specials + 2 words
    np.testing.assert_allclose(vecs[1], 0.1)  # special row i -> 0.1*i
    np.testing.assert_allclose(vecs[4], emb[0])
    with pytest.raises(RuntimeError):
        V.CustomVocab(str(vf), str(tmp_path / "missing.npy"))


def test_npy_vocab(tmp_path):
    wf = tmp_path / "w.npy"
    np.save(wf, np.array(["dog", "cat"]))
    nv = V.NpyVocab(str(wf), embedding_dim=8)
    assert nv.stoi["dog"] == 1  # index 0 reserved for pad
    assert nv.get_vectors().shape == (3, 8)


def test_pretrained_vocab(tmp_path):
    gf = tmp_path / "glove.txt"
    gf.write_text("dog 1 2 3\ncat 4 5 6\n")
    pv = V.PretrainedVocab(str(gf))
    assert pv.get_embedding_dim() == 3
    idx = pv.stoi["dog"]
    np.testing.assert_allclose(pv.get_vectors()[idx], [1, 2, 3])
    assert pv.to_indices(["zebra"]) == [pv.stoi[V.UNK_TOKEN]]
    with pytest.raises(RuntimeError):
        V.PretrainedVocab("glove.6B.300d")  # download alias -> clear error


def test_extracted_vocab_and_factory(tmp_path):
    np.save(tmp_path / "7.npy", np.ones(4, np.float32))
    ev = V.build_vocab(type="extracted", base_path=str(tmp_path),
                       embedding_dim=4)
    assert ev.get_dim() == 4
    np.testing.assert_allclose(ev.get_item_embedding(7), 1.0)

    vf = tmp_path / "v.txt"
    vf.write_text("dog\n")
    rv = V.build_vocab(type="random", vocab_file=str(vf))
    assert "dog" in rv.stoi
    with pytest.raises(ValueError):
        V.build_vocab(type="nope")


def test_word_to_vector_dict():
    class FakeModel:
        def get_word_vector(self, w):
            return np.full(3, float(len(w)))

    d = V.WordToVectorDict(FakeModel())
    np.testing.assert_allclose(d["ab"], 2.0)
    np.testing.assert_allclose(d["ab abcd"], 3.0)  # mean over words


# ------------------------------------------------------------------- general

def test_updir():
    assert G.updir("/a/b/c/d", 2) == "/a/b"


def test_extract_file_zip(tmp_path):
    src = tmp_path / "payload.txt"
    src.write_text("hello")
    zf = tmp_path / "a.zip"
    with zipfile.ZipFile(zf, "w") as z:
        z.write(src, "payload.txt")
    out = tmp_path / "out"
    out.mkdir()
    G.extract_file(str(zf), str(out))
    assert (out / "payload.txt").read_text() == "hello"
    with pytest.raises(ValueError):
        G.extract_file(str(src))


def test_iterative_support():
    assert G.iterative_support(lambda x: x + 1, [1, [2, 3]]) == [2, [3, 4]]
    assert G.iterative_support(lambda x: x * 2, 3) == 6


def test_transform_to_batch_sequence():
    x = np.zeros((2, 3, 5))
    assert G.transform_to_batch_sequence(x).shape == (6, 5)
    assert G.transform_to_batch_sequence(x[0]).shape == (3, 5)
    assert G.transform_to_batch_sequence(None) is None
    y = np.zeros((2, 3, 4, 5))
    assert G.transform_to_batch_sequence_dim(y).shape == (6, 4, 5)
    assert G.transform_to_batch_sequence_dim(y[0]).shape == (3, 4, 5)


def test_ckpt_name_and_override_folder():
    cfg = {"task_attributes": {"vqa": {}}, "model_attributes": {"univl": {}},
           "training_parameters": {"seed": 7}}
    assert G.ckpt_name_from_core_args(cfg) == "vqa_univl_7"

    class Args:
        config_override = {"training_parameters": {"lr": 0.1}}

    name = G.foldername_from_config_override(Args())
    assert name.startswith("_") and "/" not in name and ":" not in name
    assert G.foldername_from_config_override({"config_override": None}) == ""


def test_visualization_records(tmp_path):
    """VisualizationDataRecord + headless importance renderers
    (reference utils/visualize.py:9-148)."""
    from antmmf_tpu.utils.visualize import (
        VisualizationDataRecord,
        visualize_image_importance,
        visualize_images,
        visualize_text_importance,
    )

    vr = VisualizationDataRecord(
        word_attributions=[0.9, -0.5, 0.1, 0.0],
        pred_prob=0.75, pred_class=1, true_class=0, attr_class=1,
        attr_score=0.4, raw_input=["a", "dog", "<pad>", "<pad>"],
        convergence_score=0.01)
    html = visualize_text_importance([vr], "<pad>", "t",
                                     str(tmp_path / "imp.html"))
    assert "dog" in html and "rgba(200, 0, 0" in html  # negative = red
    assert (tmp_path / "imp.html").exists()

    heat = visualize_image_importance([vr, vr], "t",
                                      str(tmp_path / "imp.png"))
    assert heat.shape == (2 * 24, 4 * 24, 3)
    assert (tmp_path / "imp.png").exists()

    grid = visualize_images([np.zeros((10, 8, 3), np.uint8),
                             np.ones((6, 6, 3), np.uint8)], size=(16, 16))
    assert grid.ndim == 3
