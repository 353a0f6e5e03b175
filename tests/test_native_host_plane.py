"""Native C++ host data-plane: WordPiece + LMDB reader parity vs the pure
Python twins (antmmf_tpu/native/src/host_plane.cc vs utils/tokenization.py
and utils/lmdb_lite.py). The native library auto-builds with the system
compiler; if no toolchain is available these tests skip and the Python
fallbacks (tested elsewhere) carry the feature."""

import json
import os
import random

import pytest

from antmmf_tpu.utils.tokenization import (
    BasicTokenizer,
    BertTokenizer,
    WordpieceTokenizer,
)

native = pytest.importorskip("antmmf_tpu.native.host_plane")

if not native.native_available():
    pytest.skip("no native toolchain", allow_module_level=True)

VOCAB = os.path.join(os.path.dirname(__file__), "data", "vocabs",
                     "bert-base-uncased_30522_vocab.txt")
VOCAB_CN = os.path.join(os.path.dirname(__file__), "data", "vocabs",
                        "bert-base-chinese_21128_vocab.txt")


def _python_tokenize(bt: BertTokenizer, text: str):
    out = []
    for word in bt.basic.tokenize(text):
        out.extend(bt.wordpiece.tokenize(word))
    return out


@pytest.fixture(scope="module")
def bt():
    return BertTokenizer(VOCAB)


@pytest.fixture(scope="module")
def nw():
    return native.NativeWordPiece(VOCAB)


class TestNativeWordPiece:
    def test_fixture_caption_parity(self, bt, nw):
        path = os.path.join(os.path.dirname(__file__), "data", "video",
                            "msrvtt_train.jsonl")
        texts = []
        for line in open(path):
            d = json.loads(line)
            texts.extend(c for c in (d.get("caption") or [])
                         if isinstance(c, str))
        assert texts
        for s in texts:
            ids = nw.encode(s)
            if ids is None:
                continue
            py = bt.convert_tokens_to_ids(_python_tokenize(bt, s))
            assert ids == py, s

    def test_edge_cases(self, bt, nw):
        cases = [
            "",
            "   ",
            "Hello, World!",
            "a" * 150,  # > max_chars_per_word -> [UNK]
            "café naïve résumé ÉTUDE",
            "test-case...punct!!![CLS]",
            "mixed 北京 cjk 语言 here",
            "ﬁne ǅungla İstanbul ßtraße",
            "tab\tnew\nline\rdone",
            "\x00null�repl",
            "emoji 🙂 and astral 𠀀 cjk-ext-b",
            "123 456.789 1,000,000",
        ]
        for s in cases:
            ids = nw.encode(s)
            if ids is None:  # complex codepoint -> python fallback
                continue
            py = bt.convert_tokens_to_ids(_python_tokenize(bt, s))
            assert ids == py, repr(s)

    def test_complex_sigma_falls_back(self, nw):
        # word-final capital sigma lowers contextually -> native refuses
        assert nw.encode("ΣΙΓΜΑΣ") is None

    def test_bert_tokenizer_transparent(self, bt):
        # the BertTokenizer surface uses the native path invisibly:
        # output tokens (strings) must equal the pure-python algorithm
        s = "A quick brown fox; unaffordable! 北京 2024"
        assert bt._native is not None
        assert bt.tokenize(s) == _python_tokenize(bt, s)

    def test_fuzz_ascii_parity(self, bt, nw):
        rng = random.Random(0)
        alphabet = ("abcdefgh ijklmnop qrstuvwx yz0123! .,-#@%^&*()"
                    "ABCDEFGH \t\n")
        for _ in range(200):
            s = "".join(rng.choice(alphabet)
                        for _ in range(rng.randrange(0, 120)))
            ids = nw.encode(s)
            py = bt.convert_tokens_to_ids(_python_tokenize(bt, s))
            assert ids == py, repr(s)

    def test_fuzz_unicode_parity(self, bt, nw):
        rng = random.Random(1)
        for _ in range(200):
            cps = []
            for _ in range(rng.randrange(0, 60)):
                r = rng.random()
                if r < 0.5:
                    cps.append(rng.randrange(32, 127))
                elif r < 0.7:
                    cps.append(rng.randrange(0x4E00, 0x9FFF))
                elif r < 0.85:
                    cps.append(rng.randrange(0xC0, 0x2FF))  # latin accents
                else:
                    cps.append(rng.randrange(1, 0x3000))
            s = "".join(chr(c) for c in cps if not 0xD800 <= c <= 0xDFFF)
            ids = nw.encode(s)
            if ids is None:
                continue
            py = bt.convert_tokens_to_ids(_python_tokenize(bt, s))
            assert ids == py, repr(s)

    def test_chinese_vocab(self):
        if not os.path.exists(VOCAB_CN):
            pytest.skip("no chinese vocab fixture")
        bt = BertTokenizer(VOCAB_CN)
        nw2 = native.NativeWordPiece(VOCAB_CN)
        for s in ["我爱北京天安门", "mixed 中文 english 文本 2024!"]:
            ids = nw2.encode(s)
            py = bt.convert_tokens_to_ids(_python_tokenize(bt, s))
            assert ids == py, s


class TestNativeLmdb:
    @pytest.fixture(scope="class")
    def env(self, tmp_path_factory):
        from antmmf_tpu.utils.lmdb_lite import LmdbLiteWriter

        path = str(tmp_path_factory.mktemp("mdb") / "data.mdb")
        rng = random.Random(0)
        kv = {}
        w = LmdbLiteWriter(path)
        for i in range(4000):  # enough entries to force >1 branch level
            k = f"k{i:05d}".encode()
            v = bytes(rng.getrandbits(8)
                      for _ in range(rng.choice([5, 50, 900])))
            kv[k] = v
            w.put(k, v)
        kv[b"overflow"] = b"\xab" * 70000
        w.put(b"overflow", kv[b"overflow"])
        w.save()
        return path, kv

    def test_get_parity(self, env):
        from antmmf_tpu.utils.lmdb_lite import LmdbLiteReader

        path, kv = env
        nat = native.NativeLmdbReader(path)
        py = LmdbLiteReader(path)
        assert len(nat) == len(py) == len(kv)
        for k in list(kv)[::97] + [b"overflow"]:
            assert nat.get(k) == kv[k]
            assert py.get(k) == kv[k]
        assert nat.get(b"absent") is None

    def test_keys_sorted(self, env):
        path, kv = env
        nat = native.NativeLmdbReader(path)
        assert nat.keys() == sorted(kv)

    def test_open_lmdb_prefers_native(self, env):
        from antmmf_tpu.utils import lmdb_lite

        path, kv = env
        r = lmdb_lite.open_lmdb(path)
        # with the toolchain present and no real lmdb, this is the native
        # reader; with real lmdb installed it's the shim — both must read
        assert r.get(b"k00000") == kv[b"k00000"]

    def test_str_key(self, env):
        path, kv = env
        nat = native.NativeLmdbReader(path)
        assert nat.get("k00001") == kv[b"k00001"]
