"""Benchmark the native C++ host data-plane against the pure-Python twins.

Host-side throughput matters because the data plane runs on host cores while
the TPU consumes batches (SURVEY.md section 7 "Input pipeline at TPU speed");
the native library moves the two purely-Python hot loops (WordPiece
tokenization, LMDB gets) to C++. One JSON line per result.

Run: python -m antmmf_tpu.scripts.bench_native
"""

from __future__ import annotations

import json
import os
import random
import tempfile
import time


def _jl(**kw):
    print(json.dumps(kw), flush=True)


def bench_wordpiece() -> None:
    from antmmf_tpu.native.host_plane import NativeWordPiece
    from antmmf_tpu.utils.tokenization import BertTokenizer

    vocab = os.path.join("tests", "data", "vocabs",
                         "bert-base-uncased_30522_vocab.txt")
    bt = BertTokenizer(vocab)
    nw = NativeWordPiece(vocab)

    caps = []
    for line in open(os.path.join("tests", "data", "video",
                                  "msrvtt_train.jsonl")):
        d = json.loads(line)
        caps.extend(c for c in (d.get("caption") or [])
                    if isinstance(c, str))

    def run(texts, label):
        n_tok = sum(len(bt.tokenize(t)) for t in texts)

        def t_py():
            t0 = time.perf_counter()
            for s in texts:
                for w in bt.basic.tokenize(s):
                    bt.wordpiece.tokenize(w)
            return time.perf_counter() - t0

        def t_nat():
            t0 = time.perf_counter()
            for s in texts:
                nw.encode(s)
            return time.perf_counter() - t0

        tp = min(t_py() for _ in range(3))
        tn = min(t_nat() for _ in range(3))
        _jl(metric=f"wordpiece_{label}", python_tok_s=round(n_tok / tp),
            native_tok_s=round(n_tok / tn), speedup=round(tp / tn, 2))

    run(caps * 20, "short_captions")
    long_text = " ".join(caps * 30)[:4000]
    run([long_text] * 200, "long_text_4k")


def bench_lmdb() -> None:
    from antmmf_tpu.native.host_plane import NativeLmdbReader
    from antmmf_tpu.utils.lmdb_lite import LmdbLiteReader, LmdbLiteWriter

    rng = random.Random(0)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "data.mdb")
        w = LmdbLiteWriter(path)
        keys = []
        for i in range(20000):
            k = f"frame_{i:07d}".encode()
            keys.append(k)
            w.put(k, bytes(rng.getrandbits(8) for _ in range(256)))
        w.save()
        py = LmdbLiteReader(path)
        nat = NativeLmdbReader(path)
        probe = keys[:5000]

        t0 = time.perf_counter()
        for k in probe:
            py.get(k)
        tp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for k in probe:
            nat.get(k)
        tn = time.perf_counter() - t0
        _jl(metric="lmdb_get", python_gets_s=round(len(probe) / tp),
            native_gets_s=round(len(probe) / tn),
            speedup=round(tp / tn, 2), entries=len(keys))


def main() -> None:
    from antmmf_tpu.native.host_plane import native_available

    if not native_available():
        _jl(metric="native_host_plane", available=False)
        return
    bench_wordpiece()
    bench_lmdb()


if __name__ == "__main__":
    main()
