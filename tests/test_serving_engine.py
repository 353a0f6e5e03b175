"""Continuous-batching serving engine: slot-pooled decode must be
token-for-token identical to per-request ``model.generate`` greedy decoding
(the engine goes beyond the reference's one-request-at-a-time HF generate,
prj/Pink/pink/eval/model_vqav2.py:141, but must not change the tokens)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from antmmf_tpu.models.m2_omni import M2Omni
from antmmf_tpu.models.pink import PinkModel
from antmmf_tpu.predictors.serving_engine import (
    ContinuousBatchingEngine,
    M2OmniAdapter,
    PinkAdapter,
)

EOS = 1
MAX_NEW = 5
LP = 6


def _truncate_at_eos(toks, eos=EOS):
    out = []
    for t in toks:
        out.append(int(t))
        if t == eos:
            break
    return out


@pytest.fixture(scope="module")
def pink_setup():
    model = PinkModel(lm_preset="omni_tiny_test", vit_preset="vit_tiny_test",
                      image_size=32, lora_rank=2, dtype_str="float32")
    rng = jax.random.PRNGKey(0)
    init_batch = {
        "input_ids": jnp.zeros((1, LP), jnp.int32),
        "input_mask": jnp.ones((1, LP), jnp.int32),
        "image_data": jax.random.normal(rng, (1, 32, 32, 3)),
    }
    variables = model.init(rng, init_batch)
    reqs = []
    for i in range(5):
        r = jax.random.PRNGKey(100 + i)
        n = 3 + i % 3
        ids = np.zeros((LP,), np.int32)
        ids[:n] = np.asarray(
            jax.random.randint(r, (n,), 5, 40), np.int32)
        mask = (np.arange(LP) < n).astype(np.int32)
        img = np.asarray(jax.random.normal(r, (32, 32, 3)), np.float32)
        reqs.append((f"req{i}", {"input_ids": ids, "input_mask": mask,
                                 "image_data": img}))
    return model, variables, reqs


def _reference_tokens(model, variables, data):
    batch = {"input_ids": jnp.asarray(data["input_ids"])[None],
             "input_mask": jnp.asarray(data["input_mask"])[None]}
    if "image_data" in data:
        batch["image_data"] = jnp.asarray(data["image_data"])[None]
    tokens, lens = model.generate(variables, batch, eos_id=EOS,
                                  max_length=MAX_NEW)
    tokens, lens = np.asarray(tokens), np.asarray(lens)
    gen = tokens[0, lens[0]: lens[0] + MAX_NEW]
    return _truncate_at_eos(gen)


class TestPinkEngine:
    def test_matches_sequential_generate(self, pink_setup):
        model, variables, reqs = pink_setup
        ad = PinkAdapter(model, variables, max_prompt_len=LP,
                         max_new_tokens=MAX_NEW, has_image=True)
        # 2 slots < 5 requests: exercises queueing + slot reuse
        eng = ContinuousBatchingEngine(ad, slots=2, max_new_tokens=MAX_NEW,
                                       eos_id=EOS)
        result = eng.run(reqs)
        assert set(result["outputs"]) == {r[0] for r in reqs}
        for rid, data in reqs:
            want = _reference_tokens(model, variables, data)
            assert result["outputs"][rid] == want, rid
        assert result["total_tokens"] == sum(
            len(v) for v in result["outputs"].values())
        assert result["latency_p50"] > 0

    def test_online_submit_mid_stream(self, pink_setup):
        """Requests arriving while others decode join at token boundaries."""
        model, variables, reqs = pink_setup
        ad = PinkAdapter(model, variables, max_prompt_len=LP,
                         max_new_tokens=MAX_NEW, has_image=True)
        eng = ContinuousBatchingEngine(ad, slots=2, max_new_tokens=MAX_NEW,
                                       eos_id=EOS, step_tokens=2)
        done = {}
        eng.submit(*reqs[0])
        for rid in eng.step() + eng.step():  # 4 of req0's 5 tokens decoded
            done[rid] = eng._done[rid]
        eng.submit(*reqs[1])  # joins while req0 is mid-decode
        for _ in range(4 * MAX_NEW):
            for rid in eng.step():
                done[rid] = eng._done[rid]
            if len(done) == 2:
                break
        assert set(done) == {reqs[0][0], reqs[1][0]}
        for rid, data in reqs[:2]:
            assert done[rid] == _reference_tokens(model, variables, data)


class TestM2OmniEngine:
    def test_matches_sequential_generate(self):
        model = M2Omni(lm_preset="omni_tiny_test",
                       vit_preset="vit_tiny_test", image_size=32,
                       image_token_id=3, audio_token_id=None,
                       dtype_str="float32")
        rng = jax.random.PRNGKey(0)
        N = (32 // 16) ** 2
        def mk(seed, n_text):
            r = jax.random.PRNGKey(seed)
            row = [5] + [3] * N + list(
                np.asarray(jax.random.randint(r, (n_text,), 5, 40)))
            ids = np.zeros((LP + N,), np.int32)
            ids[:len(row)] = row
            mask = (ids != 0).astype(np.int32)
            img = np.asarray(jax.random.normal(r, (1, 32, 32, 3)),
                             np.float32)
            return {"input_ids": ids, "input_mask": mask, "image_data": img}

        init = mk(0, 3)
        variables = model.init(rng, {
            "input_ids": jnp.asarray(init["input_ids"])[None],
            "input_mask": jnp.asarray(init["input_mask"])[None],
            "image_data": jnp.asarray(init["image_data"])[None]})
        reqs = [(f"r{i}", mk(200 + i, 2 + i % 3)) for i in range(3)]

        ad = M2OmniAdapter(model, variables, max_prompt_len=LP + N,
                           max_new_tokens=MAX_NEW, has_image=True)
        eng = ContinuousBatchingEngine(ad, slots=2, max_new_tokens=MAX_NEW,
                                       eos_id=EOS)
        result = eng.run(reqs)
        for rid, data in reqs:
            want = _reference_tokens(model, variables, data)
            assert result["outputs"][rid] == want, rid


class TestDecodeWindow:
    @pytest.mark.parametrize("step_tokens", [1, 3])
    def test_window_sizes_keep_tokens_identical(self, pink_setup,
                                                step_tokens):
        """The decode window (tokens per host sync) is a pure scheduling
        knob: H=1 (exact per-token admission) and H=3 (mid-window
        retirement + slot reuse, budget 5 not divisible by 3) must both
        reproduce per-request generate tokens."""
        model, variables, reqs = pink_setup
        ad = PinkAdapter(model, variables, max_prompt_len=LP,
                         max_new_tokens=MAX_NEW, has_image=True)
        eng = ContinuousBatchingEngine(ad, slots=2, max_new_tokens=MAX_NEW,
                                       eos_id=EOS, step_tokens=step_tokens)
        result = eng.run(reqs)
        for rid, data in reqs:
            want = _reference_tokens(model, variables, data)
            assert result["outputs"][rid] == want, (step_tokens, rid)


class TestKvInt8Engine:
    def test_matches_generate_with_int8_cache(self, pink_setup):
        """Engine slot-pool with kv_int8 caches == per-request generate with
        kv_int8 (both paths quantize identically)."""
        model, variables, reqs = pink_setup
        qmodel = model.clone(kv_int8=True)
        ad = PinkAdapter(qmodel, variables, max_prompt_len=LP,
                         max_new_tokens=MAX_NEW, has_image=True)
        eng = ContinuousBatchingEngine(ad, slots=2, max_new_tokens=MAX_NEW,
                                       eos_id=EOS)
        result = eng.run(reqs[:3])
        for rid, data in reqs[:3]:
            want = _reference_tokens(qmodel, variables, data)
            assert result["outputs"][rid] == want, rid


class TestMultiTurnSessions:
    """Engine-level multi-turn serving: a session keeps its cache row
    between turns and continue_session appends the next turn via the
    model's extend_cache — generations must equal a full re-prefill of the
    whole conversation (what the reference does every turn)."""

    NO_EOS = 999_999  # never generated: turns retire on budget

    def _want(self, model, variables, data):
        batch = {"input_ids": jnp.asarray(data["input_ids"])[None],
                 "input_mask": jnp.asarray(data["input_mask"])[None],
                 "image_data": jnp.asarray(data["image_data"])[None]}
        tokens, lens = model.generate(variables, batch, eos_id=self.NO_EOS,
                                      max_length=MAX_NEW)
        return list(np.asarray(tokens)[0, int(lens[0]):
                                       int(lens[0]) + MAX_NEW])

    def test_two_turns_match_full_reprefill(self, pink_setup):
        model, variables, reqs = pink_setup
        ad = PinkAdapter(model, variables, max_prompt_len=LP,
                         max_new_tokens=MAX_NEW, has_image=True,
                         extra_slots=16)
        eng = ContinuousBatchingEngine(ad, slots=2, max_new_tokens=MAX_NEW,
                                       eos_id=self.NO_EOS, step_tokens=2)
        rid0, data0 = reqs[0]
        eng.submit("t1", dict(data0, session=True))
        # a plain request shares the pool while the session runs
        eng.submit(*reqs[1])
        for _ in range(4 * MAX_NEW):
            eng.step()
            if "t1" in eng._done and reqs[1][0] in eng._done:
                break
        gen1 = eng._done["t1"]
        assert len(gen1) == MAX_NEW
        # the pool-mate is untouched by session bookkeeping
        assert eng._done[reqs[1][0]] == self._want(model, variables,
                                                   reqs[1][1])

        turn2 = np.array([17, 23, 31], np.int32)
        eng.continue_session("t1", "t2", {"input_ids": turn2})
        for _ in range(4 * MAX_NEW):
            eng.step()
            if "t2" in eng._done:
                break
        gen2 = eng._done["t2"]

        # reference: re-prefill the FULL conversation [prompt; gen1; turn2]
        n1 = int(np.asarray(data0["input_mask"]).sum())
        full = np.concatenate([np.asarray(data0["input_ids"][:n1]),
                               np.asarray(gen1, np.int32), turn2])
        batch2 = {
            "input_ids": jnp.asarray(full)[None],
            "input_mask": jnp.ones((1, full.shape[0]), jnp.int32),
            "image_data": jnp.asarray(data0["image_data"])[None],
        }
        want, lens = model.generate(variables, batch2, eos_id=self.NO_EOS,
                                    max_length=MAX_NEW)
        want2 = list(np.asarray(want)[0, int(lens[0]): int(lens[0]) + MAX_NEW])
        assert gen2 == want2

    def test_close_session_frees_the_slot(self, pink_setup):
        model, variables, reqs = pink_setup
        ad = PinkAdapter(model, variables, max_prompt_len=LP,
                         max_new_tokens=MAX_NEW, has_image=True,
                         extra_slots=8)
        eng = ContinuousBatchingEngine(ad, slots=1, max_new_tokens=MAX_NEW,
                                       eos_id=self.NO_EOS, step_tokens=2)
        eng.submit("s1", dict(reqs[0][1], session=True))
        for _ in range(2 * MAX_NEW):
            eng.step()
            if "s1" in eng._done:
                break
        # the single slot is held: a new request cannot be admitted
        eng.submit(*reqs[2])
        assert eng.step() == [] and eng._slot_held[0] == "s1"
        eng.close_session("s1")
        for _ in range(4 * MAX_NEW):
            eng.step()
            if reqs[2][0] in eng._done:
                break
        assert eng._done[reqs[2][0]] == self._want(model, variables,
                                                   reqs[2][1])


class TestPrefixCaching:
    def test_prefix_fork_matches_full_prompt(self, pink_setup):
        """register_prefix prefills a shared [image + system tokens] ONCE;
        requests fork the stored row and append only their suffix — tokens
        identical to a full re-prefill of prefix+suffix (the vLLM-class
        prefix-caching feature; the reference re-encodes everything per
        request)."""
        model, variables, reqs = pink_setup
        ad = PinkAdapter(model, variables, max_prompt_len=LP,
                         max_new_tokens=MAX_NEW, has_image=True)
        eng = ContinuousBatchingEngine(ad, slots=2, max_new_tokens=MAX_NEW,
                                       eos_id=EOS)
        rng = np.random.default_rng(7)
        img = np.asarray(jax.random.normal(jax.random.PRNGKey(9),
                                           (32, 32, 3)), np.float32)
        pre = rng.integers(5, 40, size=(3,)).astype(np.int32)
        eng.register_prefix("sys", {"input_ids": pre,
                                    "input_mask": np.ones(3, np.int32),
                                    "image_data": img})
        suffixes = [rng.integers(5, 40, size=(k,)).astype(np.int32)
                    for k in (2, 3, 2)]
        for i, suf in enumerate(suffixes):
            eng.submit(f"p{i}", {"prefix": "sys", "input_ids": suf})
        while eng._queue or any(r is not None for r in eng._slot_req):
            eng.step()
        for i, suf in enumerate(suffixes):
            n = len(pre) + len(suf)
            full = np.zeros((LP,), np.int32)
            full[:n] = np.concatenate([pre, suf])
            mask = (np.arange(LP) < n).astype(np.int32)
            want = _reference_tokens(model, variables, {
                "input_ids": full, "input_mask": mask, "image_data": img})
            assert eng._done[f"p{i}"] == want, i
        # the prefix row survives admissions (admit does not donate it):
        # a later fork still works after the pool churned
        eng.submit("late", {"prefix": "sys", "input_ids": suffixes[0]})
        while eng._queue or any(r is not None for r in eng._slot_req):
            eng.step()
        assert eng._done["late"] == eng._done["p0"]
        # suffix_pad: one compiled extend serves every suffix length —
        # padded suffixes produce the same tokens (stale pad writes sit
        # beyond the attention validity horizon)
        eng.suffix_pad = 3
        for i, suf in enumerate(suffixes):
            eng.submit(f"pad{i}", {"prefix": "sys", "input_ids": suf})
        while eng._queue or any(r is not None for r in eng._slot_req):
            eng.step()
        for i in range(len(suffixes)):
            assert eng._done[f"pad{i}"] == eng._done[f"p{i}"], i


class TestChunkedPrefill:
    """Interleaved chunked admission (prefill_chunk=W): one compiled
    (prefill@[1,W], extend@[W]) pair serves every prompt length, long
    prompts stream in between decode windows — tokens must be identical to
    whole-prompt admission."""

    @pytest.mark.parametrize("chunk", [2, 3])
    def test_tokens_match_unchunked(self, pink_setup, chunk):
        model, variables, reqs = pink_setup
        ad = PinkAdapter(model, variables, max_prompt_len=LP,
                         max_new_tokens=MAX_NEW, has_image=True)
        eng = ContinuousBatchingEngine(ad, slots=2, max_new_tokens=MAX_NEW,
                                       eos_id=EOS, prefill_chunk=chunk)
        result = eng.run(reqs)
        for rid, data in reqs:
            want = _reference_tokens(model, variables, data)
            assert result["outputs"][rid] == want, (chunk, rid)
        assert result["ttft_p50"] > 0 and result["tpot_p50"] >= 0

    def test_full_length_prompt_chunk_wider_than_headroom(self, pink_setup):
        """Regression: a prompt at max_prompt_len whose FINAL chunk would be
        right-padded to W forces a W-wide cache write past the last slot;
        XLA's dynamic_update_slice CLAMPS the start and overwrites good
        history (measured on-chip: first generated token flips). The engine
        now overlaps the final chunk instead — tokens must equal
        whole-prompt admission at the exact boundary."""
        model, variables, _ = pink_setup
        LPF, W, NEW = 12, 8, 2
        rng = np.random.default_rng(9)
        reqs = []
        for i in range(3):
            n = LPF if i != 1 else 5  # mix full-length and short
            ids = np.zeros((LPF,), np.int32)
            ids[:n] = rng.integers(5, 40, (n,))
            reqs.append((f"b{i}", {
                "input_ids": ids,
                "input_mask": (np.arange(LPF) < n).astype(np.int32),
                "image_data": rng.standard_normal((32, 32, 3)
                                                  ).astype(np.float32)}))
        ad = PinkAdapter(model, variables, max_prompt_len=LPF,
                         max_new_tokens=NEW, has_image=True)
        whole = ContinuousBatchingEngine(ad, slots=2, max_new_tokens=NEW,
                                         eos_id=EOS).run(reqs)
        ad2 = PinkAdapter(model, variables, max_prompt_len=LPF,
                          max_new_tokens=NEW, has_image=True)
        chunked = ContinuousBatchingEngine(
            ad2, slots=2, max_new_tokens=NEW, eos_id=EOS,
            prefill_chunk=W).run(reqs)
        assert chunked["outputs"] == whole["outputs"]

    def test_decode_proceeds_while_prefilling(self, pink_setup):
        """A decoding slot advances during another request's chunked
        prefill: after one step() with a long prompt still pending, the
        first slot has tokens while the pending one has none."""
        model, variables, reqs = pink_setup
        ad = PinkAdapter(model, variables, max_prompt_len=LP,
                         max_new_tokens=MAX_NEW, has_image=True)
        eng = ContinuousBatchingEngine(ad, slots=2, max_new_tokens=MAX_NEW,
                                       eos_id=EOS, prefill_chunk=2,
                                       chunks_per_step=1, step_tokens=1)
        eng.submit("short", reqs[0][1])
        eng.step()  # admits short (1 pending chunk), decodes 1 token
        eng.submit("long", reqs[1][1])
        eng.step()
        # long's 6-token prompt = chunk0 + 2 pending chunks; with
        # chunks_per_step=1 it is still prefilling while short decodes
        assert any(p is not None for p in eng._slot_pending)
        n_short = len(eng._slot_toks[[r for r in eng._slot_req].index(
            "short")]) if "short" in eng._slot_req else len(
            eng._done.get("short", []))
        assert n_short >= 1
        # drain; tokens still exact
        while eng._queue or any(r is not None for r in eng._slot_req) \
                or any(p is not None for p in eng._slot_pending):
            eng.step()
        for rid, data in [("short", reqs[0][1]), ("long", reqs[1][1])]:
            want = _reference_tokens(model, variables, data)
            assert eng._done[rid] == want, rid

    def test_m2omni_spliced_falls_back_when_placeholders_span_chunks(self):
        """Spliced-layout prompts whose placeholders cross the chunk
        boundary must admit whole-prompt (extend can't splice vision)."""
        model = M2Omni(lm_preset="omni_tiny_test",
                       vit_preset="vit_tiny_test", image_size=32,
                       image_token_id=3, audio_token_id=None,
                       dtype_str="float32")
        rng = jax.random.PRNGKey(0)
        N = (32 // 16) ** 2

        def mk(seed, n_text):
            r = jax.random.PRNGKey(seed)
            row = [5] + [3] * N + list(
                np.asarray(jax.random.randint(r, (n_text,), 5, 40)))
            ids = np.zeros((LP + N,), np.int32)
            ids[:len(row)] = row
            mask = (ids != 0).astype(np.int32)
            img = np.asarray(jax.random.normal(r, (1, 32, 32, 3)),
                             np.float32)
            return {"input_ids": ids, "input_mask": mask, "image_data": img}

        init = mk(0, 3)
        variables = model.init(rng, {
            "input_ids": jnp.asarray(init["input_ids"])[None],
            "input_mask": jnp.asarray(init["input_mask"])[None],
            "image_data": jnp.asarray(init["image_data"])[None]})
        reqs = [(f"r{i}", mk(200 + i, 2 + i % 3)) for i in range(2)]
        ad = M2OmniAdapter(model, variables, max_prompt_len=LP + N,
                           max_new_tokens=MAX_NEW, has_image=True)
        # chunk=2 < 1 + N placeholders -> every request falls back
        eng = ContinuousBatchingEngine(ad, slots=2, max_new_tokens=MAX_NEW,
                                       eos_id=EOS, prefill_chunk=2)
        result = eng.run(reqs)
        for rid, data in reqs:
            want = _reference_tokens(model, variables, data)
            assert result["outputs"][rid] == want, rid


class TestSamplingControls:
    def test_top_p_zero_equals_greedy_and_mixed_pool_isolated(
            self, pink_setup):
        """top_p→0 nucleus sampling == greedy, and a sampling request in
        the pool must not perturb greedy requests' tokens (they run inside
        the same _step_sample program)."""
        model, variables, reqs = pink_setup
        ad = PinkAdapter(model, variables, max_prompt_len=LP,
                         max_new_tokens=MAX_NEW, has_image=True)
        eng = ContinuousBatchingEngine(ad, slots=3, max_new_tokens=MAX_NEW,
                                       eos_id=EOS)
        mixed = [
            (reqs[0][0], {**reqs[0][1], "do_sample": True, "top_p": 1e-9,
                          "temperature": 0.7, "seed": 11}),
            (reqs[1][0], dict(reqs[1][1])),  # greedy
            (reqs[2][0], {**reqs[2][1], "do_sample": True, "top_p": 0.9,
                          "temperature": 1.3, "seed": 7}),
        ]
        result = eng.run(mixed)
        # top_p -> 0 keeps only the argmax token: greedy tokens exactly
        for rid, data in reqs[:2]:
            want = _reference_tokens(model, variables, data)
            assert result["outputs"][rid] == want, rid
        assert len(result["outputs"][reqs[2][0]]) >= 1

    def test_seeded_sampling_reproducible_and_schedule_independent(
            self, pink_setup):
        """Same request + seed gives the same tokens regardless of what
        else is co-scheduled (per-token keys are fold_in(seed, rope))."""
        model, variables, reqs = pink_setup
        ad = PinkAdapter(model, variables, max_prompt_len=LP,
                         max_new_tokens=MAX_NEW, has_image=True)
        sample_req = {**reqs[0][1], "do_sample": True, "top_p": 0.95,
                      "temperature": 1.0, "seed": 42}
        eng = ContinuousBatchingEngine(ad, slots=2, max_new_tokens=MAX_NEW,
                                       eos_id=EOS)
        alone = eng.run([("a", sample_req)])["outputs"]["a"]
        eng.reset()
        crowded = eng.run([("a", sample_req)] + reqs[1:4])["outputs"]["a"]
        assert alone == crowded


class TestStopAndCancel:
    def test_stop_sequence_truncates_and_retires(self, pink_setup):
        model, variables, reqs = pink_setup
        rid, data = reqs[0]
        want = _reference_tokens(model, variables, data)
        # stop on the first token that DIFFERS from the opener (the greedy
        # fixture repeats tokens, so stopping on want[1] could fire at
        # position 0)
        idx = next((i for i, t in enumerate(want) if t != want[0]), None)
        if idx is None:
            pytest.skip("fixture generated a constant sequence")
        ad = PinkAdapter(model, variables, max_prompt_len=LP,
                         max_new_tokens=MAX_NEW, has_image=True)
        eng = ContinuousBatchingEngine(ad, slots=2, max_new_tokens=MAX_NEW,
                                       eos_id=EOS)
        result = eng.run([(rid, {**data, "stop": [[want[idx]]]})])
        # stop tokens are excluded from the output (HF convention)
        assert result["outputs"][rid] == want[:idx]
        # multi-token stop sequence: the pair (want[idx-1], want[idx])
        eng.reset()
        result = eng.run(
            [(rid, {**data, "stop": [[want[idx - 1], want[idx]]]})])
        assert result["outputs"][rid] == want[:idx - 1]

    def test_cancel_queued_and_running(self, pink_setup):
        model, variables, reqs = pink_setup
        ad = PinkAdapter(model, variables, max_prompt_len=LP,
                         max_new_tokens=MAX_NEW, has_image=True)
        eng = ContinuousBatchingEngine(ad, slots=1, max_new_tokens=MAX_NEW,
                                       eos_id=EOS, step_tokens=1)
        eng.submit("run", reqs[0][1])
        eng.submit("queued", reqs[1][1])
        eng.step()  # "run" admitted + 1 token; "queued" still waiting
        assert eng.cancel("queued") is True
        assert eng.cancel("run") is True
        assert eng.cancel("nonexistent") is False
        while eng._queue or any(r is not None for r in eng._slot_req):
            eng.step()
        assert eng._done["queued"] == []
        assert len(eng._done["run"]) <= 2  # partial, freed at the boundary
        assert eng._cancelled == {"queued", "run"}


class TestMixedModalityRequests:
    def test_multi_image_plus_video_request(self):
        """The engine serves a spliced request carrying TWO images (tuple
        of streams, each at its own placeholder run) and a video — tokens
        equal per-request model.generate on the same batch (the reference
        serves one request at a time and cannot batch mixed-modality rows
        at all)."""
        model = M2Omni(lm_preset="omni_tiny_test",
                       vit_preset="vit_tiny_test", image_size=32,
                       image_token_id=3, video_token_id=6,
                       audio_token_id=None, dtype_str="float32")
        rng = jax.random.PRNGKey(0)
        N = (32 // 16) ** 2  # tokens per image stream (and per video frame)

        def mk(seed):
            r = jax.random.PRNGKey(seed)
            row = ([5] + [3] * N + [20] + [3] * N + [21] + [6] * N
                   + list(np.asarray(jax.random.randint(r, (3,), 30, 900))))
            ids = np.asarray(row, np.int32)
            img1 = np.asarray(jax.random.normal(r, (32, 32, 3)), np.float32)
            img2 = np.asarray(
                jax.random.normal(jax.random.fold_in(r, 1), (32, 32, 3)),
                np.float32)
            vid = np.asarray(
                jax.random.normal(jax.random.fold_in(r, 2), (1, 32, 32, 3)),
                np.float32)
            return {"input_ids": ids,
                    "input_mask": np.ones_like(ids),
                    "image_data": (img1, img2), "video_data": vid}

        d0 = mk(0)
        variables = model.init(rng, {
            "input_ids": jnp.asarray(d0["input_ids"])[None],
            "input_mask": jnp.asarray(d0["input_mask"])[None],
            "image_data": tuple(jnp.asarray(x)[None]
                                for x in d0["image_data"]),
            "video_data": jnp.asarray(d0["video_data"])[None]})
        reqs = [(f"r{i}", mk(100 + i)) for i in range(3)]

        Lp = len(d0["input_ids"])
        ad = M2OmniAdapter(model, variables, max_prompt_len=Lp,
                           max_new_tokens=MAX_NEW, has_image=True)
        eng = ContinuousBatchingEngine(ad, slots=2, max_new_tokens=MAX_NEW,
                                       eos_id=EOS)
        result = eng.run(reqs)
        for rid, data in reqs:
            batch = {"input_ids": jnp.asarray(data["input_ids"])[None],
                     "input_mask": jnp.asarray(data["input_mask"])[None],
                     "image_data": tuple(jnp.asarray(x)[None]
                                         for x in data["image_data"]),
                     "video_data": jnp.asarray(data["video_data"])[None]}
            tokens, lens = model.generate(variables, batch, eos_id=EOS,
                                          max_length=MAX_NEW)
            tokens, lens = np.asarray(tokens), np.asarray(lens)
            want = _truncate_at_eos(tokens[0, lens[0]: lens[0] + MAX_NEW])
            assert result["outputs"][rid] == want, rid


class TestScanLayersEngine:
    """scan_layers models carry ONE stacked KV-cache dict ([L, B, H, T, D]
    leaves, slot-row axis 1 instead of 0): the engine's admit/extend row
    scatters and T discovery must follow the layout (pink_7b.yml /
    m2_omni_7b.yml set scan_layers: true for production serving)."""

    def test_matches_sequential_generate(self):
        model = PinkModel(lm_preset="omni_tiny_test",
                          vit_preset="vit_tiny_test", image_size=32,
                          lora_rank=2, scan_layers=True,
                          dtype_str="float32")
        rng = jax.random.PRNGKey(0)
        init_batch = {
            "input_ids": jnp.zeros((1, LP), jnp.int32),
            "input_mask": jnp.ones((1, LP), jnp.int32),
            "image_data": jax.random.normal(rng, (1, 32, 32, 3)),
        }
        variables = model.init(rng, init_batch)
        reqs = []
        for i in range(3):
            r = jax.random.PRNGKey(300 + i)
            n = 3 + i % 3
            ids = np.zeros((LP,), np.int32)
            ids[:n] = np.asarray(jax.random.randint(r, (n,), 5, 40), np.int32)
            mask = (np.arange(LP) < n).astype(np.int32)
            img = np.asarray(jax.random.normal(r, (32, 32, 3)), np.float32)
            reqs.append((f"sc{i}", {"input_ids": ids, "input_mask": mask,
                                    "image_data": img}))
        ad = PinkAdapter(model, variables, max_prompt_len=LP,
                         max_new_tokens=MAX_NEW, has_image=True)
        # stacked cache leaves: [L, 1, H, T, D]
        leaf = jax.tree_util.tree_leaves(ad.make_cache(1))[0]
        assert leaf.ndim == 5 and leaf.shape[1] == 1
        eng = ContinuousBatchingEngine(ad, slots=2, max_new_tokens=MAX_NEW,
                                       eos_id=EOS)
        result = eng.run(reqs)
        for rid, data in reqs:
            want = _reference_tokens(model, variables, data)
            assert result["outputs"][rid] == want, rid


class TestDeadlineEviction:
    def test_running_and_queued_requests_evict_past_deadline(
            self, pink_setup):
        """Eviction under pressure: with 1 slot and tight deadlines, an
        overdue RUNNING request frees its slot with partial tokens (marked
        evicted) and an overdue QUEUED request never runs — the engine
        drains instead of pinning slots forever."""
        import time as _time

        model, variables, reqs = pink_setup
        ad = PinkAdapter(model, variables, max_prompt_len=LP,
                         max_new_tokens=MAX_NEW, has_image=True)
        eng = ContinuousBatchingEngine(ad, slots=1, max_new_tokens=MAX_NEW,
                                       eos_id=EOS, step_tokens=1)
        eng.submit("tight", {**reqs[0][1], "deadline_s": 0.0})
        eng.submit("fine", reqs[1][1])
        eng.step()  # "tight" admitted (deadline checked AFTER one window)
        _time.sleep(0.01)
        while eng._queue or any(r is not None for r in eng._slot_req):
            eng.step()
        res = eng.stats(1.0)
        assert "tight" in res["evicted"]
        # partial output kept, slot freed, the healthy request completed
        assert len(res["outputs"]["tight"]) < MAX_NEW
        assert len(res["outputs"]["fine"]) == MAX_NEW
        assert "fine" not in res["evicted"]

        # queued eviction: deadline expires before a slot frees
        eng.reset()
        eng.submit("holder", reqs[0][1])
        eng.step()
        eng.submit("starved", {**reqs[1][1], "deadline_s": 0.0})
        _time.sleep(0.01)
        while eng._queue or any(r is not None for r in eng._slot_req):
            eng.step()
        res = eng.stats(1.0)
        assert "starved" in res["evicted"]
        assert res["outputs"]["starved"] == []  # never ran
        assert len(res["outputs"]["holder"]) == MAX_NEW

    def test_engine_default_timeout_applies(self, pink_setup):
        model, variables, reqs = pink_setup
        ad = PinkAdapter(model, variables, max_prompt_len=LP,
                         max_new_tokens=MAX_NEW, has_image=True)
        eng = ContinuousBatchingEngine(ad, slots=1, max_new_tokens=MAX_NEW,
                                       eos_id=EOS, step_tokens=1)
        eng.request_timeout_s = 1e-6
        eng.submit("r", reqs[0][1])
        eng.step()
        while eng._queue or any(r is not None for r in eng._slot_req):
            eng.step()
        assert "r" in eng.stats(1.0)["evicted"]

    def test_stats_report_utilization_and_queue_depth(self, pink_setup):
        model, variables, reqs = pink_setup
        ad = PinkAdapter(model, variables, max_prompt_len=LP,
                         max_new_tokens=MAX_NEW, has_image=True)
        eng = ContinuousBatchingEngine(ad, slots=2, max_new_tokens=MAX_NEW,
                                       eos_id=EOS, step_tokens=1)
        res = eng.run(reqs[:4])
        assert 0.0 < res["slot_utilization"] <= 1.0
        assert res["queue_depth_max"] >= 1  # 4 requests over 2 slots queued
        assert res["steps"] > 0
        assert res["evicted"] == set()


class TestMixedImageTextOnlyPool:
    def test_text_only_requests_in_image_engine_match_generate(
            self, pink_setup):
        """A text-only request served by an image-serving engine must use
        ITS OWN vision offset (0), not the engine-level Lv — the sustained
        mixed workload (long+vision / short text-only) depends on it."""
        model, variables, reqs = pink_setup
        ad = PinkAdapter(model, variables, max_prompt_len=LP,
                         max_new_tokens=MAX_NEW, has_image=True)
        eng = ContinuousBatchingEngine(ad, slots=2, max_new_tokens=MAX_NEW,
                                       eos_id=EOS)
        mixed = [reqs[0],
                 ("text_only", {k: v for k, v in reqs[1][1].items()
                                if k != "image_data"}),
                 reqs[2]]
        result = eng.run(mixed)
        for rid, data in mixed:
            want = _reference_tokens(model, variables, data)
            assert result["outputs"][rid] == want, rid
