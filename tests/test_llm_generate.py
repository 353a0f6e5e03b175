"""KV-cache decode path: prefill + per-token decode vs full causal forward.

The reference LLM family decodes with HF ``generate`` + ``past_key_values``
(/root/reference/prj/Pink/pink/eval/model_vqav2.py:141,
/root/reference/prj/M2_omni/models/modeling_llama_3d.py:900-1000). These tests
pin the TPU-native equivalent: cache-decode logits match the full forward, the
cached greedy path reproduces the legacy full-prefix re-encoding path
token-for-token, beam search really runs K beams, and the M2-omni 3D-RoPE
position continuation follows the reference get_rope_index convention
(modeling_m2omni.py:327-494) — including multiple placeholder runs per row.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from antmmf_tpu.models.m2_omni import M2Omni
from antmmf_tpu.models.pink import PinkModel
from antmmf_tpu.modules.llm import DecoderLM, init_decoder_cache


def test_decoder_cache_matches_full_forward():
    """Prefill Lp tokens then decode the rest one-by-one — hidden states must
    match the plain causal forward over the whole sequence."""
    B, L, C, Lp = 2, 10, 32, 6
    model = DecoderLM(num_layers=2, num_heads=4, num_kv_heads=2,
                      dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    embeds = jax.random.normal(rng, (B, L, C), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
    params = model.init(rng, embeds, positions)

    full = model.apply(params, embeds, positions)  # [B, L, C]

    cache = init_decoder_cache(2, B, 2, L, C // 4, jnp.float32)
    pre, cache = model.apply(params, embeds[:, :Lp], positions[:, :Lp],
                             None, True, cache=cache)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(full[:, :Lp]),
                               atol=2e-5)
    for t in range(Lp, L):
        pos = jnp.full((B,), t, jnp.int32)
        step, cache = model.apply(params, embeds[:, t:t + 1], pos[:, None],
                                  None, True, cache=cache, decode_pos=pos)
        np.testing.assert_allclose(np.asarray(step[:, 0]),
                                   np.asarray(full[:, t]), atol=2e-5)


def test_decoder_cache_ragged_rows():
    """Per-row decode slots (ragged prompts): row 0 decodes at slot 4, row 1
    at slot 6 — each must match its own full-forward reference."""
    B, L, C = 2, 8, 32
    lens = jnp.array([4, 6], jnp.int32)
    model = DecoderLM(num_layers=2, num_heads=4, dtype=jnp.float32)
    rng = jax.random.PRNGKey(1)
    embeds = jax.random.normal(rng, (B, L, C), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
    params = model.init(rng, embeds, positions)

    mask = (jnp.arange(L)[None] < lens[:, None]).astype(jnp.int32)
    full = model.apply(params, embeds, positions, mask)

    cache = init_decoder_cache(2, B, 4, L, C // 4, jnp.float32)
    _, cache = model.apply(params, embeds, positions, mask, True, cache=cache)
    # decode the token AT slot lens (one per row), fed the embedding each
    # row would see next; compare against a full forward with that token
    # appended at its row's slot
    nxt = jax.random.normal(jax.random.PRNGKey(2), (B, C), jnp.float32)
    slot_oh = jax.nn.one_hot(lens, L, dtype=jnp.float32)[..., None]
    embeds2 = embeds * (1 - slot_oh) + nxt[:, None] * slot_oh
    mask2 = (jnp.arange(L)[None] < (lens + 1)[:, None]).astype(jnp.int32)
    full2 = model.apply(params, embeds2, positions, mask2)
    want = np.asarray(jnp.take_along_axis(
        full2, lens[:, None, None].repeat(C, -1), axis=1)[:, 0])

    step, _ = model.apply(params, nxt[:, None], lens[:, None], None, True,
                          cache=cache, decode_pos=lens)
    np.testing.assert_allclose(np.asarray(step[:, 0]), want, atol=2e-5)


@pytest.fixture(scope="module")
def pink_tiny():
    model = PinkModel(lm_preset="omni_tiny_test", vit_preset="vit_tiny_test",
                      image_size=32, lora_rank=2, dtype_str="float32")
    rng = jax.random.PRNGKey(0)
    batch = {
        "input_ids": jnp.array([[5, 6, 7, 8, 0, 0], [9, 10, 11, 12, 13, 14]],
                               jnp.int32),
        "input_mask": jnp.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]],
                                jnp.int32),
        "image_data": jax.random.normal(rng, (2, 32, 32, 3)),
    }
    variables = model.init(rng, batch)
    return model, variables, batch


def test_pink_cached_greedy_matches_reencode(pink_tiny):
    model, variables, batch = pink_tiny
    got, lens = model.generate(variables, batch, eos_id=1, max_length=5,
                               use_cache=True)
    want, lens2 = model.generate(variables, batch, eos_id=1, max_length=5,
                                 use_cache=False)
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(lens2))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pink_beam1_matches_greedy(pink_tiny):
    model, variables, batch = pink_tiny
    greedy, _ = model.generate(variables, batch, eos_id=1, max_length=5)
    beam1, _ = model.generate(variables, batch, eos_id=1, max_length=5,
                              num_beams=1)
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(beam1))


def test_pink_beam_search_runs_and_scores(pink_tiny):
    """num_beams>1 is no longer discarded: K=4 beams must return sequences
    whose total log-prob is >= the greedy sequence's (beam search can only
    improve the sum-of-logprobs objective)."""
    model, variables, batch = pink_tiny
    max_new = 5
    greedy, lens = model.generate(variables, batch, eos_id=1,
                                  max_length=max_new)
    beam, _ = model.generate(variables, batch, eos_id=1, max_length=max_new,
                             num_beams=4)
    assert beam.shape == greedy.shape

    def seq_logprob(tokens):
        total = 0.0
        ids0 = np.asarray(batch["input_ids"])
        lens_np = np.asarray(lens)
        for b in range(ids0.shape[0]):
            cur = np.asarray(tokens[b]).copy()
            for t in range(max_new):
                upto = lens_np[b] + t
                fwd = {
                    "input_ids": jnp.asarray(cur[None, :]),
                    "input_mask": jnp.asarray(
                        (np.arange(cur.shape[0]) < upto)[None].astype(np.int32)),
                    "image_data": batch["image_data"][b:b + 1],
                }
                logits = model.apply(variables, fwd)["logits"]
                logp = jax.nn.log_softmax(logits[0, upto - 1])
                total += float(logp[cur[upto]])
                if cur[upto] == 1:
                    break
        return total

    assert seq_logprob(beam) >= seq_logprob(greedy) - 1e-4


@pytest.fixture(scope="module")
def omni_tiny_spliced():
    model = M2Omni(lm_preset="omni_tiny_test", vit_preset="vit_tiny_test",
                   image_size=32, image_token_id=3, audio_token_id=None,
                   dtype_str="float32")
    rng = jax.random.PRNGKey(0)
    N = (32 // 16) ** 2  # 4 tokens per image
    row0 = [5] + [3] * N + [6, 7, 8, 0, 0]
    row1 = [9] + [3] * N + [10, 11, 12, 13, 14]
    ids = jnp.array([row0, row1], jnp.int32)
    mask = (ids != 0).astype(jnp.int32)
    batch = {
        "input_ids": ids, "input_mask": mask,
        "image_data": jax.random.normal(rng, (2, 1, 32, 32, 3)),
    }
    variables = model.init(rng, batch)
    return model, variables, batch


def test_m2omni_generate_greedy_spliced(omni_tiny_spliced):
    """Cached greedy must match a manual re-encoding greedy loop."""
    model, variables, batch = omni_tiny_spliced
    max_new = 4
    got, lens = model.generate(variables, batch, eos_id=1,
                               max_length=max_new)

    ids = np.asarray(batch["input_ids"])
    mask = np.asarray(batch["input_mask"])
    B, Lp = ids.shape
    total = Lp + max_new
    want = np.concatenate([ids * mask, np.zeros((B, max_new), np.int32)], 1)
    lens_np = mask.sum(-1)
    done = np.zeros((B,), bool)
    for t in range(max_new):
        cur = (np.arange(total)[None] < (lens_np + t)[:, None])
        fwd = {"input_ids": jnp.asarray(want),
               "input_mask": jnp.asarray(cur.astype(np.int32)),
               "image_data": batch["image_data"]}
        logits = np.asarray(model.apply(variables, fwd)["logits"])
        for b in range(B):
            last = logits[b, lens_np[b] + t - 1]
            nxt = 1 if done[b] else int(np.argmax(last))
            want[b, lens_np[b] + t] = nxt
            done[b] |= nxt == 1
    np.testing.assert_array_equal(np.asarray(got), want)
    np.testing.assert_array_equal(np.asarray(lens), lens_np)


def test_m2omni_generate_prefix_layout():
    """Prefix (non-spliced) layout decodes and continues 3D positions."""
    model = M2Omni(lm_preset="omni_tiny_test", vit_preset="vit_tiny_test",
                   image_size=32, dtype_str="float32")
    rng = jax.random.PRNGKey(0)
    batch = {
        "input_ids": jnp.array([[5, 6, 7, 0], [8, 9, 10, 11]], jnp.int32),
        "input_mask": jnp.array([[1, 1, 1, 0], [1, 1, 1, 1]], jnp.int32),
        "image_data": jax.random.normal(rng, (2, 2, 32, 32, 3)),
    }
    variables = model.init(rng, batch)
    tokens, lens = model.generate(variables, batch, eos_id=1, max_length=3)
    assert tokens.shape == (2, 7)
    assert list(np.asarray(lens)) == [3, 4]
    # generated slots were written (not left at the pad value) for row 0
    assert np.asarray(tokens)[0, 3:6].max() >= 0


def _reference_rope_index(tokens, grids):
    """Numpy transcription of the reference get_rope_index loop
    (modeling_m2omni.py:327-494): tokens is a list with 'T' for text and
    (run_id) ints for placeholder slots; grids maps run_id -> (t, h, w)."""
    pos = []
    st_idx = 0
    i = 0
    while i < len(tokens):
        if tokens[i] == "T":
            pos.append((st_idx, st_idx, st_idx))
            st_idx += 1
            i += 1
        else:
            run = tokens[i]
            t, h, w = grids[run]
            for tt in range(t):
                for hh in range(h):
                    for ww in range(w):
                        pos.append((st_idx + tt, st_idx + hh, st_idx + ww))
            st_idx += max(t, h, w)
            i += t * h * w
    return np.array(pos)


def test_get_rope_index_two_images_one_row():
    """Two separate <image> runs in one row: the second run must restart its
    (t, h, w) grid at ITS OWN base (the round-2 bug used the first run's
    offset for every run)."""
    # layout: T [img0: 1x2x2] T T [img1: 1x2x2] T
    N = 4
    ids = np.array([[7] + [3] * N + [8, 9] + [3] * N + [10]])
    ids = jnp.asarray(ids, jnp.int32)
    modal_mask = ids == 3
    # modal_pos for 2 images stacked as frames: frame f -> t=f, 2x2 grid
    mp = []
    for f in range(2):
        for hh in range(2):
            for ww in range(2):
                mp.append((f, hh, ww))
    modal_pos = jnp.asarray(np.array(mp)[None], jnp.int32)
    rel, run_start = M2Omni._modal_rel_positions(modal_mask, modal_pos)
    pos, next_base = M2Omni.get_rope_index(modal_mask, run_start, rel)

    want = _reference_rope_index(
        ["T"] + [0] * N + ["T", "T"] + [1] * N + ["T"],
        {0: (1, 2, 2), 1: (1, 2, 2)})
    np.testing.assert_array_equal(np.asarray(pos)[0], want)
    assert int(next_base[0]) == int(want.max()) + 1


def test_get_rope_index_video_run():
    """One 2-frame video run: t advances inside the run; following text
    resumes at run base + max(t, h, w) + 1 (NOT at the slot index)."""
    N = 8  # 2 frames x 2x2
    ids = np.array([[7] + [3] * N + [9]])
    ids = jnp.asarray(ids, jnp.int32)
    modal_mask = ids == 3
    mp = []
    for f in range(2):
        for hh in range(2):
            for ww in range(2):
                mp.append((f, hh, ww))
    modal_pos = jnp.asarray(np.array(mp)[None], jnp.int32)
    rel, run_start = M2Omni._modal_rel_positions(modal_mask, modal_pos)
    pos, _ = M2Omni.get_rope_index(modal_mask, run_start, rel)
    want = _reference_rope_index(["T"] + [0] * N + ["T"], {0: (2, 2, 2)})
    np.testing.assert_array_equal(np.asarray(pos)[0], want)


def test_int8_quantized_generate_runs_and_approximates(pink_tiny):
    """quantize_for_decode variables drive the same generate API; greedy
    tokens from int8 weights must match full-precision tokens on the tiny
    model (quantization error << logit gaps at min_size=0 per-channel)."""
    from antmmf_tpu.predictors.quantization import (
        is_decode_quantized, quantize_for_decode)

    model, variables, batch = pink_tiny
    qvars = quantize_for_decode(variables, min_size=1024)
    assert is_decode_quantized(qvars)
    full, lens = model.generate(variables, batch, eos_id=1, max_length=4)
    q, lens2 = model.generate(qvars, batch, eos_id=1, max_length=4)
    assert q.shape == full.shape
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(lens2))
    # int8 per-channel error is small; prompts must be preserved exactly
    Lp = batch["input_ids"].shape[1]
    np.testing.assert_array_equal(np.asarray(q)[:, :Lp],
                                  np.asarray(full)[:, :Lp])


def test_int4_quantized_generate_runs(pink_tiny):
    """Group-int4 weights (nibble-packed) drive the same generate API:
    records detected, prompt preserved, decode runs end-to-end. Tokens may
    deviate from full precision (4-bit error vs random-init logit gaps),
    so only the API contract is pinned here; dequant numerics are pinned
    in test_quantization.py."""
    from antmmf_tpu.predictors.quantization import (
        is_decode_quantized, quantize_for_decode)

    model, variables, batch = pink_tiny
    q4 = quantize_for_decode(variables, min_size=1024, bits=4, group=32)
    assert is_decode_quantized(q4)
    full, lens = model.generate(variables, batch, eos_id=1, max_length=4)
    out, lens2 = model.generate(q4, batch, eos_id=1, max_length=4)
    assert out.shape == full.shape
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(lens2))
    # prompt slots only — generations (written after each row's prompt,
    # inside the padding for short rows) may deviate at 4 bits
    out_np, lens_np = np.asarray(out), np.asarray(lens)
    ids_np = np.asarray(batch["input_ids"])
    for b in range(out_np.shape[0]):
        np.testing.assert_array_equal(out_np[b, :lens_np[b]],
                                      ids_np[b, :lens_np[b]])


def test_kv_int8_cache_generate_matches(pink_tiny):
    """int8 KV cache (kv_int8=True): same generate API/shapes, prompt
    preserved, and teacher-forcing the fp32-cache greedy trajectory through
    both cache flavours keeps every decode-step logit within int8
    quantization noise. (Token-exact greedy equality is NOT asserted: on a
    random-init model near-tie logit gaps can sit below the per-slot
    max-abs quantization error, so the trajectory comparison is done at
    logits level.)"""
    from antmmf_tpu.models.pink import LM_PRESETS

    model, variables, batch = pink_tiny
    qmodel = model.clone(kv_int8=True)
    full, lens = model.generate(variables, batch, eos_id=1, max_length=4)
    q, lens2 = qmodel.generate(variables, batch, eos_id=1, max_length=4)
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(lens2))
    assert q.shape == full.shape
    Lp = batch["input_ids"].shape[1]
    np.testing.assert_array_equal(np.asarray(q)[:, :Lp],
                                  np.asarray(full)[:, :Lp])

    preset = LM_PRESETS[model.lm_preset]
    B = full.shape[0]
    Lv = model.num_vision_tokens(batch)
    T = Lv + full.shape[1]
    n_kv = preset["num_kv_heads"] or preset["num_heads"]

    def run(m):
        cache = init_decoder_cache(
            preset["num_layers"], B, n_kv, T,
            preset["hidden"] // preset["num_heads"],
            jnp.dtype(m.dtype_str), quantized=m.kv_int8)
        logits, cache = m.apply(variables, batch, cache, lens,
                                method=PinkModel.prefill)
        out = [logits]
        pos = Lv + lens
        for t in range(3):
            tok = jnp.take_along_axis(full, (lens + t)[:, None], axis=1)[:, 0]
            logits, cache = m.apply(variables, tok, pos, cache,
                                    method=PinkModel.decode_step)
            out.append(logits)
            pos = pos + 1
        return jnp.stack(out)

    ref = np.asarray(run(model))
    got = np.asarray(run(qmodel))
    np.testing.assert_allclose(got, ref, atol=2e-2 * np.abs(ref).max())


def test_kv_int8_cache_m2omni(omni_tiny_spliced):
    model, variables, batch = omni_tiny_spliced
    qmodel = model.clone(kv_int8=True)
    full, lens = model.generate(variables, batch, eos_id=1, max_length=4)
    q, lens2 = qmodel.generate(variables, batch, eos_id=1, max_length=4)
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(lens2))
    np.testing.assert_array_equal(np.asarray(q), np.asarray(full))


def test_get_rope_index_closed_form_matches_scan():
    """The closed-form (cumsum/reset-cummax) get_rope_index equals the
    lax.scan transcription of the reference recurrence on randomized
    text/run interleavings — including adjacent runs and run-at-end rows."""
    rng = np.random.default_rng(0)
    B, L = 4, 64
    modal_mask = np.zeros((B, L), bool)
    run_start = np.zeros((B, L), bool)
    rel = np.zeros((B, L, 3), np.int64)
    for b in range(B):
        i = int(rng.integers(0, 3))
        while i < L:
            run_len = int(rng.integers(1, 9))
            run_len = min(run_len, L - i)
            modal_mask[b, i:i + run_len] = True
            run_start[b, i] = True
            rel[b, i:i + run_len] = rng.integers(0, 6, (run_len, 3))
            rel[b, i] = 0  # run starts at its own base
            # gap: 0 = adjacent next run, else text
            i += run_len + int(rng.integers(0, 4))
    args = (jnp.asarray(modal_mask), jnp.asarray(run_start),
            jnp.asarray(rel, jnp.int32))
    pos_fast, base_fast = M2Omni.get_rope_index(*args)
    pos_scan, base_scan = M2Omni.get_rope_index_scan(*args)
    np.testing.assert_array_equal(np.asarray(pos_fast), np.asarray(pos_scan))
    np.testing.assert_array_equal(np.asarray(base_fast),
                                  np.asarray(base_scan))
