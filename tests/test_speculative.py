"""Prompt-lookup speculative decoding: exact-greedy guarantee + chunk decode.

The speculative path (utils/speculative.py + DecoderLM chunked decode) must
be token-for-token identical to plain cached greedy decode — the draft only
changes how many greedy tokens each verify step yields, never which. The
reference has no speculative decoding (HF generate, one token per forward,
prj/Pink/pink/eval/model_vqav2.py:141); this is a beyond-reference serving
optimization, so the regression anchor is our own greedy path (itself
regression-anchored to the full-prefix re-encode in test_llm_generate.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from antmmf_tpu.models.m2_omni import M2Omni
from antmmf_tpu.models.pink import PinkModel
from antmmf_tpu.modules.llm import DecoderLM, init_decoder_cache
from antmmf_tpu.utils.speculative import propose_prompt_lookup


def test_propose_prompt_lookup_basic():
    # row 0: trailing bigram (5, 6) occurred earlier at t=0 -> continuation
    # 7, 8; row 1: no repeat -> fallback to last_tok
    tokens = jnp.array([[5, 6, 7, 8, 5, 6, 0, 0],
                        [1, 2, 3, 4, 5, 6, 0, 0]], jnp.int32)
    cur_len = jnp.array([6, 6], jnp.int32)
    last = jnp.array([6, 6], jnp.int32)
    draft = propose_prompt_lookup(tokens, cur_len, last, gamma=2, ngram=2)
    np.testing.assert_array_equal(np.asarray(draft), [[7, 8], [6, 6]])


def test_propose_prompt_lookup_most_recent_match():
    # bigram (5, 6) occurs at t=0 (-> 9) and t=3 (-> 4): the most recent
    # earlier occurrence (t=3) wins
    tokens = jnp.array([[5, 6, 9, 5, 6, 4, 2, 5, 6, 0, 0, 0]], jnp.int32)
    cur_len = jnp.array([9], jnp.int32)
    draft = propose_prompt_lookup(tokens, cur_len, jnp.array([6]), 1, 2)
    np.testing.assert_array_equal(np.asarray(draft), [[4]])


def test_decoder_chunk_decode_matches_steps():
    """A K-token chunk through the cache must produce the same hidden states
    as K sequential single-token decode steps."""
    B, L, C, Lp, K = 2, 12, 32, 5, 4
    model = DecoderLM(num_layers=2, num_heads=4, num_kv_heads=2,
                      dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    embeds = jax.random.normal(rng, (B, L, C), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
    params = model.init(rng, embeds, positions)

    cache = init_decoder_cache(2, B, 2, L, C // 4, jnp.float32)
    _, cache0 = model.apply(params, embeds[:, :Lp], positions[:, :Lp],
                            None, True, cache=cache)

    # sequential single-token decode
    cache_seq = jax.tree_util.tree_map(lambda x: x, cache0)
    outs = []
    for t in range(Lp, Lp + K):
        pos = jnp.full((B,), t, jnp.int32)
        step, cache_seq = model.apply(
            params, embeds[:, t:t + 1], pos[:, None], None, True,
            cache=cache_seq, decode_pos=pos)
        outs.append(np.asarray(step[:, 0]))
    want = np.stack(outs, 1)  # [B, K, C]

    # one chunked decode
    pos0 = jnp.full((B,), Lp, jnp.int32)
    chunk_pos = pos0[:, None] + jnp.arange(K)[None]
    got, cache_chunk = model.apply(
        params, embeds[:, Lp:Lp + K], chunk_pos, None, True,
        cache=cache0, decode_pos=pos0)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)
    # caches agree on the written slots
    for lc_s, lc_c in zip(cache_seq, cache_chunk):
        np.testing.assert_allclose(np.asarray(lc_s["k"][:, :, :Lp + K]),
                                   np.asarray(lc_c["k"][:, :, :Lp + K]),
                                   atol=2e-5)


def test_decoder_chunk_decode_ragged_slots():
    """Per-row chunk start slots (rows at different lengths) must match each
    row's own sequential decode."""
    B, L, C, K = 2, 12, 32, 3
    lens = jnp.array([4, 6], jnp.int32)
    model = DecoderLM(num_layers=2, num_heads=4, dtype=jnp.float32)
    rng = jax.random.PRNGKey(1)
    embeds = jax.random.normal(rng, (B, L, C), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
    params = model.init(rng, embeds, positions)

    mask = (jnp.arange(L)[None] < lens[:, None]).astype(jnp.int32)
    cache = init_decoder_cache(2, B, 4, L, C // 4, jnp.float32)
    _, cache0 = model.apply(params, embeds, positions, mask, True,
                            cache=cache)
    new = jax.random.normal(jax.random.PRNGKey(2), (B, K, C), jnp.float32)

    cache_seq = jax.tree_util.tree_map(lambda x: x, cache0)
    outs = []
    for j in range(K):
        pos = lens + j
        step, cache_seq = model.apply(
            params, new[:, j:j + 1], pos[:, None], None, True,
            cache=cache_seq, decode_pos=pos)
        outs.append(np.asarray(step[:, 0]))
    want = np.stack(outs, 1)

    chunk_pos = lens[:, None] + jnp.arange(K)[None]
    got, _ = model.apply(params, new, chunk_pos, None, True,
                         cache=cache0, decode_pos=lens)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


@pytest.fixture(scope="module")
def pink_tiny():
    model = PinkModel(lm_preset="omni_tiny_test", vit_preset="vit_tiny_test",
                      image_size=32, lora_rank=2, dtype_str="float32")
    rng = jax.random.PRNGKey(0)
    # row 0 carries a repeated trigram (prompt-lookup hits); row 1 is plain
    batch = {
        "input_ids": jnp.array([[5, 6, 7, 5, 6, 7, 5, 6],
                                [9, 10, 11, 12, 13, 14, 0, 0]], jnp.int32),
        "input_mask": jnp.array([[1] * 8, [1] * 6 + [0, 0]], jnp.int32),
        "image_data": jax.random.normal(rng, (2, 32, 32, 3)),
    }
    variables = model.init(rng, batch)
    return model, variables, batch


@pytest.mark.parametrize("gamma", [1, 3, 6])
def test_pink_speculative_matches_greedy(pink_tiny, gamma):
    model, variables, batch = pink_tiny
    want, lens = model.generate(variables, batch, eos_id=1, max_length=7)
    got, lens2 = model.generate(variables, batch, eos_id=1, max_length=7,
                                speculative=gamma)
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(lens2))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pink_speculative_eos_cut(pink_tiny):
    """Pick a token the greedy path actually emits mid-generation as eos_id:
    the speculative path must stop at the same place and eos-pad identically."""
    model, variables, batch = pink_tiny
    base, lens = model.generate(variables, batch, eos_id=1, max_length=6)
    base_np = np.asarray(base)
    lens_np = np.asarray(lens)
    # a mid-generation token from row 0 becomes the eos for the rerun
    eos = int(base_np[0, lens_np[0] + 2])
    want, _ = model.generate(variables, batch, eos_id=eos, max_length=6)
    got, _ = model.generate(variables, batch, eos_id=eos, max_length=6,
                            speculative=3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pink_speculative_text_only(pink_tiny):
    model, variables, _ = pink_tiny
    batch = {
        "input_ids": jnp.array([[5, 6, 5, 6, 5, 6]], jnp.int32),
        "input_mask": jnp.ones((1, 6), jnp.int32),
    }
    want, _ = model.generate(variables, batch, eos_id=1, max_length=6)
    got, _ = model.generate(variables, batch, eos_id=1, max_length=6,
                            speculative=4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pink_speculative_kv_int8(pink_tiny):
    """Speculative + int8 KV cache compose: tokens match the kv_int8 greedy
    path (chunk quantization == per-token quantization per slot)."""
    model, variables, batch = pink_tiny
    qmodel = model.clone(kv_int8=True)
    want, _ = qmodel.generate(variables, batch, eos_id=1, max_length=6)
    got, _ = qmodel.generate(variables, batch, eos_id=1, max_length=6,
                             speculative=3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.fixture(scope="module")
def omni_tiny_spliced():
    model = M2Omni(lm_preset="omni_tiny_test", vit_preset="vit_tiny_test",
                   image_size=32, image_token_id=3, audio_token_id=None,
                   dtype_str="float32")
    rng = jax.random.PRNGKey(0)
    N = (32 // 16) ** 2  # 4 tokens per image
    row0 = [5] + [3] * N + [6, 7, 6, 7, 6]
    row1 = [9] + [3] * N + [10, 11, 12, 0, 0]
    ids = jnp.array([row0, row1], jnp.int32)
    mask = (ids != 0).astype(jnp.int32)
    batch = {
        "input_ids": ids, "input_mask": mask,
        "image_data": jax.random.normal(rng, (2, 1, 32, 32, 3)),
    }
    variables = model.init(rng, batch)
    return model, variables, batch


@pytest.mark.parametrize("gamma", [2, 4])
def test_m2omni_speculative_matches_greedy(omni_tiny_spliced, gamma):
    model, variables, batch = omni_tiny_spliced
    want, lens = model.generate(variables, batch, eos_id=1, max_length=6)
    got, lens2 = model.generate(variables, batch, eos_id=1, max_length=6,
                                speculative=gamma)
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(lens2))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_m2omni_speculative_long_budget(omni_tiny_spliced):
    """max_new not divisible by gamma+1: the budget cap must stop exactly at
    max_new tokens."""
    model, variables, batch = omni_tiny_spliced
    want, _ = model.generate(variables, batch, eos_id=1, max_length=9)
    got, _ = model.generate(variables, batch, eos_id=1, max_length=9,
                            speculative=4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pink_sampling_surface(pink_tiny):
    """do_sample wires nucleus_sampling_cached into generate (the reference
    HF-generate sampling surface): top_p->0 collapses to greedy, and the
    same rng reproduces the same tokens."""
    model, variables, batch = pink_tiny
    greedy, lens = model.generate(variables, batch, eos_id=1, max_length=5)
    near_greedy, _ = model.generate(
        variables, batch, eos_id=1, max_length=5, do_sample=True,
        top_p=1e-6, temperature=1.0, rng=jax.random.PRNGKey(7))
    lens_np = np.asarray(lens)
    for b in range(2):
        # generated region only (sampling pads with eos after early stop,
        # greedy does too — compare the full generated window)
        np.testing.assert_array_equal(
            np.asarray(near_greedy)[b, lens_np[b]:lens_np[b] + 5],
            np.asarray(greedy)[b, lens_np[b]:lens_np[b] + 5])
    a, _ = model.generate(variables, batch, eos_id=1, max_length=5,
                          do_sample=True, top_p=0.95, temperature=1.3,
                          rng=jax.random.PRNGKey(3))
    b2, _ = model.generate(variables, batch, eos_id=1, max_length=5,
                           do_sample=True, top_p=0.95, temperature=1.3,
                           rng=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))


def test_m2omni_sampling_surface(omni_tiny_spliced):
    model, variables, batch = omni_tiny_spliced
    greedy, lens = model.generate(variables, batch, eos_id=1, max_length=4)
    near_greedy, _ = model.generate(
        variables, batch, eos_id=1, max_length=4, do_sample=True,
        top_p=1e-6, rng=jax.random.PRNGKey(7))
    lens_np = np.asarray(lens)
    for b in range(2):
        np.testing.assert_array_equal(
            np.asarray(near_greedy)[b, lens_np[b]:lens_np[b] + 4],
            np.asarray(greedy)[b, lens_np[b]:lens_np[b] + 4])
