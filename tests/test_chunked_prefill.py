"""Chunked prefill + multi-turn cache extension.

``prefill_chunked`` feeds the [vision; text] stream through the decoder a
fixed-width chunk at a time — numerically identical to full prefill on all
valid positions, but the decoder program is prompt-length-independent (one
compiled chunk shape serves every prompt length) and activation memory is
O(chunk). ``extend_cache`` appends a new conversation turn to an existing
cache (multi-turn serving without re-prefilling history) — the reference
re-encodes the whole conversation each turn (HF generate over the full
prompt, prj/Pink/pink/eval/model_vqav2.py:141)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from antmmf_tpu.models.m2_omni import M2Omni
from antmmf_tpu.models.pink import PinkModel


@pytest.fixture(scope="module")
def pink_tiny():
    model = PinkModel(lm_preset="omni_tiny_test", vit_preset="vit_tiny_test",
                      image_size=32, lora_rank=2, dtype_str="float32")
    rng = jax.random.PRNGKey(0)
    batch = {
        "input_ids": jnp.array([[5, 6, 7, 8, 9, 10, 11, 12],
                                [13, 14, 15, 16, 17, 0, 0, 0]], jnp.int32),
        "input_mask": jnp.array([[1] * 8, [1] * 5 + [0] * 3], jnp.int32),
        "image_data": jax.random.normal(rng, (2, 32, 32, 3)),
    }
    variables = model.init(rng, batch)
    return model, variables, batch


def _mk_cache(model, variables, batch, extra, Lp=None):
    from antmmf_tpu.models.m2_omni import LM_PRESETS
    from antmmf_tpu.modules.llm import init_decoder_cache

    p = LM_PRESETS[model.lm_preset]
    Lv = model.num_vision_tokens(batch)
    Lp = Lp if Lp is not None else batch["input_ids"].shape[1]
    B = batch["input_ids"].shape[0]
    n_kv = p["num_kv_heads"] or p["num_heads"]
    return init_decoder_cache(p["num_layers"], B, n_kv, Lv + Lp + extra,
                              p["hidden"] // p["num_heads"], jnp.float32)


@pytest.mark.parametrize("chunk", [3, 8, 64])
def test_pink_chunked_prefill_matches_full(pink_tiny, chunk):
    model, variables, batch = pink_tiny
    lens = batch["input_mask"].sum(-1).astype(jnp.int32)
    full_logits, full_cache = model.apply(
        variables, batch, _mk_cache(model, variables, batch, 4), lens,
        method=PinkModel.prefill)
    ck_logits, ck_cache = model.apply(
        variables, batch, _mk_cache(model, variables, batch, 4), lens,
        chunk, method=PinkModel.prefill_chunked)
    np.testing.assert_allclose(np.asarray(ck_logits),
                               np.asarray(full_logits), atol=2e-4)
    # caches agree on every VALID slot (vision + each row's real text)
    Lv = model.num_vision_tokens(batch)
    lens_np = np.asarray(lens)
    for lf, lc in zip(full_cache, ck_cache):
        for b in range(2):
            n = Lv + lens_np[b]
            np.testing.assert_allclose(np.asarray(lf["k"][b, :, :n]),
                                       np.asarray(lc["k"][b, :, :n]),
                                       atol=2e-5)


def test_pink_chunked_prefill_then_decode(pink_tiny):
    """Greedy continuation from a chunk-prefilled cache == generate."""
    model, variables, batch = pink_tiny
    lens = batch["input_mask"].sum(-1).astype(jnp.int32)
    Lv = model.num_vision_tokens(batch)
    max_new = 4
    want, _ = model.generate(variables, batch, eos_id=1,
                             max_length=max_new)
    logits, cache = model.apply(
        variables, batch, _mk_cache(model, variables, batch, max_new), lens,
        5, method=PinkModel.prefill_chunked)
    toks = []
    for t in range(max_new):
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        toks.append(np.asarray(nxt))
        if t == max_new - 1:
            break
        logits, cache = model.apply(variables, nxt, Lv + lens + t, cache,
                                    method=PinkModel.decode_step)
    got = np.stack(toks, 1)
    want_np, lens_np = np.asarray(want), np.asarray(lens)
    for b in range(2):
        np.testing.assert_array_equal(
            got[b], want_np[b, lens_np[b]: lens_np[b] + max_new])


def test_pink_extend_cache_two_turns(pink_tiny):
    """prefill(turn1) + extend_cache(turn2) == prefill(turn1 ++ turn2),
    with ragged rows in both turns."""
    model, variables, batch = pink_tiny
    turn2 = jnp.array([[21, 22, 23, 0], [24, 25, 26, 27]], jnp.int32)
    mask2 = jnp.array([[1, 1, 1, 0], [1, 1, 1, 1]], jnp.int32)
    lens1 = batch["input_mask"].sum(-1).astype(jnp.int32)
    lens2 = mask2.sum(-1).astype(jnp.int32)
    Lv = model.num_vision_tokens(batch)

    # reference: one prefill over each row's concatenated conversation
    ids_np, m1_np = np.asarray(batch["input_ids"]), np.asarray(
        batch["input_mask"])
    t2_np, m2_np = np.asarray(turn2), np.asarray(mask2)
    Lcat = ids_np.shape[1] + t2_np.shape[1]
    cat = np.zeros((2, Lcat), np.int32)
    catm = np.zeros((2, Lcat), np.int32)
    for b in range(2):
        row = list(ids_np[b][m1_np[b] > 0]) + list(t2_np[b][m2_np[b] > 0])
        cat[b, :len(row)] = row
        catm[b, :len(row)] = 1
    cat_batch = {"input_ids": jnp.asarray(cat),
                 "input_mask": jnp.asarray(catm),
                 "image_data": batch["image_data"]}
    want, _ = model.apply(
        variables, cat_batch, _mk_cache(model, variables, cat_batch, 4),
        jnp.asarray(catm.sum(-1), jnp.int32), method=PinkModel.prefill)

    # two-turn path: prefill turn1 into a cache big enough for both turns
    cache = _mk_cache(model, variables, batch, 4 + turn2.shape[1])
    _, cache = model.apply(variables, batch, cache, lens1,
                           method=PinkModel.prefill)
    got, cache, new_start = model.apply(
        variables, turn2, mask2, Lv + lens1, cache,
        method=PinkModel.extend_cache)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
    np.testing.assert_array_equal(np.asarray(new_start),
                                  np.asarray(Lv + lens1 + lens2))


def test_m2omni_extend_cache_two_turns():
    """Spliced image prompt + a second text turn: extend_cache == one
    prefill over the concatenation (rope continuation included)."""
    model = M2Omni(lm_preset="omni_tiny_test", vit_preset="vit_tiny_test",
                   image_size=32, image_token_id=3, audio_token_id=None,
                   dtype_str="float32")
    rng = jax.random.PRNGKey(0)
    N = (32 // 16) ** 2
    row0 = [5] + [3] * N + [6, 7, 8]
    row1 = [9] + [3] * N + [10, 11, 0]
    ids = jnp.array([row0, row1], jnp.int32)
    mask = (ids != 0).astype(jnp.int32)
    batch = {"input_ids": ids, "input_mask": mask,
             "image_data": jax.random.normal(rng, (2, 1, 32, 32, 3))}
    variables = model.init(rng, batch)

    turn2 = jnp.array([[31, 32, 0], [33, 34, 35]], jnp.int32)
    mask2 = jnp.array([[1, 1, 0], [1, 1, 1]], jnp.int32)

    # reference: prefill over concatenated rows
    ids_np, m_np = np.asarray(ids), np.asarray(mask)
    t2_np, m2_np = np.asarray(turn2), np.asarray(mask2)
    Lcat = ids_np.shape[1] + t2_np.shape[1]
    cat = np.zeros((2, Lcat), np.int32)
    catm = np.zeros((2, Lcat), np.int32)
    for b in range(2):
        row = list(ids_np[b][m_np[b] > 0]) + list(t2_np[b][m2_np[b] > 0])
        cat[b, :len(row)] = row
        catm[b, :len(row)] = 1
    cat_batch = {"input_ids": jnp.asarray(cat),
                 "input_mask": jnp.asarray(catm),
                 "image_data": batch["image_data"]}
    want, _, _, _ = model.apply(variables, cat_batch, 2,
                                method=M2Omni.prefill)

    # two-turn path
    _, cache, lens_full, next_p = model.apply(
        variables, batch, 2 + int(turn2.shape[1]), method=M2Omni.prefill)
    got, cache, new_rope, new_slot = model.apply(
        variables, turn2, mask2, next_p, lens_full, cache,
        method=M2Omni.extend_cache)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
    tlen = np.asarray(mask2.sum(-1))
    np.testing.assert_array_equal(np.asarray(new_slot),
                                  np.asarray(lens_full) + tlen)
