"""Continuous-batching serving engine for the KV-cache LLM family.

The reference serves its MLLMs one request at a time through HF
``model.generate`` (``prj/Pink/pink/eval/model_vqav2.py:141``) and batches
only statically (``antmmf/predictors/batch_predictor.py``). Decode on TPU is
HBM-bandwidth-bound — one request leaves most of the per-step weight read
unused — so this engine goes beyond the reference: a fixed pool of ``slots``
cache rows decodes in lock-step while requests are admitted and retired at
token boundaries (the vLLM-style continuous-batching idea, restricted to
static shapes so everything stays inside two jitted programs).

Design (XLA-friendly, zero dynamic shapes):
* one jitted single-request prefill writes a fresh [1, ...] cache;
* one jitted ``_admit`` scatters that cache row + first-token logits into a
  slot of the pooled [S, ...] cache (``lax.dynamic_update_index_in_dim``);
* one jitted ``_step`` advances ALL slots one DECODE WINDOW (``step_tokens``
  tokens under a fori_loop — one host round-trip per window, because on a
  remote-attached chip per-token host syncs dominate decode itself);
* the host loop owns request bookkeeping only: queueing, EOS/max-token
  retirement at window boundaries, per-request token collection.

Works with any model exposing the ``prefill``/``decode_step`` contract
(PinkModel, M2Omni) via the small adapters below. Greedy by default —
token-for-token identical to ``model.generate`` (regression-tested) — with
per-request nucleus sampling (do_sample/temperature/top_p/seed, the HF
``generate`` surface the reference serves through,
prj/Pink/pink/eval/model_vqav2.py:446-448), stop sequences, cancellation,
and optional interleaved chunked prefill (``prefill_chunk``) so one long
prompt admission never stalls the pool's active decode slots.
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.predictors.quantization import make_live_vars


class PinkAdapter:
    """Binds ``PinkModel`` to the engine protocol. Cache slots and RoPE
    positions coincide for Pink (1D positions over [vision; text]).

    The weights are held on the adapter but enter every jit as ARGUMENTS
    (``make_live_vars`` is applied to the traced tree inside the program) —
    a closure capture would bake multi-GB constants into the HLO and stall
    the remote-compile relay at 1B+ scale."""

    def __init__(self, module, variables, max_prompt_len: int,
                 max_new_tokens: int, has_image: bool,
                 extra_slots: int = 0):
        from antmmf_tpu.models.pink import LM_PRESETS

        self.module = module
        self.variables = variables
        preset = LM_PRESETS[module.lm_preset]
        self.num_layers = preset["num_layers"]
        self.n_kv = preset["num_kv_heads"] or preset["num_heads"]
        self.head_dim = preset["hidden"] // preset["num_heads"]
        self.dtype = jnp.dtype(module.dtype_str)
        probe = {"input_ids": np.zeros((1, max_prompt_len), np.int32)}
        if has_image:
            probe["image_data"] = np.zeros(
                (1, module.image_size, module.image_size, 3), np.float32)
        self.Lv = module.num_vision_tokens(probe)
        # extra_slots: cache headroom for multi-turn sessions (each extra
        # turn appends its tokens + generations after the first exchange)
        self.T = self.Lv + max_prompt_len + max_new_tokens + extra_slots
        self.max_prompt = max_prompt_len
        self.has_image = has_image

        def _pf(variables, tokens, mask, extras, reserve=0):
            # reserve is unused: Pink's cache is always sized to the FULL
            # budget self.T regardless of the prompt chunk length, so a
            # chunk-0 prefill already leaves room for the remaining chunks
            from antmmf_tpu.models.pink import PinkModel

            live = make_live_vars(variables, self.dtype)
            batch = {"input_ids": tokens, "input_mask": mask, **extras}
            lens = mask.sum(-1).astype(jnp.int32)
            cache = self.make_cache(1)
            logits, cache = self.module.apply(
                live(), batch, cache, lens, method=PinkModel.prefill)
            # vision offset of THIS request (extras structure is static per
            # trace): a text-only request in an image-serving engine has no
            # vision prefix — using the engine-level Lv would start decode
            # at the wrong cache slot
            lv = self.module.num_vision_tokens(batch)
            start = lv + lens
            return logits, cache, start, start

        # one program per extras STRUCTURE (image / text-only), retraced
        # automatically — extras is a pytree argument
        self._pf = jax.jit(_pf, static_argnums=(4,))

    def make_cache(self, batch: int):
        from antmmf_tpu.modules.llm import init_decoder_cache

        return init_decoder_cache(self.num_layers, batch, self.n_kv, self.T,
                                  self.head_dim, self.dtype,
                                  quantized=getattr(self.module, "kv_int8",
                                                    False),
                                  stacked=getattr(self.module, "scan_layers",
                                                  False))

    def prefill1(self, tokens, mask, extras, reserve: int = 0):
        """[1, Lp] prompt -> (logits0 [1, V], cache1, slot0 [1], rope0 [1]).
        ``extras`` is a dict of batched modality arrays ({"image_data": ...}
        or {} for text-only); ``reserve`` extra cache slots are requested
        beyond the prompt+decode budget (chunked admission prefills chunk 0
        here and appends the remaining prompt chunks through ``extend``)."""
        return self._pf(self.variables, tokens, mask, extras, reserve)

    def decode(self, variables, token, rope, slot, cache):
        """Called from inside the engine's jitted ``_step`` — ``variables``
        is the traced argument, never a captured constant."""
        from antmmf_tpu.models.pink import PinkModel

        live = make_live_vars(variables, self.dtype)
        return self.module.apply(live(step_mode=True), token, slot,
                                 cache, method=PinkModel.decode_step)

    def extend(self, variables, tokens, mask, rope, slot, cache):
        """Append a new conversation turn (multi-turn sessions): returns
        (last-valid logits, cache, new_rope, new_slot). Pink's RoPE
        positions coincide with cache slots."""
        from antmmf_tpu.models.pink import PinkModel

        live = make_live_vars(variables, self.dtype)
        logits, cache, new_start = self.module.apply(
            live(step_mode=True), tokens, mask, slot, cache,
            method=PinkModel.extend_cache)
        return logits, cache, new_start, new_start


class M2OmniAdapter:
    """Binds ``M2Omni`` to the engine protocol. RoPE positions follow the
    3D ``get_rope_index`` continuation convention and differ from cache
    slots, so the two streams are carried separately. Weights enter every
    jit as arguments (see PinkAdapter)."""

    def __init__(self, module, variables, max_prompt_len: int,
                 max_new_tokens: int, has_image: bool,
                 extra_slots: int = 0):
        self.module = module
        self.variables = variables
        self.max_new = max_new_tokens
        self.max_prompt = max_prompt_len
        self.has_image = has_image
        self.dtype = jnp.dtype(getattr(module, "dtype_str", "bfloat16"))
        self.T: Optional[int] = None  # discovered from the first prefill

        def _pf(variables, tokens, mask, extras, reserve=0):
            from antmmf_tpu.models.m2_omni import M2Omni

            live = make_live_vars(variables, self.dtype)
            batch = {"input_ids": tokens, "input_mask": mask, **extras}
            return self.module.apply(
                live(), batch, self.max_new + extra_slots + reserve,
                method=M2Omni.prefill)

        # one program per extras STRUCTURE (any mix of image_data /
        # video_data / audio / multi-image tuples), retraced automatically
        self._pf = jax.jit(_pf, static_argnums=(4,))

    def prefill1(self, tokens, mask, extras, reserve: int = 0):
        """``extras``: dict of batched modality arrays — image_data (array
        or tuple of arrays for multi-image requests), video_data, audio,
        audio_mask. ``reserve`` widens the discovered cache beyond
        prompt+decode — chunked admission prefills chunk 0 and must leave
        room for the remaining prompt chunks (M2Omni sizes T from the
        prompt it sees)."""
        logits, cache, lens_full, next_p = self._pf(
            self.variables, tokens, mask, extras, reserve)
        # first leaf is "k": [..., T, head_dim] in both the list layout
        # ([B, H, T, D]) and the scan_layers stacked one ([L, B, H, T, D])
        T = jax.tree_util.tree_leaves(cache)[0].shape[-2]
        if self.T is not None and T != self.T:
            raise ValueError(
                f"M2Omni prefill produced cache length {T} != pooled {self.T}"
                " — M2Omni sizes the cache from the SPLICED prompt length,"
                " so every request in one engine must pad input_ids to one"
                " fixed length (vision embeddings replace placeholder slots"
                " in place; a different prompt width means a different row"
                " shape that cannot join the slot pool)")
        self.T = T
        return logits, cache, lens_full, next_p

    def decode(self, variables, token, rope, slot, cache):
        from antmmf_tpu.models.m2_omni import M2Omni

        live = make_live_vars(variables, self.dtype)
        return self.module.apply(live(step_mode=True), token, rope,
                                 slot, cache, method=M2Omni.decode_step)

    def extend(self, variables, tokens, mask, rope, slot, cache):
        from antmmf_tpu.models.m2_omni import M2Omni

        live = make_live_vars(variables, self.dtype)
        return self.module.apply(live(step_mode=True), tokens, mask, rope,
                                 slot, cache, method=M2Omni.extend_cache)


class ContinuousBatchingEngine:
    """Slot-pooled greedy decoding with admission at token boundaries.

    ``run(requests)`` is the batch driver: feeds every request through the
    pool and returns ``{request_id: token_list}`` plus per-request timing.
    ``submit``/``step`` expose the online loop for a real server.

    Multi-turn sessions: ``submit(rid, {..., "session": True})`` keeps the
    request's cache row after retirement; ``continue_session(rid, rid2,
    {"input_ids": turn})`` appends the next turn via the model's
    ``extend_cache`` and resumes decoding — conversation history is never
    re-prefilled (the reference re-encodes the whole conversation each
    turn). ``close_session`` returns the row to the pool.
    """

    def __init__(self, adapter, slots: int = 8, max_new_tokens: int = 32,
                 eos_id: int = 102, step_tokens: int = 8,
                 suffix_pad: Optional[int] = None,
                 prefill_chunk: Optional[int] = None,
                 chunks_per_step: int = 1):
        self.ad = adapter
        self.S = slots
        self.max_new = max_new_tokens
        self.eos_id = eos_id
        # interleaved chunked prefill (vLLM-style): with ``prefill_chunk=W``
        # a prompt is admitted as a W-token chunk-0 prefill and the rest of
        # the prompt is appended W tokens at a time via the model's
        # extend_cache, at most ``chunks_per_step`` chunks BETWEEN decode
        # windows — one long prompt no longer stalls every active decode
        # slot behind a full-length prefill, and one compiled
        # (prefill@[1,W], extend@[W]) pair serves EVERY prompt length
        # (full prefill compiles a new program per length). Tokens are
        # identical to whole-prompt admission (the extend_cache ragged-row
        # equivalence; regression-tested).
        self.chunk = int(prefill_chunk) if prefill_chunk else None
        if self.chunk:
            # a chunk wider than the prompt budget would pad chunk 0 PAST
            # the cache's prompt slots (the W-wide prefill writes
            # Lv..Lv+W-1; T is sized to max_prompt) — clamp, whole-prompt
            # admission is the natural limit case
            self.chunk = min(self.chunk,
                             int(getattr(adapter, "max_prompt", self.chunk)))
        self.chunks_per_step = max(1, int(chunks_per_step))
        # per-slot pending prompt chunks awaiting extend (chunked admission)
        self._slot_pending: List[Optional[Dict[str, Any]]] = [None] * slots
        # prefix-forked requests pad their suffix to this width so ONE
        # compiled extend serves every suffix length (a fresh trace per
        # length would recompile mid-serving); None = exact shapes. The
        # padded write stays inside prefix_len + suffix_pad ≤ prompt budget
        # and pre-overwrite pad slots sit above the causal validity bound.
        self.suffix_pad = suffix_pad
        # decode window: tokens advanced per host round-trip. Every host
        # sync pays the dispatch latency of the accelerator link (on a
        # remote-attached chip it can exceed the decode step itself —
        # measured 84 tok/s at H=1 vs 311 for a fully-jitted static batch),
        # so the window loop runs inside ONE jitted program and the host
        # only admits/retires at window boundaries. Waste is bounded by
        # H-1 tokens per request (post-EOS tokens inside a window are
        # discarded); H=1 recovers exact per-token admission.
        self.H = max(1, int(step_tokens))
        self._queue: List[Tuple[Any, Mapping[str, Any]]] = []
        self._slot_req: List[Optional[Any]] = [None] * slots
        self._slot_toks: List[List[int]] = [[] for _ in range(slots)]
        self._slot_budget: List[int] = [max_new_tokens] * slots
        # per-request decoding controls (host side; sampling params also
        # mirror into device arrays at admission)
        self._slot_stop: List[List[List[int]]] = [[] for _ in range(slots)]
        self._slot_temp = np.zeros((slots,), np.float32)  # 0 = greedy
        self._slot_topp = np.ones((slots,), np.float32)
        self._cancelled: set = set()
        # deadline eviction: requests carrying {"deadline_s": T} (or the
        # engine-level default) are EVICTED once T seconds have elapsed
        # since submit — a queued overdue request never runs, a running one
        # frees its slot at the next window boundary with its partial
        # tokens in the outputs (marked in ``evicted``). The back-pressure
        # valve a real queue needs: one stuck/oversized request cannot pin
        # a slot forever.
        self.request_timeout_s: Optional[float] = None
        self._deadline: Dict[Any, float] = {}
        self._evicted: set = set()
        # per-step telemetry ring: (active_slots, queue_depth) at each
        # step() — stats() reduces to slot utilization + queue-depth
        # percentiles (the sustained-load evidence)
        self._timeline: List[Tuple[int, int]] = []
        self._t_submit: Dict[Any, float] = {}
        self._t_first: Dict[Any, float] = {}
        self._done: Dict[Any, List[int]] = {}
        self._latency: Dict[Any, float] = {}
        self._state = None  # lazily built on first admit
        # multi-turn sessions: a request submitted with {"session": True}
        # keeps its cache row after retirement; continue_session() appends
        # the next turn to it via the model's extend_cache (no re-prefill
        # of the conversation history — the reference re-encodes the whole
        # conversation each turn)
        self._session_req: set = set()
        self._slot_held: List[Optional[Any]] = [None] * slots
        # host-tracked (rope, slot) where each row's CURRENT generation
        # started — continuation point = start + len(kept tokens)
        self._slot_start: List[Tuple[int, int]] = [(0, 0)] * slots
        self._sessions: Dict[Any, Tuple[int, int, int]] = {}
        # prefix cache: prefix_id -> (cache1, logits0, rope0, slot0,
        # rope_end, slot_end) — a shared prompt prefix prefilled ONCE and
        # forked into each request's slot at admission (vLLM-class prefix
        # caching; the reference re-encodes everything per request)
        self._prefixes: Dict[Any, Tuple[Any, Any, Any, Any, int, int]] = {}

        from functools import partial

        # slot-row axis in cache leaves: 0 in the per-layer list layout
        # ([B, H, T, D] leaves); 1 under scan_layers (ONE stacked dict,
        # [L, B, H, T, D] leaves — the layer dim leads)
        RA = 1 if getattr(adapter.module, "scan_layers", False) else 0
        self._row_axis = RA

        @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def _admit(cache, last_logits, rope, spos, cache1, logits0, rope0,
                   slot0, slot_idx):
            cache = jax.tree_util.tree_map(
                lambda big, one: jax.lax.dynamic_update_index_in_dim(
                    big, jax.lax.index_in_dim(one, 0, RA, keepdims=False),
                    slot_idx, RA), cache, cache1)
            last_logits = last_logits.at[slot_idx].set(logits0[0])
            rope = rope.at[slot_idx].set(rope0[0])
            spos = spos.at[slot_idx].set(slot0[0])
            return cache, last_logits, rope, spos

        self._admit_jit = _admit

        @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def _extend(cache, last_logits, rope, spos, tokens1, mask1,
                    rope_at, slot_at, slot_idx, variables):
            # gather the session's row, append the turn on the [1]-batch
            # cache, scatter back — other slots' caches are never written
            # (a batch-wide chunk write could clamp into their live history
            # at the T boundary)
            cache1 = jax.tree_util.tree_map(
                lambda big: jax.lax.dynamic_slice_in_dim(big, slot_idx, 1,
                                                         RA),
                cache)
            lg, cache1, new_rope, new_slot = self.ad.extend(
                variables, tokens1[None], mask1[None], rope_at[None],
                slot_at[None], cache1)
            cache = jax.tree_util.tree_map(
                lambda big, one: jax.lax.dynamic_update_index_in_dim(
                    big, jax.lax.index_in_dim(one, 0, RA, keepdims=False),
                    slot_idx, RA), cache, cache1)
            last_logits = last_logits.at[slot_idx].set(lg[0])
            rope = rope.at[slot_idx].set(new_rope[0])
            spos = spos.at[slot_idx].set(new_slot[0])
            return cache, last_logits, rope, spos

        self._extend_jit = _extend

        H = self.H

        @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def _step(cache, last_logits, rope, spos, active, variables):
            T = jax.tree_util.tree_leaves(cache)[0].shape[-2]

            def body(i, carry):
                toks, last_logits, cache, rope, spos = carry
                nxt = jnp.argmax(last_logits, -1).astype(jnp.int32)
                nxt = jnp.where(active, nxt, 0)
                toks = toks.at[:, i].set(nxt)
                safe_slot = jnp.minimum(spos, T - 1)
                logits, cache = self.ad.decode(variables, nxt, rope,
                                               safe_slot, cache)
                rope = jnp.where(active, rope + 1, rope)
                spos = jnp.where(active, jnp.minimum(spos + 1, T - 1), spos)
                return toks, logits, cache, rope, spos

            toks0 = jnp.zeros((last_logits.shape[0], H), jnp.int32)
            toks, last_logits, cache, rope, spos = jax.lax.fori_loop(
                0, H, body, (toks0, last_logits, cache, rope, spos))
            return toks, last_logits, cache, rope, spos

        self._step_jit = _step

        NEG_INF = jnp.float32(-1e9)

        @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def _step_sample(cache, last_logits, rope, spos, active, temps,
                         top_ps, keys, variables):
            """Decode window with per-slot nucleus sampling. Slots with
            temperature 0 take the greedy argmax (bit-identical to _step),
            so mixed greedy/sampling batches share one program. A token's
            RNG key is fold_in(request seed key, rope position) — a pure
            function of (seed, the request's own progress), so sampled
            tokens never depend on which other requests happen to be
            co-scheduled in the pool."""
            T = jax.tree_util.tree_leaves(cache)[0].shape[-2]

            def body(i, carry):
                toks, last_logits, cache, rope, spos = carry
                greedy = jnp.argmax(last_logits, -1).astype(jnp.int32)
                lg = last_logits.astype(jnp.float32) \
                    / jnp.maximum(temps, 1e-6)[:, None]
                srt = jnp.sort(lg, axis=-1)[:, ::-1]
                probs = jax.nn.softmax(srt, -1)
                cum = jnp.cumsum(probs, axis=-1)
                cutoff_idx = jnp.sum(cum < top_ps[:, None], axis=-1)
                cutoff = jnp.take_along_axis(srt, cutoff_idx[:, None], -1)
                filtered = jnp.where(lg < cutoff, NEG_INF, lg)
                subs = jax.vmap(jax.random.fold_in)(keys, rope)
                sampled = jax.vmap(
                    lambda k, row: jax.random.categorical(k, row))(
                        subs, filtered).astype(jnp.int32)
                nxt = jnp.where(temps > 0, sampled, greedy)
                nxt = jnp.where(active, nxt, 0)
                toks = toks.at[:, i].set(nxt)
                safe_slot = jnp.minimum(spos, T - 1)
                logits, cache = self.ad.decode(variables, nxt, rope,
                                               safe_slot, cache)
                rope = jnp.where(active, rope + 1, rope)
                spos = jnp.where(active, jnp.minimum(spos + 1, T - 1), spos)
                return toks, logits, cache, rope, spos

            toks0 = jnp.zeros((last_logits.shape[0], H), jnp.int32)
            toks, last_logits, cache, rope, spos = jax.lax.fori_loop(
                0, H, body, (toks0, last_logits, cache, rope, spos))
            return toks, last_logits, cache, rope, spos

        self._step_sample_jit = _step_sample

    # -- pool state --------------------------------------------------------
    def _ensure_state(self, cache1, logits0):
        if self._state is not None:
            return
        S, ra = self.S, self._row_axis
        pooled = jax.tree_util.tree_map(
            lambda one: jnp.zeros(
                one.shape[:ra] + (S,) + one.shape[ra + 1:], one.dtype),
            cache1)
        V = logits0.shape[-1]
        self._state = {
            "cache": pooled,
            "last_logits": jnp.zeros((S, V), logits0.dtype),
            "rope": jnp.zeros((S,), jnp.int32),
            "spos": jnp.zeros((S,), jnp.int32),
            # per-slot RNG seed keys for sampling (uint32[2] threefry keys;
            # per-token subkeys are fold_in(key, rope) inside _step_sample)
            "keys": jnp.zeros((S, 2), jnp.uint32),
        }

    # -- public API --------------------------------------------------------
    def reset(self) -> None:
        """Clear request bookkeeping but keep the pooled state and compiled
        programs (benchmarks / long-running servers reuse one engine)."""
        self._queue.clear()
        self._slot_req = [None] * self.S
        self._slot_toks = [[] for _ in range(self.S)]
        self._slot_stop = [[] for _ in range(self.S)]
        self._slot_temp[:] = 0.0
        self._slot_topp[:] = 1.0
        self._slot_pending = [None] * self.S
        self._cancelled = set()
        self._evicted = set()
        self._deadline.clear()
        self._timeline = []
        self._t_submit.clear()
        self._t_first.clear()
        self._done = {}
        self._latency = {}
        self._session_req = set()
        self._slot_held = [None] * self.S
        self._sessions = {}

    @staticmethod
    def _extras_of(data: Mapping[str, Any]) -> Dict[str, Any]:
        """Batch a request's modality arrays into the [1]-row prefill
        extras dict. Conventions per key: image_data [H, W, 3] (a 4-dim
        array is taken as already batched, or as one [F, H, W, 3] stream if
        you batch it yourself) or a tuple of arrays (multi-image request —
        each spliced at its own placeholder run); video_data [F, H, W, 3];
        audio [T, F]; audio_mask [T]."""
        extras: Dict[str, Any] = {}
        img = data.get("image_data")
        if img is not None:
            if isinstance(img, (tuple, list)):
                extras["image_data"] = tuple(
                    jnp.asarray(x)[None] if jnp.asarray(x).ndim == 3
                    else jnp.asarray(x) for x in img)
            else:
                img = jnp.asarray(img)
                extras["image_data"] = img[None] if img.ndim == 3 else img
        vid = data.get("video_data")
        if vid is not None:
            vid = jnp.asarray(vid)
            extras["video_data"] = vid[None] if vid.ndim == 4 else vid
        aud = data.get("audio")
        if aud is not None:
            aud = jnp.asarray(aud)
            extras["audio"] = aud[None] if aud.ndim == 2 else aud
            am = data.get("audio_mask")
            if am is not None:
                am = jnp.asarray(am)
                extras["audio_mask"] = am[None] if am.ndim == 1 else am
        return extras

    def register_prefix(self, prefix_id, data: Mapping[str, Any]) -> None:
        """Prefill a SHARED prompt prefix once (system prompt, few-shot
        preamble, shared image) for reuse across requests:
        ``submit(rid, {"prefix": prefix_id, "input_ids": suffix})`` forks
        the stored cache row into the request's slot and appends only the
        suffix through the model's ``extend_cache`` — the prefix's vision
        tower + prefill compute never reruns. Suffix tokens are identical
        to a full re-prefill of prefix+suffix (the extend_cache ragged-row
        equivalence, tests/test_serving_engine.py). data: {"input_ids":
        [Lp], "input_mask"?, "image_data"?}."""
        tokens = jnp.asarray(data["input_ids"], jnp.int32)[None]
        mask = jnp.asarray(
            data.get("input_mask", np.ones(tokens.shape[1], np.int32)),
            jnp.int32)[None]
        logits0, cache1, slot0, rope0 = self.ad.prefill1(
            tokens, mask, self._extras_of(data))
        self._ensure_state(cache1, logits0)
        self._prefixes[prefix_id] = (
            cache1, logits0, rope0, slot0,
            int(np.asarray(rope0).reshape(-1)[0]),
            int(np.asarray(slot0).reshape(-1)[0]))

    def drop_prefix(self, prefix_id) -> None:
        self._prefixes.pop(prefix_id, None)

    def submit(self, request_id, data: Mapping[str, Any]) -> None:
        """data: {"input_ids": [Lp], "input_mask": [Lp], "image_data"?,
        "max_new"?: int, "session"?: bool,
        "do_sample"?: bool, "temperature"?: float, "top_p"?: float,
        "seed"?: int, "stop"?: [[token ids], ...]} — per-request token
        budgets retire each slot independently (the whole point of
        continuous batching: no waiting for the longest request in a static
        batch). ``session: True`` keeps the cache row after retirement so
        ``continue_session`` can append the next conversation turn.
        ``do_sample`` turns on nucleus sampling for this request only
        (temperature/top_p per request, reproducible under ``seed``,
        independent of co-scheduled requests); ``stop`` sequences retire the
        request when generated (matched tokens are excluded from the
        output, the HF stop-string convention)."""
        if data.get("session"):
            self._session_req.add(request_id)
        self._t_submit[request_id] = time.perf_counter()
        ddl = data.get("deadline_s", self.request_timeout_s)
        if ddl is not None:
            self._deadline[request_id] = self._t_submit[request_id] \
                + float(ddl)
        self._queue.append((request_id, data))

    def cancel(self, request_id) -> bool:
        """Cancel a queued or running request. A queued request never runs;
        a running one frees its slot at the next window boundary (its
        partial tokens appear in the outputs, marked in ``cancelled``).
        Returns False if the id is unknown or already finished."""
        for i, (rid, _) in enumerate(self._queue):
            if rid == request_id:
                self._queue.pop(i)
                self._cancelled.add(request_id)
                self._done[request_id] = []
                self._latency[request_id] = (
                    time.perf_counter() - self._t_submit[request_id])
                return True
        if request_id in self._slot_req or any(
                p is not None and p["rid"] == request_id
                for p in self._slot_pending):
            self._cancelled.add(request_id)  # retired in the next step()
            return True
        return False

    def _set_controls(self, s: int, rid, data: Mapping[str, Any]) -> None:
        """Per-request decode controls for the slot: budget, stop
        sequences, sampling params (+ the slot's RNG seed key)."""
        self._slot_req[s] = rid
        self._slot_toks[s] = []
        self._slot_budget[s] = min(int(data.get("max_new", self.max_new)),
                                   self.max_new)
        self._slot_stop[s] = [list(map(int, seq))
                              for seq in data.get("stop", []) if len(seq)]
        if data.get("do_sample"):
            self._slot_temp[s] = max(float(data.get("temperature", 1.0)),
                                     1e-6)
            self._slot_topp[s] = float(data.get("top_p", 0.9))
            key = jax.random.PRNGKey(int(data.get("seed", 0)))
            st = self._state
            st["keys"] = st["keys"].at[s].set(key.astype(jnp.uint32))
        else:
            self._slot_temp[s] = 0.0
            self._slot_topp[s] = 1.0

    def _admit_waiting(self) -> None:
        for s in range(self.S):
            if self._slot_req[s] is not None or not self._queue \
                    or self._slot_held[s] is not None \
                    or self._slot_pending[s] is not None:
                continue
            rid, data = self._queue.pop(0)
            if rid in self._cancelled:
                continue
            if data.get("prefix") is not None:
                self._admit_with_prefix(s, rid, data)
            elif self.chunk is not None:
                self._admit_chunked(s, rid, data)
            else:
                self._admit_full(s, rid, data)

    def _admit_full(self, s: int, rid, data: Mapping[str, Any]) -> None:
        tokens = jnp.asarray(data["input_ids"], jnp.int32)[None]
        mask = jnp.asarray(
            data.get("input_mask", np.ones(tokens.shape[1], np.int32)),
            jnp.int32)[None]
        logits0, cache1, slot0, rope0 = self.ad.prefill1(
            tokens, mask, self._extras_of(data))
        self._ensure_state(cache1, logits0)
        st = self._state
        st["cache"], st["last_logits"], st["rope"], st["spos"] = \
            self._admit_jit(st["cache"], st["last_logits"], st["rope"],
                            st["spos"], cache1, logits0, rope0, slot0, s)
        self._set_controls(s, rid, data)
        # generation start (rope, slot) kept as [1] device arrays —
        # host-read only at session retirement, so plain requests never
        # pay an extra sync; continuation = start + len(kept tokens)
        self._slot_start[s] = (rope0, slot0)

    def _admit_chunked(self, s: int, rid, data: Mapping[str, Any]) -> None:
        """Chunked admission: prefill chunk 0 (vision tower + the first
        ``self.chunk`` prompt tokens, padded to that width so ONE compiled
        prefill serves every prompt length) into slot ``s``; the remaining
        prompt is queued host-side as W-token chunks appended via
        ``_extend_jit`` between decode windows (``_advance_pending``). The
        slot joins decoding only once its whole prompt is in — other slots
        keep decoding meanwhile instead of stalling behind one long
        prefill."""
        W = self.chunk
        ids = np.asarray(data["input_ids"], np.int32)
        msk = np.asarray(
            data.get("input_mask", np.ones(ids.shape[0], np.int32)),
            np.int32)
        # drop right padding; chunking re-pads per chunk
        n_valid = int(msk.sum())
        ids, msk = ids[:n_valid], msk[:n_valid]
        # splice-layout models (M2Omni image/audio_token_id) replace
        # placeholder ids with modality embeddings DURING prefill; the
        # text-only extend path can't do that, so placeholders must all sit
        # inside chunk 0 — otherwise admit the whole prompt at once
        splice_ids = [t for t in (
            getattr(self.ad.module, "image_token_id", None),
            getattr(self.ad.module, "video_token_id", None),
            getattr(self.ad.module, "audio_token_id", None)) if t is not None]
        if splice_ids and np.isin(ids[W:], splice_ids).any():
            self._admit_full(s, rid, data)
            return
        c0, c0m = ids[:W], msk[:W]
        if c0.shape[0] < W:
            pad = W - c0.shape[0]
            c0 = np.concatenate([c0, np.zeros(pad, np.int32)])
            c0m = np.concatenate([c0m, np.zeros(pad, np.int32)])
        reserve = max(0, getattr(self.ad, "max_prompt", W) - W)
        logits0, cache1, slot0, rope0 = self.ad.prefill1(
            jnp.asarray(c0)[None], jnp.asarray(c0m)[None],
            self._extras_of(data), reserve)
        self._ensure_state(cache1, logits0)
        st = self._state
        st["cache"], st["last_logits"], st["rope"], st["spos"] = \
            self._admit_jit(st["cache"], st["last_logits"], st["rope"],
                            st["spos"], cache1, logits0, rope0, slot0, s)
        self._set_controls(s, rid, data)
        self._slot_start[s] = (rope0, slot0)
        if n_valid > W:
            # every chunk is EXACTLY W wide; the final chunk starts at
            # n_valid - W and OVERLAPS the previous one — overlapped slots
            # are rewritten with identical keys/values (same tokens, same
            # positions), which is harmless, whereas a right-PADDED final
            # chunk would need a W-wide cache write past the last slot and
            # XLA's dynamic_update_slice CLAMPS the start index: the write
            # lands at T - W and silently overwrites good history (measured:
            # prompts at max_prompt_len corrupted slots T-W.. and flipped
            # the first generated token)
            starts = list(range(W, n_valid - W + 1, W))
            if not starts or starts[-1] + W < n_valid:
                starts.append(n_valid - W)
            self._slot_pending[s] = {
                "rid": rid,
                "chunks": [(ids[st:st + W], st) for st in starts],
                # continuation bases after chunk 0's W valid tokens; a chunk
                # at text index st sits at base + (st - W)
                "rope0": int(np.asarray(rope0).reshape(-1)[0]),
                "slot0": int(np.asarray(slot0).reshape(-1)[0]),
                "W0": W,
            }
            self._slot_req[s] = None  # not decodable until the prompt is in

    def _advance_pending(self) -> None:
        """Append up to ``chunks_per_step`` pending prompt chunks (across
        all prefilling slots, round-robin by slot index) via the compiled
        W-wide extend. A slot whose last chunk lands becomes decodable with
        the extend's last-valid logits as its first-token logits."""
        quota = self.chunks_per_step
        for s in range(self.S):
            if quota <= 0:
                break
            pend = self._slot_pending[s]
            if pend is None:
                continue
            if pend["rid"] in self._cancelled:  # cancelled mid-prefill
                self._finish_cancelled(s, pend["rid"])
                self._slot_pending[s] = None
                continue
            W = self.chunk
            st = self._state
            last_end = None
            while pend["chunks"] and quota > 0:
                tokens, tstart = pend["chunks"].pop(0)
                off = tstart - pend["W0"]
                mask = np.ones(W, np.int32)  # chunks are exactly W valid
                st["cache"], st["last_logits"], st["rope"], st["spos"] = \
                    self._extend_jit(
                        st["cache"], st["last_logits"], st["rope"],
                        st["spos"], jnp.asarray(tokens), jnp.asarray(mask),
                        jnp.int32(pend["rope0"] + off),
                        jnp.int32(pend["slot0"] + off),
                        jnp.int32(s), self.ad.variables)
                last_end = tstart + W
                quota -= 1
            if not pend["chunks"]:
                off = last_end - pend["W0"]
                self._slot_req[s] = pend["rid"]
                self._slot_start[s] = (pend["rope0"] + off,
                                       pend["slot0"] + off)
                self._slot_pending[s] = None

    def _finish_cancelled(self, s: int, rid) -> None:
        self._done[rid] = list(self._slot_toks[s])
        self._latency[rid] = time.perf_counter() - self._t_submit[rid]
        self._slot_req[s] = None
        self._slot_toks[s] = []
        self._deadline.pop(rid, None)

    def _evict_overdue(self) -> None:
        """Deadline pass: running requests past their deadline free their
        slot (partial tokens kept, marked evicted); queued overdue requests
        are dropped before ever running. Pending chunked prefills are
        abandoned the same way."""
        if not self._deadline:
            return
        now = time.perf_counter()
        for s in range(self.S):
            rid = self._slot_req[s]
            if rid is not None and now > self._deadline.get(rid, np.inf):
                self._evicted.add(rid)
                self._finish_cancelled(s, rid)
            pend = self._slot_pending[s]
            if pend is not None and \
                    now > self._deadline.get(pend["rid"], np.inf):
                self._evicted.add(pend["rid"])
                self._finish_cancelled(s, pend["rid"])
                self._slot_pending[s] = None
        keep = []
        for rid, data in self._queue:
            if now > self._deadline.get(rid, np.inf):
                self._evicted.add(rid)
                self._done[rid] = []
                self._latency[rid] = now - self._t_submit[rid]
            else:
                keep.append((rid, data))
        self._queue = keep

    def _admit_with_prefix(self, s: int, rid, data: Mapping[str, Any]
                           ) -> None:
        """Fork a registered prefix row into slot ``s`` (no prefill — the
        stored [1]-cache scatters in; _admit_jit does not donate it) and
        append the request's suffix tokens via the model's extend_cache."""
        cache1, logits0, rope0, slot0, r0, s0 = self._prefixes[data["prefix"]]
        st = self._state
        st["cache"], st["last_logits"], st["rope"], st["spos"] = \
            self._admit_jit(st["cache"], st["last_logits"], st["rope"],
                            st["spos"], cache1, logits0, rope0, slot0, s)
        suffix = data.get("input_ids")
        tlen = 0
        if suffix is not None and len(suffix) > 0:
            suffix = np.asarray(suffix, np.int32)
            msk = np.asarray(
                data.get("input_mask", np.ones(suffix.shape[0], np.int32)),
                np.int32)
            pad = self.suffix_pad
            if pad is not None and suffix.shape[0] < pad:
                ext = pad - suffix.shape[0]
                suffix = np.concatenate([suffix, np.zeros(ext, np.int32)])
                msk = np.concatenate([msk, np.zeros(ext, np.int32)])
            tokens = jnp.asarray(suffix, jnp.int32)
            mask = jnp.asarray(msk, jnp.int32)
            st["cache"], st["last_logits"], st["rope"], st["spos"] = \
                self._extend_jit(st["cache"], st["last_logits"], st["rope"],
                                 st["spos"], tokens, mask,
                                 jnp.int32(r0), jnp.int32(s0),
                                 jnp.int32(s), self.ad.variables)
            tlen = int(np.asarray(mask).sum())
        self._set_controls(s, rid, data)
        self._slot_start[s] = (r0 + tlen, s0 + tlen)

    @staticmethod
    def _stop_hit(toks: List[int], stops: List[List[int]]) -> int:
        """If ``toks`` ends with any stop sequence, return its length
        (so the caller can exclude it from the output); else 0."""
        for seq in stops:
            n = len(seq)
            if n and len(toks) >= n and toks[-n:] == seq:
                return n
        return 0

    def step(self) -> List[Any]:
        """Retire cancelled slots, advance pending prompt chunks (chunked
        admission), admit from the queue, advance every decodable slot one
        decode window (``step_tokens`` tokens under one jitted program),
        retire finished requests. Returns the ids retired this step."""
        # cancelled-on-slot requests retire before spending another window
        for s in range(self.S):
            rid = self._slot_req[s]
            if rid is not None and rid in self._cancelled:
                self._finish_cancelled(s, rid)
        self._evict_overdue()
        self._advance_pending()
        self._admit_waiting()
        self._timeline.append(
            (sum(r is not None for r in self._slot_req), len(self._queue)))
        if self._state is None:
            return []
        active_py = [r is not None for r in self._slot_req]
        if not any(active_py):
            return []
        st = self._state
        active = jnp.asarray(active_py)
        sampling = bool((self._slot_temp[active_py] > 0).any()) \
            if any(active_py) else False
        if sampling:
            toks, st["last_logits"], st["cache"], st["rope"], st["spos"] = \
                self._step_sample_jit(
                    st["cache"], st["last_logits"], st["rope"], st["spos"],
                    active, jnp.asarray(self._slot_temp),
                    jnp.asarray(self._slot_topp), st["keys"],
                    self.ad.variables)
        else:
            toks, st["last_logits"], st["cache"], st["rope"], st["spos"] = \
                self._step_jit(st["cache"], st["last_logits"], st["rope"],
                               st["spos"], active, self.ad.variables)
        toks_host = np.asarray(toks)  # [S, H]
        retired = []
        now = time.perf_counter()
        for s in range(self.S):
            rid = self._slot_req[s]
            if rid is None:
                continue
            if not self._slot_toks[s]:
                self._t_first[rid] = now  # first token landed this window
            for h in range(self.H):
                tok = int(toks_host[s, h])
                self._slot_toks[s].append(tok)
                cut = self._stop_hit(self._slot_toks[s], self._slot_stop[s])
                if cut:
                    del self._slot_toks[s][-cut:]
                if tok == self.eos_id or cut \
                        or len(self._slot_toks[s]) >= self._slot_budget[s]:
                    self._done[rid] = list(self._slot_toks[s])
                    self._latency[rid] = now - self._t_submit[rid]
                    self._deadline.pop(rid, None)
                    self._slot_req[s] = None
                    if rid in self._session_req:
                        # hold the cache row; the EOS token itself stays in
                        # the conversation (it was written at its slot)
                        kept = len(self._done[rid]) + cut
                        r0, s0 = self._slot_start[s]
                        r0 = int(np.asarray(r0).reshape(-1)[0])
                        s0 = int(np.asarray(s0).reshape(-1)[0])
                        self._slot_held[s] = rid
                        self._sessions[rid] = (s, r0 + kept, s0 + kept)
                    retired.append(rid)
                    break  # post-EOS window tokens are discarded
        return retired

    # -- multi-turn sessions ----------------------------------------------
    def continue_session(self, session_id, new_request_id,
                         data: Mapping[str, Any]) -> None:
        """Append the next conversation turn to a held session's cache row
        (model extend_cache — no re-prefill of history; the reference
        re-encodes the whole conversation per turn) and resume decoding
        under ``new_request_id``. data: {"input_ids": [Lt],
        "input_mask"?: [Lt], "max_new"?: int}."""
        if session_id not in self._sessions:
            raise KeyError(f"no held session {session_id!r}")
        s, rope_c, slot_c = self._sessions.pop(session_id)
        self._session_req.discard(session_id)
        tokens = jnp.asarray(data["input_ids"], jnp.int32)
        mask = jnp.asarray(
            data.get("input_mask", np.ones(tokens.shape[0], np.int32)),
            jnp.int32)
        st = self._state
        st["cache"], st["last_logits"], st["rope"], st["spos"] = \
            self._extend_jit(st["cache"], st["last_logits"], st["rope"],
                             st["spos"], tokens, mask,
                             jnp.int32(rope_c), jnp.int32(slot_c),
                             jnp.int32(s), self.ad.variables)
        tlen = int(np.asarray(mask).sum())
        self._slot_held[s] = None
        self._set_controls(s, new_request_id, data)
        self._slot_start[s] = (rope_c + tlen, slot_c + tlen)
        if data.get("session") or new_request_id in self._session_req:
            self._session_req.add(new_request_id)
        self._t_submit.setdefault(new_request_id, time.perf_counter())

    def close_session(self, session_id) -> None:
        """Free a held session's slot back to the pool."""
        if session_id in self._sessions:
            s, _, _ = self._sessions.pop(session_id)
            self._slot_held[s] = None
        self._session_req.discard(session_id)

    def run(self, requests: List[Tuple[Any, Mapping[str, Any]]]
            ) -> Dict[str, Any]:
        """Drive a full workload; returns outputs + timing summary
        (latency, TTFT = submit→first token, TPOT = mean inter-token time
        after the first — the serving-quality pair chunked admission
        trades against raw throughput)."""
        for rid, data in requests:
            self.submit(rid, data)
        t0 = time.perf_counter()
        while self._queue or any(r is not None for r in self._slot_req) \
                or any(p is not None for p in self._slot_pending):
            self.step()
        return self.stats(time.perf_counter() - t0)

    def stats(self, wall: float) -> Dict[str, Any]:
        """Summary over everything retired since the last reset — shared by
        ``run`` and online drivers (Poisson-arrival benches) that own their
        submit/step loop."""
        total_tokens = sum(len(v) for v in self._done.values())
        lat = sorted(self._latency.values())
        ttft = sorted(self._t_first[r] - self._t_submit[r]
                      for r in self._done if r in self._t_first)
        tpot = sorted(
            (self._latency[r] - (self._t_first[r] - self._t_submit[r]))
            / max(len(self._done[r]) - 1, 1)
            for r in self._done if r in self._t_first)

        def pct(xs, q):
            return xs[min(int(q * len(xs)), len(xs) - 1)] if xs else 0.0

        occ = [a for a, _ in self._timeline]
        qd = sorted(q for _, q in self._timeline)
        return {
            "outputs": dict(self._done),
            "cancelled": set(self._cancelled),
            "evicted": set(self._evicted),
            "wall_s": wall,
            "total_tokens": total_tokens,
            "tokens_per_s": total_tokens / max(wall, 1e-9),
            "latency_p50": pct(lat, 0.5),
            "latency_max": lat[-1] if lat else 0.0,
            "ttft_p50": pct(ttft, 0.5), "ttft_p99": pct(ttft, 0.99),
            "tpot_p50": pct(tpot, 0.5), "tpot_p99": pct(tpot, 0.99),
            # sustained-load telemetry: fraction of slot-steps doing useful
            # decode, and the queue-depth distribution over steps
            "slot_utilization": (float(np.mean(occ)) / self.S) if occ
            else 0.0,
            "queue_depth_p50": pct(qd, 0.5),
            "queue_depth_max": qd[-1] if qd else 0,
            "steps": len(self._timeline),
        }
