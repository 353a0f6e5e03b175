"""Adversarial training methods as pure gradient-transforms.

Reference parity: ``/root/reference/antmmf/models/nlp_adversarial.py`` (``FGM:10``,
``PGD:56``, ``EMA:128``) and ``mm_adversarial.py`` (``MMFreeLB:43``), base class
``base_adversarial.py:1-55``.

TPU-native redesign: the reference mutates embedding weights in-place between
extra backward passes; here each method is a **pure function from (loss_fn,
params) to (grads, scalars)** that runs inside the jitted train step — ascent
steps become a ``lax.fori_loop`` and the embedding-parameter subset is selected
by path regex, so the whole adversarial schedule compiles into one XLA program.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry

DEFAULT_EMB_PATTERN = r".*embedding.*"


def _path_str(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "name", getattr(p, "idx", p)))) for p in path
    )


def embedding_mask(params, pattern: str = DEFAULT_EMB_PATTERN):
    rx = re.compile(pattern)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: bool(rx.fullmatch(_path_str(path).lower())), params)


def _masked(mask, where_true, where_false):
    """Per-leaf select: mask is a pytree of python bools (static)."""
    return jax.tree_util.tree_map(
        lambda m, a, b: a if m else b, mask, where_true, where_false)


def _global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in leaves) + 1e-12)


class BaseAdversarial:
    """Config: {type, params: {epsilon, alpha, steps, emb_pattern}}."""

    def __init__(self, params: Optional[Mapping[str, Any]] = None):
        p = dict(params or {})
        self.epsilon = float(p.get("epsilon", 1.0))
        self.alpha = float(p.get("alpha", 0.3))
        self.steps = int(p.get("steps", 3))
        self.emb_pattern = p.get("emb_pattern", DEFAULT_EMB_PATTERN)

    def grads(self, loss_fn: Callable, params) -> Tuple[Any, Dict[str, jnp.ndarray]]:
        raise NotImplementedError


@registry.register_adversarial("fgm")
class FGM(BaseAdversarial):
    """Fast gradient method: one ε-normalised ascent step on embeddings; final
    gradient = clean + adversarial."""

    def grads(self, loss_fn, params):
        mask = embedding_mask(params, self.emb_pattern)
        (loss, aux), g_clean = jax.value_and_grad(loss_fn, has_aux=True)(params)
        g_emb = _masked(mask, g_clean,
                        jax.tree_util.tree_map(jnp.zeros_like, g_clean))
        norm = _global_norm(g_emb)
        delta = jax.tree_util.tree_map(
            lambda m, g: (self.epsilon * g / norm) if m else jnp.zeros_like(g),
            mask, g_clean)
        adv_params = jax.tree_util.tree_map(lambda p, d: p + d, params, delta)
        (adv_loss, _), g_adv = jax.value_and_grad(loss_fn, has_aux=True)(adv_params)
        grads = jax.tree_util.tree_map(lambda a, b: a + b, g_clean, g_adv)
        scalars = dict(aux)
        scalars["adv_loss"] = adv_loss
        return loss, grads, scalars


@registry.register_adversarial("pgd")
class PGD(BaseAdversarial):
    """Projected gradient descent: K ascent steps on an ε-ball embedding
    perturbation; final gradient = clean + last-step adversarial."""

    def grads(self, loss_fn, params):
        mask = embedding_mask(params, self.emb_pattern)
        (loss, aux), g_clean = jax.value_and_grad(loss_fn, has_aux=True)(params)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)

        def ascend(_, delta):
            adv = jax.tree_util.tree_map(lambda p, d: p + d, params, delta)
            _, g = jax.value_and_grad(loss_fn, has_aux=True)(adv)
            g_emb = _masked(mask, g, zeros)
            norm = _global_norm(g_emb)
            delta = jax.tree_util.tree_map(
                lambda m, d, g_: d + (self.alpha * g_ / norm) if m else d,
                mask, delta, g)
            # project onto the ε ball
            dn = _global_norm(_masked(mask, delta, zeros))
            factor = jnp.minimum(1.0, self.epsilon / dn)
            return jax.tree_util.tree_map(
                lambda m, d: d * factor if m else d, mask, delta)

        # steps is a small static int — the python loop unrolls under jit
        delta = zeros
        for i in range(self.steps):
            delta = ascend(i, delta)
        adv_params = jax.tree_util.tree_map(lambda p, d: p + d, params, delta)
        (adv_loss, _), g_adv = jax.value_and_grad(loss_fn, has_aux=True)(adv_params)
        grads = jax.tree_util.tree_map(lambda a, b: a + b, g_clean, g_adv)
        scalars = dict(aux)
        scalars["adv_loss"] = adv_loss
        return loss, grads, scalars


@registry.register_adversarial("free_lb")
@registry.register_adversarial("mm_free_lb")
class FreeLB(BaseAdversarial):
    """FreeLB: accumulate gradients across K ascent steps (averaged)."""

    def grads(self, loss_fn, params):
        mask = embedding_mask(params, self.emb_pattern)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        (loss, aux), g_clean = jax.value_and_grad(loss_fn, has_aux=True)(params)
        acc = g_clean
        delta = zeros
        adv_loss = loss
        for _ in range(self.steps):
            g_emb = _masked(mask, acc, zeros)
            norm = _global_norm(g_emb)
            delta = jax.tree_util.tree_map(
                lambda m, d, g_: d + (self.alpha * g_ / norm) if m else d,
                mask, delta, acc)
            adv = jax.tree_util.tree_map(lambda p, d: p + d, params, delta)
            (adv_loss, _), g = jax.value_and_grad(loss_fn, has_aux=True)(adv)
            acc = jax.tree_util.tree_map(lambda a, b: a + b, acc, g)
        grads = jax.tree_util.tree_map(lambda g_: g_ / (self.steps + 1), acc)
        scalars = dict(aux)
        scalars["adv_loss"] = adv_loss
        return loss, grads, scalars


@registry.register_adversarial("mm_hotflip")
class MMHotFlip(BaseAdversarial):
    """HotFlip discrete token attack (reference mm_adversarial.py:283).

    The reference flips the input token whose embedding-gradient L2 norm is
    largest, replacing it with the vocabulary entry that maximises the
    first-order loss change, one position per step, never re-flipping a
    position. Used by the ``adversarial_*_generate`` run types to rewrite
    dataset annotations.

    TPU-native form: a pure jittable function over the batch. The caller
    supplies ``embed_loss_fn(inputs_embeds) -> scalar`` (any model whose text
    embeddings accept ``inputs_embeds`` — see TextEmbeddings — can build one)
    and the word-embedding ``table`` [V, C].
    """

    def __init__(self, params: Optional[Mapping[str, Any]] = None):
        super().__init__(params)
        p = dict(params or {})
        # +1 = untargeted (increase loss / move away from target), the
        # reference's away_from_target default
        self.sign = 1.0 if p.get("away_from_target", True) else -1.0

    def attack(
        self,
        embed_loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
        table: jnp.ndarray,   # [V, C]
        input_ids: jnp.ndarray,  # int[B, L]
        input_mask: Optional[jnp.ndarray] = None,  # int[B, L] 1 = real token
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Returns (flipped_ids, info). ``self.steps`` positions are flipped."""
        B, L = input_ids.shape
        if input_mask is None:
            input_mask = jnp.ones_like(input_ids)
        neg_inf = jnp.finfo(jnp.float32).min
        flipped = jnp.zeros((B, L), bool)
        ids = input_ids
        rows = jnp.arange(B)
        last_loss = jnp.asarray(0.0, jnp.float32)

        for _ in range(self.steps):  # small static int — unrolls under jit
            embeds = jnp.take(table, ids, axis=0)
            loss, g = jax.value_and_grad(
                lambda e: embed_loss_fn(e).astype(jnp.float32))(embeds)
            last_loss = loss
            g = g.astype(jnp.float32)
            norms = jnp.sum(g * g, axis=-1)  # [B, L]
            norms = jnp.where((input_mask > 0) & ~flipped, norms, neg_inf)
            pos = jnp.argmax(norms, axis=-1)  # [B]
            g_pos = g[rows, pos]  # [B, C]
            old = ids[rows, pos]  # [B]
            # first-order flip score: sign · g·(E[v] − E[old])
            scores = self.sign * (
                g_pos @ table.astype(jnp.float32).T
                - jnp.sum(g_pos * jnp.take(table, old, axis=0)
                          .astype(jnp.float32), -1, keepdims=True))
            scores = scores.at[rows, old].set(neg_inf)
            new_tok = jnp.argmax(scores, axis=-1).astype(ids.dtype)
            # rows whose every position is already flipped give up (norms all
            # -inf → keep the old token)
            can_flip = norms[rows, pos] > neg_inf / 2
            new_tok = jnp.where(can_flip, new_tok, old)
            ids = ids.at[rows, pos].set(new_tok)
            flipped = flipped.at[rows, pos].set(
                flipped[rows, pos] | can_flip)
        return ids, {"adv_loss": last_loss,
                     "n_flipped": flipped.sum().astype(jnp.int32)}

    def grads(self, loss_fn, params):
        raise NotImplementedError(
            "mm_hotflip is a discrete input attack for adversarial data "
            "generation — use .attack(embed_loss_fn, table, ids, mask); it "
            "does not produce training gradients")


@registry.register_adversarial("ema")
class EMA:
    """Exponential moving average of parameters (nlp_adversarial.py:128) —
    functional update + swap helpers; the AdvTrainer keeps the shadow tree in
    its extended state."""

    def __init__(self, params: Optional[Mapping[str, Any]] = None):
        self.decay = float(dict(params or {}).get("decay", 0.999))

    def init(self, params):
        return jax.tree_util.tree_map(jnp.array, params)

    def update(self, shadow, params):
        return jax.tree_util.tree_map(
            lambda s, p: self.decay * s + (1.0 - self.decay) * p, shadow, params)


def build_adversarial(config: Optional[Mapping[str, Any]]):
    if not config:
        return None
    if isinstance(config, str):
        config = {"type": config}
    cls = registry.get_adversarial_class(config["type"])
    return cls(config.get("params", {}))
