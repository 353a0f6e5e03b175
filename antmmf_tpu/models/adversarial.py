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
