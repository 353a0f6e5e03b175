"""Optimizer + LR-schedule construction on optax.

Reference parity: ``/root/reference/antmmf/optimizer/build.py:10-45`` (resolve
optimizer by name), ``antmmf/utils/general.py:27-44`` (warmup + step-decay
lambda), BERT-style param grouping ``get_bert_configured_parameters``
(general.py:343-368: no weight decay on bias/LayerNorm), and per-group lr
multipliers (univl_model.py:80-106 img_encoder at 0.1×lr;
univl_video_ret.py:482-520 pretrained-prefix decay).

TPU mapping: grad accumulation is ``optax.MultiSteps`` (config
``gradient_accumulation_steps``); clipping is ``optax.clip_by_global_norm``; the
whole chain is one pure optax transform applied inside the jitted step.
"""

from __future__ import annotations

import re
from typing import Any, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from antmmf_tpu.common.configuration import convert_to_config
from antmmf_tpu.common.registry import registry

NO_DECAY_PATTERNS = (r".*bias$", r".*scale$", r".*norm.*", r".*layer_norm.*",
                     r".*embedding$", r".*logit_scale$")


def _path_str(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "name", getattr(p, "idx", p)))) for p in path
    )


def make_weight_decay_mask(params) -> Any:
    """True where weight decay applies (kernels), False on bias/norm/embeddings."""

    def decide(path, leaf) -> bool:
        p = _path_str(path).lower()
        return not any(re.fullmatch(pat, p) for pat in NO_DECAY_PATTERNS)

    return jax.tree_util.tree_map_with_path(decide, params)


def make_frozen_labels(params, patterns: Sequence[str]) -> Any:
    """Label tree for optax.multi_transform: ``"frozen"`` where any regex
    matches the parameter path (searched, like lr_multipliers), ``"train"``
    elsewhere. Frozen leaves get ``optax.set_to_zero()`` — no update AND no
    optimizer state (adam m/v, MultiSteps accumulators are never allocated),
    the memory-true form of parameter-efficient finetuning. The reference
    freezes via ``requires_grad_(False)``
    (prj/Pink/pink/model/adapter.py mark_only_adapter_as_trainable), which
    equally allocates no optimizer state in torch.
    """
    compiled = [re.compile(p) for p in patterns]

    def decide(path, leaf) -> str:
        p = _path_str(path)
        return "frozen" if any(c.search(p) for c in compiled) else "train"

    return jax.tree_util.tree_map_with_path(decide, params)


def make_lr_multiplier_mask(params, rules: Sequence) -> Any:
    """Per-parameter lr multipliers from [[regex, mult], ...]; first match wins,
    default 1.0 (the config surface for encoder_lr_decay / img 0.1×lr)."""
    compiled = [(re.compile(pat), float(mult)) for pat, mult in rules]

    def decide(path, leaf) -> float:
        p = _path_str(path)
        for pat, mult in compiled:
            if pat.search(p):
                return mult
        return 1.0

    return jax.tree_util.tree_map_with_path(decide, params)


def scale_by_multipliers(multipliers) -> optax.GradientTransformation:
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree_util.tree_map(lambda u, m: u * m, updates, multipliers), state

    return optax.GradientTransformation(init_fn, update_fn)


def build_lr_schedule(tp: Mapping[str, Any], base_lr: float):
    """warmup_factor→1 over warmup_iterations, then decay.

    ``lr_decay`` selects the decay family (reference ships step only —
    utils/general.py:27-44 ``lr_lambda_update``; cosine/linear are the
    standard finetuning additions):

      step    ×lr_ratio at each of lr_steps (default)
      cosine  cosine from base_lr to min_lr_ratio·base_lr over
              lr_decay_iterations (fallback: max_iterations)
      linear  linear over the same horizon
    """
    tp = convert_to_config(tp)
    use_warmup = bool(tp.get("use_warmup", False))
    warmup_iters = int(tp.get("warmup_iterations", 0)) if use_warmup else 0
    warmup_factor = float(tp.get("warmup_factor", 0.2))
    steps = [int(s) for s in (tp.get("lr_steps", []) or [])]
    ratio = float(tp.get("lr_ratio", 0.1))
    decay = str(tp.get("lr_decay", "step"))
    raw_horizon = tp.get("lr_decay_iterations",
                         tp.get("max_iterations", 0)) or 0
    # base.yml's max_iterations default is .inf (train-until-stopped):
    # an unbounded horizon only matters to the cosine/linear decays, which
    # degenerate to constant-lr — encode as 0 ("no horizon")
    horizon = 0 if raw_horizon in (float("inf"),) else int(raw_horizon)
    min_ratio = float(tp.get("min_lr_ratio", 0.0))
    if decay not in ("step", "cosine", "linear"):
        raise ValueError(f"Unknown lr_decay {decay!r}")
    if decay != "step" and horizon <= 0:
        raise ValueError(
            f"lr_decay={decay!r} needs lr_decay_iterations or max_iterations")

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        lr = jnp.asarray(base_lr, jnp.float32)
        if warmup_iters > 0:
            alpha = jnp.clip(count / warmup_iters, 0.0, 1.0)
            lr = lr * (warmup_factor * (1 - alpha) + alpha)
        if decay == "step":
            for s in steps:
                lr = jnp.where(count >= s, lr * ratio, lr)
            return lr
        # cosine/linear: decay phase starts after warmup
        t = jnp.clip((count - warmup_iters) / max(horizon - warmup_iters, 1),
                     0.0, 1.0)
        if decay == "cosine":
            frac = min_ratio + (1 - min_ratio) * 0.5 * (1 + jnp.cos(jnp.pi * t))
        else:  # linear
            frac = min_ratio + (1 - min_ratio) * (1 - t)
        return lr * frac

    return schedule


def make_group_labels(params, groups: Sequence[Mapping[str, Any]]):
    """Label each param by the first matching group pattern (else 'default')."""
    compiled = [(re.compile(g["pattern"]), f"group_{i}")
                for i, g in enumerate(groups)]

    def decide(path, leaf) -> str:
        p = _path_str(path)
        for pat, label in compiled:
            if pat.search(p):
                return label
        return "default"

    return jax.tree_util.tree_map_with_path(decide, params)


def build_combined_optimizer(
    params,
    cfg: Mapping[str, Any],
    tp: Mapping[str, Any],
) -> tuple:
    """Per-group optimizer types (reference ``CombinedOptimizer``,
    optimizer/combine_optimizers.py:16-131)::

        optimizer_attributes:
          type: combined
          groups:
            - {pattern: "img_encoder", type: sgd, params: {lr: 0.01}}
            - {pattern: ".*", type: adam_w, params: {lr: 1.0e-4}}
    """
    groups = list(cfg.get("groups", []))
    transforms = {}
    schedules = {}
    for i, g in enumerate(groups):
        tx, sched = build_optimizer(params, {
            "type": g.get("type", "adam_w"), "params": g.get("params", {})},
            {})  # per-group chains exclude global clip/accum (applied outside)
        transforms[f"group_{i}"] = tx
        schedules[f"group_{i}"] = sched
    transforms["default"], schedules["default"] = build_optimizer(
        params, {"type": "adam_w", "params": {"lr": 1e-4}}, {})
    labels = make_group_labels(params, groups)
    core = optax.multi_transform(transforms, labels)
    chain = []
    if bool(tp.get("clip_gradients", False)):
        chain.append(optax.clip_by_global_norm(float(tp.get("max_grad_l2_norm", 1.0))))
    chain.append(core)
    tx = optax.chain(*chain)
    accum = int(tp.get("gradient_accumulation_steps", 1))
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, schedules.get("group_0", schedules["default"])


def build_optimizer(
    params,
    optimizer_attributes: Mapping[str, Any],
    training_parameters: Optional[Mapping[str, Any]] = None,
    custom_schedule=None,
) -> tuple:
    """Returns (optax transform, schedule fn). Config shape (reference-compatible)::

        optimizer_attributes:
          type: adam_w
          params: {lr: 5.0e-5, weight_decay: 0.01, eps: 1.0e-8}
          lr_multipliers: [["img_encoder", 0.1]]

    ``custom_schedule`` (a model-provided ``fn(count) -> lr``) overrides the
    config-built schedule — the reference's ``get_custom_scheduler`` hook
    (base_trainer.py:445-465); the trainer passes it when the model module
    defines ``custom_lr_schedule(training_parameters)``.
    """
    cfg = convert_to_config(optimizer_attributes or {})
    tp = convert_to_config(training_parameters or {})
    name = cfg.get("type", "adam_w")
    if name == "combined":
        if custom_schedule is not None:
            raise ValueError(
                "custom_lr_schedule is not supported with the 'combined' "
                "optimizer (per-group schedules are config-built)")
        return build_combined_optimizer(params, cfg, tp)
    p = dict(cfg.get("params", {}))
    lr = float(p.pop("lr", p.pop("learning_rate", 1e-4)))
    schedule = (custom_schedule if custom_schedule is not None
                else build_lr_schedule(tp, lr))
    accum = int(tp.get("gradient_accumulation_steps", 1))
    if accum > 1:
        # MultiSteps advances the inner optimizer count once per k micro-
        # batches; warmup_iterations / lr_steps are configured in trainer
        # iterations, so rescale the count the inner schedule consumes.
        # The returned `schedule` stays in trainer-iteration units (used by
        # the trainer's lr logging), and schedule(i) == inner(i // k).
        outer_schedule = schedule
        inner_schedule = lambda c: outer_schedule(c * accum)  # noqa: E731
    else:
        inner_schedule = schedule

    weight_decay = float(p.pop("weight_decay", 0.0))
    betas = p.pop("betas", None)
    if betas is not None:
        b1, b2 = float(betas[0]), float(betas[1])
    else:
        b1, b2 = float(p.pop("b1", 0.9)), float(p.pop("b2", 0.999))
    eps = float(p.pop("eps", 1e-8))
    # mu_dtype: store the first moment in a narrower dtype (e.g. "bfloat16")
    # to cut optimizer HBM traffic (measured 85.7→83.4 ms on the flagship
    # step, BASELINE.md r2b); second moment and update math stay fp32.
    mu_dtype = p.pop("mu_dtype", None)

    custom = registry.get_optimizer_class(name, default=None)
    if custom is not None:
        core = custom(learning_rate=inner_schedule, **p)
    elif name in ("adam_w", "adamw"):
        core = optax.adamw(inner_schedule, b1=b1, b2=b2, eps=eps,
                           weight_decay=weight_decay, mu_dtype=mu_dtype,
                           mask=make_weight_decay_mask(params))
    elif name == "adam":
        core = optax.adam(inner_schedule, b1=b1, b2=b2, eps=eps,
                          mu_dtype=mu_dtype)
    elif name == "sgd":
        core = optax.sgd(inner_schedule, momentum=float(p.pop("momentum", 0.9)))
    elif name == "radam":
        core = optax.radam(inner_schedule, b1=b1, b2=b2, eps=eps)
    elif name == "adan":
        # Adan ≈ adamw with Nesterov-style momentum; optax.adan exists ≥0.2
        adan = getattr(optax, "adan", None)
        if adan is not None:
            core = adan(inner_schedule, eps=eps, weight_decay=weight_decay)
        else:  # fallback
            core = optax.adamw(inner_schedule, weight_decay=weight_decay)
    elif name in ("adafactor",):
        core = optax.adafactor(inner_schedule)
    elif name == "lion":
        core = optax.lion(inner_schedule, weight_decay=weight_decay,
                          mu_dtype=mu_dtype,
                          mask=make_weight_decay_mask(params))
    else:
        raise KeyError(f"Unknown optimizer {name!r}")
    if mu_dtype is not None and name not in (
            "adam_w", "adamw", "adam", "lion"):
        raise ValueError(
            f"mu_dtype is not supported by optimizer {name!r}")

    chain = []
    if bool(tp.get("clip_gradients", False)):
        chain.append(optax.clip_by_global_norm(float(tp.get("max_grad_l2_norm", 1.0))))
    chain.append(core)
    mults = cfg.get("lr_multipliers", [])
    if mults:
        chain.append(scale_by_multipliers(make_lr_multiplier_mask(params, mults)))
    tx = optax.chain(*chain)

    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)

    frozen = list(cfg.get("frozen_params", []) or [])
    if frozen:
        # outermost so MultiSteps accumulators are ALSO skipped on frozen
        # leaves — at 7B-class LoRA this is the difference between ~92 GB
        # and ~0.1 GB of optimizer+accumulator state
        labels = make_frozen_labels(params, frozen)
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, labels)
    return tx, schedule
