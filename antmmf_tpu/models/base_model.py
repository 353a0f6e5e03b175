"""Model contract + the loss/metric-attaching shell.

Reference parity: ``/root/reference/antmmf/models/base_model.py`` —
``BaseModel.build()/build_for_test()/forward(SampleList)->dict`` with automatic
loss/metric attachment in ``__call__`` (:214-260) and the online-serving state
that disables them (:222-231).

TPU mapping: a *model* is a flax ``nn.Module`` registered by name whose
``from_config`` classmethod builds it from YAML ``model_attributes``. The
imperative attach-losses-on-call behavior becomes the functional ``ModelShell``:

    shell = build_model(config)                      # resolves registry name
    params = shell.init(rng, example_batch)
    loss, (output, scalars) = shell.loss_fn(params, batch, rngs)

``loss_fn`` is pure and jittable; the trainer differentiates it under pjit.
Models may emit their own ``output["losses"]`` (contrastive towers do); config
losses are merged on top, and ``total_loss = sum(mean of each)`` exactly like the
reference trainer (base_trainer.py:677-681).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.common.configuration import Configuration, convert_to_config
from antmmf_tpu.common.registry import registry
from antmmf_tpu.modules.losses.losses import Losses
from antmmf_tpu.modules.metrics.metrics import Metrics


class BaseModel(nn.Module):
    """Marker base class for registered models.

    Subclasses are flax modules taking ``(batch: Mapping[str, jnp.ndarray],
    deterministic: bool)`` and returning a dict that may include ``logits``,
    ``losses`` (name → scalar), ``metrics``, and arbitrary embedding fields.
    """

    @classmethod
    def from_config(cls, config: Mapping[str, Any]) -> "BaseModel":
        """Build from YAML model_attributes. Default: pass keys matching the
        dataclass fields."""
        config = convert_to_config(config)
        fields = {f for f in cls.__dataclass_fields__ if f not in ("parent", "name")}
        kwargs = {k: v for k, v in config.to_dict().items() if k in fields}
        return cls(**kwargs)

    @classmethod
    def for_test(cls, config: Mapping[str, Any]) -> "BaseModel":
        """Random-init test build: never downloads weights (reference
        ``build_for_test`` contract, base_model.py:103-115). Identical to
        from_config here — this framework never downloads implicitly."""
        return cls.from_config(config)


class ModelShell:
    """Bundles a model module with its configured losses/metrics and exposes the
    pure functions the trainer jits."""

    def __init__(
        self,
        module: nn.Module,
        losses: Optional[Losses] = None,
        metrics: Optional[Metrics] = None,
        online_serving: bool = False,
    ):
        self.module = module
        self.losses = losses or Losses([])
        self.metrics = metrics or Metrics([])
        self.online_serving = online_serving

    # ------------------------------------------------------------------- init
    def init(self, rng: jax.Array, example_batch: Mapping[str, Any]):
        params_rng, dropout_rng = jax.random.split(rng)
        return self.module.init(
            {"params": params_rng, "dropout": dropout_rng},
            example_batch,
            deterministic=True,
        )

    # ---------------------------------------------------------------- forward
    def apply(
        self,
        variables,
        batch: Mapping[str, Any],
        deterministic: bool = True,
        rngs: Optional[Mapping[str, jax.Array]] = None,
        with_mutable: bool = False,
    ):
        """Forward. With ``with_mutable`` (training), non-param collections
        (MoCo queues, batch stats) are threaded functionally: returns
        (output, updated_collections)."""
        mutable = [c for c in variables if c != "params"] if with_mutable else False
        if mutable:
            output, updated = self.module.apply(
                variables, batch, deterministic=deterministic, rngs=rngs,
                mutable=mutable,
            )
        else:
            output = self.module.apply(
                variables, batch, deterministic=deterministic, rngs=rngs
            )
            updated = {}
        if not isinstance(output, Mapping):
            raise TypeError(
                f"Model output must be a Mapping, got {type(output).__name__}"
            )
        if with_mutable:
            return dict(output), dict(updated)
        return dict(output)

    def attach(self, batch: Mapping, output: Dict[str, Any]) -> Dict[str, Any]:
        """Merge model-emitted and config losses/metrics (skipped when serving)."""
        if self.online_serving:
            output.pop("losses", None)
            output.pop("metrics", None)
            return output
        model_losses = dict(output.get("losses", {}))
        model_losses.update(self.losses(batch, output))
        output["losses"] = model_losses
        model_metrics = dict(output.get("metrics", {}))
        model_metrics.update(self.metrics(batch, output))
        output["metrics"] = model_metrics
        return output

    # ------------------------------------------------------------------- loss
    def loss_fn(
        self,
        variables,
        batch: Mapping[str, Any],
        rngs: Optional[Mapping[str, jax.Array]] = None,
        deterministic: bool = False,
    ) -> Tuple[jnp.ndarray, Tuple[Dict[str, Any], Dict[str, jnp.ndarray]]]:
        has_extra = any(c != "params" for c in variables)
        if has_extra and not deterministic:
            output, updated = self.apply(
                variables, batch, deterministic=deterministic, rngs=rngs,
                with_mutable=True)
            output["_updated_collections"] = updated
        else:
            output = self.apply(variables, batch, deterministic=deterministic,
                                rngs=rngs)
        output = self.attach(batch, output)
        losses = output.get("losses", {})
        if losses:
            total = sum(jnp.mean(v) for v in losses.values())
        else:
            total = jnp.zeros((), jnp.float32)
        scalars = {f"losses/{k}": jnp.mean(v) for k, v in losses.items()}
        scalars.update({f"metrics/{k}": jnp.mean(v)
                        for k, v in output.get("metrics", {}).items()})
        scalars["total_loss"] = total
        return total, (output, scalars)


def build_model(
    config: Mapping[str, Any], model_name: Optional[str] = None, for_test: bool = False,
    online_serving: bool = False,
) -> ModelShell:
    """Resolve ``model_attributes.<name>`` → registered class → ModelShell."""
    config = convert_to_config(config)
    attributes = config.get("model_attributes", config)
    if model_name is None:
        names = list(attributes.keys())
        if len(names) != 1:
            raise ValueError(
                f"model_name required when model_attributes has {len(names)} entries"
            )
        model_name = names[0]
    model_config = attributes.get(model_name, {})
    # training_parameters.dtype_policy.compute provides the default compute
    # dtype when the model config doesn't pin one (the AMP-knob analogue)
    policy_dtype = config.get_dotted("training_parameters.dtype_policy.compute") \
        if hasattr(config, "get_dotted") else None
    if policy_dtype and "dtype_str" not in model_config and \
            "dtype_str" in getattr(registry.get_model_class(
                model_config.get("model_class", model_name)),
                "__dataclass_fields__", {}):
        model_config = convert_to_config(
            {**model_config.to_dict(), "dtype_str": str(policy_dtype)})
    cls = registry.get_model_class(model_config.get("model_class", model_name))
    module = cls.for_test(model_config) if for_test else cls.from_config(model_config)
    losses = Losses(model_config.get("losses", []))
    metrics = Metrics(model_config.get("metrics", []))
    return ModelShell(module, losses, metrics, online_serving=online_serving)
