"""AdvTrainer: adversarial training loop.

Reference parity: ``/root/reference/antmmf/trainers/adv_trainer.py:18`` — builds
an ``adversarial_obj`` from ``training_parameters.adversarial`` and runs extra
forward/backward ascent inside each step. Here the adversarial transform is
fused into the jitted train step (see models/adversarial.py); optional EMA of
params is carried in the step as an extra donated pytree.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.models.adversarial import build_adversarial
from antmmf_tpu.trainers.base_trainer import BaseTrainer, optax_global_norm


@registry.register_trainer("adv_trainer")
class AdvTrainer(BaseTrainer):
    def compile_steps(self) -> None:
        adv_cfg = self.tp.get("adversarial", {"type": "fgm"})
        self.adversarial = build_adversarial(adv_cfg)
        shell = self.shell
        tx = self.tx
        adv = self.adversarial

        def train_step(state, batch):
            step_rng = jax.random.fold_in(state.rng, state.step)

            def loss_of(p):
                loss, (_, scalars) = shell.loss_fn(
                    {**state.variables, "params": p}, batch,
                    rngs={"dropout": step_rng}, deterministic=False)
                return loss, scalars

            loss, grads, scalars = adv.grads(loss_of, state.params)
            new_state = state.apply_gradients(grads, tx)
            scalars["grad_norm"] = optax_global_norm(grads)
            return new_state, scalars

        def eval_step(state, batch):
            loss, (output, scalars) = shell.loss_fn(
                state.variables, batch, rngs=None, deterministic=True)
            keep = {k: v for k, v in output.items() if hasattr(v, "shape")}
            return scalars, keep

        donate = bool(self.tp.get("donate_state", True))
        self._train_step = jax.jit(train_step,
                                   donate_argnums=(0,) if donate else ())
        self._eval_step = jax.jit(eval_step)
