"""DistillTrainer: teacher → student knowledge distillation.

Reference parity: ``/root/reference/antmmf/trainers/distill_trainer.py:19`` —
teacher built from pretrained config, student from ``model_attributes``; the KD
loop (:54-75) adds a soft-target loss between teacher and student logits.

TPU mapping: teacher params are frozen constants closed over by the jitted step
(teacher forward fuses into the same XLA program, no_grad by construction —
nothing in JAX tracks gradients unless asked).
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.models.base_model import build_model
from antmmf_tpu.trainers.base_trainer import BaseTrainer, optax_global_norm


def kd_kl_loss(student_logits, teacher_logits, temperature: float = 2.0):
    t = temperature
    s = jax.nn.log_softmax(student_logits.astype(jnp.float32) / t, -1)
    p = jax.nn.softmax(teacher_logits.astype(jnp.float32) / t, -1)
    return (p * (jnp.log(jnp.maximum(p, 1e-9)) - s)).sum(-1).mean() * t * t


@registry.register_trainer("distill_trainer")
class DistillTrainer(BaseTrainer):
    def load_model(self) -> None:
        super().load_model()  # student
        dp = self.tp.get("distill", {})
        teacher_name = dp.get("teacher_model")
        if teacher_name is None:
            raise ValueError("distill_trainer needs training_parameters."
                             "distill.teacher_model")
        self.teacher_shell = build_model(self.config, teacher_name)
        example = {k: jnp.asarray(v)
                   for k, v in self._cached_first_batch.arrays().items()}
        t_rng = jax.random.PRNGKey(int(dp.get("teacher_seed", 0)))
        self.teacher_variables = self.teacher_shell.init(t_rng, example)
        ckpt = dp.get("teacher_checkpoint")
        if ckpt:
            import orbax.checkpoint as ocp

            from antmmf_tpu.common.checkpoint import merge_params_tolerant

            with ocp.PyTreeCheckpointer() as ck:
                raw = ck.restore(ckpt)
            self.teacher_variables, _ = merge_params_tolerant(
                self.teacher_variables, raw.get("variables", raw))

    def compile_steps(self) -> None:
        shell = self.shell
        teacher_shell = self.teacher_shell
        teacher_vars = self.teacher_variables
        tx = self.tx
        dp = self.tp.get("distill", {})
        temperature = float(dp.get("temperature", 2.0))
        kd_weight = float(dp.get("kd_weight", 1.0))

        def train_step(state, batch):
            step_rng = jax.random.fold_in(state.rng, state.step)
            t_out = teacher_shell.apply(teacher_vars, batch, deterministic=True)
            t_logits = jax.lax.stop_gradient(t_out["logits"])

            def loss_of(p):
                loss, (output, scalars) = shell.loss_fn(
                    {**state.variables, "params": p}, batch,
                    rngs={"dropout": step_rng}, deterministic=False)
                kd = kd_kl_loss(output["logits"], t_logits, temperature)
                scalars["losses/kd_loss"] = kd
                total = loss + kd_weight * kd
                scalars["total_loss"] = total
                return total, scalars

            (loss, scalars), grads = jax.value_and_grad(
                loss_of, has_aux=True)(state.params)
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
