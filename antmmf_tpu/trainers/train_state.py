"""TrainState: the single pytree holding all mutable training state.

The reference trainer's scattered mutable state (model params, optimizer,
iteration, epoch, AMP scaler — base_trainer.py:274-443) collapses into one
donated, sharded pytree updated by a pure jitted step (SURVEY.md §7 deltas).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # int32 scalar
    variables: Any  # flax variables ({"params": ...} [+ batch_stats etc.])
    opt_state: Any
    rng: jax.Array

    @property
    def params(self):
        return self.variables["params"]

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation, rng: jax.Array):
        return cls(
            step=jnp.zeros((), jnp.int32),
            variables=variables,
            opt_state=tx.init(variables["params"]),
            rng=rng,
        )

    def apply_gradients(self, grads, tx: optax.GradientTransformation) -> "TrainState":
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_vars = dict(self.variables)
        new_vars["params"] = new_params
        return self.replace(
            step=self.step + 1, variables=new_vars, opt_state=new_opt_state
        )

    def next_rng(self) -> tuple:
        new_rng, sub = jax.random.split(self.rng)
        return self.replace(rng=new_rng), sub
