"""SPMD correctness: the same train step over different mesh layouts must be
numerically equivalent — data-parallel only vs dp×fsdp×tp sharding rules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from antmmf_tpu.models.base_model import build_model
from antmmf_tpu.optimizer.build import build_optimizer
from antmmf_tpu.parallel.mesh import batch_spec, build_mesh
from antmmf_tpu.parallel.state_sharding import shard_state
from antmmf_tpu.trainers.train_state import TrainState

CONFIG = {
    "model_attributes": {"univl_retrieval": {
        "vit_preset": "vit_tiny_test", "bert_preset": "bert_tiny_test",
        "image_size": 32, "embed_dim": 32, "dtype_str": "float32"}},
    "optimizer_attributes": {"type": "adam_w", "params": {"lr": 1e-3}},
    "training_parameters": {"clip_gradients": True},
}

RULES = [
    [r".*attention/(q_proj|k_proj|v_proj)/kernel", [None, "model"]],
    [r".*attention/out_proj/kernel", ["model", None]],
    [r".*(kernel|embedding)", ["fsdp", None]],
    [r".*", None],
]


def _batch(B=8):
    rng = np.random.default_rng(0)
    return {
        "image_data": rng.standard_normal((B, 2, 32, 32, 3)).astype(np.float32),
        "video_mask": np.ones((B, 2), np.int64),
        "caption_input_ids": rng.integers(0, 30522, (B, 8)).astype(np.int64),
        "caption_input_mask": np.ones((B, 8), np.int64),
        "caption_segment_ids": np.zeros((B, 8), np.int64),
    }


def _run_steps(mesh_cfg, rules, n_steps=3):
    mesh = build_mesh(mesh_cfg)
    shell = build_model(CONFIG)
    batch = _batch()
    variables = shell.init(jax.random.PRNGKey(0), batch)
    tx, _ = build_optimizer(variables["params"], CONFIG["optimizer_attributes"],
                            CONFIG["training_parameters"])
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    state = shard_state(state, mesh, rules)
    db = jax.device_put(batch, jax.sharding.NamedSharding(mesh, batch_spec()))

    def train_step(state, batch):
        def loss_of(p):
            loss, (_, s) = shell.loss_fn(
                {**state.variables, "params": p}, batch,
                rngs={"dropout": jax.random.fold_in(state.rng, state.step)},
                deterministic=False)
            return loss, s

        (loss, _), g = jax.value_and_grad(loss_of, has_aux=True)(state.params)
        return state.apply_gradients(g, tx), loss

    step = jax.jit(train_step)
    losses = []
    for _ in range(n_steps):
        state, loss = step(state, db)
        losses.append(float(loss))
    return losses, jax.device_get(state.params)


def test_fsdp_tp_matches_pure_dp():
    losses_dp, params_dp = _run_steps({"data": 8}, None)
    losses_sharded, params_sh = _run_steps(
        {"data": 2, "fsdp": 2, "model": 2}, RULES)
    np.testing.assert_allclose(losses_dp, losses_sharded, rtol=2e-4)
    # parameters after 3 optimizer steps agree across layouts
    flat_a = jax.tree_util.tree_leaves(params_dp)
    flat_b = jax.tree_util.tree_leaves(params_sh)
    worst = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                for a, b in zip(flat_a, flat_b))
    assert worst < 5e-4, worst


def test_seq_axis_layout_matches():
    losses_dp, _ = _run_steps({"data": 8}, None, n_steps=2)
    losses_seq, _ = _run_steps({"data": 4, "seq": 2}, None, n_steps=2)
    np.testing.assert_allclose(losses_dp, losses_seq, rtol=2e-4)
