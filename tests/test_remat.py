"""Decoder-layer rematerialization (DecoderLM.remat) must be numerically
invisible: same params → same loss and same grads as the non-remat forward,
for both Pink and M2-omni training paths. Remat is the memory knob for
1B-class finetuning on a 16 GB chip (reference trains with
gradient_checkpointing on GPUs: prj/Pink/pink/train/train.py TrainingArguments
surface); here it is flax nn.remat over each DecoderLayer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from antmmf_tpu.models.base_model import build_model


def _batch(rng, batch=2, text_len=12, size=32):
    ids = rng.integers(4, 900, (batch, text_len))
    labels = ids.copy()
    labels[:, : text_len // 2] = -1
    return {
        "image_data": rng.standard_normal(
            (batch, size, size, 3)).astype(np.float32),
        "input_ids": ids.astype(np.int32),
        "input_mask": np.ones((batch, text_len), np.int32),
        "labels": labels.astype(np.int32),
    }


@pytest.mark.parametrize("model_key,attrs", [
    ("pink", {"lm_preset": "omni_tiny_test", "vit_preset": "vit_tiny_test",
              "image_size": 32, "lora_rank": 4, "lora_decoder": True,
              "lora_freeze_base": True, "dtype_str": "float32"}),
    ("m2_omni", {"lm_preset": "omni_tiny_test",
                 "vit_preset": "vit_tiny_test", "image_size": 32,
                 "llm_lora_rank": 4, "dtype_str": "float32"}),
])
def test_remat_matches_plain(model_key, attrs):
    rng = np.random.default_rng(0)
    batch = _batch(rng)

    shells = {
        r: build_model(
            {"model_attributes": {model_key: {**attrs, "remat": r}}})
        for r in (False, True)
    }
    # identical init: remat wraps the layer class but keeps the param tree
    params = shells[False].init(jax.random.PRNGKey(0), batch)["params"]
    p2 = shells[True].init(jax.random.PRNGKey(0), batch)["params"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, p2)

    def loss_fn(shell):
        def f(p):
            out = shell.apply({"params": p}, batch, deterministic=True)
            return out["losses"]["lm_loss"]
        return f

    l0, g0 = jax.value_and_grad(loss_fn(shells[False]))(params)
    l1, g1 = jax.value_and_grad(loss_fn(shells[True]))(params)
    assert np.allclose(float(l0), float(l1), rtol=1e-6, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6),
        g0, g1)
