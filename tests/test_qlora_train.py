"""QLoRA-class training composition: a decoder whose FROZEN base exists only
int4-packed (QuantDense consumes the packed siblings; make_live_vars
dequantizes the rest transiently) while LoRA adapters train in fp32.

This is the capacity recipe that finetunes a 7B-class model on one 16 GB
chip (BASELINE.md round-4b: 2,984 tok/s at 50.5% MFU). The reference
finetunes the same model class on A100-80GB nodes
(prj/Pink/scripts/stage2.sh).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util

from antmmf_tpu.models.base_model import build_model
from antmmf_tpu.predictors.quantization import (
    make_live_vars, synth_quantized_like)


def _build():
    shell = build_model({"model_attributes": {"pink": {
        "lm_preset": "omni_tiny_test", "vit_preset": "vit_tiny_test",
        "image_size": 32, "lora_rank": 2, "lora_decoder": True,
        "lora_freeze_base": True, "remat": True, "dtype_str": "float32",
    }}})
    batch = {
        "image_data": np.zeros((2, 32, 32, 3), np.float32),
        "input_ids": np.arange(2 * 16).reshape(2, 16).astype(np.int32) % 997,
        "input_mask": np.ones((2, 16), np.int32),
        "labels": np.tile(np.arange(16, dtype=np.int32)[None] % 97, (2, 1)),
    }
    return shell, batch


def test_qlora_step_trains_adapters_only():
    shell, batch = _build()
    shapes = jax.eval_shape(
        lambda r, b: shell.init(r, b), jax.random.PRNGKey(0), batch)
    flat = traverse_util.flatten_dict(shapes["params"], sep="/")
    is_trainable = lambda k: any(  # noqa: E731
        t in k for t in ("lora", "adapter", "vision_proj", "output_adapter"))
    train_shapes = {k: v for k, v in flat.items() if is_trainable(k)}
    frozen_shapes = {k: v for k, v in flat.items() if k not in train_shapes}

    synth = synth_quantized_like(
        traverse_util.unflatten_dict(frozen_shapes, sep="/"), min_size=64)
    frozen_flat = traverse_util.flatten_dict(synth, sep="/")
    # the decoder projections must actually be packed records, not floats
    assert any(k.endswith("kernel/q4") for k in frozen_flat), \
        sorted(frozen_flat)[:5]

    rng = np.random.default_rng(0)
    train_flat = {
        k: (np.zeros(s.shape, np.float32) if k.endswith("lora_b")
            else (rng.standard_normal(s.shape) * 0.02).astype(np.float32))
        for k, s in train_shapes.items()}

    tx = optax.adamw(1e-2)
    opt_state = tx.init(train_flat)

    def loss_of(tf_):
        merged = traverse_util.unflatten_dict({**frozen_flat, **tf_}, sep="/")
        live = make_live_vars({"params": merged}, jnp.float32)(False)
        out = shell.apply(live, batch, deterministic=True)
        return out["losses"]["lm_loss"]

    @jax.jit
    def step(tf_, opt_state):
        loss, grads = jax.value_and_grad(loss_of)(tf_)
        updates, opt_state = tx.update(grads, opt_state, tf_)
        return optax.apply_updates(tf_, updates), opt_state, loss, grads

    l0 = float(loss_of(train_flat))
    assert np.isfinite(l0)
    tf1, opt_state, loss, grads = step(train_flat, opt_state)
    # gradients flow into the adapters (lora_b receives grad first)
    gnorm = sum(float(jnp.abs(g).sum()) for k, g in grads.items()
                if "lora_b" in k or "vision_proj" in k)
    assert gnorm > 0.0
    # a few steps reduce the loss — training works THROUGH the packed base
    for _ in range(5):
        tf1, opt_state, loss, _ = step(tf1, opt_state)
    assert float(loss) < l0
