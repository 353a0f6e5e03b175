"""Chunked LM loss (long-stream training): _lm_loss_chunked must equal the
full-logits _lm_loss exactly — the [B, L, V] logits tensor (6 GB f32 at
9.9k tokens x 152k vocab) crashes the TPU compiler outright
(scripts/bench_longctx_bisect.py 'decoder_loss' leg) and is auto-replaced
by lax.map over sequence chunks past 2^28 logit elements."""

import jax
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.models.base_model import build_model


def _setup():
    shell = build_model({"model_attributes": {"m2_omni": {
        "lm_preset": "omni_tiny_test", "vit_preset": "vit_tiny_test",
        "image_size": 32, "image_token_id": 3, "dtype_str": "float32"}}})
    rng = np.random.default_rng(0)
    L = 40
    ids = rng.integers(5, 900, (2, L)).astype(np.int32)
    ids[:, :4] = 3
    labels = ids.copy()
    labels[:, :8] = -1
    batch = {"input_ids": ids, "input_mask": np.ones_like(ids),
             "image_data": rng.standard_normal(
                 (2, 32, 32, 3)).astype(np.float32),
             "labels": labels}
    variables = shell.init(jax.random.PRNGKey(0), batch)
    return shell.module, variables, batch, labels


def test_chunked_equals_full_and_differentiates():
    m, variables, batch, labels = _setup()
    out = m.apply(variables, batch, deterministic=True)
    hidden = out["hidden"]
    for chunk in (16, 7, 64):  # divides / ragged / wider-than-stream
        ch = m.apply(variables, hidden, jnp.asarray(labels), chunk,
                     method=type(m)._lm_loss_chunked)
        np.testing.assert_allclose(
            float(ch["losses"]["lm_loss"]),
            float(out["losses"]["lm_loss"]), rtol=1e-6)
        np.testing.assert_allclose(
            float(ch["metrics"]["lm_acc"]),
            float(out["metrics"]["lm_acc"]), rtol=0)

    def loss_of(v):
        return m.apply(v, hidden, jnp.asarray(labels), 16,
                       method=type(m)._lm_loss_chunked)["losses"]["lm_loss"]

    g = jax.grad(loss_of)(variables)
    total = sum(float(jnp.abs(x).sum())
                for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
