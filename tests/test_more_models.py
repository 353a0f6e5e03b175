import jax
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.models.base_model import build_model
from antmmf_tpu.modules.approx_compute import sampled_softmax_loss
from antmmf_tpu.modules import moco
from antmmf_tpu.modules.vision.efficientnet import EfficientNet
from antmmf_tpu.modules.vision.s3d import S3DG

KEY = jax.random.PRNGKey(0)


def test_s3d_backbone():
    m = S3DG(width=16, num_blocks=2, dtype=jnp.float32)
    v = jnp.ones((1, 4, 32, 32, 3))
    params = m.init(KEY, v)
    out = m.apply(params, v)
    assert out["pooled"].shape[0] == 1 and out["grid"].ndim == 5


def test_efficientnet_backbone():
    m = EfficientNet(preset="test", dtype=jnp.float32)
    x = jnp.ones((1, 64, 64, 3))
    params = m.init(KEY, x)
    out = m.apply(params, x)
    assert out["pooled"].shape[0] == 1


def test_s3d_milnce_model():
    cfg = {"model_attributes": {"s3d": {
        "width": 16, "num_blocks": 2, "bert_preset": "bert_tiny_test",
        "embed_dim": 32, "dtype_str": "float32"}}}
    shell = build_model(cfg)
    rng = np.random.default_rng(0)
    b = {"video": rng.standard_normal((2, 4, 32, 32, 3)).astype(np.float32),
         "caption_input_ids": rng.integers(0, 30522, (2, 8)).astype(np.int64),
         "caption_input_mask": np.ones((2, 8), np.int64)}
    variables = shell.init(KEY, b)
    out = shell.apply(variables, b)
    assert "mil_nce_loss" in out["losses"]


def test_spk_resnet_model():
    cfg = {"model_attributes": {"spk_resnet": {
        "embed_dim": 16, "num_speakers": 10, "dtype_str": "float32"}}}
    shell = build_model(cfg)
    b = {"audio": np.random.default_rng(0).standard_normal(
        (2, 64, 40)).astype(np.float32),
        "targets": np.array([1, 2], np.int64)}
    variables = shell.init(KEY, b)
    out = shell.apply(variables, b)
    assert out["logits"].shape == (2, 10)
    assert out["speaker_embed"].shape == (2, 16)


def test_layoutlm_model():
    cfg = {"model_attributes": {"layoutlm": {
        "bert_preset": "bert_tiny_test", "num_labels": 3,
        "dtype_str": "float32"}}}
    shell = build_model(cfg)
    rng = np.random.default_rng(0)
    b = {"input_ids": rng.integers(0, 30522, (2, 6)).astype(np.int64),
         "input_mask": np.ones((2, 6), np.int64),
         "bbox": rng.integers(0, 1000, (2, 6, 4)).astype(np.int64),
         "targets": np.array([0, 1], np.int64)}
    variables = shell.init(KEY, b)
    out = shell.apply(variables, b)
    assert out["logits"].shape == (2, 3)


def test_moco_queue_and_momentum():
    params = {"w": jnp.zeros((2,))}
    mom = moco.init_momentum_params(params)
    mom = moco.momentum_update(mom, {"w": jnp.ones((2,))}, momentum=0.9)
    np.testing.assert_allclose(np.asarray(mom["w"]), 0.1)

    q = moco.init_queue(4, 2)
    q = moco.enqueue(q, jnp.ones((3, 2)))
    negs, valid = moco.queue_negatives(q)
    assert valid.tolist() == [True, True, True, False]
    q = moco.enqueue(q, jnp.full((2, 2), 2.0))  # wraps the ring
    assert int(q["ptr"]) == 1
    assert float(q["queue"][0, 0]) == 2.0
    assert moco.queue_negatives(q)[1].all()


def test_sampled_softmax_decreases_with_good_embeddings():
    V, D, B = 1000, 16, 8
    rng = jax.random.PRNGKey(0)
    weight = jax.random.normal(rng, (V, D))
    targets = jnp.arange(B)
    good = weight[targets] * 5.0
    bad = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    l_good = sampled_softmax_loss(good, weight, None, targets,
                                  jax.random.PRNGKey(2), 64)
    l_bad = sampled_softmax_loss(bad, weight, None, targets,
                                 jax.random.PRNGKey(2), 64)
    assert float(l_good) < float(l_bad)


def test_efficientnet_drop_connect():
    """Stochastic depth (reference modules/utils.py:91 drop_connect):
    active only when not deterministic; expectation-preserving rescale."""
    from antmmf_tpu.modules.vision.efficientnet import drop_connect

    m = EfficientNet(preset="test", drop_connect_rate=0.9, dtype=jnp.float32)
    x = jnp.ones((2, 64, 64, 3))
    params = m.init(KEY, x)
    det = m.apply(params, x, deterministic=True)["pooled"]
    det2 = m.apply(params, x, deterministic=True)["pooled"]
    assert jnp.allclose(det, det2)  # deterministic path has no randomness
    tr = m.apply(params, x, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(1)})["pooled"]
    assert not jnp.allclose(det, tr)  # branches actually dropped

    # per-sample Bernoulli mask with 1/keep rescale
    z = jnp.ones((4, 2, 2, 3))
    out = drop_connect(z, 0.5, jax.random.PRNGKey(0))
    per_sample = out.reshape(4, -1)
    assert all(
        jnp.allclose(row, 0.0) or jnp.allclose(row, 2.0) for row in per_sample)
