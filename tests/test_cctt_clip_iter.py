import jax
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.modules.encoders.clip_text_encoder import ClipTextEncoder
from antmmf_tpu.modules.vision.cctt import CompactConvTransformer
from antmmf_tpu.tasks.iteration_strategies import build_iteration_strategy

KEY = jax.random.PRNGKey(0)


def test_cctt_forward():
    m = CompactConvTransformer(preset="cct_test", dtype=jnp.float32)
    x = jnp.ones((2, 32, 32, 3))
    params = m.init(KEY, x)
    out = m.apply(params, x)
    assert out["pooled"].shape == (2, 32)
    assert out["sequence"].ndim == 3


def test_clip_text_encoder_eot_pooling_and_causality():
    m = ClipTextEncoder(vocab_size=100, context_length=16, width=32,
                        num_layers=1, num_heads=2, output_dim=16,
                        dtype=jnp.float32)
    ids1 = jnp.array([[5, 7, 99, 1, 1, 1]])  # EOT=99 at position 2
    ids2 = jnp.array([[5, 7, 99, 3, 8, 2]])  # different future tokens
    params = m.init(KEY, ids1)
    o1 = m.apply(params, ids1)
    o2 = m.apply(params, ids2)
    assert o1["pooled_output"].shape == (1, 16)
    # causal: pooled at EOT (pos 2) must not depend on later positions
    np.testing.assert_allclose(np.asarray(o1["pooled_output"]),
                               np.asarray(o2["pooled_output"]), atol=1e-5)


def test_iteration_strategies():
    rr = build_iteration_strategy("round_robin", [10, 10, 10])
    assert [rr() for _ in range(4)] == [0, 1, 2, 0]

    sp = build_iteration_strategy("size_proportional", [1000, 1], seed=0)
    picks = [sp() for _ in range(100)]
    assert picks.count(0) > 90

    ratios = build_iteration_strategy(
        {"type": "ratios", "params": {"ratios": [0, 1]}}, [10, 10])
    assert all(ratios() == 1 for _ in range(5))

    uni = build_iteration_strategy("uniform", [1, 1000000], seed=0)
    assert 20 < sum(uni() for _ in range(100)) < 80
