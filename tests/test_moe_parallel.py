import jax
import jax.numpy as jnp
import numpy as np
import pytest

from antmmf_tpu.modules.attention import xla_attention_core
from antmmf_tpu.modules.moe import MoELayer, top1_gating, top2_gating
from antmmf_tpu.parallel.contrastive import (
    chunked_infonce,
    chunked_symmetric_infonce,
)
from antmmf_tpu.parallel.long_context import ring_attention, ulysses_attention
from antmmf_tpu.parallel.mesh import build_mesh
from antmmf_tpu.modules.losses.contrastive import cross_en, symmetric_cross_en

F32 = jnp.float32


# -------------------------------------------------------------------- gating
def test_top2_gating_shapes_and_capacity():
    T, E, C = 16, 4, 4
    logits = jax.random.normal(jax.random.PRNGKey(0), (T, E))
    dispatch, combine, aux = top2_gating(logits, C, "best")
    assert dispatch.shape == (T, E, C)
    # each (expert, slot) used at most once
    assert (dispatch.sum(axis=0) <= 1).all()
    # each token dispatched ≤ 2 slots
    assert (dispatch.sum(axis=(1, 2)) <= 2).all()
    assert aux["aux_loss"].shape == ()
    assert float(aux["frac_tokens_dropped"]) >= 0


def test_top1_capacity_drops_overflow():
    T, E = 8, 2
    # all tokens prefer expert 0; capacity 2 → 6 dropped
    logits = jnp.tile(jnp.array([[5.0, -5.0]]), (T, 1))
    dispatch, combine, aux = top1_gating(logits, 2)
    assert int(dispatch.sum()) == 2
    assert float(aux["frac_tokens_dropped"]) > 0.5


def test_moe_layer_forward_and_grads():
    layer = MoELayer(num_experts=4, hidden_dim=32, top_k=2, dtype=F32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16))
    params = layer.init({"params": jax.random.PRNGKey(1),
                         "dropout": jax.random.PRNGKey(2)}, x, False)
    out, aux = layer.apply(params, x, True)
    assert out.shape == x.shape
    assert np.isfinite(float(aux["aux_loss"]))

    def loss(p):
        o, a = layer.apply(p, x, True)
        return jnp.sum(o ** 2) + a["aux_loss"] + 0.01 * a["router_z_loss"]

    g = jax.grad(lambda p: loss(p))(params)
    gn = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_moe_identity_when_experts_learned_zero():
    # with zero expert weights output is bias-only — check plumbing not math
    layer = MoELayer(num_experts=2, hidden_dim=8, top_k=1, dtype=F32)
    x = jnp.ones((1, 4, 8))
    params = layer.init({"params": jax.random.PRNGKey(0)}, x, True)
    out, _ = layer.apply(params, x, True)
    assert out.shape == x.shape


def test_moe_scatter_matches_einsum_dispatch():
    """The scatter dispatch (O(T*k*D) index ops, the tutel-fused-dispatch
    role) and the legacy one-hot einsum dispatch (O(T*E*C*D)) share the
    routing math and must produce IDENTICAL outputs — top-1 and top-2,
    including capacity drops."""
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 12))
    for top_k in (1, 2):
        kw = dict(num_experts=4, hidden_dim=24, top_k=top_k, dtype=F32,
                  capacity_factor=1.0, second_expert_policy="best")
        l_sc = MoELayer(dispatch_mode="scatter", **kw)
        l_ei = MoELayer(dispatch_mode="einsum", **kw)
        params = l_sc.init({"params": jax.random.PRNGKey(1)}, x, True)
        o1, a1 = l_sc.apply(params, x, False)
        o2, a2 = l_ei.apply(params, x, False)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(float(a1["frac_tokens_dropped"]),
                                   float(a2["frac_tokens_dropped"]),
                                   rtol=1e-6, atol=1e-6)

        def loss(p, layer):
            o, a = layer.apply(p, x, False)
            return jnp.sum(o ** 2) + a["aux_loss"]

        g1 = jax.grad(loss)(params, l_sc)
        g2 = jax.grad(loss)(params, l_ei)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6), g1, g2)


# ------------------------------------------------------- chunked contrastive
def test_chunked_infonce_matches_dense():
    N, D = 24, 8
    t = jax.random.normal(jax.random.PRNGKey(0), (N, D))
    v = jax.random.normal(jax.random.PRNGKey(1), (N, D))
    t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    scale = 10.0
    dense = cross_en((t @ v.T) * scale)
    chunked = chunked_infonce(t, v, scale, chunk_size=7)  # non-divisible chunk
    np.testing.assert_allclose(float(chunked), float(dense), rtol=1e-5)
    dense_sym = symmetric_cross_en((t @ v.T) * scale)
    chunk_sym = chunked_symmetric_infonce(t, v, scale, chunk_size=8)
    np.testing.assert_allclose(float(chunk_sym), float(dense_sym), rtol=1e-5)


def test_chunked_infonce_gradients_match():
    N, D = 16, 4
    t = jax.random.normal(jax.random.PRNGKey(0), (N, D))
    v = jax.random.normal(jax.random.PRNGKey(1), (N, D))

    g1 = jax.grad(lambda t: chunked_infonce(t, v, 5.0, chunk_size=4))(t)
    g2 = jax.grad(lambda t: cross_en((t @ v.T) * 5.0))(t)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


# ------------------------------------------------------------- seq parallel
@pytest.fixture(scope="module")
def seq_mesh():
    return build_mesh({"seq": 8})


def _qkv(B=2, H=8, L=32, D=16):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return tuple(jax.random.normal(k, (B, H, L, D), F32) for k in ks)


def test_ulysses_matches_dense(seq_mesh):
    q, k, v = _qkv()
    mask = jnp.ones((2, 32)).at[:, -5:].set(0)
    bias = jnp.where(mask > 0, 0.0, -1e30)[:, None, None, :]
    ref = xla_attention_core(q, k, v, bias=bias)
    out = ulysses_attention(q, k, v, seq_mesh, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_matches_dense(seq_mesh):
    q, k, v = _qkv(H=2)
    mask = jnp.ones((2, 32)).at[:, -3:].set(0)
    bias = jnp.where(mask > 0, 0.0, -1e30)[:, None, None, :]
    ref = xla_attention_core(q, k, v, bias=bias)
    out = ring_attention(q, k, v, seq_mesh, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ulysses_head_padding_12_heads_on_8way(seq_mesh):
    """Flagship head count (12) on an 8-way seq axis via head zero-padding."""
    q, k, v = _qkv(H=12)
    mask = jnp.ones((2, 32)).at[:, -5:].set(0)
    bias = jnp.where(mask > 0, 0.0, -1e30)[:, None, None, :]
    ref = xla_attention_core(q, k, v, bias=bias)
    out = ulysses_attention(q, k, v, seq_mesh, bias=bias)
    assert out.shape == q.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ulysses_odd_sequence_length(seq_mesh):
    """L=37 is not divisible by the 8-way axis — seq padding handles it."""
    q, k, v = _qkv(H=8, L=37)
    ref = xla_attention_core(q, k, v)
    out = ulysses_attention(q, k, v, seq_mesh)
    assert out.shape == q.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_causal_matches_dense(seq_mesh):
    """Causal ring attention == XLA attention with a causal mask."""
    q, k, v = _qkv(H=2, L=32)
    L = 32
    causal_bias = jnp.where(
        jnp.arange(L)[None, :] > jnp.arange(L)[:, None], -1e30, 0.0
    )[None, None]
    ref = xla_attention_core(q, k, v, bias=causal_bias)
    out = ring_attention(q, k, v, seq_mesh, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_causal_with_kv_padding(seq_mesh):
    q, k, v = _qkv(H=2, L=32)
    L = 32
    mask = jnp.ones((2, L)).at[:, -4:].set(0)
    kv_bias = jnp.where(mask > 0, 0.0, -1e30)[:, None, None, :]
    causal = jnp.where(
        jnp.arange(L)[None, :] > jnp.arange(L)[:, None], -1e30, 0.0
    )[None, None]
    ref = xla_attention_core(q, k, v, bias=kv_bias + causal)
    out = ring_attention(q, k, v, seq_mesh, bias=kv_bias, causal=True)
    # padded-key rows beyond the mask are irrelevant for the valid queries
    np.testing.assert_allclose(np.asarray(out)[:, :, :28],
                               np.asarray(ref)[:, :, :28], atol=2e-5)


def test_sequence_parallel_knob_in_transformer(seq_mesh):
    """MultiHeadAttention routes through ulysses when the registry mesh has a
    seq axis and the module sets sequence_parallel."""
    from antmmf_tpu.common.registry import registry
    from antmmf_tpu.modules.attention import MultiHeadAttention

    registry.register("mesh", seq_mesh)
    try:
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 33, 48), F32)
        mha_sp = MultiHeadAttention(num_heads=12, dtype=F32,
                                    sequence_parallel="ulysses")
        mha = MultiHeadAttention(num_heads=12, dtype=F32)
        variables = mha_sp.init(jax.random.PRNGKey(1), x)
        out_sp = mha_sp.apply(variables, x)
        out = mha.apply(variables, x)
        np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out),
                                   atol=2e-5)
    finally:
        registry.unregister("mesh")


def test_m2_encoder_surfaces_frac_tokens_dropped():
    """The GShard capacity-overflow telemetry must reach model metrics
    (bench_moe.py's headline; reference moe_layer.py:121-290)."""
    import jax
    import jax.numpy as jnp

    from antmmf_tpu.models.m2_encoder import M2Encoder

    model = M2Encoder(preset="m2_tiny_test", image_size=32, patch_size=16,
                      vocab_size=100, embed_dim_out=16, moe_layers=(1,),
                      moe_num_experts=4, dtype_str="float32")
    rng = jax.random.PRNGKey(0)
    batch = {"image": jax.random.normal(rng, (4, 32, 32, 3)),
             "input_ids": jnp.ones((4, 8), jnp.int32),
             "input_mask": jnp.ones((4, 8), jnp.int32)}
    variables = model.init(rng, batch)
    out = model.apply(variables, batch)
    assert "frac_tokens_dropped" in out["metrics"]
    fd = float(out["metrics"]["frac_tokens_dropped"])
    assert 0.0 <= fd <= 1.0
    assert "moe_aux_loss" in out["losses"]
