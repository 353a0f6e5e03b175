"""Decoder-path sequence parallelism: GQA-native causal ring attention and
the DecoderLM `sequence_parallel` knob.

The reference has NO long-context machinery (SURVEY §2.3 mandates SP as
first-class anyway); the workload is the reference's long-video LLM training
(/root/reference/prj/M2_omni/models/modeling_llama_3d.py:1 — multi-frame
vision-token streams on A100-80GB nodes). These tests pin SP numerics
bisect-style against the single-device dense path on the 8-way virtual CPU
mesh, matching tests/test_sharding_equivalence.py's contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from antmmf_tpu.common.registry import registry
from antmmf_tpu.modules.attention import xla_attention_core
from antmmf_tpu.modules.llm import DecoderLM
from antmmf_tpu.parallel.long_context import ring_attention, ulysses_attention
from antmmf_tpu.parallel.mesh import build_mesh

F32 = jnp.float32


@pytest.fixture(scope="module")
def seq_mesh():
    return build_mesh({"seq": 8})


def _gqa_qkv(B=2, Hq=8, Hkv=2, L=32, D=16):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, Hq, L, D), F32)
    k = jax.random.normal(ks[1], (B, Hkv, L, D), F32)
    v = jax.random.normal(ks[2], (B, Hkv, L, D), F32)
    return q, k, v


def _dense_ref(q, k, v, kv_mask=None, causal=True):
    rep = q.shape[1] // k.shape[1]
    if rep > 1:
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    L = q.shape[2]
    bias = jnp.zeros((q.shape[0], 1, 1, k.shape[2]), F32)
    if kv_mask is not None:
        bias = jnp.where(kv_mask > 0, 0.0, -1e30)[:, None, None, :]
    if causal:
        cb = jnp.where(jnp.arange(L)[None, :] > jnp.arange(L)[:, None],
                       -1e30, 0.0)[None, None]
        bias = bias + cb
    return xla_attention_core(q, k, v, bias=bias)


def test_ring_gqa_causal_matches_dense(seq_mesh):
    q, k, v = _gqa_qkv()
    out = ring_attention(q, k, v, seq_mesh, causal=True)
    ref = _dense_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_gqa_with_padding_bias(seq_mesh):
    q, k, v = _gqa_qkv()
    mask = jnp.ones((2, 32)).at[:, -5:].set(0)
    bias = jnp.where(mask > 0, 0.0, -1e30)[:, None, None, :]
    out = ring_attention(q, k, v, seq_mesh, bias=bias, causal=True)
    ref = _dense_ref(q, k, v, kv_mask=mask)
    np.testing.assert_allclose(np.asarray(out)[:, :, :27],
                               np.asarray(ref)[:, :, :27], atol=2e-5)


def test_ring_gqa_odd_sequence_length(seq_mesh):
    q, k, v = _gqa_qkv(L=29)
    out = ring_attention(q, k, v, seq_mesh, causal=True)
    ref = _dense_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ulysses_causal_matches_dense(seq_mesh):
    q, k, v = _gqa_qkv(Hq=8, Hkv=8)
    out = ulysses_attention(q, k, v, seq_mesh, causal=True)
    ref = _dense_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def _lm(sp="none", **kw):
    return DecoderLM(num_layers=2, num_heads=4, num_kv_heads=2,
                     sequence_parallel=sp, dtype=F32, **kw)


def _lm_inputs(B=2, L=24, C=32):
    ks = jax.random.split(jax.random.PRNGKey(3), 2)
    embeds = jax.random.normal(ks[0], (B, L, C), F32)
    positions = jnp.tile(jnp.arange(L)[None], (B, 1))
    mask = jnp.ones((B, L)).at[:, -4:].set(0)
    return embeds, positions, mask


@pytest.mark.parametrize("mode", ["ring", "ulysses"])
def test_decoder_lm_sp_matches_single_device(seq_mesh, mode):
    """Same params: SP forward == dense forward (the bisect contract)."""
    embeds, positions, mask = _lm_inputs()
    dense = _lm()
    variables = dense.init(jax.random.PRNGKey(0), embeds, positions, mask)
    ref = dense.apply(variables, embeds, positions, mask)
    registry.register("mesh", seq_mesh)
    try:
        out = _lm(mode).apply(variables, embeds, positions, mask)
    finally:
        registry.unregister("mesh")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_decoder_lm_sp_grads_match(seq_mesh):
    """Gradients through the ring (ppermute chain + online softmax) match the
    dense path — SP must be trainable, not inference-only."""
    embeds, positions, mask = _lm_inputs(L=16)
    dense = _lm()
    variables = dense.init(jax.random.PRNGKey(0), embeds, positions, mask)

    def loss(params, model):
        out = model.apply({"params": params}, embeds, positions, mask)
        return jnp.sum(out ** 2)

    g_ref = jax.grad(loss)(variables["params"], dense)
    registry.register("mesh", seq_mesh)
    try:
        g_sp = jax.grad(loss)(variables["params"], _lm("ring"))
    finally:
        registry.unregister("mesh")
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_sp = {jax.tree_util.keystr(p): l
               for p, l in jax.tree_util.tree_leaves_with_path(g_sp)}
    for path, leaf in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_sp[jax.tree_util.keystr(path)]),
            np.asarray(leaf), atol=5e-4,
            err_msg=jax.tree_util.keystr(path))


def test_decoder_lm_sp_with_remat_and_scan(seq_mesh):
    """SP composes with the production memory structure (scan_layers+remat)."""
    embeds, positions, mask = _lm_inputs()
    dense = _lm()
    variables = dense.init(jax.random.PRNGKey(0), embeds, positions, mask)
    ref = dense.apply(variables, embeds, positions, mask)
    from antmmf_tpu.modules.llm import stack_decoder_layers

    stacked = {"params": stack_decoder_layers(variables["params"])}
    registry.register("mesh", seq_mesh)
    try:
        out = _lm("ring", remat=True, scan_layers=True).apply(
            stacked, embeds, positions, mask)
    finally:
        registry.unregister("mesh")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_decoder_lm_sp_decode_stays_data_parallel(seq_mesh):
    """KV-cache decode ignores the SP knob (decode is cache-HBM-bound; there
    is no sequence to shard) — generation works unchanged under a seq mesh."""
    embeds, positions, mask = _lm_inputs(B=2, L=8)
    model = _lm("ring")
    dense = _lm()
    variables = dense.init(jax.random.PRNGKey(0), embeds, positions, mask)
    cache = dense.make_cache(2, 16, 32, dtype=F32)
    registry.register("mesh", seq_mesh)
    try:
        h_sp, cache_sp = model.apply(variables, embeds, positions, mask,
                                     cache=cache)
    finally:
        registry.unregister("mesh")
    h_ref, cache_ref = dense.apply(variables, embeds, positions, mask,
                                   cache=cache)
    np.testing.assert_allclose(np.asarray(h_sp), np.asarray(h_ref), atol=2e-5)
