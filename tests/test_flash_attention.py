"""Flash attention (interpret mode on CPU) vs the XLA reference core."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from antmmf_tpu.modules.attention import xla_attention_core
from antmmf_tpu.ops.pallas.flash_attention import flash_attention


def _rand(shape, key):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def _kv_bias(mask):  # [B, Lk] 1/0 → additive
    return jnp.where(mask > 0, 0.0, -1e30).astype(jnp.float32)


@pytest.mark.parametrize("Lq,Lk", [(128, 128), (64, 192), (100, 130)])
def test_forward_matches_xla(Lq, Lk):
    B, H, D = 2, 3, 32
    q, k, v = _rand((B, H, Lq, D), 0), _rand((B, H, Lk, D), 1), _rand((B, H, Lk, D), 2)
    mask = jnp.ones((B, Lk)).at[:, Lk - 7:].set(0)
    bias4 = _kv_bias(mask)[:, None, None, :]
    ref = xla_attention_core(q, k, v, bias=bias4)
    out = flash_attention(q, k, v, bias=_kv_bias(mask), interpret=True,
                          block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_backward_matches_xla():
    B, H, Lq, Lk, D = 1, 2, 64, 96, 16
    q, k, v = _rand((B, H, Lq, D), 0), _rand((B, H, Lk, D), 1), _rand((B, H, Lk, D), 2)
    mask = jnp.ones((B, Lk)).at[:, -5:].set(0)
    bias4 = _kv_bias(mask)[:, None, None, :]

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, bias=_kv_bias(mask), interpret=True,
                              block_q=32, block_k=32)
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(q, k, v):
        out = xla_attention_core(q, k, v, bias=bias4)
        return jnp.sum(out * jnp.cos(out))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4,
                                   err_msg=f"d{name}")


def test_fully_masked_rows_are_safe():
    B, H, L, D = 1, 1, 32, 16
    q = _rand((B, H, L, D), 0)
    k = _rand((B, H, L, D), 1)
    v = _rand((B, H, L, D), 2)
    mask = jnp.zeros((B, L))  # everything masked
    out = flash_attention(q, k, v, bias=_kv_bias(mask), interpret=True,
                          block_q=32, block_k=32)
    assert np.isfinite(np.asarray(out)).all()


def test_causal_matches_xla():
    B, H, L, D = 1, 2, 96, 16
    q, k, v = _rand((B, H, L, D), 0), _rand((B, H, L, D), 1), _rand((B, H, L, D), 2)
    causal_bias = jnp.where(jnp.tril(jnp.ones((L, L), bool)), 0.0,
                            -1e30)[None, None]
    ref = xla_attention_core(q, k, v, bias=causal_bias)
    out = flash_attention(q, k, v, causal=True, interpret=True,
                          block_q=32, block_k=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_causal_backward_matches_xla():
    B, H, L, D = 1, 1, 64, 16
    q, k, v = _rand((B, H, L, D), 0), _rand((B, H, L, D), 1), _rand((B, H, L, D), 2)
    causal_bias = jnp.where(jnp.tril(jnp.ones((L, L), bool)), 0.0,
                            -1e30)[None, None]

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True, interpret=True,
                                       block_q=32, block_k=32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention_core(q, k, v, bias=causal_bias) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4,
                                   err_msg=f"d{name}")


def test_small_attention_matches_xla():
    """Fused short-sequence kernel (interpret mode): fwd+bwd exact vs XLA.
    Measured slower than XLA in its target regime on v5e (see
    attention._use_small_kernel) — kept as an explicit op."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    import antmmf_tpu.ops.pallas.small_attention as sa
    from antmmf_tpu.modules.attention import xla_attention_core

    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        B, H, L, D = 2, 4, 50, 32
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (jax.random.normal(kk, (B, H, L, D), jnp.float32)
                   for kk in ks)
        mask = jnp.ones((B, L)).at[:, -7:].set(0)
        bias = jnp.where(mask > 0, 0.0, -1e30)[:, None, None, :]
        ref = xla_attention_core(q, k, v, bias=bias)
        out = sa.small_attention(q, k, v, bias=bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

        def loss_of(fn):
            return jax.grad(lambda a, b, c: jnp.sum(
                fn(a, b, c, bias=bias) ** 2), argnums=(0, 1, 2))(q, k, v)

        for g_ref, g_out in zip(loss_of(xla_attention_core),
                                loss_of(sa.small_attention)):
            np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                                       atol=2e-4)
    finally:
        pl.pallas_call = orig


def test_grid_kernels_match_resident(monkeypatch):
    """The long-sequence 3-D grid kernels (selected past _RESIDENT_MAX_L,
    where the resident-KV form exceeds VMEM) must agree with the resident
    form — forward AND gradients, causal and not."""
    import antmmf_tpu.ops.pallas.flash_attention as fa

    B, H, L, D = 1, 2, 192, 32
    q, k, v = _rand((B, H, L, D), 3), _rand((B, H, L, D), 4), \
        _rand((B, H, L, D), 5)
    mask = jnp.ones((B, L)).at[:, L - 9:].set(0)

    def run(causal, bq=64, bk=64):
        def loss(q, k, v):
            return fa.flash_attention(
                q, k, v, bias=_kv_bias(mask), interpret=True,
                block_q=bq, block_k=bk, causal=causal).sum()

        out = fa.flash_attention(q, k, v, bias=_kv_bias(mask),
                                 interpret=True, block_q=bq, block_k=bk,
                                 causal=causal)
        grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        return out, grads

    for causal in (False, True):
        monkeypatch.setattr(fa, "_RESIDENT_MAX_L", 8192)
        ref_out, ref_grads = run(causal)
        monkeypatch.setattr(fa, "_RESIDENT_MAX_L", 64)  # force grid kernels
        # 64x64 explicit AND the long-L production config (512x512 — the
        # defaults are bumped to GRID_BLOCK_* past _RESIDENT_MAX_L, which
        # measured 8.6x over 128x128 on chip; blocks wider than L exercise
        # the padding path)
        for bq, bk in ((64, 64), (512, 512)):
            out, grads = run(causal, bq, bk)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                       rtol=2e-5, atol=2e-5)
            for g, rg in zip(grads, ref_grads):
                np.testing.assert_allclose(np.asarray(g), np.asarray(rg),
                                           rtol=2e-4, atol=2e-4)
