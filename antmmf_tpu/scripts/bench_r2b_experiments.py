"""Round-2b TPU throughput experiments: MFU headroom candidates.

Measures the flagship retrieval train step under two HBM-traffic
optimisations the round-2 sweep didn't cover:

1. **Fused QKV projection** — one [C, 3·inner] GEMM instead of three
   [C, inner] GEMMs for self-attention (reads the activations from HBM
   once instead of three times per attention block; 24 blocks per step).
   Measured via a monkeypatched ``MultiHeadAttention.__call__`` (fresh
   init, so the experiment's param naming doesn't matter).
2. **bf16 first moment** — ``optax.adamw(mu_dtype=bfloat16)`` halves the
   read+write traffic of the Adam mu buffer (~150M params → ~1.2 GB/step
   saved at B=32).

Prints one JSON line per experiment. Run on the real chip in background:
``PYTHONPATH=/root/repo:/root/.axon_site python -m antmmf_tpu.scripts.bench_r2b_experiments``
"""

from __future__ import annotations

import json

from antmmf_tpu.scripts.bench_r2_experiments import (
    RETRIEVAL,
    build,
    flops_of,
    make_batch,
    timed_steps,
)

_orig_attn_call = None


def _patch_fused_qkv():
    global _orig_attn_call
    import flax.linen as nn
    import functools

    from antmmf_tpu.modules import attention as attn_mod
    from antmmf_tpu.modules.attention import attention_core

    _orig_attn_call = attn_mod.MultiHeadAttention.__call__

    @nn.compact
    def fused_call(self, x, kv=None, bias=None, deterministic=True,
                   return_probs=False):
        import jax.numpy as jnp

        is_self = kv is None
        kv = x if kv is None else kv
        C = x.shape[-1]
        head_dim = self.head_dim or C // self.num_heads
        inner = self.num_heads * head_dim
        dense = functools.partial(
            nn.Dense, dtype=self.dtype, param_dtype=self.param_dtype)

        def heads(t):
            B, L, _ = t.shape
            return t.reshape(B, L, self.num_heads, head_dim).transpose(
                0, 2, 1, 3)

        if is_self:
            qkv = dense(3 * inner, name="qkv_proj")(x)
            q, k, v = (heads(t) for t in jnp.split(qkv, 3, axis=-1))
        else:
            q = heads(dense(inner, name="q_proj")(x))
            k = heads(dense(inner, name="k_proj")(kv))
            v = heads(dense(inner, name="v_proj")(kv))
        out = attention_core(q, k, v, bias=bias, use_pallas=self.use_pallas)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        B, H, Lq, D = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, H * D)
        out = dense(self.out_dim or C, name="out_proj")(out)
        if return_probs:
            return out, None
        return out

    from flax.linen.module import wrap_method_once

    attn_mod.MultiHeadAttention.__call__ = wrap_method_once(fused_call)


def _unpatch_fused_qkv():
    from antmmf_tpu.modules import attention as attn_mod

    if _orig_attn_call is not None:
        attn_mod.MultiHeadAttention.__call__ = _orig_attn_call


def run(tag, batch_size=32, fused_qkv=False, mu_dtype=None,
        fused_prod=False):
    import jax

    if fused_prod:
        # production path: param-compatible runtime-concat fused QKV
        # (modules/attention.py fuse_qkv flag)
        from antmmf_tpu.modules import attention as attn_mod

        attn_mod.FUSE_QKV_DEFAULT = True
    if fused_qkv:
        _patch_fused_qkv()
    try:
        host = make_batch(batch_size, 8, 224)
        cfg = {"univl_retrieval": dict(RETRIEVAL["univl_retrieval"])}
        opt = {"lr": 5e-5, "weight_decay": 0.01}
        if mu_dtype is not None:
            opt["mu_dtype"] = mu_dtype
        step, state, sharding, _ = build(cfg, host, opt_params=opt)
        dbatch = jax.device_put(host, sharding)
        fl = flops_of(step, state, dbatch)
        dt, _ = timed_steps(step, state, dbatch)
        cps = batch_size / dt / len(jax.devices())
        print(json.dumps({
            "exp": tag, "batch": batch_size,
            "ms_per_step": round(dt * 1e3, 2),
            "clips_per_sec_per_chip": round(cps, 1),
            "tflops_per_step": round(fl / 1e12, 3),
            "achieved_tflops": round(fl / dt / 1e12, 1),
        }), flush=True)
    finally:
        if fused_qkv:
            _unpatch_fused_qkv()
        if fused_prod:
            from antmmf_tpu.modules import attention as attn_mod

            attn_mod.FUSE_QKV_DEFAULT = False


def main():
    import jax

    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "backend": jax.default_backend()}), flush=True)
    for tag, kw in (
        ("r2b_baseline_b32", {}),
        ("r2b_fused_qkv", {"fused_qkv": True}),
        ("r2b_mu_bf16", {"mu_dtype": "bfloat16"}),
        ("r2b_fused_qkv_mu_bf16", {"fused_qkv": True,
                                   "mu_dtype": "bfloat16"}),
        ("r2b_fused_prod_concat", {"fused_prod": True}),
    ):
        try:
            run(tag, **kw)
        except Exception as e:
            print(json.dumps({"exp_error": tag, "type": type(e).__name__,
                              "msg": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
