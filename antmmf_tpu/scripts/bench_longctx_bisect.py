"""Bisect the long-video compile failure: which sub-graph kills the
remote TPU compile at ~10k-token streams when the flash kernel alone
compiles and runs (bench_flash_long)?

Legs (each its own jit; one JSON line each, errors recorded per leg):
  flash_bias    — causal flash fwd+bwd WITH a key-padding bias row (the
                  model passes one; the microbench that passed did not)
  decoder       — DecoderLM forward+bwd at [1, L, 2048] (omni_1b config),
                  key-padding mask, no vision/splice/loss
  decoder_loss  — decoder + lm_head + masked LM loss (adds the [1, L, V]
                  f32 logits/log_softmax pair)
  tower_splice  — 48-frame ViT tower + _splice_embeds + 3D positions only
                  (no decoder)

Usage: python -m antmmf_tpu.scripts.bench_longctx_bisect [--len 9920]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--len", dest="L", type=int, default=9920)
    ap.add_argument("--legs", default="flash_bias,decoder,decoder_loss,"
                                      "tower_splice")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    L = args.L
    print(json.dumps({"backend": jax.default_backend(), "L": L}), flush=True)

    def leg(name, fn, steps: int = 3):
        """Compile + TIME each sub-graph — the per-component wall table
        that attributes the B=1 long-video step time (round-5: the 3.5-5.6%
        'MFU' numbers undercount pallas custom-call flops, so wall
        attribution is the honest lens)."""
        try:
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            compile_s = time.perf_counter() - t0
            t1 = time.perf_counter()
            for _ in range(steps):
                out = fn()
            jax.block_until_ready(out)
            np.asarray(jax.tree_util.tree_leaves(out)[0])  # force via relay
            ms = (time.perf_counter() - t1) / steps * 1e3
            print(json.dumps({"leg": name, "ok": True,
                              "compile_s": round(compile_s, 1),
                              "ms_per_call": round(ms, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"leg": name, "ok": False,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)

    legs = args.legs.split(",")

    if "flash_bias" in legs:
        from antmmf_tpu.ops.pallas.flash_attention import flash_attention

        q = jax.random.normal(jax.random.PRNGKey(0), (1, 16, L, 128),
                              jnp.bfloat16)
        bias = jnp.zeros((1, L), jnp.float32).at[:, -64:].set(-1e30)

        def loss(q):
            return flash_attention(q, q, q, bias=bias, causal=True).astype(
                jnp.float32).sum()

        jf = jax.jit(jax.grad(loss))
        leg("flash_bias", lambda: jf(q))

    if "decoder" in legs or "decoder_loss" in legs:
        from antmmf_tpu.models.m2_omni import LM_PRESETS
        from antmmf_tpu.modules.llm import DecoderLM

        p = LM_PRESETS["omni_1b"]
        dec = DecoderLM(num_layers=p["num_layers"], num_heads=p["num_heads"],
                        num_kv_heads=p["num_kv_heads"], rope_3d=True,
                        dtype=jnp.bfloat16)
        embeds = jax.random.normal(jax.random.PRNGKey(1),
                                   (1, L, p["hidden"]), jnp.bfloat16)
        positions = jnp.broadcast_to(
            jnp.arange(L, dtype=jnp.int32)[None, :, None], (1, L, 3))
        mask = jnp.ones((1, L), jnp.int32)
        dvars = dec.init(jax.random.PRNGKey(2), embeds[:, :8],
                         positions[:, :8], mask[:, :8])

        if "decoder" in legs:
            def dloss(v, emb):
                return dec.apply(v, emb, positions, mask).astype(
                    jnp.float32).sum()

            jd = jax.jit(jax.grad(dloss, argnums=1))
            leg("decoder", lambda: jd(dvars, embeds))

        if "decoder_loss" in legs:
            V = p["vocab_size"]
            head = jax.random.normal(jax.random.PRNGKey(3),
                                     (p["hidden"], V), jnp.bfloat16) * 0.02
            labels = jnp.ones((1, L), jnp.int32)

            def dlloss(v, emb, head):
                h = dec.apply(v, emb, positions, mask)
                logits = (h @ head).astype(jnp.float32)
                logp = jax.nn.log_softmax(logits, -1)
                nll = -jnp.take_along_axis(logp, labels[..., None],
                                           -1)[..., 0]
                return nll.mean()

            jdl = jax.jit(jax.grad(dlloss, argnums=1))
            leg("decoder_loss", lambda: jdl(dvars, embeds, head))

    if "tower_splice" in legs:
        from antmmf_tpu.models.base_model import build_model

        shell = build_model({"model_attributes": {"m2_omni": {
            "lm_preset": "omni_1b", "vit_preset": "vit_base_patch16",
            "image_size": 224, "video_token_id": 3,
            "dtype_str": "bfloat16"}}})
        frames = max(1, (L - 256) // 196)
        n_vis = frames * 196
        ids = np.full((1, n_vis + 256), 7, np.int32)
        ids[0, :n_vis] = 3
        batch = {
            "video_data": np.random.default_rng(0).standard_normal(
                (1, frames, 224, 224, 3)).astype(np.float32),
            "input_ids": ids, "input_mask": np.ones_like(ids),
        }
        variables = shell.init(jax.random.PRNGKey(4), {
            "video_data": batch["video_data"][:, :1],
            "input_ids": ids[:, :8], "input_mask": ids[:, :8] * 0 + 1})

        def tloss(v, batch_):
            emb, pos, _ = shell.module.apply(
                v, batch_, jnp.asarray(batch_["input_ids"]),
                method=type(shell.module)._assemble_spliced,
                deterministic=True)
            return emb.astype(jnp.float32).sum() + pos.sum()

        jt = jax.jit(tloss)
        leg("tower_splice", lambda: jt(variables, batch))


if __name__ == "__main__":
    main()
