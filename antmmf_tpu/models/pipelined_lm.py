"""Pipeline-parallel transformer LM: GPipe stages as a registered model.

The reference has no pipeline parallelism (SURVEY.md §2.3 — design-in-anyway).
Round 1 shipped the GPipe substrate (``parallel/pipeline.py``) exercised only on
a toy block; this model makes PP **requestable from YAML** on a real causal
transformer:

    model_attributes:
      pipelined_lm:
        {vocab_size, embed_dim, num_heads, num_stages, layers_per_stage,
         num_microbatches}
    training_parameters:
      mesh: {model: <num_stages>, data: ...}

Stage parameters are explicit stacked tensors with leading dim S — created
directly via ``self.param`` so the standard trainer/optimizer/checkpoint path
sees one ordinary param tree; ``parallel/pipeline.pipeline_apply`` shards the
stage dim over the ``model`` axis and drives microbatches through the ring.
The stage math (pre-LN causal attention + GELU MLP) is written as pure jnp on
the packed tensors — one stage's weights never leave its mesh slice.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.models.base_model import BaseModel
from antmmf_tpu.parallel.pipeline import pipeline_apply, split_microbatches


def _stage_forward(params: Mapping[str, jnp.ndarray], x: jnp.ndarray,
                   num_heads: int) -> jnp.ndarray:
    """Apply this stage's ``layers_per_stage`` pre-LN causal blocks.

    params leaves: [L_stage, ...] packed per-layer tensors.
    x: [mb, T, C].
    """
    L = params["wq"].shape[0]
    T = x.shape[1]
    causal = jnp.where(
        jnp.arange(T)[None, :] > jnp.arange(T)[:, None], -1e30, 0.0)

    def ln(x, scale, bias):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        return ((xf - mu) / jnp.sqrt(var + 1e-5) * scale + bias).astype(x.dtype)

    def layer(x, p):
        h = ln(x, p["ln1_s"], p["ln1_b"])
        B, T, C = h.shape
        hd = C // num_heads

        def heads(t):
            return t.reshape(B, T, num_heads, hd).transpose(0, 2, 1, 3)

        q = heads(h @ p["wq"])
        k = heads(h @ p["wk"])
        v = heads(h @ p["wv"])
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * hd ** -0.5
        probs = jax.nn.softmax(s + causal[None, None], -1).astype(x.dtype)
        att = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        att = att.transpose(0, 2, 1, 3).reshape(B, T, C) @ p["wo"]
        x = x + att
        h = ln(x, p["ln2_s"], p["ln2_b"])
        h = jax.nn.gelu((h @ p["w1"]) + p["b1"], approximate=True)
        return x + (h @ p["w2"]) + p["b2"], None

    x, _ = jax.lax.scan(layer, x, params)
    return x


@registry.register_model("pipelined_lm")
class PipelinedDecoderLM(BaseModel):
    """Causal LM whose transformer stack runs as a GPipe pipeline over the
    ``model`` mesh axis."""

    vocab_size: int = 30522
    embed_dim: int = 256
    num_heads: int = 4
    num_stages: int = 2
    layers_per_stage: int = 2
    num_microbatches: int = 4
    max_len: int = 128
    mlp_ratio: float = 4.0
    dtype_str: str = "bfloat16"

    def setup(self) -> None:
        C = self.embed_dim
        S, L = self.num_stages, self.layers_per_stage
        hid = int(C * self.mlp_ratio)
        init = nn.initializers.normal(0.02)
        zeros, ones = nn.initializers.zeros, nn.initializers.ones
        # packed stage params: leading dims [S, L, ...]
        self.stages = {
            "wq": self.param("wq", init, (S, L, C, C), jnp.float32),
            "wk": self.param("wk", init, (S, L, C, C), jnp.float32),
            "wv": self.param("wv", init, (S, L, C, C), jnp.float32),
            "wo": self.param("wo", init, (S, L, C, C), jnp.float32),
            "w1": self.param("w1", init, (S, L, C, hid), jnp.float32),
            "b1": self.param("b1", zeros, (S, L, hid), jnp.float32),
            "w2": self.param("w2", init, (S, L, hid, C), jnp.float32),
            "b2": self.param("b2", zeros, (S, L, C), jnp.float32),
            "ln1_s": self.param("ln1_s", ones, (S, L, C), jnp.float32),
            "ln1_b": self.param("ln1_b", zeros, (S, L, C), jnp.float32),
            "ln2_s": self.param("ln2_s", ones, (S, L, C), jnp.float32),
            "ln2_b": self.param("ln2_b", zeros, (S, L, C), jnp.float32),
        }
        self.embed = nn.Embed(self.vocab_size, C, param_dtype=jnp.float32,
                              name="word_embeddings")
        self.pos = self.param("pos_embedding", init, (self.max_len, C),
                              jnp.float32)
        self.final_norm = nn.LayerNorm(name="final_norm")

    def __call__(self, batch: Mapping[str, Any],
                 deterministic: bool = True) -> Dict[str, Any]:
        from antmmf_tpu.common.registry import registry as _reg

        ids = batch["input_ids"]
        B, T = ids.shape
        x = self.embed(ids) + self.pos[None, :T]
        mesh = _reg.get("mesh", default=None)
        dtype = jnp.dtype(self.dtype_str)
        x = x.astype(dtype)

        if mesh is not None and mesh.shape.get("model", 1) == self.num_stages \
                and self.num_stages > 1:
            mbs = split_microbatches(x, self.num_microbatches)
            out = pipeline_apply(
                lambda p, h: _stage_forward(p, h, self.num_heads),
                self.stages, mbs, mesh, axis="model")
            x = out.reshape(B, T, -1)
        else:  # single-path fallback: run stages sequentially
            for s in range(self.num_stages):
                p = jax.tree_util.tree_map(lambda t, _s=s: t[_s], self.stages)
                x = _stage_forward(p, x, self.num_heads)

        x = self.final_norm(x.astype(jnp.float32))
        logits = x @ self.embed.embedding.T  # tied decoder
        output: Dict[str, Any] = {"logits": logits}
        if "lm_targets" in batch or True:
            # next-token LM loss over the shifted sequence
            targets = ids[:, 1:]
            logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
            nll = -jnp.take_along_axis(logp, targets[..., None], -1)[..., 0]
            mask = batch.get("input_mask")
            if mask is not None:
                m = mask[:, 1:].astype(jnp.float32)
                loss = (nll * m).sum() / jnp.maximum(m.sum(), 1.0)
            else:
                loss = nll.mean()
            output["losses"] = {"lm_loss": loss}
        return output
