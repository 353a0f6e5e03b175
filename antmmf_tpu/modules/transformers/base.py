"""Generic transformer encoder stack (pre-LN and post-LN variants).

Reference parity: ``/root/reference/antmmf/modules/transformers/base.py:20-516``
(generic encoder/decoder layers). Post-LN matches BERT towers, pre-LN matches
ViT/CLIP towers; both share the attention core (Pallas/XLA swappable) and the
fp32-norm dtype policy. Rematerialisation (gradient checkpointing) wraps whole
layers via ``nn.remat`` when ``remat`` is set — the jax.checkpoint equivalent of
the reference's per-encoder torch.utils.checkpoint flags
(``antmmf/modules/encoders/visual_encoder.py:180-207``).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from antmmf_tpu.modules.attention import MultiHeadAttention
from antmmf_tpu.modules.layers import DropPath, LayerNorm, Mlp

Dtype = Any


class TransformerLayer(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    drop_path: float = 0.0
    activation: str = "gelu"
    norm_style: str = "pre"  # pre (ViT/CLIP) | post (BERT)
    layer_norm_eps: float = 1e-5
    use_pallas: bool = True
    sequence_parallel: str = "none"  # none | ulysses | ring (seq mesh axis)
    sow_attention: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        kv: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_attention: bool = False,
    ):
        attn = MultiHeadAttention(
            num_heads=self.num_heads, dropout=self.dropout, use_pallas=self.use_pallas,
            sequence_parallel=self.sequence_parallel,
            sow_attention=self.sow_attention,
            dtype=self.dtype, param_dtype=self.param_dtype, name="attention",
        )
        mlp = Mlp(
            hidden_dim=int(x.shape[-1] * self.mlp_ratio), activation=self.activation,
            dropout=self.dropout, dtype=self.dtype, param_dtype=self.param_dtype,
            name="mlp",
        )
        ln1 = LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="norm1")
        ln2 = LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="norm2")
        dp = DropPath(self.drop_path)

        probs = None

        def run_attn(h):
            nonlocal probs
            out = attn(h, kv=kv, bias=bias, deterministic=deterministic,
                       return_probs=return_attention)
            if return_attention:
                out, probs = out
            return out

        if self.norm_style == "pre":
            x = x + dp(run_attn(ln1(x)), deterministic=deterministic)
            x = x + dp(mlp(ln2(x), deterministic=deterministic),
                       deterministic=deterministic)
        else:  # post-LN (BERT)
            x = ln1(x + dp(run_attn(x), deterministic=deterministic))
            x = ln2(x + dp(mlp(x, deterministic=deterministic),
                           deterministic=deterministic))
        if return_attention:
            return x, probs
        return x


class _ScanLayerBody(TransformerLayer):
    """TransformerLayer in scan calling convention: carry → (carry, None)."""

    def __call__(self, carry, bias=None, kv=None, deterministic=True):
        from antmmf_tpu.parallel.partitioning import shard_batch_dim

        # 2D boundary layout (data on batch, fsdp on features): keeps the
        # scan carry sharded and the backward kernel-grad reshard a pure
        # data-axis gather (see TransformerEncoder loop / MULTICHIP r4)
        return super().__call__(shard_batch_dim(carry, feature=True),
                                bias, kv, deterministic), None


class TransformerEncoder(nn.Module):
    """N identical layers; optional final LN (pre-LN style) and remat.

    ``scan_layers`` folds the stack into one ``nn.scan`` — a single compiled
    layer body regardless of depth (the compile-time lever for 24–48-layer
    1B/10B configs). Params then carry a leading stage dim (``layers/...``
    [N, ...]) instead of per-layer names, so keep it off when importing
    per-layer external checkpoints; drop_path is uniform under scan.
    """

    num_layers: int
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    drop_path: float = 0.0
    activation: str = "gelu"
    norm_style: str = "pre"
    layer_norm_eps: float = 1e-5
    final_norm: bool = True
    remat: bool = False
    scan_layers: bool = False
    pipeline_stages: int = 1  # GPipe over the `model` mesh axis (needs scan)
    pipeline_microbatches: int = 4
    # ToMe (arXiv:2210.09461): merge r similar tokens between blocks —
    # plain-layer path only, self-attention without padding bias (images)
    token_merge_r: int = 0
    use_pallas: bool = True
    sequence_parallel: str = "none"
    sow_attention: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_importance: bool = False,
    ):
        layer_cls = TransformerLayer
        if self.remat:
            layer_cls = nn.remat(TransformerLayer, static_argnums=(4,))
        if return_importance:
            assert not (self.remat or self.scan_layers), \
                "return_importance needs the plain layer path"
        common = dict(
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            dropout=self.dropout, activation=self.activation,
            norm_style=self.norm_style, layer_norm_eps=self.layer_norm_eps,
            use_pallas=self.use_pallas,
            sequence_parallel=self.sequence_parallel,
            sow_attention=self.sow_attention, dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        if self.token_merge_r > 0:
            assert not self.scan_layers and self.pipeline_stages == 1, \
                "token_merge_r changes the token count per layer — " \
                "incompatible with scan_layers/pipeline_stages"
        if self.scan_layers:
            scanned = nn.scan(
                _ScanLayerBody,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                length=self.num_layers,
            )(drop_path=self.drop_path, name="layers", **common)
            if self.pipeline_stages > 1 and not self.is_initializing():
                x = self._pipelined(x, bias, deterministic, common)
            else:
                x, _ = scanned(x, bias, None, deterministic)
        else:
            if self.token_merge_r > 0:
                assert bias is None and not return_importance, \
                    "token_merge_r needs bias-free self-attention (images)"
                from antmmf_tpu.modules.vision.token_merging import tome_merge

                tome_size = jnp.ones(x.shape[:2], jnp.float32)
                # proportional attention (ToMe §3): keys score + log(size)
                # so a size-s merged token attracts attention like the s
                # tokens it stands for; size 1 everywhere → bias 0
                bias = jnp.log(tome_size)[:, None, None, :]
            # linearly scaled stochastic depth across layers
            importance = None
            for i in range(self.num_layers):
                rate = self.drop_path * i / max(1, self.num_layers - 1)
                layer = layer_cls(drop_path=rate, name=f"layer_{i}", **common)
                if return_importance:
                    x, probs = layer(x, bias, None, deterministic, True)
                    # reference word importance (univl_video_base.py:138-143):
                    # per-layer mean over heads, summed over query positions,
                    # accumulated across layers → [B, L]
                    contrib = probs.mean(axis=1).sum(axis=1)
                    importance = contrib if importance is None \
                        else importance + contrib
                else:
                    if self.remat:
                        # keep the remat-saved layer boundary sharded —
                        # 2D (data on batch, fsdp on features): the layout
                        # whose backward reshard toward fsdp-sharded kernel
                        # grads needs no transposed-order hop, so GSPMD
                        # never falls back to involuntary full
                        # rematerialization (MULTICHIP r4 tail; measured 0
                        # warnings, identical loss)
                        from antmmf_tpu.parallel.partitioning import (
                            shard_batch_dim)

                        x = shard_batch_dim(x, feature=True)
                    x = layer(x, bias, None, deterministic)
                    if self.token_merge_r > 0 and i < self.num_layers - 1:
                        x, tome_size = tome_merge(
                            x, tome_size, self.token_merge_r)
                        bias = jnp.log(tome_size)[:, None, None, :]
        if self.final_norm and self.norm_style == "pre":
            x = LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="final_norm")(x)
        if return_importance:
            return x, importance
        return x

    def _pipelined(self, x, bias, deterministic, common):
        """GPipe the scanned layer stack over the ``model`` mesh axis.

        The ``layers`` params already carry a leading [num_layers] dim
        (scan_layers); reshaping to [S, L/S, ...] makes each mesh slice own
        a contiguous block of layers, and ``parallel/pipeline.pipeline_apply``
        streams microbatches through the ring (attention bias rides along as
        a per-microbatch aux input). Numerics match the sequential scan.
        """
        import jax as _jax

        from antmmf_tpu.common.registry import registry as _reg
        from antmmf_tpu.parallel.pipeline import (
            pipeline_apply,
            split_microbatches,
        )

        S = self.pipeline_stages
        mesh = _reg.get("mesh", default=None)
        if mesh is None or mesh.shape.get("model", 1) != S:
            raise ValueError(
                f"pipeline_stages={S} needs a mesh with a model axis of "
                f"size {S} registered (got "
                f"{None if mesh is None else dict(mesh.shape)})")
        if self.num_layers % S:
            raise ValueError(
                f"num_layers {self.num_layers} not divisible by "
                f"pipeline_stages {S}")
        assert deterministic or self.dropout == 0.0, \
            "pipelined encoder path has no dropout rng plumbing"

        params = self.variables["params"]["layers"]  # leaves [N, ...]
        per = self.num_layers // S
        staged = _jax.tree_util.tree_map(
            lambda t: t.reshape((S, per) + t.shape[1:]), params)

        body = nn.scan(
            _ScanLayerBody,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
            length=per,
        )(drop_path=self.drop_path, **common)

        def stage_fn(p, h, a=None):
            out, _ = body.apply({"params": p}, h, a, None, True)
            return out

        M = min(self.pipeline_microbatches, x.shape[0])
        mbs = split_microbatches(x, M)
        aux = split_microbatches(bias, M) if bias is not None else None
        out = pipeline_apply(stage_fn, staged, mbs, mesh, axis="model",
                             aux=aux)
        return out.reshape(x.shape)
