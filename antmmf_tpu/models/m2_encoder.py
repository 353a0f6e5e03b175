"""M2-Encoder: bilingual CLIP-scale contrastive model on a multiway transformer.

Reference parity: ``/root/reference/prj/M2_Encoder/`` — ``VLMo`` multiway
transformer (``vlmo/modules/multiway_transformer.py``: shared self-attention,
modality-specific FFN experts) with torchscale encoder + optional xMoE sparse
FFN (``vlmo/torchscale/component/xmoe/``), bilingual tokenization, and the
grouped-aggregation contrastive loss (README.md:16).

TPU design: one ``MultiwayTransformer`` stack processes image patches, text
tokens, or fused streams; each block's FFN is routed per-modality (dense
experts) or token-routed (MoELayer on the ``expert`` mesh axis) — scaling to
the 1B/10B configs via fsdp/model mesh axes + the chunked contrastive loss
(``antmmf_tpu/parallel/contrastive.py``).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.models.base_model import BaseModel
from antmmf_tpu.models.univl import l2_normalize
from antmmf_tpu.modules.attention import MultiHeadAttention
from antmmf_tpu.modules.embeddings import TextEmbeddings, VisualEmbeddings
from antmmf_tpu.modules.layers import LayerNorm, Mlp, make_attention_mask
from antmmf_tpu.modules.losses.contrastive import symmetric_cross_en
from antmmf_tpu.modules.moe import MoELayer
from antmmf_tpu.parallel.contrastive import chunked_symmetric_infonce

Dtype = Any

# modality ids routed to FFN experts
VISION_EXPERT, LANGUAGE_EXPERT, FUSION_EXPERT = 0, 1, 2

PRESETS = {
    "m2_encoder_0b4": dict(embed_dim=768, num_layers=12, num_heads=12),
    "m2_encoder_1b": dict(embed_dim=1280, num_layers=32, num_heads=16),
    "m2_encoder_10b": dict(embed_dim=2560, num_layers=48, num_heads=32),
    "m2_tiny_test": dict(embed_dim=64, num_layers=2, num_heads=2),
}


class MultiwayBlock(nn.Module):
    """Pre-LN block: shared attention, per-modality FFN experts (VLMo-style,
    reference multiway_transformer.py:118-243).

    Depth-parity features:
      * separate post-attention LayerNorm per expert (norm2_text / norm2_imag /
        norm2_vl in the reference);
      * LayerScale gammas (gamma_1/gamma_2) when ``layerscale_init`` > 0;
      * the FUSION stream: before ``with_vlffn`` engages, the first
        ``text_len`` tokens route to the language expert and the rest to the
        vision expert (reference :195-199); with_vlffn routes the whole fused
        stream through a dedicated VL expert (:202).
    """

    num_heads: int
    mlp_ratio: float = 4.0
    num_ffn_experts: int = 2  # vision + language (+ fusion when 3)
    with_vlffn: bool = False
    moe: bool = False
    moe_num_experts: int = 8
    moe_capacity_factor: float = 1.25
    moe_dispatch_mode: str = "scatter"
    layerscale_init: float = 0.0  # 0 disables LayerScale
    dropout: float = 0.0
    layer_norm_eps: float = 1e-5  # reference VLMo uses 1e-6
    ffn_activation: str = "gelu"  # VLMo torch nn.GELU = "gelu_exact"
    use_pallas: bool = True
    dtype: Dtype = jnp.bfloat16

    def _ffn(self, x: jnp.ndarray, expert: int,
             deterministic: bool) -> jnp.ndarray:
        h = LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                      name=f"norm2_expert_{expert}")(x)
        return Mlp(hidden_dim=int(x.shape[-1] * self.mlp_ratio),
                   activation=self.ffn_activation,
                   dropout=self.dropout, dtype=self.dtype,
                   name=f"ffn_expert_{expert}")(h, deterministic=deterministic)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        modality: int,  # static expert index for this stream
        bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        text_len: int = 0,  # static split point for the fusion stream
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        aux: Dict[str, jnp.ndarray] = {}
        C = x.shape[-1]
        if self.layerscale_init > 0:
            g1 = self.param("gamma_1", nn.initializers.constant(
                self.layerscale_init), (C,), jnp.float32)
            g2 = self.param("gamma_2", nn.initializers.constant(
                self.layerscale_init), (C,), jnp.float32)
        else:
            g1 = g2 = None

        h = LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                      name="norm1")(x)
        att = MultiHeadAttention(
            num_heads=self.num_heads, dropout=self.dropout,
            use_pallas=self.use_pallas, dtype=self.dtype, name="attention",
        )(h, bias=bias, deterministic=deterministic)
        if g1 is not None:
            att = att * g1.astype(att.dtype)
        x = x + att

        if self.moe:
            h = LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                          name="norm2_moe")(x)
            out, aux = MoELayer(
                num_experts=self.moe_num_experts,
                hidden_dim=int(C * self.mlp_ratio),
                capacity_factor=self.moe_capacity_factor,
                dispatch_mode=self.moe_dispatch_mode,
                dtype=self.dtype, name="moe_ffn",
            )(h, deterministic=deterministic)
        elif modality == FUSION_EXPERT and not self.with_vlffn:
            # early fused layers: segment-wise expert routing (:195-199)
            t = self._ffn(x[:, :text_len], LANGUAGE_EXPERT, deterministic)
            v = self._ffn(x[:, text_len:], VISION_EXPERT, deterministic)
            out = jnp.concatenate([t, v], axis=1)
        elif modality == FUSION_EXPERT:
            out = self._ffn(x, FUSION_EXPERT, deterministic)
        else:
            out = self._ffn(x, modality, deterministic)
        if g2 is not None:
            out = out * g2.astype(out.dtype)
        return x + out, aux


def multiway_runs(num_layers: int, moe_layers, vl_start: int):
    """Group consecutive blocks into maximal runs of identical static config
    ``(with_vlffn, moe)`` — the scan segmentation: each run of length > 1
    folds into one ``nn.scan`` body (params stacked under
    ``blocks_{start}_{end}`` with a leading run-length dim), singletons stay
    plain named blocks. Returns ``[(start, length, with_vlffn, moe), ...]``."""
    moe_set = set(moe_layers or ())
    runs = []
    i = 0
    while i < num_layers:
        key = (i >= vl_start, i in moe_set)
        j = i
        while j < num_layers and (j >= vl_start, j in moe_set) == key:
            j += 1
        runs.append((i, j - i) + key)
        i = j
    return runs


def stack_multiway_blocks(encoder_params, num_layers: int, moe_layers,
                          vl_start: int):
    """Convert per-block MultiwayTransformer params (``block_0..block_{N-1}``)
    into the ``scan_layers`` layout: runs of identical blocks (see
    ``multiway_runs``) become stacked ``blocks_{start}_{end}`` subtrees with
    a leading run-length dim; singleton runs keep their ``block_i`` name.
    Use after importing per-block external checkpoints (``convert_checkpoint
    --arch m2_encoder / vlmo_multiway``) when the target sets
    ``scan_layers: true``."""
    import jax as _jax
    import jax.numpy as _jnp

    out = {k: v for k, v in encoder_params.items()
           if not (k.startswith("block_") and k.split("_")[1].isdigit())}
    for start, n, _, _ in multiway_runs(num_layers, moe_layers, vl_start):
        if n == 1:
            out[f"block_{start}"] = encoder_params[f"block_{start}"]
            continue
        per = [encoder_params[f"block_{i}"] for i in range(start, start + n)]
        out[f"blocks_{start}_{start + n - 1}"] = _jax.tree_util.tree_map(
            lambda *leaves: _jnp.stack(leaves, axis=0), *per)
    return out


def stack_multiway_blocks_auto(encoder_params):
    """``stack_multiway_blocks`` without the model config: the run
    segmentation is inferred from each block's param STRUCTURE (vlffn adds
    the expert-2 ffn/norm params, moe swaps the ffn for ``moe_ffn``), which
    determines ``(with_vlffn, moe)`` exactly — consecutive ``block_i`` with
    identical leaf paths+shapes fold into one stacked run. Used by
    ``convert_checkpoint --scan_layers`` where only the checkpoint exists."""
    import jax as _jax
    import jax.numpy as _jnp

    idx = sorted(int(k.split("_")[1]) for k in encoder_params
                 if k.startswith("block_") and k.split("_")[1].isdigit())

    def sig(tree):
        return tuple(sorted(
            (_jax.tree_util.keystr(p), tuple(v.shape))
            for p, v in _jax.tree_util.tree_flatten_with_path(tree)[0]))

    out = {k: v for k, v in encoder_params.items()
           if not (k.startswith("block_") and k.split("_")[1].isdigit())}
    i = 0
    while i < len(idx):
        j = i
        s = sig(encoder_params[f"block_{idx[i]}"])
        while (j + 1 < len(idx) and idx[j + 1] == idx[j] + 1
               and sig(encoder_params[f"block_{idx[j + 1]}"]) == s):
            j += 1
        if j == i:
            out[f"block_{idx[i]}"] = encoder_params[f"block_{idx[i]}"]
        else:
            per = [encoder_params[f"block_{k}"] for k in idx[i:j + 1]]
            out[f"blocks_{idx[i]}_{idx[j]}"] = _jax.tree_util.tree_map(
                lambda *leaves: _jnp.stack(leaves, axis=0), *per)
        i = j + 1
    return out


class _ScanMultiwayBody(MultiwayBlock):
    """MultiwayBlock in scan calling convention: carry → (carry, aux) with
    the static call args (modality / deterministic / text_len) moved onto
    module attributes so the body stays remat-able under nn.scan without
    static_argnums plumbing."""

    modality: int = 0
    text_len: int = 0
    deterministic: bool = True

    def __call__(self, carry, bias=None):
        from antmmf_tpu.parallel.partitioning import shard_batch_dim

        return super().__call__(shard_batch_dim(carry), self.modality, bias,
                                self.deterministic, self.text_len)


class MultiwayTransformer(nn.Module):
    embed_dim: int
    num_layers: int
    num_heads: int
    mlp_ratio: float = 4.0
    moe_layers: Tuple[int, ...] = ()  # indices of blocks that use token-routed MoE
    moe_num_experts: int = 8
    moe_capacity_factor: float = 1.25
    moe_dispatch_mode: str = "scatter"
    num_ffn_experts: int = 2
    # fused (VL) streams use the dedicated VL expert from this layer on
    # (reference vlffn_start_layer_index, multiway_transformer.py:270-338);
    # -1 = last quarter of the stack (the VLMo default shape: 10 of 12)
    vlffn_start_layer: int = -1
    layerscale_init: float = 0.0
    dropout: float = 0.0
    layer_norm_eps: float = 1e-5
    ffn_activation: str = "gelu"
    use_pallas: bool = True
    # rematerialize each block (pod-scale pretraining batches don't fit
    # otherwise); saved block boundaries stay sharded via shard_batch_dim
    remat: bool = False
    # fold runs of identical blocks into nn.scan bodies (see multiway_runs):
    # per-device temp becomes O(one block) of gathered fsdp weights/grads
    # instead of O(whole stack) — a python loop lets XLA hoist every
    # all-gather and keep all grads live (the 10B AOT evidence, BASELINE
    # round 4). Params move under blocks_{start}_{end} with a leading
    # run-length dim; stack imported per-block checkpoints with
    # ``stack_multiway_blocks``.
    scan_layers: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, modality: int, bias=None, deterministic: bool = True,
                 text_len: int = 0):
        from antmmf_tpu.parallel.partitioning import shard_batch_dim

        vl_start = self.vlffn_start_layer if self.vlffn_start_layer >= 0 \
            else max(0, self.num_layers - max(1, self.num_layers // 6))
        aux_total: Dict[str, jnp.ndarray] = {}
        common = dict(
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            num_ffn_experts=self.num_ffn_experts,
            moe_num_experts=self.moe_num_experts,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_dispatch_mode=self.moe_dispatch_mode,
            layerscale_init=self.layerscale_init, dropout=self.dropout,
            layer_norm_eps=self.layer_norm_eps,
            ffn_activation=self.ffn_activation,
            use_pallas=self.use_pallas, dtype=self.dtype)
        if self.scan_layers:
            for start, n, vlffn, moe in multiway_runs(
                    self.num_layers, self.moe_layers, vl_start):
                if n == 1:
                    x, aux = MultiwayBlock(
                        with_vlffn=vlffn, moe=moe, name=f"block_{start}",
                        **common,
                    )(shard_batch_dim(x), modality, bias, deterministic,
                      text_len)
                    for k, v in aux.items():
                        aux_total[k] = aux_total.get(k, 0.0) + v
                    continue
                body_cls = (nn.remat(_ScanMultiwayBody, prevent_cse=False)
                            if self.remat else _ScanMultiwayBody)
                scanned = nn.scan(
                    body_cls,
                    variable_axes={"params": 0},
                    split_rngs={"params": True, "dropout": True},
                    in_axes=(nn.broadcast,),
                    length=n,
                )(with_vlffn=vlffn, moe=moe, modality=modality,
                  text_len=text_len, deterministic=deterministic,
                  name=f"blocks_{start}_{start + n - 1}", **common)
                x, aux = scanned(x, bias)
                for k, v in aux.items():
                    aux_total[k] = aux_total.get(k, 0.0) + jnp.sum(v)
            x = LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                          name="final_norm")(x)
            return x, aux_total
        # modality / deterministic / text_len are static python args
        block_cls = (nn.remat(MultiwayBlock, static_argnums=(2, 4, 5))
                     if self.remat else MultiwayBlock)
        for i in range(self.num_layers):
            if self.remat:
                x = shard_batch_dim(x)
            x, aux = block_cls(
                with_vlffn=(i >= vl_start), moe=(i in self.moe_layers),
                name=f"block_{i}", **common,
            )(x, modality, bias, deterministic, text_len)
            for k, v in aux.items():
                aux_total[k] = aux_total.get(k, 0.0) + v
        x = LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                      name="final_norm")(x)
        return x, aux_total


@registry.register_model("m2_encoder")
class M2Encoder(BaseModel):
    """Bilingual dual-use encoder: CLIP-style contrastive image/text towers
    sharing one multiway transformer."""

    preset: str = "m2_encoder_0b4"
    image_size: int = 224
    patch_size: int = 32
    vocab_size: int = 21128  # bilingual vocab (Chinese BERT default)
    max_text_len: int = 52
    embed_dim_out: int = 512
    moe_layers: Tuple[int, ...] = ()
    moe_num_experts: int = 8
    # GShard train capacity (silently defaulted before round 4 — YAML
    # moe_capacity_factor now actually reaches the router)
    moe_capacity_factor: float = 1.25
    moe_dispatch_mode: str = "scatter"
    aux_loss_weight: float = 0.01
    router_z_weight: float = 0.001
    use_chunked_loss: bool = False
    chunk_size: int = 1024
    init_logit_scale: float = 2.6592
    # fused VL stream + ITM ranking head (VLMo's second pretraining task);
    # vlffn_start_layer -1 = VLMo default shape (last ~1/6 of the stack)
    with_itm: bool = False
    vlffn_start_layer: int = -1
    layerscale_init: float = 0.0
    dropout: float = 0.0
    # reference VLMo numerics: eps 1e-6, torch nn.GELU (exact erf) — set
    # these when loading converted vlmo_multiway checkpoints
    # (tests/test_vlmo_parity.py proves the stack matches with them)
    layer_norm_eps: float = 1e-5
    ffn_activation: str = "gelu"
    use_pallas: bool = True
    # block-level remat for pod-scale batches (see MultiwayTransformer)
    remat: bool = False
    # scan runs of identical blocks (see MultiwayTransformer.scan_layers)
    scan_layers: bool = False
    dtype_str: str = "bfloat16"

    def setup(self) -> None:
        dtype = jnp.dtype(self.dtype_str)
        p = PRESETS[self.preset]
        self.width = p["embed_dim"]
        self.visual_embed = VisualEmbeddings(
            image_size=self.image_size, patch_size=self.patch_size,
            embed_dim=self.width, dropout=self.dropout, dtype=dtype)
        self.text_embed = TextEmbeddings(
            vocab_size=self.vocab_size, hidden_size=self.width,
            max_position_embeddings=512, dropout=self.dropout, dtype=dtype)
        self.encoder = MultiwayTransformer(
            embed_dim=self.width, num_layers=p["num_layers"],
            num_heads=p["num_heads"], moe_layers=self.moe_layers,
            moe_num_experts=self.moe_num_experts,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_dispatch_mode=self.moe_dispatch_mode,
            num_ffn_experts=3 if self.with_itm else 2,
            vlffn_start_layer=self.vlffn_start_layer,
            layerscale_init=self.layerscale_init, dropout=self.dropout,
            layer_norm_eps=self.layer_norm_eps,
            ffn_activation=self.ffn_activation,
            use_pallas=self.use_pallas, remat=self.remat, scan_layers=self.scan_layers, dtype=dtype)
        self.image_proj = nn.Dense(self.embed_dim_out, use_bias=False, dtype=dtype)
        self.text_proj = nn.Dense(self.embed_dim_out, use_bias=False, dtype=dtype)
        if self.with_itm:
            self.itm_head = nn.Dense(2, dtype=jnp.float32)
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(self.init_logit_scale), (),
            jnp.float32)

    def encode_image(self, images: jnp.ndarray, deterministic: bool = True):
        x = self.visual_embed(images, deterministic=deterministic)
        x, aux = self.encoder(x, VISION_EXPERT, None, deterministic)
        return l2_normalize(self.image_proj(x[:, 0])), aux

    def encode_text(self, ids, mask, deterministic: bool = True):
        x = self.text_embed(ids, deterministic=deterministic)
        bias = make_attention_mask(mask)
        x, aux = self.encoder(x, LANGUAGE_EXPERT, bias, deterministic)
        return l2_normalize(self.text_proj(x[:, 0])), aux

    def encode_multimodal(self, ids, mask, images, deterministic: bool = True):
        """Fused VL stream (reference Block fusion routing + vlffn): text then
        patch tokens through one pass; returns the fused [CLS] state."""
        t = self.text_embed(ids, deterministic=deterministic)
        v = self.visual_embed(images, deterministic=deterministic)
        x = jnp.concatenate([t, v.astype(t.dtype)], axis=1)
        full_mask = jnp.concatenate(
            [mask, jnp.ones(v.shape[:2], mask.dtype)], axis=1)
        bias = make_attention_mask(full_mask)
        x, aux = self.encoder(x, FUSION_EXPERT, bias, deterministic,
                              text_len=t.shape[1])
        return x[:, 0], aux

    def __call__(self, batch: Mapping[str, Any], deterministic: bool = True) -> Dict:
        img = batch.get("image", batch.get("image_data"))
        if img.ndim == 5:
            img = img[:, 0]
        ids = batch.get("input_ids", batch.get("caption_input_ids"))
        mask = batch.get("input_mask", batch.get("caption_input_mask"))
        img_emb, aux_i = self.encode_image(img, deterministic)
        txt_emb, aux_t = self.encode_text(ids, mask, deterministic)
        scale = jnp.exp(jnp.clip(self.logit_scale, 0.0, jnp.log(100.0)))

        losses: Dict[str, jnp.ndarray] = {}
        if self.use_chunked_loss:
            losses["contrastive_loss"] = chunked_symmetric_infonce(
                txt_emb, img_emb, scale, self.chunk_size)
            sim = (txt_emb.astype(jnp.float32) @ img_emb.astype(jnp.float32).T
                   ) * scale
        else:
            sim = (txt_emb.astype(jnp.float32) @ img_emb.astype(jnp.float32).T
                   ) * scale
            losses["contrastive_loss"] = symmetric_cross_en(sim)
        output: Dict[str, Any] = {}
        if self.with_itm:
            # ITM over matched pairs + rolled in-batch negatives (VLMo's
            # second pretraining objective through the fused VL stream)
            B = img.shape[0]
            neg_img = jnp.roll(img, 1, axis=0)
            pos_cls, aux_p = self.encode_multimodal(ids, mask, img,
                                                    deterministic)
            neg_cls, aux_n = self.encode_multimodal(ids, mask, neg_img,
                                                    deterministic)
            itm_logits = self.itm_head(jnp.concatenate(
                [pos_cls, neg_cls], axis=0).astype(jnp.float32))
            itm_targets = jnp.concatenate(
                [jnp.ones((B,), jnp.int32), jnp.zeros((B,), jnp.int32)])
            logp = jax.nn.log_softmax(itm_logits, axis=-1)
            losses["itm_loss"] = -jnp.mean(
                jnp.take_along_axis(logp, itm_targets[:, None], axis=-1))
            output["itm_logits"] = itm_logits
            output["vl_cls"] = pos_cls
            aux_list = (aux_i, aux_t, aux_p, aux_n)
        else:
            aux_list = (aux_i, aux_t)
        metrics: Dict[str, jnp.ndarray] = {}
        n_drop = 0
        for aux in aux_list:
            if "aux_loss" in aux:
                losses["moe_aux_loss"] = losses.get("moe_aux_loss", 0.0) + \
                    self.aux_loss_weight * aux["aux_loss"]
            if "router_z_loss" in aux:
                losses["router_z_loss"] = losses.get("router_z_loss", 0.0) + \
                    self.router_z_weight * aux["router_z_loss"]
            if "frac_tokens_dropped" in aux:
                # GShard capacity-overflow telemetry (moe_layer.py:121-290)
                metrics["frac_tokens_dropped"] = metrics.get(
                    "frac_tokens_dropped", 0.0) + aux["frac_tokens_dropped"]
                n_drop += 1
        if n_drop:
            # aux_total sums over this tower's MoE layers; normalize to a
            # per-layer mean fraction
            metrics["frac_tokens_dropped"] = (
                metrics["frac_tokens_dropped"]
                / (n_drop * max(1, len(self.moe_layers))))
        return {**output, "sim": sim, "l1_simi": sim, "logits": sim,
                "text_embed": txt_emb, "visual_embed": img_emb,
                "losses": losses, "metrics": metrics}
