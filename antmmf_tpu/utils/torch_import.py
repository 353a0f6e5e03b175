"""Import PyTorch reference weights into the JAX towers.

The parity requirement (SURVEY.md §7 hard part #5): validating MSR-VTT numbers
against the reference needs its torch checkpoints loaded into our flax params.
This module maps state_dicts for the two tower families:

  * HF-style BERT (``bert.*`` / bare) → ``BertEncoder`` params
  * OpenAI-CLIP-style ViT (``visual.*``) → ``VisionTransformer`` params

Dense weights transpose ([out, in] → [in, out]); packed qkv splits; LayerNorm
weight/bias → scale/bias. Anything unmapped flows through
``checkpoint.merge_params_tolerant`` (shape-checked, warn-and-skip).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, Mapping) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, Mapping) and "model" in obj and isinstance(
            obj["model"], Mapping):
        obj = obj["model"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}


def _set(tree: Dict, path: str, value: np.ndarray) -> None:
    node = tree
    parts = path.split("/")
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def bert_state_dict_to_params(
    sd: Mapping[str, np.ndarray], num_layers: int,
) -> Dict[str, Any]:
    """HF BERT state_dict → our BertEncoder param tree (under 'params' root)."""
    sd = {re.sub(r"^bert\.", "", k): v for k, v in sd.items()}
    p: Dict[str, Any] = {}
    ln = "LayerNorm_0"

    def T(v):
        return np.ascontiguousarray(v.T)

    emb = "embeddings"
    _set(p, f"{emb}/word_embeddings/embedding", sd["embeddings.word_embeddings.weight"])
    _set(p, f"{emb}/position_embeddings/embedding",
         sd["embeddings.position_embeddings.weight"])
    _set(p, f"{emb}/token_type_embeddings/embedding",
         sd["embeddings.token_type_embeddings.weight"])
    _set(p, f"{emb}/layer_norm/{ln}/scale", sd["embeddings.LayerNorm.weight"])
    _set(p, f"{emb}/layer_norm/{ln}/bias", sd["embeddings.LayerNorm.bias"])

    for i in range(num_layers):
        src = f"encoder.layer.{i}"
        dst = f"encoder/layer_{i}"
        for hf, ours in (("query", "q_proj"), ("key", "k_proj"),
                         ("value", "v_proj")):
            _set(p, f"{dst}/attention/{ours}/kernel",
                 T(sd[f"{src}.attention.self.{hf}.weight"]))
            _set(p, f"{dst}/attention/{ours}/bias",
                 sd[f"{src}.attention.self.{hf}.bias"])
        _set(p, f"{dst}/attention/out_proj/kernel",
             T(sd[f"{src}.attention.output.dense.weight"]))
        _set(p, f"{dst}/attention/out_proj/bias",
             sd[f"{src}.attention.output.dense.bias"])
        _set(p, f"{dst}/norm1/{ln}/scale",
             sd[f"{src}.attention.output.LayerNorm.weight"])
        _set(p, f"{dst}/norm1/{ln}/bias",
             sd[f"{src}.attention.output.LayerNorm.bias"])
        _set(p, f"{dst}/mlp/fc1/kernel", T(sd[f"{src}.intermediate.dense.weight"]))
        _set(p, f"{dst}/mlp/fc1/bias", sd[f"{src}.intermediate.dense.bias"])
        _set(p, f"{dst}/mlp/fc2/kernel", T(sd[f"{src}.output.dense.weight"]))
        _set(p, f"{dst}/mlp/fc2/bias", sd[f"{src}.output.dense.bias"])
        _set(p, f"{dst}/norm2/{ln}/scale", sd[f"{src}.output.LayerNorm.weight"])
        _set(p, f"{dst}/norm2/{ln}/bias", sd[f"{src}.output.LayerNorm.bias"])

    if "pooler.dense.weight" in sd:
        _set(p, "pooler/kernel", T(sd["pooler.dense.weight"]))
        _set(p, "pooler/bias", sd["pooler.dense.bias"])
    return p


def hf_clip_vision_state_dict_to_params(
    sd: Mapping[str, np.ndarray], num_layers: int, final_norm: bool = True,
) -> Dict[str, Any]:
    """HF ``CLIPVisionModel`` state_dict → our VisionTransformer param tree.

    ``num_layers`` may be fewer than the checkpoint's (select-layer
    consumption: Pink's ``hidden_states[-2]``); ``final_norm=False`` skips
    post_layernorm, which hidden_states never include."""
    sd = {re.sub(r"^vision_model\.", "", k): v for k, v in sd.items()}
    p: Dict[str, Any] = {}
    ln = "LayerNorm_0"

    def T(v):
        return np.ascontiguousarray(v.T)

    conv = sd["embeddings.patch_embedding.weight"]  # [C, 3, ph, pw]
    _set(p, "embeddings/patch_embed/proj/kernel",
         np.ascontiguousarray(conv.transpose(2, 3, 1, 0)))
    _set(p, "embeddings/patch_embed/proj/bias",
         sd.get("embeddings.patch_embedding.bias",
                np.zeros(conv.shape[0], np.float32)))
    _set(p, "embeddings/cls_token",
         sd["embeddings.class_embedding"].reshape(1, 1, -1))
    _set(p, "embeddings/pos_embedding", sd["embeddings.position_embedding.weight"])
    _set(p, f"pre_norm/{ln}/scale", sd["pre_layrnorm.weight"])
    _set(p, f"pre_norm/{ln}/bias", sd["pre_layrnorm.bias"])
    for i in range(num_layers):
        src = f"encoder.layers.{i}"
        dst = f"encoder/layer_{i}"
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _set(p, f"{dst}/attention/{name}/kernel",
                 T(sd[f"{src}.self_attn.{name}.weight"]))
            _set(p, f"{dst}/attention/{name}/bias",
                 sd[f"{src}.self_attn.{name}.bias"])
        _set(p, f"{dst}/norm1/{ln}/scale", sd[f"{src}.layer_norm1.weight"])
        _set(p, f"{dst}/norm1/{ln}/bias", sd[f"{src}.layer_norm1.bias"])
        _set(p, f"{dst}/norm2/{ln}/scale", sd[f"{src}.layer_norm2.weight"])
        _set(p, f"{dst}/norm2/{ln}/bias", sd[f"{src}.layer_norm2.bias"])
        _set(p, f"{dst}/mlp/fc1/kernel", T(sd[f"{src}.mlp.fc1.weight"]))
        _set(p, f"{dst}/mlp/fc1/bias", sd[f"{src}.mlp.fc1.bias"])
        _set(p, f"{dst}/mlp/fc2/kernel", T(sd[f"{src}.mlp.fc2.weight"]))
        _set(p, f"{dst}/mlp/fc2/bias", sd[f"{src}.mlp.fc2.bias"])
    if final_norm:
        _set(p, f"encoder/final_norm/{ln}/scale", sd["post_layernorm.weight"])
        _set(p, f"encoder/final_norm/{ln}/bias", sd["post_layernorm.bias"])
    return p


def clip_vit_state_dict_to_params(
    sd: Mapping[str, np.ndarray], num_layers: int,
) -> Dict[str, Any]:
    """OpenAI-CLIP visual tower → our VisionTransformer param tree."""
    sd = {re.sub(r"^visual\.", "", k): v for k, v in sd.items()}
    p: Dict[str, Any] = {}
    ln = "LayerNorm_0"

    def T(v):
        return np.ascontiguousarray(v.T)

    # conv1 [C, 3, ph, pw] → [ph, pw, 3, C]
    conv = sd["conv1.weight"]
    _set(p, "embeddings/patch_embed/proj/kernel",
         np.ascontiguousarray(conv.transpose(2, 3, 1, 0)))
    if "conv1.bias" in sd:
        _set(p, "embeddings/patch_embed/proj/bias", sd["conv1.bias"])
    else:
        _set(p, "embeddings/patch_embed/proj/bias",
             np.zeros(conv.shape[0], np.float32))
    _set(p, "embeddings/cls_token", sd["class_embedding"].reshape(1, 1, -1))
    _set(p, "embeddings/pos_embedding", sd["positional_embedding"])
    _set(p, f"pre_norm/{ln}/scale", sd["ln_pre.weight"])
    _set(p, f"pre_norm/{ln}/bias", sd["ln_pre.bias"])

    for i in range(num_layers):
        src = f"transformer.resblocks.{i}"
        dst = f"encoder/layer_{i}"
        wqkv = sd[f"{src}.attn.in_proj_weight"]  # [3C, C]
        bqkv = sd[f"{src}.attn.in_proj_bias"]
        C = wqkv.shape[1]
        for j, ours in enumerate(("q_proj", "k_proj", "v_proj")):
            _set(p, f"{dst}/attention/{ours}/kernel", T(wqkv[j * C:(j + 1) * C]))
            _set(p, f"{dst}/attention/{ours}/bias", bqkv[j * C:(j + 1) * C])
        _set(p, f"{dst}/attention/out_proj/kernel",
             T(sd[f"{src}.attn.out_proj.weight"]))
        _set(p, f"{dst}/attention/out_proj/bias", sd[f"{src}.attn.out_proj.bias"])
        _set(p, f"{dst}/norm1/{ln}/scale", sd[f"{src}.ln_1.weight"])
        _set(p, f"{dst}/norm1/{ln}/bias", sd[f"{src}.ln_1.bias"])
        _set(p, f"{dst}/norm2/{ln}/scale", sd[f"{src}.ln_2.weight"])
        _set(p, f"{dst}/norm2/{ln}/bias", sd[f"{src}.ln_2.bias"])
        _set(p, f"{dst}/mlp/fc1/kernel", T(sd[f"{src}.mlp.c_fc.weight"]))
        _set(p, f"{dst}/mlp/fc1/bias", sd[f"{src}.mlp.c_fc.bias"])
        _set(p, f"{dst}/mlp/fc2/kernel", T(sd[f"{src}.mlp.c_proj.weight"]))
        _set(p, f"{dst}/mlp/fc2/bias", sd[f"{src}.mlp.c_proj.bias"])

    _set(p, f"encoder/final_norm/{ln}/scale", sd["ln_post.weight"])
    _set(p, f"encoder/final_norm/{ln}/bias", sd["ln_post.bias"])
    if "proj" in sd:
        _set(p, "proj/kernel", np.asarray(sd["proj"]))
    return p


def pvt_v2_state_dict_to_params(
    sd: Mapping[str, np.ndarray], preset: str = "pvt_v2_b0",
) -> Dict[str, Any]:
    """Reference PVT-v2 state_dict (antmmf pvt.py:119-266) → our PVTv2 tree."""
    from antmmf_tpu.modules.vision.pvt import V2_PRESETS

    depths = V2_PRESETS[preset]["depths"]
    p: Dict[str, Any] = {}
    ln = "LayerNorm_0"

    def T(v):
        return np.ascontiguousarray(v.T)

    def TC(v):  # conv [out, in, kh, kw] → [kh, kw, in, out]
        return np.ascontiguousarray(np.transpose(v, (2, 3, 1, 0)))

    for si, depth in enumerate(depths):
        t = si + 1  # torch stages are 1-indexed
        _set(p, f"patch_embed{si}/kernel", TC(sd[f"patch_embed{t}.proj.weight"]))
        _set(p, f"patch_embed{si}/bias", sd[f"patch_embed{t}.proj.bias"])
        _set(p, f"embed_norm{si}/{ln}/scale", sd[f"patch_embed{t}.norm.weight"])
        _set(p, f"embed_norm{si}/{ln}/bias", sd[f"patch_embed{t}.norm.bias"])
        for bi in range(depth):
            src = f"block{t}.{bi}"
            dst = f"stage{si}_block{bi}"
            _set(p, f"{dst}/norm1/{ln}/scale", sd[f"{src}.norm1.weight"])
            _set(p, f"{dst}/norm1/{ln}/bias", sd[f"{src}.norm1.bias"])
            _set(p, f"{dst}/norm2/{ln}/scale", sd[f"{src}.norm2.weight"])
            _set(p, f"{dst}/norm2/{ln}/bias", sd[f"{src}.norm2.bias"])
            att = f"{dst}/attention"
            _set(p, f"{att}/q/kernel", T(sd[f"{src}.attn.q.weight"]))
            _set(p, f"{att}/q/bias", sd[f"{src}.attn.q.bias"])
            _set(p, f"{att}/kv/kernel", T(sd[f"{src}.attn.kv.weight"]))
            _set(p, f"{att}/kv/bias", sd[f"{src}.attn.kv.bias"])
            _set(p, f"{att}/proj/kernel", T(sd[f"{src}.attn.proj.weight"]))
            _set(p, f"{att}/proj/bias", sd[f"{src}.attn.proj.bias"])
            if f"{src}.attn.sr.weight" in sd:
                _set(p, f"{att}/sr/kernel", TC(sd[f"{src}.attn.sr.weight"]))
                _set(p, f"{att}/sr/bias", sd[f"{src}.attn.sr.bias"])
                _set(p, f"{att}/sr_norm/{ln}/scale", sd[f"{src}.attn.norm.weight"])
                _set(p, f"{att}/sr_norm/{ln}/bias", sd[f"{src}.attn.norm.bias"])
            mlp = f"{dst}/mlp"
            _set(p, f"{mlp}/fc1/kernel", T(sd[f"{src}.mlp.fc1.weight"]))
            _set(p, f"{mlp}/fc1/bias", sd[f"{src}.mlp.fc1.bias"])
            _set(p, f"{mlp}/fc2/kernel", T(sd[f"{src}.mlp.fc2.weight"]))
            _set(p, f"{mlp}/fc2/bias", sd[f"{src}.mlp.fc2.bias"])
            _set(p, f"{mlp}/dwconv/kernel",
                 TC(sd[f"{src}.mlp.dwconv.dwconv.weight"]))
            _set(p, f"{mlp}/dwconv/bias", sd[f"{src}.mlp.dwconv.dwconv.bias"])
        _set(p, f"stage_norm{si}/{ln}/scale", sd[f"norm{t}.weight"])
        _set(p, f"stage_norm{si}/{ln}/bias", sd[f"norm{t}.bias"])
    return p


def univl_ref_state_dict_to_params(
    sd: Mapping[str, np.ndarray], bert_layers: int,
    pvt_preset: str = "pvt_v2_b0",
) -> Dict[str, Any]:
    """Reference ``UnivlForVideoTextRetrieval`` state_dict → our
    ``UnivlRefRetrieval`` param tree (models/univl_ref.py)."""

    def sub(prefix: str) -> Dict[str, np.ndarray]:
        return {k[len(prefix):]: v for k, v in sd.items()
                if k.startswith(prefix)}

    def T(v):
        return np.ascontiguousarray(v.T)

    p: Dict[str, Any] = {}
    p["text_encoder"] = bert_state_dict_to_params(
        sub("module.text_encoder.module."), bert_layers)
    p["img_encoder"] = pvt_v2_state_dict_to_params(
        sub("module.img_encoder.model."), pvt_preset)
    conv = sd["module.img_encoder.output_proj.weight"]  # [out, in, 1, 1]
    _set(p, "output_proj/kernel",
         np.ascontiguousarray(np.transpose(conv, (2, 3, 1, 0))))
    _set(p, "output_proj/bias", sd["module.img_encoder.output_proj.bias"])
    _set(p, "img_fc_0/kernel", T(sd["module.img_encoder.img_fc.0.weight"]))
    _set(p, "img_fc_0/bias", sd["module.img_encoder.img_fc.0.bias"])
    _set(p, "img_fc_1/kernel", T(sd["module.img_encoder.img_fc.2.weight"]))
    _set(p, "img_fc_1/bias", sd["module.img_encoder.img_fc.2.bias"])
    if "module.cross_pooler.dense.weight" in sd:
        _set(p, "cross_pooler/kernel", T(sd["module.cross_pooler.dense.weight"]))
        _set(p, "cross_pooler/bias", sd["module.cross_pooler.dense.bias"])
    if "similarity_dense.0.weight" in sd:
        _set(p, "similarity_dense_0/kernel", T(sd["similarity_dense.0.weight"]))
        _set(p, "similarity_dense_0/bias", sd["similarity_dense.0.bias"])
        _set(p, "similarity_dense_1/kernel", T(sd["similarity_dense.2.weight"]))
        _set(p, "similarity_dense_1/bias", sd["similarity_dense.2.bias"])
    return p


def univl_ref_pretrain_state_dict_to_params(
    sd: Mapping[str, np.ndarray], bert_layers: int,
    pvt_preset: str = "pvt_v2_b0",
) -> Dict[str, Any]:
    """Reference ``UnivlForVideoPretraining`` state_dict → our
    ``UnivlRefPretraining`` tree (retrieval towers under ``model.`` plus the
    tied MLM head and the ITM NSP head)."""

    def T(v):
        return np.ascontiguousarray(v.T)

    inner = {k[len("model."):]: v for k, v in sd.items()
             if k.startswith("model.")}
    p = univl_ref_state_dict_to_params(inner, bert_layers, pvt_preset)
    mlm = "mlm_head.transformer_mlm.cls.predictions"
    _set(p, "mlm_transform/kernel", T(sd[f"{mlm}.transform.dense.weight"]))
    _set(p, "mlm_transform/bias", sd[f"{mlm}.transform.dense.bias"])
    _set(p, "mlm_norm/scale", sd[f"{mlm}.transform.LayerNorm.weight"])
    _set(p, "mlm_norm/bias", sd[f"{mlm}.transform.LayerNorm.bias"])
    _set(p, "mlm_bias", sd[f"{mlm}.bias"])
    if "itm_head.cls.seq_relationship.weight" in sd:
        _set(p, "itm_cls/kernel", T(sd["itm_head.cls.seq_relationship.weight"]))
        _set(p, "itm_cls/bias", sd["itm_head.cls.seq_relationship.bias"])
    return p


def _infer_block_depth(sd: Mapping[str, np.ndarray], prefix: str) -> int:
    idx = [int(k[len(prefix) + 7:].split(".")[0]) for k in sd
           if k.startswith(f"{prefix}blocks.")]
    if not idx:
        raise KeyError(f"no '{prefix}blocks.*' keys in state dict")
    return max(idx) + 1


def vlmo_multiway_state_dict_to_params(
    sd: Mapping[str, np.ndarray], depth: Optional[int] = None,
    prefix: str = "",
) -> Dict[str, Any]:
    """Reference VLMo ``MultiWayTransformer`` block stack → our
    ``MultiwayTransformer`` params (models/m2_encoder.py).

    Mapping (reference prj/M2_Encoder/vlmo/modules/multiway_transformer.py):
    fused ``attn.qkv.weight`` [3C, C] splits into q/k/v kernels (k bias is
    zero by construction — Attention.forward:88-91); per-modality FFNs
    ``mlp_imag/mlp_text/mlp_vl`` map to ``ffn_expert_{0,1,2}`` with their
    ``norm2_*`` partners; LayerScale ``gamma_1/gamma_2`` pass through;
    final ``norm`` → ``final_norm``.
    """

    def T(v):
        return np.ascontiguousarray(np.asarray(v).T)

    def ln(dst: str, src: str) -> None:
        _set(p, f"{dst}/LayerNorm_0/scale", sd[f"{src}.weight"])
        _set(p, f"{dst}/LayerNorm_0/bias", sd[f"{src}.bias"])

    if depth is None:
        depth = _infer_block_depth(sd, prefix)
    expert_of = {"imag": 0, "text": 1, "vl": 2}
    p: Dict[str, Any] = {}
    for i in range(depth):
        b, dst = f"{prefix}blocks.{i}", f"block_{i}"
        ln(f"{dst}/norm1", f"{b}.norm1")
        qkv = np.asarray(sd[f"{b}.attn.qkv.weight"])  # [3C, C]
        C = qkv.shape[1]
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            _set(p, f"{dst}/attention/{name}/kernel", T(qkv[j * C:(j + 1) * C]))
        zeros = np.zeros((C,), np.float32)
        _set(p, f"{dst}/attention/q_proj/bias",
             np.asarray(sd.get(f"{b}.attn.q_bias", zeros)))
        _set(p, f"{dst}/attention/k_proj/bias", zeros)
        _set(p, f"{dst}/attention/v_proj/bias",
             np.asarray(sd.get(f"{b}.attn.v_bias", zeros)))
        _set(p, f"{dst}/attention/out_proj/kernel", T(sd[f"{b}.attn.proj.weight"]))
        _set(p, f"{dst}/attention/out_proj/bias", sd[f"{b}.attn.proj.bias"])
        for mod, ex in expert_of.items():
            if f"{b}.mlp_{mod}.fc1.weight" not in sd:
                continue
            ln(f"{dst}/norm2_expert_{ex}", f"{b}.norm2_{mod}")
            _set(p, f"{dst}/ffn_expert_{ex}/fc1/kernel", T(sd[f"{b}.mlp_{mod}.fc1.weight"]))
            _set(p, f"{dst}/ffn_expert_{ex}/fc1/bias", sd[f"{b}.mlp_{mod}.fc1.bias"])
            _set(p, f"{dst}/ffn_expert_{ex}/fc2/kernel", T(sd[f"{b}.mlp_{mod}.fc2.weight"]))
            _set(p, f"{dst}/ffn_expert_{ex}/fc2/bias", sd[f"{b}.mlp_{mod}.fc2.bias"])
        for g in ("gamma_1", "gamma_2"):
            if f"{b}.{g}" in sd:
                _set(p, f"{dst}/{g}", sd[f"{b}.{g}"])
    ln("final_norm", f"{prefix}norm")
    return p


def interpolate_grid_pos_embed(pos: np.ndarray, target_tokens: int,
                               num_extra: int = 1) -> np.ndarray:
    """Resize a [1, extra+G², C] abs pos table to ``target_tokens`` total
    tokens by bilinear grid interpolation (the reference's
    ``interpolate_pos_embed``, eva_vit.py:382-403, with jax.image.resize
    in place of torch bicubic); extra (cls) rows pass through."""
    pos = np.asarray(pos)
    if pos.shape[1] == target_tokens:
        return pos
    import jax

    extra, grid = pos[:, :num_extra], pos[:, num_extra:]
    orig = int(round(grid.shape[1] ** 0.5))
    new = int(round((target_tokens - num_extra) ** 0.5))
    g = grid.reshape(1, orig, orig, -1)
    g = np.asarray(jax.image.resize(
        g, (1, new, new, g.shape[-1]), method="bilinear"))
    return np.concatenate([extra, g.reshape(1, new * new, -1)], axis=1)


def eva_vit_state_dict_to_params(
    sd: Mapping[str, np.ndarray], depth: Optional[int] = None,
    prefix: str = "", target_tokens: Optional[int] = None,
) -> Dict[str, Any]:
    """Reference Pink EVA-ViT (``pink/model/eva_vit.py`` VisionTransformer)
    → our ``EvaVisionTransformer`` params. Fused ``attn.qkv.weight``
    [3C, C] splits into q/k/v kernels; ``q_bias``/``v_bias`` import with a
    zero k bias (Attention.forward:129-134); patch conv transposes
    [C,3,p,p] → [p,p,3,C]. ``target_tokens`` (1 + grid²) resizes the abs
    pos table for a different image size (reference interpolate_pos_embed,
    eva_vit.py:382-403)."""

    def T(v):
        return np.ascontiguousarray(np.asarray(v).T)

    def ln(dst: str, src: str) -> None:
        _set(p, f"{dst}/LayerNorm_0/scale", sd[f"{src}.weight"])
        _set(p, f"{dst}/LayerNorm_0/bias", sd[f"{src}.bias"])

    if depth is None:
        depth = _infer_block_depth(sd, prefix)
    p: Dict[str, Any] = {}
    conv = np.asarray(sd[f"{prefix}patch_embed.proj.weight"])
    _set(p, "patch_embed/kernel",
         np.ascontiguousarray(np.transpose(conv, (2, 3, 1, 0))))
    _set(p, "patch_embed/bias", sd[f"{prefix}patch_embed.proj.bias"])
    _set(p, "cls_token", sd[f"{prefix}cls_token"])
    pos = np.asarray(sd[f"{prefix}pos_embed"])
    if target_tokens is not None:
        pos = interpolate_grid_pos_embed(pos, target_tokens)
    _set(p, "pos_embed", pos)
    for i in range(depth):
        b, dst = f"{prefix}blocks.{i}", f"layer_{i}"
        ln(f"{dst}/norm1", f"{b}.norm1")
        ln(f"{dst}/norm2", f"{b}.norm2")
        qkv = np.asarray(sd[f"{b}.attn.qkv.weight"])
        C = qkv.shape[1]
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            _set(p, f"{dst}/attention/{name}/kernel",
                 T(qkv[j * C:(j + 1) * C]))
        zeros = np.zeros((C,), np.float32)
        _set(p, f"{dst}/attention/q_proj/bias",
             np.asarray(sd.get(f"{b}.attn.q_bias", zeros)))
        _set(p, f"{dst}/attention/k_proj/bias", zeros)
        _set(p, f"{dst}/attention/v_proj/bias",
             np.asarray(sd.get(f"{b}.attn.v_bias", zeros)))
        _set(p, f"{dst}/attention/out_proj/kernel",
             T(sd[f"{b}.attn.proj.weight"]))
        _set(p, f"{dst}/attention/out_proj/bias", sd[f"{b}.attn.proj.bias"])
        _set(p, f"{dst}/mlp/fc1/kernel", T(sd[f"{b}.mlp.fc1.weight"]))
        _set(p, f"{dst}/mlp/fc1/bias", sd[f"{b}.mlp.fc1.bias"])
        _set(p, f"{dst}/mlp/fc2/kernel", T(sd[f"{b}.mlp.fc2.weight"]))
        _set(p, f"{dst}/mlp/fc2/bias", sd[f"{b}.mlp.fc2.bias"])
    return p


def s3d_state_dict_to_params(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Reference S3D-G state_dict (s3dg.py ``S3D``) → our ``S3DRef`` params
    (models/s3d_ref.py). Conv3d [O,I,kt,kh,kw] → [kt,kh,kw,I,O]; BatchNorm
    weight/bias/running_mean/running_var → scale/bias/mean/var."""

    def TC(v):  # conv3d
        return np.ascontiguousarray(np.transpose(np.asarray(v),
                                                 (2, 3, 4, 1, 0)))

    def T(v):
        return np.ascontiguousarray(np.asarray(v).T)

    p: Dict[str, Any] = {}

    def stconv(dst: str, src: str) -> None:
        _set(p, f"{dst}/conv1/kernel", TC(sd[f"{src}.conv1.weight"]))
        for bn in ("bn1",) + (("bn2",) if f"{src}.conv2.weight" in sd
                              else ()):
            _set(p, f"{dst}/{bn}/scale", sd[f"{src}.{bn}.weight"])
            _set(p, f"{dst}/{bn}/bias", sd[f"{src}.{bn}.bias"])
            _set(p, f"{dst}/{bn}/mean", sd[f"{src}.{bn}.running_mean"])
            _set(p, f"{dst}/{bn}/var", sd[f"{src}.{bn}.running_var"])
        if f"{src}.conv2.weight" in sd:
            _set(p, f"{dst}/conv2/kernel", TC(sd[f"{src}.conv2.weight"]))

    def gating(dst: str, src: str) -> None:
        _set(p, f"{dst}/fc/kernel", T(sd[f"{src}.fc.weight"]))
        _set(p, f"{dst}/fc/bias", sd[f"{src}.fc.bias"])

    stconv("conv1", "conv1")
    stconv("conv_2b", "conv_2b")
    stconv("conv_2c", "conv_2c")
    gating("gating", "gating")
    for blk in ("mixed_3b", "mixed_3c", "mixed_4b", "mixed_4c", "mixed_4d",
                "mixed_4e", "mixed_4f", "mixed_5b", "mixed_5c"):
        for branch in ("conv_b0", "conv_b1_a", "conv_b1_b", "conv_b2_a",
                       "conv_b2_b", "conv_b3_b"):
            stconv(f"{blk}/{branch}", f"{blk}.{branch}")
        for g in ("gating_b0", "gating_b1", "gating_b2", "gating_b3"):
            gating(f"{blk}/{g}", f"{blk}.{g}")
    _set(p, "fc/kernel", T(sd["fc.weight"]))
    _set(p, "fc/bias", sd["fc.bias"])
    return p


def qwen2_vit_state_dict_to_params(
    sd: Mapping[str, np.ndarray], depth: Optional[int] = None,
    prefix: str = "",
) -> Dict[str, Any]:
    """Reference M2-omni Qwen2-ViT (``qwen2_vit.py`` Qwen2ViT) → our
    ``Qwen2VisionTransformer`` params. The stride-equal Conv3d patchify
    weight [E, C, tps, ps, ps] flattens to our patch Dense kernel
    [C*tps*ps*ps, E] (same (C, tps, ps, ps) patch-vector order); fused
    ``attn.qkv`` imports directly (our qkv Dense keeps the reference's
    row order); merger.mlp.{0,2} map to merger_fc{1,2}."""

    def T(v):
        return np.ascontiguousarray(np.asarray(v).T)

    def ln(dst: str, src: str) -> None:
        _set(p, f"{dst}/scale", sd[f"{src}.weight"])
        _set(p, f"{dst}/bias", sd[f"{src}.bias"])

    if depth is None:
        depth = _infer_block_depth(sd, prefix)
    p: Dict[str, Any] = {}
    conv = np.asarray(sd[f"{prefix}patch_embed.proj.weight"])
    _set(p, "patch_embed/kernel", T(conv.reshape(conv.shape[0], -1)))
    for i in range(depth):
        b, dst = f"{prefix}blocks.{i}", f"layer_{i}"
        ln(f"{dst}/norm1", f"{b}.norm1")
        ln(f"{dst}/norm2", f"{b}.norm2")
        _set(p, f"{dst}/qkv/kernel", T(sd[f"{b}.attn.qkv.weight"]))
        _set(p, f"{dst}/qkv/bias", sd[f"{b}.attn.qkv.bias"])
        _set(p, f"{dst}/proj/kernel", T(sd[f"{b}.attn.proj.weight"]))
        _set(p, f"{dst}/proj/bias", sd[f"{b}.attn.proj.bias"])
        _set(p, f"{dst}/fc1/kernel", T(sd[f"{b}.mlp.fc1.weight"]))
        _set(p, f"{dst}/fc1/bias", sd[f"{b}.mlp.fc1.bias"])
        _set(p, f"{dst}/fc2/kernel", T(sd[f"{b}.mlp.fc2.weight"]))
        _set(p, f"{dst}/fc2/bias", sd[f"{b}.mlp.fc2.bias"])
    ln("ln_q", f"{prefix}merger.ln_q")
    _set(p, "merger_fc1/kernel", T(sd[f"{prefix}merger.mlp.0.weight"]))
    _set(p, "merger_fc1/bias", sd[f"{prefix}merger.mlp.0.bias"])
    _set(p, "merger_fc2/kernel", T(sd[f"{prefix}merger.mlp.2.weight"]))
    _set(p, "merger_fc2/bias", sd[f"{prefix}merger.mlp.2.bias"])
    return p


def sanm_state_dict_to_params(
    sd: Mapping[str, np.ndarray], num_blocks: Optional[int] = None,
    prefix: str = "encoder.",
) -> Dict[str, Any]:
    """Reference M2-omni SANM audio encoder (``sanm_audio.py`` SANMEncoder,
    funasr parameter schema) → our ``SANMEncoder`` params. funasr layers
    ``encoders0.0`` (560→512) and ``encoders.{i}`` map to ``layer_0`` and
    ``layer_{i+1}``; the depthwise ``fsmn_block`` conv [d, 1, k] transposes
    to our [k, 1, d] kernel."""

    def T(v):
        return np.ascontiguousarray(np.asarray(v).T)

    def ln(dst: str, src: str) -> None:
        _set(p, f"{dst}/scale", sd[f"{src}.weight"])
        _set(p, f"{dst}/bias", sd[f"{src}.bias"])

    def block(dst: str, src: str) -> None:
        ln(f"{dst}/norm1", f"{src}.norm1")
        ln(f"{dst}/norm2", f"{src}.norm2")
        a = f"{src}.self_attn"
        _set(p, f"{dst}/self_attn/linear_q_k_v/kernel",
             T(sd[f"{a}.linear_q_k_v.weight"]))
        _set(p, f"{dst}/self_attn/linear_q_k_v/bias",
             sd[f"{a}.linear_q_k_v.bias"])
        _set(p, f"{dst}/self_attn/fsmn_kernel", np.ascontiguousarray(
            np.transpose(np.asarray(sd[f"{a}.fsmn_block.weight"]),
                         (2, 1, 0))))
        _set(p, f"{dst}/self_attn/linear_out/kernel",
             T(sd[f"{a}.linear_out.weight"]))
        _set(p, f"{dst}/self_attn/linear_out/bias",
             sd[f"{a}.linear_out.bias"])
        _set(p, f"{dst}/w_1/kernel", T(sd[f"{src}.feed_forward.w_1.weight"]))
        _set(p, f"{dst}/w_1/bias", sd[f"{src}.feed_forward.w_1.bias"])
        _set(p, f"{dst}/w_2/kernel", T(sd[f"{src}.feed_forward.w_2.weight"]))
        _set(p, f"{dst}/w_2/bias", sd[f"{src}.feed_forward.w_2.bias"])

    if num_blocks is None:
        idx = [int(k.replace(prefix, "").split(".")[1]) for k in sd
               if k.startswith(f"{prefix}encoders.")]
        num_blocks = (max(idx) + 2) if idx else 1
    p: Dict[str, Any] = {}
    block("layer_0", f"{prefix}encoders0.0")
    for i in range(num_blocks - 1):
        block(f"layer_{i + 1}", f"{prefix}encoders.{i}")
    ln("after_norm", f"{prefix}after_norm")
    return p


def llama_3d_state_dict_to_params(
    sd: Mapping[str, np.ndarray], num_layers: Optional[int] = None,
    prefix: str = "model.", lm_head_key: str = "lm_head.weight",
) -> Dict[str, Any]:
    """Reference LLaMA-3D decoder (``modeling_llama_3d.py`` Llama3dForCausalLM
    — HF-LLaMA layout) → ``{token_embed, decoder, lm_head}`` params matching
    ``modules/llm.DecoderLM`` (the shared substrate of Pink / M2-omni).
    Tied lm_head falls back to the embedding. Pink serial adapters
    (``adapter_attn.tune_adapter_a/b``, adapter.py:286-361) map to
    ``adapter_attn/down|up`` when present."""

    def T(v):
        return np.ascontiguousarray(np.asarray(v).T)

    if num_layers is None:
        idx = [int(k.replace(prefix, "").split(".")[1]) for k in sd
               if k.startswith(f"{prefix}layers.")]
        num_layers = max(idx) + 1
    p: Dict[str, Any] = {}
    _set(p, "token_embed/embedding", sd[f"{prefix}embed_tokens.weight"])
    for i in range(num_layers):
        b, dst = f"{prefix}layers.{i}", f"decoder/layer_{i}"
        _set(p, f"{dst}/input_norm/scale",
             sd[f"{b}.input_layernorm.weight"])
        _set(p, f"{dst}/post_attn_norm/scale",
             sd[f"{b}.post_attention_layernorm.weight"])
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            _set(p, f"{dst}/attention/{name}/kernel",
                 T(sd[f"{b}.self_attn.{name}.weight"]))
        for name in ("gate_proj", "up_proj", "down_proj"):
            _set(p, f"{dst}/mlp/{name}/kernel",
                 T(sd[f"{b}.mlp.{name}.weight"]))
        for ada, dst_ada in (("adapter_attn", "adapter_attn"),
                             ("adapter_mlp", "adapter_mlp_layer")):
            if f"{b}.{ada}.tune_adapter_a.weight" in sd:
                _set(p, f"{dst}/{dst_ada}/down/kernel",
                     T(sd[f"{b}.{ada}.tune_adapter_a.weight"]))
                _set(p, f"{dst}/{dst_ada}/down/bias",
                     sd[f"{b}.{ada}.tune_adapter_a.bias"])
                _set(p, f"{dst}/{dst_ada}/up/kernel",
                     T(sd[f"{b}.{ada}.tune_adapter_b.weight"]))
                _set(p, f"{dst}/{dst_ada}/up/bias",
                     sd[f"{b}.{ada}.tune_adapter_b.bias"])
    _set(p, "decoder/final_norm/scale", sd[f"{prefix}norm.weight"])
    head = sd.get(lm_head_key, sd[f"{prefix}embed_tokens.weight"])
    _set(p, "lm_head/kernel", T(head))
    return p


def pink_state_dict_to_params(
    sd: Mapping[str, np.ndarray], clip_select_layer: int = -2,
) -> Dict[str, Any]:
    """Reference Pink checkpoint (``prj/Pink/pink/model/pink.py`` PinkModel =
    LlamaForCausalLM + CLIP/EVA vision_model + mm_projector + serial
    adapters) → our ``models/pink.PinkModel`` params with
    ``adapter_style="pink"``. Vision tower routes by key shape: EVA
    (``vision_model.blocks.``) → eva importer; CLIP
    (``vision_model.vision_model.``) → hf_clip_vision importer truncated to
    ``clip_select_layer`` (reference encode_image consumes
    ``hidden_states[clip_select_layer]``, default -2 — the trailing layer
    and post_layernorm never run, pink.py:185-188)."""
    p = llama_3d_state_dict_to_params(sd)
    if any(k.startswith("vision_model.blocks.") for k in sd):
        p["vision_tower"] = eva_vit_state_dict_to_params(
            sd, depth=None, prefix="vision_model.")
    elif any(k.startswith("vision_model.vision_model.") for k in sd):
        depth = max(int(k.split(".")[4]) for k in sd
                    if k.startswith("vision_model.vision_model.encoder.layers."))
        p["vision_tower"] = hf_clip_vision_state_dict_to_params(
            {k.replace("vision_model.vision_model.", "vision_model."): v
             for k, v in sd.items() if k.startswith("vision_model.")},
            depth + 1 + clip_select_layer + 1, final_norm=False)
    def T(v):
        return np.ascontiguousarray(np.asarray(v).T)
    _set(p, "vision_proj/kernel", T(sd["mm_projector.weight"]))
    _set(p, "vision_proj/bias", sd["mm_projector.bias"])
    return p


def m2_omni_state_dict_to_params(
    sd: Mapping[str, np.ndarray], mlp_depths: Optional[int] = None,
) -> Dict[str, Any]:
    """Reference M2-omni checkpoint (``modeling_m2omni.py`` Bailing2 model:
    ``language_model`` LLaMA-3D + ``vision_model`` Qwen2-ViT +
    ``audio_model.encoder`` SANM + ``linear_proj``/``linear_proj_audio``
    MLPs) → our ``models/m2_omni.M2Omni`` params (qwen2 + sanm towers)."""
    p = llama_3d_state_dict_to_params(
        sd, prefix="language_model.model.",
        lm_head_key="language_model.lm_head.weight")
    p["vision_tower"] = qwen2_vit_state_dict_to_params(
        sd, depth=None, prefix="vision_model.")
    p["audio_encoder"] = sanm_state_dict_to_params(
        sd, prefix="audio_model.encoder.")

    def T(v):
        return np.ascontiguousarray(np.asarray(v).T)

    # Sequential [Linear] + (depth-1)*[GELU, Linear] -> Linear indices 0,2,4..
    for seq, dst in (("linear_proj", "vision_proj"),
                     ("linear_proj_audio", "audio_proj")):
        idxs = sorted({int(k.split(".")[1]) for k in sd
                       if k.startswith(f"{seq}.") and k.endswith(".weight")})
        for j, si in enumerate(idxs):
            _set(p, f"{dst}_{j}/kernel", T(sd[f"{seq}.{si}.weight"]))
            _set(p, f"{dst}_{j}/bias", sd[f"{seq}.{si}.bias"])
    return p


def m2_encoder_beit3_state_dict_to_params(
    sd: Mapping[str, np.ndarray], num_layers: Optional[int] = None,
    vl_layers: Optional[int] = None, prefix: str = "",
) -> Dict[str, Any]:
    """Released M2-Encoder checkpoint (torchscale BEiT3 VLMo — the layout
    ``convert_deepspeed_ckpt`` emits, reference vlmo_module.py:59) → our
    ``models/m2_encoder_ref.M2EncoderRef`` params. Covers the backbone
    (multiway A/B projections+norms, subln inner/ffn norms, fairseq
    positions), the vl stack, ITC heads, pooler and logit scale."""

    def T(v):
        return np.ascontiguousarray(np.asarray(v).T)

    def ln(dst: str, src: str) -> None:
        _set(p, f"{dst}/scale", sd[f"{src}.weight"])
        _set(p, f"{dst}/bias", sd[f"{src}.bias"])

    def mw_dense(dst: str, src: str) -> None:
        for w in ("A", "B"):
            _set(p, f"{dst}/{w}/kernel", T(sd[f"{src}.{w}.weight"]))
            _set(p, f"{dst}/{w}/bias", sd[f"{src}.{w}.bias"])

    def mw_ln(dst: str, src: str) -> None:
        for w in ("A", "B"):
            ln(f"{dst}/{w}", f"{src}.{w}")

    def stack(dst_root: str, src_root: str, n: int) -> None:
        for i in range(n):
            b, dst = f"{src_root}.layers.{i}", f"{dst_root}/layer_{i}"
            mw_ln(f"{dst}/self_attn_layer_norm", f"{b}.self_attn_layer_norm")
            mw_ln(f"{dst}/final_layer_norm", f"{b}.final_layer_norm")
            mw_ln(f"{dst}/inner_attn_ln", f"{b}.self_attn.inner_attn_ln")
            for name in ("q_proj", "k_proj", "v_proj"):
                mw_dense(f"{dst}/{name}", f"{b}.self_attn.{name}")
            mw_dense(f"{dst}/out_proj", f"{b}.self_attn.out_proj")
            for w in ("A", "B"):
                _set(p, f"{dst}/ffn/{w}_fc1/kernel",
                     T(sd[f"{b}.ffn.{w}.fc1.weight"]))
                _set(p, f"{dst}/ffn/{w}_fc1/bias", sd[f"{b}.ffn.{w}.fc1.bias"])
                _set(p, f"{dst}/ffn/{w}_ffn_ln/scale",
                     sd[f"{b}.ffn.{w}.ffn_layernorm.weight"])
                _set(p, f"{dst}/ffn/{w}_ffn_ln/bias",
                     sd[f"{b}.ffn.{w}.ffn_layernorm.bias"])
                _set(p, f"{dst}/ffn/{w}_fc2/kernel",
                     T(sd[f"{b}.ffn.{w}.fc2.weight"]))
                _set(p, f"{dst}/ffn/{w}_fc2/bias", sd[f"{b}.ffn.{w}.fc2.bias"])
        mw_ln(f"{dst_root}/layer_norm", f"{src_root}.layer_norm")

    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    if num_layers is None:
        num_layers = 1 + max(int(k.split(".")[3]) for k in sd
                             if k.startswith("backbone.encoder.layers."))
    p: Dict[str, Any] = {}
    _set(p, "text_embed/embedding", sd["backbone.text_embed.weight"])
    conv = np.asarray(sd["backbone.vision_embed.proj.weight"])
    _set(p, "vision_proj_conv/kernel",
         np.ascontiguousarray(conv.transpose(2, 3, 1, 0)))
    _set(p, "vision_proj_conv/bias", sd["backbone.vision_embed.proj.bias"])
    _set(p, "cls_token", sd["backbone.vision_embed.cls_token"])
    _set(p, "pos_vision/embedding",
         sd["backbone.encoder.embed_positions.A.weight"])
    _set(p, "pos_text/embedding",
         sd["backbone.encoder.embed_positions.B.weight"])
    stack("backbone", "backbone.encoder", num_layers)
    if any(k.startswith("backbone_vl.") for k in sd):
        if vl_layers is None:
            vl_layers = 1 + max(int(k.split(".")[2]) for k in sd
                                if k.startswith("backbone_vl.layers."))
        stack("backbone_vl", "backbone_vl", vl_layers)
    for head in ("itc_text_proj", "itc_image_proj",
                 "itc_vl_text_proj", "itc_vl_image_proj"):
        if f"{head}.fc.weight" in sd:
            _set(p, f"{head}/kernel", T(sd[f"{head}.fc.weight"]))
    if "pooler.dense.weight" in sd:
        _set(p, "pooler/kernel", T(sd["pooler.dense.weight"]))
        _set(p, "pooler/bias", sd["pooler.dense.bias"])
    if "logit_scale" in sd:
        _set(p, "logit_scale", np.asarray(sd["logit_scale"]).reshape(()))
    return p
