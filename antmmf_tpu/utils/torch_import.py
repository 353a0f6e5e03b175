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
    sd: Mapping[str, np.ndarray], num_layers: int,
) -> Dict[str, Any]:
    """HF ``CLIPVisionModel`` state_dict → our VisionTransformer param tree."""
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
