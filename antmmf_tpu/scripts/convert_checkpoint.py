"""Convert a PyTorch reference checkpoint into a serving-ready Orbax dir.

The reference ships torch ``.ckpt``/``.pth`` files (reference
common/checkpoint.py:368 final ``.pth``; predictors glob them at
base_predictor.py:23-294). A reference user switching to this framework
runs this once per checkpoint::

    python -m antmmf_tpu.scripts.convert_checkpoint \
        --torch_ckpt univl_final.pth --arch univl_retrieval \
        --bert_layers 12 --out /path/to/model_dir [--config exp.yml]

The output dir holds ``model_final`` (Orbax param tree, loadable by
``BasePredictor._load_checkpoint`` / ``Checkpoint.load_model_weights``'s
tolerant merge) and, when ``--config`` is given, the ``config.yaml`` the
predictor reads to rebuild the model.

Mappings live in ``antmmf_tpu/utils/torch_import.py`` (dense transposes,
qkv splits, LayerNorm renames); anything unmapped is reported, not
silently dropped.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

import numpy as np

ARCHS = ("bert", "clip_vit", "hf_clip_vision", "pvt_v2",
         "univl_retrieval", "univl_pretrain", "vlmo_multiway", "eva_vit",
         "s3d", "qwen2_vit", "sanm", "llama_3d", "pink", "m2_omni",
         "m2_encoder")


def _to_scan_layout(params: dict, arch: str) -> dict:
    """Re-layout imported per-layer params for a target config that sets
    ``scan_layers: true``: every DecoderLM subtree (a dict key named
    ``decoder`` holding ``layer_0.. + final_norm``) stacks via
    ``stack_decoder_layers``; a ``vlmo_multiway`` block stack folds via
    structure-inferred run segmentation. Vision towers (eva/qwen2 also name
    their blocks ``layer_i``) are left alone — only the subtrees the scan
    models actually read in stacked form are converted."""
    from antmmf_tpu.models.m2_encoder import stack_multiway_blocks_auto
    from antmmf_tpu.modules.llm import stack_decoder_layers

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            v = walk(v)
            if (k == "decoder" and isinstance(v, dict) and "layer_0" in v
                    and "final_norm" in v):
                v = stack_decoder_layers(v)
            out[k] = v
        return out

    params = walk(params)
    if arch == "vlmo_multiway" and "block_0" in params:
        params = stack_multiway_blocks_auto(params)
    return params


def convert(torch_ckpt: str, arch: str, out: str, bert_layers: int = 12,
            vit_layers: int = 12, pvt_preset: str = "pvt_v2_b0",
            config: str | None = None, scan_layers: bool = False) -> dict:
    from antmmf_tpu.utils import torch_import as ti

    sd = ti.load_torch_state_dict(torch_ckpt)
    if arch == "bert":
        params = ti.bert_state_dict_to_params(sd, bert_layers)
    elif arch == "clip_vit":
        params = ti.clip_vit_state_dict_to_params(sd, vit_layers)
    elif arch == "hf_clip_vision":
        params = ti.hf_clip_vision_state_dict_to_params(sd, vit_layers)
    elif arch == "pvt_v2":
        params = ti.pvt_v2_state_dict_to_params(sd, pvt_preset)
    elif arch == "univl_retrieval":
        params = ti.univl_ref_state_dict_to_params(
            sd, bert_layers, pvt_preset)
    elif arch == "univl_pretrain":
        params = ti.univl_ref_pretrain_state_dict_to_params(
            sd, bert_layers, pvt_preset)
    elif arch == "s3d":
        params = ti.s3d_state_dict_to_params(sd)
    elif arch == "eva_vit":
        # depth inferred from the state dict (eva_vit_g has 39 blocks;
        # never trust a default layer count for block-stack arches)
        params = ti.eva_vit_state_dict_to_params(sd, depth=None)
    elif arch == "m2_encoder":
        # released VLMo/BEiT3 checkpoints may carry the deepspeed
        # "_forward_module." wrapper (reference convert_deepspeed_ckpt,
        # vlmo_module.py:59) — strip it, then import the full model
        sd = {(k[len("_forward_module."):] if k.startswith("_forward_module.")
               else k): v for k, v in sd.items()}
        params = ti.m2_encoder_beit3_state_dict_to_params(sd)
    elif arch == "llama_3d":
        prefix = "language_model.model." if any(
            k.startswith("language_model.model.") for k in sd) else "model."
        head = ("language_model.lm_head.weight"
                if prefix.startswith("language_model.") else "lm_head.weight")
        params = ti.llama_3d_state_dict_to_params(sd, prefix=prefix,
                                                  lm_head_key=head)
    elif arch == "pink":
        params = ti.pink_state_dict_to_params(sd)
    elif arch == "m2_omni":
        params = ti.m2_omni_state_dict_to_params(sd)
    elif arch == "sanm":
        # Bailing audio checkpoints prefix with "audio_model.encoder." or
        # bare "encoder."; detect which
        prefix = "audio_model.encoder." if any(
            k.startswith("audio_model.encoder.") for k in sd) else "encoder."
        if not any(k.startswith(prefix) for k in sd):
            prefix = ""
        params = ti.sanm_state_dict_to_params(sd, prefix=prefix)
    elif arch == "qwen2_vit":
        # M2-omni checkpoints may prefix the tower with "vision_model."
        prefix = "vision_model." if any(
            k.startswith("vision_model.blocks.") for k in sd) else ""
        params = ti.qwen2_vit_state_dict_to_params(sd, depth=None,
                                                   prefix=prefix)
    elif arch == "vlmo_multiway":
        # M2-Encoder/VLMo checkpoints prefix the stack with "transformer."
        prefix = "transformer." if any(
            k.startswith("transformer.blocks.") for k in sd) else ""
        params = ti.vlmo_multiway_state_dict_to_params(
            sd, depth=None, prefix=prefix)
    else:
        raise SystemExit(f"--arch must be one of {ARCHS}")

    import jax
    import orbax.checkpoint as ocp

    if scan_layers:
        params = _to_scan_layout(params, arch)

    leaves = jax.tree_util.tree_leaves(params)
    nbytes = sum(np.asarray(x).nbytes for x in leaves)

    os.makedirs(out, exist_ok=True)
    path = os.path.abspath(os.path.join(out, "model_final"))
    if os.path.exists(path):
        shutil.rmtree(path)
    with ocp.PyTreeCheckpointer() as ck:
        ck.save(path, {"params": params})
    if config:
        shutil.copy(config, os.path.join(out, "config.yaml"))

    return {"arch": arch, "out": path, "param_leaves": len(leaves),
            "mb": round(nbytes / 1e6, 1),
            "source_keys": len(sd)}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--torch_ckpt", required=True)
    p.add_argument("--arch", required=True, choices=ARCHS)
    p.add_argument("--out", required=True)
    p.add_argument("--bert_layers", type=int, default=12)
    p.add_argument("--vit_layers", type=int, default=12)
    p.add_argument("--pvt_preset", default="pvt_v2_b0")
    p.add_argument("--config", default=None,
                   help="experiment yaml copied to <out>/config.yaml")
    p.add_argument("--scan_layers", action="store_true",
                   help="emit the nn.scan stacked-layer layout (targets "
                        "with model_attributes.<m>.scan_layers: true)")
    args = p.parse_args()
    print(json.dumps(convert(
        args.torch_ckpt, args.arch, args.out,
        bert_layers=args.bert_layers, vit_layers=args.vit_layers,
        pvt_preset=args.pvt_preset, config=args.config,
        scan_layers=args.scan_layers)))


if __name__ == "__main__":
    main()
