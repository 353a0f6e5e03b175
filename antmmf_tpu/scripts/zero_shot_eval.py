"""Zero-shot classification eval (the M2-Encoder headline benchmark harness).

Reference parity: ``/root/reference/prj/M2_Encoder`` evaluates zero-shot
ImageNet(-CN) top-1 (README.md:16 — 88.5% / 80.7%) by scoring each image
against label-prompt text embeddings. This harness does the same with any
registered contrastive model (m2_encoder, univl_retrieval, openai_clip):

  1. embed every class label through prompt templates ("a photo of a {}.")
     and average the text embeddings per class;
  2. embed images; predict = argmax cosine similarity;
  3. report top-1 / top-5.

Usage::

    python -m antmmf_tpu.scripts.zero_shot_eval --config <cfg.yml> \
        --image_dir data/imagenet/val --labels_file labels.txt \
        [--checkpoint save/models/best]
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

EN_TEMPLATES = (
    "a photo of a {}.",
    "a photo of the {}.",
    "a picture of a {}.",
)
CN_TEMPLATES = ("{}的照片。", "一张{}的图片。")


def build_class_embeddings(
    encode_text: Callable[[np.ndarray, np.ndarray], np.ndarray],
    tokenize: Callable[[str], Dict[str, np.ndarray]],
    labels: Sequence[str],
    templates: Sequence[str] = EN_TEMPLATES,
    batch_size: int = 64,
) -> np.ndarray:
    """[num_classes, D] L2-normalized prompt-ensembled class embeddings."""
    prompts: List[Dict[str, np.ndarray]] = []
    owners: List[int] = []
    for ci, label in enumerate(labels):
        for t in templates:
            prompts.append(tokenize(t.format(label)))
            owners.append(ci)
    embeds = []
    for s in range(0, len(prompts), batch_size):
        chunk = prompts[s: s + batch_size]
        ids = np.stack([c["input_ids"] for c in chunk])
        mask = np.stack([c["input_mask"] for c in chunk])
        embeds.append(np.asarray(encode_text(ids, mask), np.float32))
    embeds = np.concatenate(embeds)
    owners = np.asarray(owners)
    out = np.zeros((len(labels), embeds.shape[-1]), np.float32)
    for ci in range(len(labels)):
        mean = embeds[owners == ci].mean(axis=0)
        out[ci] = mean / max(np.linalg.norm(mean), 1e-9)
    return out


def zero_shot_accuracy(
    image_embeds: np.ndarray,   # [N, D] L2-normalized
    class_embeds: np.ndarray,   # [C, D] L2-normalized
    targets: np.ndarray,        # int[N]
) -> Dict[str, float]:
    sims = image_embeds @ class_embeds.T
    order = np.argsort(-sims, axis=-1)
    top1 = float((order[:, 0] == targets).mean()) * 100.0
    k = min(5, class_embeds.shape[0])
    top5 = float((order[:, :k] == targets[:, None]).any(-1).mean()) * 100.0
    return {"zero_shot_top1": top1, "zero_shot_top5": top5,
            "n": float(len(targets))}


def main(argv=None) -> None:
    # honor JAX_PLATFORMS even when a plugin registered itself
    # programmatically (same contract as antmmf_tpu.run / predictors.cli)
    import os

    if os.environ.get("JAX_PLATFORMS") in ("cpu",):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from antmmf_tpu.common.build import build_config
    from antmmf_tpu.datasets.processors.image_processors import (
        NormalizedImageProcessor,
    )
    from antmmf_tpu.datasets.processors.text_processors import (
        MaskedTokenProcessor,
    )
    from antmmf_tpu.models.base_model import build_model

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--image_dir", required=True,
                        help="<dir>/<class_name>/*.jpg layout")
    parser.add_argument("--labels_file", default=None,
                        help="one label per line; default = subdir names")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--templates", default="en", choices=("en", "cn"))
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--image_size", type=int, default=224)
    args = parser.parse_args(argv)

    cfg = build_config(args.config)
    shell = build_model(cfg, for_test=True, online_serving=True)
    proc = NormalizedImageProcessor({"size": args.image_size,
                                     "resize": args.image_size + 32})
    text_cfg = dict(cfg.get_dotted(
        "task_attributes") or {}).get("text", {}) if hasattr(
        cfg, "get_dotted") else {}
    tok = MaskedTokenProcessor({**text_cfg, "mask_probability": 0,
                                "max_seq_length": 52})

    classes = sorted(
        d for d in os.listdir(args.image_dir)
        if os.path.isdir(os.path.join(args.image_dir, d)))
    labels = [l.strip() for l in open(args.labels_file)] \
        if args.labels_file else classes

    import cv2

    paths, targets = [], []
    for ci, cname in enumerate(classes):
        for f in sorted(os.listdir(os.path.join(args.image_dir, cname))):
            paths.append(os.path.join(args.image_dir, cname, f))
            targets.append(ci)

    example = {
        "image_data": np.zeros((1, args.image_size, args.image_size, 3),
                               np.float32),
        "input_ids": np.zeros((1, 52), np.int64),
        "input_mask": np.ones((1, 52), np.int64),
    }
    variables = shell.init(jax.random.PRNGKey(0), example)
    if args.checkpoint:
        from antmmf_tpu.common.checkpoint import Checkpoint

        ck = Checkpoint(cfg, load_only=True)
        state_like = type("S", (), {"variables": variables})()
        state_like, _ = ck.load_model_weights(state_like, args.checkpoint)
        variables = state_like.variables

    module = shell.module

    def encode_text(ids, mask):
        emb, _ = module.apply(variables, ids, mask,
                              method=type(module).encode_text)
        return emb

    def encode_images(imgs):
        emb, _ = module.apply(variables, imgs,
                              method=type(module).encode_image)
        return emb

    class_embeds = build_class_embeddings(
        jax.jit(encode_text), lambda t: tok({"text": t}), labels,
        EN_TEMPLATES if args.templates == "en" else CN_TEMPLATES,
        args.batch_size)

    jit_img = jax.jit(encode_images)
    img_embeds = []
    for s in range(0, len(paths), args.batch_size):
        batch_paths = paths[s: s + args.batch_size]
        imgs = np.stack([
            proc.transform_array(cv2.imread(p)[:, :, ::-1])
            for p in batch_paths])
        pad = args.batch_size - len(imgs)
        if pad:
            imgs = np.concatenate([imgs, np.zeros_like(imgs[:pad])])
        emb = np.asarray(jit_img(imgs), np.float32)
        img_embeds.append(emb[: len(batch_paths)])
    img_embeds = np.concatenate(img_embeds)

    print(json.dumps(zero_shot_accuracy(
        img_embeds, class_embeds, np.asarray(targets))))


if __name__ == "__main__":
    main()
