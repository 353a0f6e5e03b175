"""Offline visual feature extraction: image dir → per-image .npy features.

Reference parity: ``/root/reference/antmmf/scripts/features/`` (offline
ResNet/FRCNN feature extraction + LMDB conversion, 1187 LoC). This extractor
runs any registered visual backbone batched under jit and writes npy files the
``FeaturesDatabase`` reads back; an optional LMDB packer mirrors
``lmdb_conversion.py`` when lmdb is installed.

Usage::

    python -m antmmf_tpu.scripts.extract_features \
        --image_dir data/images --out_dir data/features \
        --encoder vit --preset vit_base_patch32 --batch_size 64
"""

from __future__ import annotations

import argparse
import os
from typing import List

import numpy as np


def iter_batches(paths: List[str], batch_size: int):
    for i in range(0, len(paths), batch_size):
        yield paths[i:i + batch_size]


def main(argv=None) -> None:
    import jax

    from antmmf_tpu.datasets.database.image_database import ImageDatabase
    from antmmf_tpu.datasets.processors.image_processors import (
        NormalizedImageProcessor,
    )
    from antmmf_tpu.modules.encoders.visual_encoder import VisualEncoder

    parser = argparse.ArgumentParser(allow_abbrev=False)
    parser.add_argument("--image_dir", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--encoder", default="vit")
    parser.add_argument("--preset", default="vit_base_patch32")
    parser.add_argument("--image_size", type=int, default=224)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--pack_lmdb", default=None,
                        help="optional output .lmdb path")
    parser.add_argument(
        "--mode", default="grid", choices=("grid", "regions"),
        help="grid: [h*w, C] token features; regions: .npz with pooled "
        "region features + absolute xyxy boxes + conf (the FRCNN-output "
        "format the reference's region pipeline consumes — grid-cell "
        "regions per 'In Defense of Grid Features', detr_processor class)")
    parser.add_argument("--num_regions", type=int, default=36,
                        help="regions mode: k*k grid cells (36 = 6x6)")
    args = parser.parse_args(argv)

    db = ImageDatabase(args.image_dir)
    proc = NormalizedImageProcessor({"size": args.image_size,
                                     "resize": args.image_size + 32})
    names = sorted(
        f for f in os.listdir(args.image_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp", ".webp")))
    os.makedirs(args.out_dir, exist_ok=True)

    enc = VisualEncoder(encoder_type=args.encoder, preset=args.preset,
                        image_size=args.image_size)
    example = np.zeros((1, 1, args.image_size, args.image_size, 3), np.float32)
    variables = enc.init(jax.random.PRNGKey(0), example)

    @jax.jit
    def extract(imgs):
        out = enc.apply(variables, imgs)
        gf = out["grid_feature"][:, 0]  # [B, h, w, C]
        B, h, w, C = gf.shape
        return gf.reshape(B, h * w, C)

    k = max(1, int(round(args.num_regions ** 0.5)))

    @jax.jit
    def extract_regions(imgs):
        out = enc.apply(variables, imgs)
        gf = out["grid_feature"][:, 0]  # [B, h, w, C]
        B, h, w, C = gf.shape
        # pool h×w grid into k×k region cells (mean) — grid-cell regions
        ph, pw = h // k, w // k
        cells = gf[:, : ph * k, : pw * k].reshape(B, k, ph, k, pw, C)
        feats = cells.mean(axis=(2, 4)).reshape(B, k * k, C)
        return feats

    def region_boxes() -> np.ndarray:
        s = args.image_size / k
        boxes = np.array([[x * s, y * s, (x + 1) * s, (y + 1) * s]
                          for y in range(k) for x in range(k)], np.float32)
        return boxes

    for batch_names in iter_batches(names, args.batch_size):
        imgs = np.stack([proc.transform_array(db(n)) for n in batch_names])
        if args.mode == "regions":
            # fp32 on disk: npy/npz can't represent bfloat16 portably
            feats = np.asarray(extract_regions(imgs[:, None]),
                               dtype=np.float32)
            boxes = region_boxes()
            for name, feat in zip(batch_names, feats):
                np.savez(
                    os.path.join(args.out_dir,
                                 os.path.splitext(name)[0] + ".npz"),
                    features=feat, boxes=boxes,
                    conf=np.ones(len(boxes), np.float32),
                    image_size=np.array([args.image_size] * 2, np.int64))
        else:
            feats = np.asarray(extract(imgs[:, None]), dtype=np.float32)
            for name, feat in zip(batch_names, feats):
                np.save(os.path.join(args.out_dir,
                                     os.path.splitext(name)[0] + ".npy"), feat)
    print(f"extracted {len(names)} feature files to {args.out_dir}")

    if args.pack_lmdb:
        try:
            import lmdb

            env = lmdb.open(args.pack_lmdb, map_size=1 << 40)
            with env.begin(write=True) as txn:
                for name in names:
                    key = os.path.splitext(name)[0]
                    path = os.path.join(args.out_dir, key + ".npy")
                    with open(path, "rb") as f:
                        txn.put(key.encode(), f.read())
        except ImportError:
            # pure-Python packer (utils/lmdb_lite) — same on-disk format
            from antmmf_tpu.utils.lmdb_lite import LmdbLiteWriter

            w = LmdbLiteWriter(args.pack_lmdb)
            for name in names:
                key = os.path.splitext(name)[0]
                path = os.path.join(args.out_dir, key + ".npy")
                with open(path, "rb") as f:
                    w.put(key, f.read())
            w.save()
        print(f"packed into {args.pack_lmdb}")


if __name__ == "__main__":
    main()
