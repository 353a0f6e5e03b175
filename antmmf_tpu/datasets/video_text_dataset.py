"""Video/image-text retrieval + pretraining dataset (MSR-VTT jsonl format).

Reference parity: ``/root/reference/prj/base_vtp/roi_univl/univl/video_text/
ret_dataset.py`` (retrieval annotations with caption/video grouping :21-80, batch
schema :127-199 — SURVEY.md §8.2) and the sparse-sampled video pipeline of
``pretrain_video_text/dataset.py:174-533``.

Batch fields produced (fixed shapes, §8.2 contract):
  image_data        float32[F, H, W, 3]   (F = n_clips * frames_per_clip; NHWC)
  video_mask        int64[F]
  caption_input_ids / caption_input_mask / caption_segment_ids /
  caption_lm_label_ids                    int64[L] (masked when mlm enabled)
  caption_raw_input_ids                   int64[L] (always unmasked)
  image_vid         int64 scalar — unique-video id (multi-gt retrieval eval)
  caption_tid       int64 scalar — caption id
  targets           int64 scalar (when labels exist)
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Mapping, Optional

import numpy as np

from antmmf_tpu.common.registry import registry
from antmmf_tpu.datasets.base_dataset import BaseDataset
from antmmf_tpu.datasets.base_dataset_builder import BaseDatasetBuilder
from antmmf_tpu.datasets.database.annotated import AnnotatedDatabase
from antmmf_tpu.datasets.database.video_database import MultiSourceLoader
from antmmf_tpu.datasets.database.image_database import ImageDatabase
from antmmf_tpu.datasets.processors.image_processors import NormalizedImageProcessor
from antmmf_tpu.datasets.processors.text_processors import MaskedTokenProcessor


class VideoTextDataset(BaseDataset):
    def __init__(self, name: str, dataset_type: str, config: Mapping):
        super().__init__(name, dataset_type, config)
        cfg = self.config
        root = cfg.get("data_root_dir", ".")
        ann_cfg = cfg.get("annotations", {})
        ann_path = ann_cfg.get(dataset_type) or ann_cfg.get("train")
        if ann_path is None:
            raise ValueError(f"No annotation path for {dataset_type!r}")
        self.annotations = AnnotatedDatabase(os.path.join(root, ann_path))

        self.media_format = cfg.get("media_format", "video")  # video | image | mixed
        media_root = os.path.join(root, cfg.get("video_root", cfg.get("image_root", "")))
        if self.media_format in ("video", "mixed"):
            # source=auto prefers a sibling <root>_keyframes tree (decode-free
            # thin-host fast path) and falls back to mp4 sparse sampling
            self.video_db = MultiSourceLoader(
                media_root, source=cfg.get("video_source", "auto"),
                seed=cfg.get("seed", 0))
        if self.media_format in ("image", "mixed"):
            img_root = os.path.join(root, cfg.get("image_root", "")) \
                if cfg.get("image_root") is not None else media_root
            self.image_db = ImageDatabase(img_root)

        # ASR transcript mixing (reference pretrain_video_text/dataset.py
        # ImageVideoDatabase/ASR-mix): per-clip json {start[], end[], text[]}
        self.asr_root = cfg.get("asr_root")
        if self.asr_root is not None:
            self.asr_root = os.path.join(root, self.asr_root)

        self.n_clips = int(cfg.get("n_clips", 1))
        self.frames_per_clip = int(cfg.get("frames_per_clip", cfg.get("num_frames", 4)))
        img_cfg = dict(cfg.get("image", {"size": 224}))
        if dataset_type != "train":  # augmentation is train-only
            img_cfg.pop("train_augment", None)
        self.image_processor = NormalizedImageProcessor(img_cfg)

        text_cfg = dict(cfg.get("text", {}))
        text_cfg.setdefault("vocab_file",
                            "tests/data/vocabs/bert-base-uncased_30522_vocab.txt")
        text_cfg.setdefault("max_seq_length", int(cfg.get("max_text_len", 30)))
        self.caption_processor = MaskedTokenProcessor(text_cfg)
        self.mlm = bool(cfg.get("mlm", False))

        # caption/video grouping for multi-gt retrieval eval (ret_dataset.py:21-80)
        self.video_ids: List[int] = []
        uniq: Dict[str, int] = {}
        for ann in self.annotations.data:
            key = str(ann.get("clip_name", ann.get("image", "")))
            if key not in uniq:
                uniq[key] = len(uniq)
            self.video_ids.append(uniq[key])
        self.num_unique_videos = len(uniq)

    def __len__(self) -> int:
        return len(self.annotations)

    def get_label(self, idx: int):
        return self.annotations[idx].get("label", 0)

    _IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")

    def _is_image_record(self, ann: Mapping) -> bool:
        if self.media_format == "image":
            return True
        if self.media_format == "video":
            return False
        name = str(ann.get("clip_name", ann.get("image", "")))
        return ann.get("type") == "image" or name.lower().endswith(self._IMG_EXTS)

    def _load_frames(self, ann: Mapping) -> np.ndarray:
        if not self._is_image_record(ann):
            clips = self.video_db.get(
                str(ann["clip_name"]),
                n_clips=self.n_clips,
                frames_per_clip=self.frames_per_clip,
                start=ann.get("start"),
                end=ann.get("end"),
                is_training=self.is_training(),
            )  # uint8 [n_clips, fpc, H, W, 3]
            return clips.reshape((-1,) + clips.shape[2:])
        img = self.image_db(str(ann.get("image", ann.get("clip_name"))))
        return np.repeat(img[None], self.n_clips * self.frames_per_clip, axis=0)

    def _asr_caption(self, ann: Mapping) -> str:
        import json

        clip = os.path.splitext(str(ann.get("clip_name", "")))[0]
        path = os.path.join(self.asr_root, os.path.basename(clip))
        if not os.path.exists(path):
            return ""
        try:
            with open(path, encoding="utf-8") as f:
                asr = json.load(f)
            return " ".join(asr.get("text", []))
        except (OSError, ValueError):
            return ""

    def get_item(self, idx: int):
        from antmmf_tpu.structures.sample import Sample

        ann = self.annotations[idx]
        frames = self._load_frames(ann)
        image_data = np.stack(
            [self.image_processor.transform_array(f) for f in frames]
        ).astype(np.float32)

        sample = Sample()
        sample["image_data"] = image_data
        sample["video_mask"] = np.ones((image_data.shape[0],), dtype=np.int64)
        sample["image_vid"] = np.int64(self.video_ids[idx])
        sample["caption_tid"] = np.int64(idx)

        caption = str(ann.get("caption", ann.get("text", "")))
        if not caption and self.asr_root is not None:
            caption = self._asr_caption(ann)
        masked = self.caption_processor(
            {"text": caption}, probability=None if self.mlm and self.is_training() else 0.0
        )
        raw = self.caption_processor({"text": caption}, probability=0.0)
        for key in ("input_ids", "input_mask", "segment_ids", "lm_label_ids"):
            sample[f"caption_{key}"] = masked[key]
        sample["caption_raw_input_ids"] = raw["input_ids"]
        sample["caption_text"] = caption

        if "label" in ann:
            sample["targets"] = np.int64(ann["label"])
        return sample


@registry.register_builder("video_text_retrieval")
@registry.register_builder("univl_dataset")
class VideoTextRetrievalBuilder(BaseDatasetBuilder):
    def __init__(self, dataset_name: str = "video_text_retrieval"):
        super().__init__(dataset_name)

    def _load(self, dataset_type: str, config, *args: Any, **kw: Any):
        return VideoTextDataset(self.dataset_name, dataset_type, config)


@registry.register_builder("video_text_pretrain")
class VideoTextPretrainBuilder(BaseDatasetBuilder):
    """Same pipeline with MLM masking enabled (pretraining objectives)."""

    def __init__(self, dataset_name: str = "video_text_pretrain"):
        super().__init__(dataset_name)

    def _load(self, dataset_type: str, config, *args: Any, **kw: Any):
        cfg = dict(config or {})
        cfg["mlm"] = True
        return VideoTextDataset(self.dataset_name, dataset_type, cfg)
