"""Pink instruction-tuning dataset: per-benchmark format adapters +
probability-interleaved source mixing.

Reference parity: ``/root/reference/prj/Pink/pink/datasets/`` — ~20
per-benchmark Dataset classes (``VQAv2.py:30-100`` QuestionAnswer templates
with ``<qes>`` marks, ``VisualGrounding.py`` ``<des>expr</des>`` questions
with serialized-box answers, ``COCOCaption.py``/``FlickrCaption.py`` caption
instructions, ``PointingVQALocal.py`` ``"<q> <loc>[x,y]</loc>"``,
``LLaVA.py`` raw conversation passthrough, ``FlickrEntity.py`` region
captions) all reduce to the same pipeline: row → (instruction, answer)
conversation → conversation-template render → tokenize with answer-only
supervision. ``ProbMergeDataset.py:10-50`` interleaves the sources by
probability with first/all_exhausted stopping (the HF interleave_datasets
index convention). Here ONE dataset covers every format via a per-source
``format`` knob, and the interleave index is precomputed with a seeded
generator so epochs are reproducible.

Config::

    pink_instruct:
      data_root_dir: tests/data/pink
      sources:
        - {annotations: vqa.jsonl, image_dir: images, format: vqa, weight: 2}
        - {annotations: ground.jsonl, image_dir: images, format: grounding}
      stopping_strategy: all_exhausted   # or first_exhausted
      seed: 42
      add_marks: true                    # <qes>/<des> instruction tags
      expand2square: true                # box normalization frame
      image: {size: 224, resize: 256}
      conversation: {template: llamav1, num_patch_tokens: 49, max_length: 256}
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np

from antmmf_tpu.common.registry import registry
from antmmf_tpu.datasets.base_dataset import BaseDataset
from antmmf_tpu.datasets.base_dataset_builder import BaseDatasetBuilder
from antmmf_tpu.datasets.processors.pink_conversation import (
    PinkConversationProcessor,
)
from antmmf_tpu.datasets.processors.pink_processors import (
    REGION_CAPTION_TEMPLATES,
    VISUAL_GROUNDING_TEMPLATES,
    serialize_box,
)
from antmmf_tpu.structures.sample import Sample

BEGIN_QUESTION, END_QUESTION = "<qes>", "</qes>"
BEGIN_DESCRIPTION, END_DESCRIPTION = "<des>", "</des>"
BEGIN_LOC, END_LOC = "<loc>", "</loc>"

# Instruction paraphrase pools in the style of the reference Templates.py
# families (fresh wordings, same placeholder structure — the reference
# random.choice's from ~50-entry pools per row).
VQA_INSTRUCTIONS = (
    "Please answer this question about the image: <question>",
    "Look at the image and give a short answer: <question>",
    "Based on the image, answer briefly: <question>",
)
CAPTION_INSTRUCTIONS = (
    "Describe the image briefly.",
    "Give a short caption for this image.",
    "What is shown in the image?",
)


def interleave_index(
    lengths: Sequence[int],
    probabilities: Optional[Sequence[float]] = None,
    seed: int = 42,
    stopping_strategy: str = "all_exhausted",
) -> np.ndarray:
    """Global-index order that interleaves N sources (reference
    ProbMergeDataset._interleave_dataset_index convention):

    - ``probabilities=None``: cycle sources round-robin; first_exhausted
      stops at the shortest source, all_exhausted wraps short sources until
      the longest is consumed once.
    - with probabilities: draw the next source from a seeded generator;
      first_exhausted stops the moment any source is fully consumed,
      all_exhausted keeps drawing (exhausted sources restart from row 0)
      until every source has been fully consumed at least once.
    """
    lengths = [int(l) for l in lengths]
    if any(l <= 0 for l in lengths):
        raise ValueError(f"every source needs rows, got lengths={lengths}")
    n = len(lengths)
    offsets = np.cumsum([0] + lengths[:-1])
    oversample = stopping_strategy == "all_exhausted"
    if stopping_strategy not in ("all_exhausted", "first_exhausted"):
        raise ValueError(f"unknown stopping_strategy {stopping_strategy!r}")

    if probabilities is None:
        if oversample:
            m = max(lengths)
            cols = [offsets[i] + (np.arange(m) % lengths[i])
                    for i in range(n)]
        else:
            m = min(lengths)
            cols = [offsets[i] + np.arange(m) for i in range(n)]
        return np.stack(cols, axis=1).reshape(-1)

    p = np.asarray(probabilities, np.float64)
    if (p < 0).any() or p.sum() <= 0:
        raise ValueError(f"bad probabilities {probabilities}")
    if not oversample and (p == 0).any():
        raise ValueError("zero probability with first_exhausted never "
                         "finishes that source")
    p = p / p.sum()
    rng = np.random.default_rng(seed)
    counters = np.zeros(n, np.int64)
    done = np.zeros(n, bool)
    out: List[int] = []
    while True:
        i = int(rng.choice(n, p=p))
        out.append(int(offsets[i] + counters[i] % lengths[i]))
        counters[i] += 1
        if counters[i] >= lengths[i]:
            done[i] = True
            if not oversample:
                break
            if done.all():
                break
    return np.asarray(out, np.int64)


def build_conversations(
    fmt: str, row: Mapping[str, Any],
    pick: Callable[[Sequence[str]], str],
    add_marks: bool = True, expand2square: bool = True,
) -> Tuple[List[Dict[str, str]], bool]:
    """row → ([{from, value}, ...], has_image) for one training example.

    Mirrors the reference adapters' question/answer construction:
    vqa (VQAv2.py:54-66 — <qes> marks or the single-word hint), caption
    (COCOCaption.py), grounding (VisualGrounding.py — <des> expr, box
    answer), region_caption (FlickrEntity.py — <loc> box, caption answer),
    pointing (PointingVQALocal.py — raw-normalized point, no
    expand2square), conversations (LLaVA.py passthrough).
    """
    w = float(row.get("width", 1.0))
    h = float(row.get("height", 1.0))
    if fmt == "conversations":
        convs = [dict(m) for m in row["conversations"]]
        return convs, bool(row.get("image") or row.get("image_path"))
    if fmt == "vqa":
        q = str(row["question"])
        if add_marks:
            instr = pick(VQA_INSTRUCTIONS).replace(
                "<question>", BEGIN_QUESTION + q + END_QUESTION)
        else:
            instr = q + "\nAnswer the question using a single word or phrase."
        answers = row.get("answers")
        answer = str(answers[0] if answers else row["answer"])
    elif fmt == "caption":
        instr = pick(CAPTION_INSTRUCTIONS)
        answer = str(row["caption"])
    elif fmt == "grounding":
        expr = str(row.get("expr", row.get("caption", "")))
        instr = pick(VISUAL_GROUNDING_TEMPLATES).replace(
            "<expr>",
            BEGIN_DESCRIPTION + expr + END_DESCRIPTION if add_marks else expr)
        answer = serialize_box(row["bbox"], w, h, expand2square=expand2square)
    elif fmt == "region_caption":
        loc = serialize_box(row["bbox"], w, h, expand2square=expand2square)
        instr = pick(REGION_CAPTION_TEMPLATES).replace("<objs>", loc)
        answer = str(row["caption"])
    elif fmt == "pointing":
        # pointing protocols scale by raw 1/width, no expand2square
        # (model_pointingvqa_local.py:180-190)
        if "point" in row:
            px, py = row["point"]
            loc = "[{:.3f},{:.3f}]".format(px / w, py / h)
        else:
            b = row["bbox"]
            loc = "[{:.3f},{:.3f},{:.3f},{:.3f}]".format(
                b[0] / w, b[1] / h, b[2] / w, b[3] / h)
        instr = f"{row['question']} {BEGIN_LOC}{loc}{END_LOC}"
        answer = str(row["answer"])
    else:
        raise KeyError(f"Unknown pink_instruct format {fmt!r}")
    return ([{"from": "human", "value": instr},
             {"from": "gpt", "value": answer}], True)


class PinkInstructDataset(BaseDataset):
    """Interleaved multi-source instruction-tuning dataset feeding
    PinkModel's answer-supervised LM loss (models/pink.py lm_loss)."""

    def __init__(self, name: str, dataset_type: str, config: Mapping):
        super().__init__(name, dataset_type, config)
        cfg = self.config
        import json

        root = cfg.get("data_root_dir", ".")
        self.add_marks = bool(cfg.get("add_marks", True))
        self.expand2square = bool(cfg.get("expand2square", True))
        self.seed = int(cfg.get("seed", 42))
        self.sources: List[Dict[str, Any]] = []
        weights: List[float] = []
        weighted = False
        for src in cfg.get("sources", []):
            path = os.path.join(root, src["annotations"])
            rows = [json.loads(l) for l in open(path) if l.strip()]
            if not rows:
                raise ValueError(f"empty annotation file {path}")
            self.sources.append({
                "rows": rows,
                "image_dir": os.path.join(root, src.get("image_dir", "")),
                "format": str(src.get("format", "vqa")),
            })
            weights.append(float(src.get("weight", 1.0)))
            weighted = weighted or ("weight" in src)
        if not self.sources:
            raise ValueError("pink_instruct needs at least one source")
        lengths = [len(s["rows"]) for s in self.sources]
        self._bounds = np.cumsum([0] + lengths)
        self.index_mapping = interleave_index(
            lengths, weights if weighted else None, seed=self.seed,
            stopping_strategy=str(
                cfg.get("stopping_strategy", "all_exhausted")))

        from antmmf_tpu.datasets.processors.image_processors import (
            NormalizedImageProcessor,
        )

        self.image_processor = NormalizedImageProcessor(
            dict(cfg.get("image", {"size": 224})),
            is_train=dataset_type == "train")
        self.image_size = int(self.image_processor.size)
        conv_cfg = dict(cfg.get("conversation", {}))
        # PinkModel uses a vision-PREFIX layout (models/pink.py _assemble:
        # vision tokens prepended, [vision; text] == the reference's
        # leading-patch-run splice, test_pink_full_parity.py) — textual
        # <im_patch> placeholders would be embedded as plain tokens, so the
        # rendered prompt carries none by default.
        conv_cfg.setdefault("num_patch_tokens", 0)
        self.conversation = PinkConversationProcessor(conv_cfg)

    def __len__(self) -> int:
        return len(self.index_mapping)

    def _route(self, global_idx: int) -> Tuple[Dict[str, Any], int]:
        src_i = int(np.searchsorted(self._bounds, global_idx, "right")) - 1
        return self.sources[src_i], int(global_idx - self._bounds[src_i])

    def get_item(self, idx: int) -> Sample:
        src, row_i = self._route(int(self.index_mapping[idx]))
        row = src["rows"][row_i]
        # per-item template choice: seeded like the reference's
        # random.choice but reproducible across runs/workers
        rng = np.random.default_rng((self.seed, idx))
        convs, has_image = build_conversations(
            src["format"], row,
            pick=lambda pool: pool[int(rng.integers(0, len(pool)))],
            add_marks=self.add_marks, expand2square=self.expand2square)
        enc = self.conversation({"conversations": convs,
                                 "has_image": has_image})
        sample = Sample()
        for key in ("input_ids", "input_mask", "labels"):
            sample[key] = enc[key]
        img = None
        name = row.get("image", row.get("image_path"))
        if has_image and name:
            import cv2

            raw = cv2.imread(os.path.join(src["image_dir"], str(name)))
            if raw is not None:
                img = self.image_processor.transform_array(raw[:, :, ::-1])
        if img is None:  # text-only row or unreadable file: black frame
            img = np.zeros((self.image_size, self.image_size, 3), np.float32)
        sample["image_data"] = img[None]  # [T=1, H, W, C]
        sample["id"] = np.int64(idx)
        return sample


@registry.register_builder("pink_instruct")
class PinkInstructBuilder(BaseDatasetBuilder):
    def __init__(self, dataset_name: str = "pink_instruct"):
        super().__init__(dataset_name)

    def _load(self, dataset_type: str, config, *args: Any, **kw: Any):
        return PinkInstructDataset(self.dataset_name, dataset_type, config)
