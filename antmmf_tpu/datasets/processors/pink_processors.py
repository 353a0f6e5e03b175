"""Pink referential-comprehension processors: box↔text serialization + prompts.

Reference parity: ``/root/reference/prj/Pink/pink/datasets/`` — boxes are
normalized to [0, 1] (optionally after expand2square padding) and serialized
into the caption stream as ``<loc>[x1,y1,x2,y2]</loc>`` with 3-decimal
coordinates (VisualGenome.py:82 etc.); instruction prompts are drawn from task
template pools (Templates.py) and assembled with a conversation template
(conversation.py). Eval parses predicted boxes back from generated text.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np

from antmmf_tpu.common.registry import registry
from antmmf_tpu.datasets.processors.processors import BaseProcessor
from antmmf_tpu.utils.conversation import get_conv_template

BEGIN_LOC, END_LOC = "<loc>", "</loc>"

# representative prompt pool (reference Templates.py VisualGrounding)
VISUAL_GROUNDING_TEMPLATES = (
    "Where is <expr>?",
    "Where is <expr>? answer in [x0,y0,x1,y1] format.",
    "What are the coordinates of <expr> in the image?",
    "Can you point out <expr> in the image and provide the coordinates of "
    "its location?",
    "Please, point out the position of <expr> in the image by giving its "
    "coordinates.",
)
REGION_CAPTION_TEMPLATES = (
    "Describe the region <objs> in the image.",
    "What is in the region <objs>?",
    "Give a short description of the area <objs>.",
)

_BOX_RE = re.compile(
    r"\[\s*([0-9.]+)\s*,\s*([0-9.]+)\s*,\s*([0-9.]+)\s*,\s*([0-9.]+)\s*\]")


def expand2square_offset(width: float, height: float) -> Tuple[float, float, float]:
    """(offset_x, offset_y, scale) that maps original pixel coords into the
    square-padded normalized frame (reference BaseDataset._expand2square_offset)."""
    side = max(width, height)
    return (side - width) / 2.0, (side - height) / 2.0, 1.0 / side


def serialize_box(box: Sequence[float], width: float, height: float,
                  expand2square: bool = True, with_tags: bool = True) -> str:
    """xyxy pixel box → '<loc>[x1,y1,x2,y2]</loc>' normalized, 3 decimals."""
    x1, y1, x2, y2 = [float(v) for v in box]
    if expand2square:
        ox, oy, s = expand2square_offset(width, height)
        scaled = [(x1 + ox) * s, (y1 + oy) * s, (x2 + ox) * s, (y2 + oy) * s]
    else:
        scaled = [x1 / width, y1 / height, x2 / width, y2 / height]
    body = "[{:.3f},{:.3f},{:.3f},{:.3f}]".format(*scaled)
    return BEGIN_LOC + body + END_LOC if with_tags else body


def parse_boxes(text: str, width: float = 1.0, height: float = 1.0,
                expand2square: bool = True) -> np.ndarray:
    """Extract every '[x1,y1,x2,y2]' from generated text → pixel xyxy [N, 4]."""
    boxes = []
    for m in _BOX_RE.finditer(text):
        x1, y1, x2, y2 = (float(g) for g in m.groups())
        if expand2square:
            side = max(width, height)
            ox, oy = (side - width) / 2.0, (side - height) / 2.0
            boxes.append([x1 * side - ox, y1 * side - oy,
                          x2 * side - ox, y2 * side - oy])
        else:
            boxes.append([x1 * width, y1 * height, x2 * width, y2 * height])
    return np.asarray(boxes, np.float32).reshape(-1, 4)


@registry.register_processor("pink_box")
class PinkBoxProcessor(BaseProcessor):
    """{'box', 'width', 'height'} → serialized location tokens (and back)."""

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *a, **k):
        super().__init__(config)
        self.expand2square = bool(self.config.get("expand2square", True))
        self.with_tags = bool(self.config.get("with_tags", True))

    def __call__(self, item: Mapping[str, Any], *a, **k) -> Dict[str, Any]:
        text = serialize_box(item["box"], item["width"], item["height"],
                             self.expand2square, self.with_tags)
        return {"location_tokens": text}

    def parse(self, text: str, width: float = 1.0, height: float = 1.0):
        return parse_boxes(text, width, height, self.expand2square)


@registry.register_processor("pink_prompt")
class PinkPromptProcessor(BaseProcessor):
    """Assemble a grounding/region-caption training prompt + answer.

    Input item: {task: visual_grounding|region_caption, expr|phrase, box,
    width, height}. Output: {"prompt", "answer", "text"} — text is the full
    conversation string for the LM (answer tokens supervised)."""

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *a, **k):
        super().__init__(config)
        self.template = str(self.config.get("conv_template", "vicuna_v1"))
        self.expand2square = bool(self.config.get("expand2square", True))
        self.rng = np.random.default_rng(self.config.get("seed"))

    def __call__(self, item: Mapping[str, Any], *a, **k) -> Dict[str, Any]:
        task = item.get("task", "visual_grounding")
        loc = serialize_box(item["box"], item["width"], item["height"],
                            self.expand2square)
        if task == "visual_grounding":
            pool = VISUAL_GROUNDING_TEMPLATES
            q = pool[int(self.rng.integers(0, len(pool)))].replace(
                "<expr>", str(item.get("expr", item.get("phrase", ""))))
            answer = loc
        elif task == "region_caption":
            pool = REGION_CAPTION_TEMPLATES
            q = pool[int(self.rng.integers(0, len(pool)))].replace(
                "<objs>", loc)
            answer = str(item.get("phrase", item.get("caption", "")))
        else:
            raise KeyError(f"Unknown pink task {task!r}")
        conv = get_conv_template(self.template)
        conv.append_message(conv.roles[0], q)
        conv.append_message(conv.roles[1], answer)
        return {"prompt": q, "answer": answer, "text": conv.get_prompt()}
