"""Pink conversation templates + answer-only label masking.

Reference parity: ``/root/reference/prj/Pink/pink/conversation.py:1-484``
(``Conversation.get_prompt`` for the SINGLE / TWO / LLAMA2 / MPT separator
styles, the ``llamav1``/``llamav2`` template registry, ``copy()``'s
``sep_template``/``system_template`` derivation :173-189) and
``pink/datasets/BaseDataset.py:154-215`` (per-item system =
``"Image: " + N×<im_patch>`` or ``"Image: N/A"``; ``_construct_target``'s
round-split label masking :165-187 — only assistant answers supervise the
LM, instructions and separators are IGNORE_INDEX).

Fresh implementation of the same contract: a registered processor that turns
``{"conversations": [{"from": "human"|"gpt", "value": str}, ...],
"has_image": bool}`` into padded ``input_ids`` / ``input_mask`` / ``labels``
for ``models/pink.PinkModel``. The masking parity test
(tests/test_pink_conversation.py) runs the transcribed reference algorithm
side-by-side over the same tokenizer.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np

from antmmf_tpu.common.registry import registry
from antmmf_tpu.datasets.processors.processors import BaseProcessor

IGNORE_INDEX = -100
DEFAULT_IMAGE_PATCH_TOKEN = "<im_patch>"
PREFIX_IMAGE = "Image: "
PREFIX_NO_IMAGE = "Image: N/A"


@dataclass
class ConversationTemplate:
    """One chat format (reference Conversation, conversation.py:14-92)."""

    system: str
    roles: Tuple[str, str]
    sep_style: str  # "single" | "two" | "llama2" | "mpt"
    sep: str
    sep2: Optional[str] = None
    offset: int = 0
    messages: List[List[Optional[str]]] = field(default_factory=list)

    @property
    def sep_template(self) -> str:
        # copy() derivation (conversation.py:173-180)
        if self.sep_style == "llama2":
            return self.sep + self.roles[1] + " "
        return self.sep + self.roles[1] + ": "

    @property
    def system_template(self) -> str:
        if self.sep_style == "llama2":
            return "[INST] <<SYS>>\n{}\n<</SYS>>\n\n"
        return "{}"

    def render(self, system: str,
               messages: Sequence[Tuple[str, Optional[str]]]) -> str:
        """get_prompt (conversation.py:29-86) over explicit messages;
        ``system`` is the already-formatted system string."""
        if self.sep_style == "single":
            ret = system + self.sep if system else ""
            for role, msg in messages:
                ret += (role + ": " + msg + self.sep) if msg else (role + ":")
            return ret
        if self.sep_style == "two":
            seps = [self.sep, self.sep2]
            ret = system + seps[0] if system else ""
            for i, (role, msg) in enumerate(messages):
                ret += (role + ": " + msg + seps[i % 2]) if msg \
                    else (role + ":")
            return ret
        if self.sep_style == "llama2":
            seps = [self.sep, self.sep2]
            ret = system if system else "[INST] "
            for i, (role, msg) in enumerate(messages):
                if msg:
                    ret += (msg + " ") if i == 0 else \
                        (role + " " + msg + seps[i % 2])
                else:
                    ret += role
            return ret
        if self.sep_style == "mpt":
            ret = system + self.sep if system else ""
            for role, msg in messages:
                ret += (role + msg + self.sep) if msg else role
            return ret
        raise ValueError(f"Unknown sep_style {self.sep_style!r}")


# the reference registry ships llamav1/llamav2 (conversation.py:477-480);
# vicuna_v1_1 and mpt are the other formats its datasets reference
CONV_TEMPLATES: Dict[str, ConversationTemplate] = {
    "llamav1": ConversationTemplate(
        system="", roles=("USER", "ASSISTANT"), sep_style="two",
        sep="\n", sep2="</s>", offset=0),
    "llamav2": ConversationTemplate(
        system="", roles=("[INST]", "[/INST]"), sep_style="llama2",
        sep=" ", sep2=" </s><s>", offset=2),
    "vicuna_v1_1": ConversationTemplate(
        system="A chat between a curious user and an artificial intelligence "
               "assistant. The assistant gives helpful, detailed, and polite "
               "answers to the user's questions.",
        roles=("USER", "ASSISTANT"), sep_style="two", sep=" ", sep2="</s>",
        offset=0),
    "mpt": ConversationTemplate(
        system="<|im_start|>system\n- You are a helpful language and vision "
               "assistant.",
        roles=("<|im_start|>user\n", "<|im_start|>assistant\n"),
        sep_style="mpt", sep="<|im_end|>", offset=0),
}


def build_prompt(template: ConversationTemplate,
                 conversations: Sequence[Mapping[str, str]],
                 has_image: bool, num_patch_tokens: int) -> str:
    """Per-item prompt: system = "Image: " + N patch tokens (or N/A), then
    the rendered turns (BaseDataset._get_data_item_train:195-204)."""
    system = template.system_template.format(
        (PREFIX_IMAGE + num_patch_tokens * DEFAULT_IMAGE_PATCH_TOKEN)
        if has_image else PREFIX_NO_IMAGE)
    role_of = {"human": template.roles[0], "gpt": template.roles[1],
               "user": template.roles[0], "assistant": template.roles[1]}
    messages = [(role_of.get(m.get("from", "human"), template.roles[0]),
                 m.get("value")) for m in conversations]
    return template.render(system, messages)


def construct_target_reference(prompt: str, template: ConversationTemplate,
                               tokenize: Callable[[str], List[int]]
                               ) -> Tuple[List[int], List[int]]:
    """The reference label-mask algorithm VERBATIM
    (BaseDataset._construct_target, :165-187): tokenize the full prompt;
    mask position 0 (BOS); split rounds on ``sep2``; mask each round up to
    and including ``sep_template``; advance by token-count arithmetic with
    the reference's ``-2`` / ``offset`` constants.

    Those constants assume the LLaMA sentencepiece tokenizer (``</s>`` is
    ONE piece and every call prepends BOS); with a tokenizer where ``sep2``
    splits into several pieces the cursor drifts — use
    ``construct_target`` (segment-exact) for training."""
    inputs = tokenize(prompt)
    target = list(inputs)
    sep = template.sep_template
    rounds = prompt.split(template.sep2)
    cur = 1
    target[:cur] = [IGNORE_INDEX] * cur
    for rou in rounds:
        if rou == "":
            break
        parts = rou.split(sep)
        if len(parts) != 2:
            break
        instruction = parts[0] + sep
        round_len = len(tokenize(rou)) + template.offset
        instruction_len = len(tokenize(instruction)) - 2
        end = min(cur + instruction_len, len(target))
        target[cur:end] = [IGNORE_INDEX] * (end - cur)
        cur += round_len
    return inputs, target


def construct_target(prompt: str, template: ConversationTemplate,
                     tokenize: Callable[[str], List[int]]
                     ) -> Tuple[List[int], List[int]]:
    """Answer-only label masks with the REFERENCE INTENT (instructions +
    role markers IGNORE_INDEX, answer tokens + their round separator
    supervised) realized exactly for ANY tokenizer: each round's
    instruction / answer / sep2 segments are tokenized separately and
    concatenated, so inputs and labels are constructed together and can
    never drift (the reference's token-count arithmetic assumes the LLaMA
    tokenizer — see ``construct_target_reference``)."""
    if template.sep2 is None:
        raise ValueError(
            "construct_target needs a two-separator template (sep2); "
            f"template with sep_style={template.sep_style!r} has none")
    sep = template.sep_template
    rounds = prompt.split(template.sep2)
    inputs: List[int] = []
    target: List[int] = []

    def seg(text: str, supervise: bool) -> None:
        if not text:
            return
        ids = tokenize(text)
        ids = ids[0 if not inputs else 1:]  # keep BOS only once, masked
        tg = list(ids) if supervise else [IGNORE_INDEX] * len(ids)
        if supervise and not inputs:
            tg[0] = IGNORE_INDEX  # BOS never supervises
        inputs.extend(ids)
        target.extend(tg)

    for i, rou in enumerate(rounds):
        if rou == "":
            continue
        parts = rou.split(sep)
        if len(parts) != 2:
            seg(rou, False)  # trailing/malformed chunk: unsupervised
            continue
        seg(parts[0] + sep, False)  # system/instruction + role marker
        # answer + its round separator supervise the loss (the split
        # removed exactly one sep2 after every non-final round)
        tail = template.sep2 if i < len(rounds) - 1 else ""
        seg(parts[1] + tail, True)
    return inputs, target


@registry.register_processor("pink_conversation")
class PinkConversationProcessor(BaseProcessor):
    """{'conversations': [...], 'has_image': bool} →
    {'input_ids', 'input_mask', 'labels'} int64[max_length]."""

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *a, **k):
        super().__init__(config)
        cfg = self.config
        self.template_name = str(cfg.get("template", "llamav1"))
        if self.template_name not in CONV_TEMPLATES:
            raise KeyError(
                f"Unknown conversation template {self.template_name!r}; "
                f"known: {sorted(CONV_TEMPLATES)}")
        self.template = CONV_TEMPLATES[self.template_name]
        if self.template.sep2 is None:
            raise ValueError(
                f"template {self.template_name!r} has no round separator "
                "(sep2) — label masking needs a two-separator format "
                "(llamav1/llamav2/vicuna_v1_1)")
        self.num_patch_tokens = int(cfg.get("num_patch_tokens", 49))
        self.max_length = int(cfg.get("max_length", 256))
        from antmmf_tpu.datasets.processors.text_processors import (
            MaskedTokenProcessor)

        self._text = MaskedTokenProcessor(
            {**dict(cfg.get("text", {})), "mask_probability": 0.0,
             "max_seq_length": self.max_length})
        tok = self._text.tokenizer
        self.bos_id = int(cfg.get(
            "bos_id", tok.convert_tokens_to_ids(["[CLS]"])[0]))
        # the image patch placeholder id inside input_ids
        self.im_patch_id = int(cfg.get("im_patch_id", 1))

    def tokenize(self, text: str) -> List[int]:
        """BOS + wordpiece ids; <im_patch> runs become im_patch_id tokens
        (the reference adds them as special tokens)."""
        out = [self.bos_id]
        pieces = text.split(DEFAULT_IMAGE_PATCH_TOKEN)
        for i, piece in enumerate(pieces):
            if i:
                out.append(self.im_patch_id)
            if piece:
                toks = self._text.tokenizer.tokenize(piece)
                out.extend(self._text.tokenizer.convert_tokens_to_ids(toks))
        return out

    def __call__(self, item: Mapping[str, Any], *a, **k) -> Dict[str, Any]:
        convs = item.get("conversations", [])
        has_image = bool(item.get("has_image",
                                  item.get("image") is not None))
        prompt = build_prompt(self.template, convs, has_image,
                              self.num_patch_tokens)
        inputs, target = construct_target(prompt, self.template,
                                          self.tokenize)
        L = self.max_length
        ids = np.zeros((L,), np.int64)
        mask = np.zeros((L,), np.int64)
        labels = np.full((L,), IGNORE_INDEX, np.int64)
        n = min(len(inputs), L)
        ids[:n] = inputs[:n]
        mask[:n] = 1
        labels[:n] = target[:n]
        return {"input_ids": ids, "input_mask": mask, "labels": labels,
                "prompt": prompt}
