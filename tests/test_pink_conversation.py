"""Pink conversation-template + label-mask parity.

The reference conversation machinery (prj/Pink/pink/conversation.py, pure
dataclasses) runs in-process: our templates must render byte-identical
prompts, and our ``construct_target`` must produce the same answer-only
label masks as a transcription of ``BaseDataset._construct_target``
(:165-187) over the SAME tokenizer.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

from antmmf_tpu.datasets.processors.pink_conversation import (
    CONV_TEMPLATES, IGNORE_INDEX, PinkConversationProcessor, build_prompt,
    construct_target, construct_target_reference)

REF = "/root/reference/prj/Pink/pink/conversation.py"
pytestmark = pytest.mark.skipif(not os.path.isfile(REF),
                                reason="reference checkout not present")


def _load_ref_conversation():
    spec = importlib.util.spec_from_file_location("ref_pink_conv", REF)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_pink_conv"] = mod
    spec.loader.exec_module(mod)
    return mod


CONVS = [
    {"from": "human", "value": "What is in the image?"},
    {"from": "gpt", "value": "A dog playing with a ball."},
    {"from": "human", "value": "Where is the ball [0.1,0.2,0.4,0.5]?"},
    {"from": "gpt", "value": "On the grass near the dog."},
]


@pytest.mark.parametrize("name", ["llamav1", "llamav2"])
def test_prompt_matches_reference_template(name):
    mod = _load_ref_conversation()
    ref_conv = mod.conv_templates[name].copy()
    system = "Image: " + 4 * "<im_patch>"
    ref_conv.set_system(system)
    for m in CONVS:
        role = ref_conv.roles[0] if m["from"] == "human" else ref_conv.roles[1]
        ref_conv.append_message(role, m["value"])
    want = ref_conv.get_prompt()
    got = build_prompt(CONV_TEMPLATES[name], CONVS, True, 4)
    assert got == want


def test_prompt_no_image_matches_reference():
    mod = _load_ref_conversation()
    ref_conv = mod.conv_templates["llamav1"].copy()
    ref_conv.set_system("Image: N/A")
    for m in CONVS[:2]:
        role = ref_conv.roles[0] if m["from"] == "human" else ref_conv.roles[1]
        ref_conv.append_message(role, m["value"])
    want = ref_conv.get_prompt()
    got = build_prompt(CONV_TEMPLATES["llamav1"], CONVS[:2], False, 4)
    assert got == want


def _reference_construct_target(prompt, conv_tmpl, tokenize):
    """Transcription of BaseDataset._construct_target (:165-187)."""
    inputs = tokenize(prompt)
    target = list(inputs)
    sep = conv_tmpl.sep_template
    rounds = prompt.split(conv_tmpl.sep2)
    cur_len = 1
    target[:cur_len] = [IGNORE_INDEX] * cur_len
    for rou in rounds:
        if rou == "":
            break
        parts = rou.split(sep)
        if len(parts) != 2:
            break
        parts[0] += sep
        round_len = len(tokenize(rou)) + conv_tmpl.offset
        instruction_len = len(tokenize(parts[0])) - 2
        for j in range(cur_len, min(cur_len + instruction_len, len(target))):
            target[j] = IGNORE_INDEX
        cur_len += round_len
    return inputs, target


@pytest.mark.parametrize("name", ["llamav1", "llamav2"])
def test_reference_algorithm_transcription_matches(name):
    proc = PinkConversationProcessor({
        "template": name, "num_patch_tokens": 4, "max_length": 128})
    tmpl = CONV_TEMPLATES[name]
    prompt = build_prompt(tmpl, CONVS, True, 4)
    got_in, got_t = construct_target_reference(prompt, tmpl, proc.tokenize)
    want_in, want_t = _reference_construct_target(prompt, tmpl, proc.tokenize)
    assert got_in == want_in
    assert got_t == want_t


@pytest.mark.parametrize("name", ["llamav1", "llamav2"])
def test_label_mask_intent_exact_per_segment(name):
    """The segment-exact construct_target realizes the reference INTENT for
    any tokenizer: instruction+role tokens IGNORE, answer+separator tokens
    supervised, with no multi-round cursor drift (the reference arithmetic
    drifts +3/round on a wordpiece tokenizer where '</s>' is 4 pieces)."""
    proc = PinkConversationProcessor({
        "template": name, "num_patch_tokens": 4, "max_length": 128})
    tmpl = CONV_TEMPLATES[name]
    prompt = build_prompt(tmpl, CONVS, True, 4)
    inputs, target = construct_target(prompt, tmpl, proc.tokenize)
    assert len(inputs) == len(target)
    # ground truth per segment, built independently
    sep = tmpl.sep_template
    rounds = prompt.split(tmpl.sep2)
    want = []
    first = True
    for i, rou in enumerate(rounds):
        if rou == "":
            continue
        parts = rou.split(sep)
        if len(parts) != 2:
            n = len(proc.tokenize(rou)) - (0 if first else 1)
            want += [False] * n
            first = False
            continue
        n_i = len(proc.tokenize(parts[0] + sep)) - (0 if first else 1)
        first = False
        want += [False] * n_i
        tail = tmpl.sep2 if i < len(rounds) - 1 else ""
        n_a = len(proc.tokenize(parts[1] + tail)) - 1
        want += [True] * n_a
    got = [t != IGNORE_INDEX for t in target]
    # BOS is always masked
    want[0] = False
    assert got == want
    # every answer's tokens really are supervised, every question masked
    sup_ids = {i for i, s in zip(inputs, got) if s}
    for ans in ("A dog playing with a ball.", "On the grass near the dog."):
        for t in proc.tokenize(ans)[1:]:
            assert t in sup_ids
    where_tok = proc.tokenize("where")[1]
    assert where_tok not in sup_ids


def test_sep2less_template_rejected():
    with pytest.raises(ValueError):
        PinkConversationProcessor({"template": "mpt"})


def test_processor_masks_instructions_supervises_answers():
    proc = PinkConversationProcessor({
        "template": "llamav1", "num_patch_tokens": 4, "max_length": 128})
    out = proc({"conversations": CONVS, "has_image": True})
    ids, mask, labels = out["input_ids"], out["input_mask"], out["labels"]
    n = int(mask.sum())
    assert n > 20
    # BOS masked; the system+first-instruction region masked
    assert labels[0] == IGNORE_INDEX
    # some answer tokens ARE supervised and equal their input ids
    sup = (labels != IGNORE_INDEX) & (mask == 1)
    assert sup.sum() > 0
    np.testing.assert_array_equal(ids[sup], labels[sup])
    # the supervised set must contain the tokens of the first answer
    ans_ids = proc.tokenize("A dog playing with a ball.")[1:]
    sup_ids = list(ids[sup])
    assert all(t in sup_ids for t in set(ans_ids))
    # padding is fully ignored
    assert (labels[n:] == IGNORE_INDEX).all()
    # the image-patch placeholders are masked (inside the system prefix)
    patch_positions = np.where(ids == proc.im_patch_id)[0]
    assert len(patch_positions) == 4
    assert (labels[patch_positions] == IGNORE_INDEX).all()


def test_multiturn_masks_second_instruction():
    proc = PinkConversationProcessor({
        "template": "llamav1", "num_patch_tokens": 2, "max_length": 128})
    out = proc({"conversations": CONVS, "has_image": False})
    ids, labels = out["input_ids"], out["labels"]
    # tokens of the second QUESTION must be ignored
    q2 = proc.tokenize("Where is the ball")[1:]
    sup_ids = set(ids[(labels != IGNORE_INDEX)].tolist())
    # "grass" appears only in answer 2 -> supervised; "Where" only in q2
    where_tok = proc.tokenize("where")[1]
    grass_tok = proc.tokenize("grass")[1]
    assert grass_tok in sup_ids
    assert where_tok not in sup_ids
