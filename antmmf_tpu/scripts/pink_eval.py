"""Pink evaluation harness: VQA-family + grounding-family benchmarks.

Reference parity: ``/root/reference/prj/Pink/pink/eval/`` ships ~15 per-dataset
scripts (model_vqav2/model_gqa/model_okvqa/model_vsr/model_seed ... answer
generation + VQA-protocol scoring; model_vg_base_batch/model_v7wgrounding/
model_pointingvqa_* ... box generation + IoU / point-in-box scoring). All of
them share one loop — prompt → ``model.generate(do_sample=False)`` → task
scorer — so here that loop is ONE harness parameterized by ``--task``:

  vqa        exact/VQA-protocol answer accuracy (min(#agreeing/3, 1))
  grounding  parse ``[x1,y1,x2,y2]`` from the generation, IoU@0.5 vs gt box
  pointing   center of the parsed box inside the gt box (pointingvqa protocol)

Annotations: jsonl rows ``{"image": ..., "question": ..., "answer": str |
"answers": [str], "bbox": [x1,y1,x2,y2]?, "width"?, "height"?}``. Decoding is
the jittable greedy loop on ``PinkModel.generate`` (static shapes, batched).

Usage::

    python -m antmmf_tpu.scripts.pink_eval --config <cfg.yml> \
        --annotations val.jsonl --image_dir data/images --task grounding
"""

from __future__ import annotations

import argparse
import json
import os
import string
from typing import Dict, List, Optional, Sequence

import numpy as np

_ARTICLES = frozenset(("a", "an", "the"))
_PUNCT_TABLE = str.maketrans("", "", string.punctuation)


def normalize_answer(text: str) -> str:
    """VQA-protocol normalization: lowercase, strip punctuation/articles,
    collapse whitespace (the `vqa_tools` processPunctuation/processDigitArticle
    convention used by every reference eval_* script)."""
    words = text.lower().translate(_PUNCT_TABLE).split()
    return " ".join(w for w in words if w not in _ARTICLES)


def vqa_score(prediction: str, answers: Sequence[str]) -> float:
    """min(#human answers matching / 3, 1) — the VQAv2 accuracy; with a single
    gt answer this degrades to exact match."""
    pred = normalize_answer(prediction)
    matches = sum(normalize_answer(a) == pred for a in answers)
    if len(answers) == 1:
        return float(matches > 0)
    return min(matches / 3.0, 1.0)


def box_iou(a: Sequence[float], b: Sequence[float]) -> float:
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = max(0.0, a[2] - a[0]) * max(0.0, a[3] - a[1])
    ub = max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])
    return inter / max(ua + ub - inter, 1e-9)


def grounding_score(
    pred_text: str, gt_box: Sequence[float],
    width: float = 1.0, height: float = 1.0,
    iou_threshold: float = 0.5, expand2square: bool = True,
) -> float:
    """1.0 iff the FIRST box parsed from the generation has IoU ≥ threshold
    with the gt (acc@0.5, the refcoco/VG protocol of model_vg_base_batch)."""
    from antmmf_tpu.datasets.processors.pink_processors import parse_boxes

    boxes = parse_boxes(pred_text, width, height, expand2square=expand2square)
    if len(boxes) == 0:
        return 0.0
    return float(box_iou(boxes[0], gt_box) >= iou_threshold)


def pointing_score(
    pred_text: str, gt_box: Sequence[float],
    width: float = 1.0, height: float = 1.0, expand2square: bool = True,
) -> float:
    """1.0 iff the center of the first parsed box falls inside the gt box
    (the pointing-QA protocol of model_pointingvqa_local)."""
    from antmmf_tpu.datasets.processors.pink_processors import parse_boxes

    boxes = parse_boxes(pred_text, width, height, expand2square=expand2square)
    if len(boxes) == 0:
        return 0.0
    cx = (boxes[0][0] + boxes[0][2]) / 2.0
    cy = (boxes[0][1] + boxes[0][3]) / 2.0
    return float(gt_box[0] <= cx <= gt_box[2] and gt_box[1] <= cy <= gt_box[3])


def mc_score(pred: str, answer: str, options: Sequence[str]) -> float:
    """Multiple-choice accuracy (reference model_seed/iconqa/mmbench class):
    the prediction names the correct option letter or its text."""
    p = pred.strip().lower()
    ans = answer.strip().lower()
    letters = "abcdefgh"[: max(1, len(options))]
    if len(ans) == 1 and ans in letters:  # answer given as a letter
        idx = letters.index(ans)
        opt = options[idx].strip().lower() if idx < len(options) else ""
    else:
        opt = ans
        idx = next((i for i, o in enumerate(options)
                    if o.strip().lower() == ans), -1)
    first = p.split(".")[0].split(")")[0].strip()
    if idx >= 0 and first == letters[idx]:
        return 1.0
    return 1.0 if opt and opt in p else 0.0


def binary_score(pred: str, answer) -> float:
    """True/false accuracy (reference model_vsr.py class)."""
    p = pred.strip().lower()
    truthy = {"true", "yes", "1"}
    want = (str(answer).strip().lower() in truthy) if not isinstance(
        answer, bool) else answer
    got = any(t in p.split()[:3] for t in truthy) if p else False
    falsy = {"false", "no", "0"}
    if any(t in p.split()[:3] for t in falsy):
        got = False
    return float(got == want)


def score_rows(
    rows: Sequence[Dict], predictions: Sequence[str], task: str,
) -> Dict[str, float]:
    """Aggregate per-row scores → summary dict (pure; unit-testable).

    Task families mirror the reference eval drivers
    (prj/Pink/pink/eval/model_*.py): vqa/gqa/okvqa (open answer match),
    grounding (IoU@0.5), pointing (point-in-box), mc (seed/iconqa/mmbench
    multiple-choice), binary (vsr true/false), caption (dump only)."""
    scores: List[float] = []
    for row, pred in zip(rows, predictions):
        if task in ("vqa", "gqa", "okvqa"):
            answers = row.get("answers") or [row["answer"]]
            scores.append(vqa_score(pred, answers))
        elif task == "mc":
            scores.append(mc_score(pred, str(row["answer"]),
                                   row.get("options", [])))
        elif task == "binary":
            scores.append(binary_score(pred, row["answer"]))
        elif task == "caption":
            continue
        else:
            fn = grounding_score if task == "grounding" else pointing_score
            scores.append(fn(pred, row["bbox"],
                             float(row.get("width", 1.0)),
                             float(row.get("height", 1.0))))
    key = {"vqa": "vqa_accuracy", "gqa": "gqa_accuracy",
           "okvqa": "okvqa_accuracy", "grounding": "acc@0.5",
           "pointing": "pointing_acc", "mc": "mc_accuracy",
           "binary": "binary_accuracy", "caption": "n_dumped"}[task]
    if task == "caption":
        return {key: float(len(predictions)), "n": float(len(predictions))}
    return {key: float(np.mean(scores)) * 100.0 if scores else 0.0,
            "n": float(len(scores))}


# Every reference eval driver (prj/Pink/pink/eval/model_*.py) resolves to
# one of the scorer families above; ``--task <driver-name>`` accepts the
# reference benchmark names directly.
BENCHMARK_ALIASES = {
    "vqav2": "vqa",                    # model_vqav2.py (VQA soft-match)
    "iconqa": "mc",                    # model_iconqa.py (letter choice)
    "seed": "mc",                      # model_seed.py (letter choice)
    "v7wgrounding": "mc",              # model_v7wgrounding.py (letter over
                                       # shuffled candidate boxes)
    "vsr": "binary",                   # model_vsr.py (yes/no)
    "vg": "grounding",                 # model_vg_base_batch.py (IoU@0.5)
    "object365": "grounding",          # model_object365.py (IoU@0.5)
    "pointingvqa_local": "pointing",   # model_pointingvqa_local.py
    "pointingvqa_looktwice": "pointing",  # model_pointingvqa_looktwice.py
}

# Instruction-marker tokens (reference pink/model/pink.py:35-51): questions,
# option blocks, referring descriptions and serialized locations are wrapped
# in typed tags that Pink's instruction tuning expects verbatim.
BEGIN_QUESTION, END_QUESTION = "<qes>", "</qes>"
BEGIN_OPTIONS, END_OPTIONS = "<opt>", "</opt>"
BEGIN_DESCRIPTION, END_DESCRIPTION = "<des>", "</des>"
BEGIN_LOC, END_LOC = "<loc>", "</loc>"

# Instruction pools in the style of the reference Templates.py families
# (QuestionAnswer:294, ChoiceQuestionAnswer:833, VisualGrounding:1,
# GroundingCaption:166 — pools of ~50 paraphrases with `<question>`,
# `<option>`, `<expr>`, `<objs>`, `<image>` placeholders). The eval drivers
# `random.choice` a paraphrase per row; here the pools are small fresh
# paraphrases with the SAME placeholder/tag structure and rows cycle through
# them deterministically (reproducible evals).
QUESTION_ANSWER_TEMPLATES = (
    "Please look at the image <image> and give a direct answer to my "
    "question: <question>",
    "Answer the question <question> briefly, based on the image <image>.",
    "Consider the image <image> and respond concisely to: <question>",
)
CHOICE_QUESTION_TEMPLATES = (
    "Look at the image <image> and pick the correct answer to <question> "
    "from the options below\n<option>.",
    "Based on the image <image>, select the best answer for the question: "
    "<question> from these options\n<option>.",
)
VISUAL_GROUNDING_EVAL_TEMPLATES = (
    "Where is <expr>? answer in [x0,y0,x1,y1] format.",
    "What are the coordinates of <expr> in the image?",
    "Locate <expr> in the image and give its bounding-box coordinates.",
)
GROUNDING_CAPTION_TEMPLATES = (
    "Can you describe the region <objs> of the image <image>?",
    "Give a short description of the area <objs> in the image <image>.",
)

_OPTION_LETTERS = "ABCDEFGH"


def _cycle(pool: Sequence[str], idx: int) -> str:
    return pool[idx % len(pool)]


def _format_options(options: Sequence[str], idx_to_loc: bool = False) -> str:
    """'A. opt\nB. opt' block, tag-wrapped (reference model_seed.py:227-231;
    v7w wraps each candidate box in <loc></loc>, model_v7wgrounding.py:184-188)."""
    body = ""
    for i, opt in enumerate(options):
        o = f"{BEGIN_LOC}{opt}{END_LOC}" if idx_to_loc else str(opt)
        body += f"{_OPTION_LETTERS[i]}. {o}\n"
    return BEGIN_OPTIONS + body.rstrip("\n").rstrip(" ") + END_OPTIONS


def build_benchmark_prompt(benchmark: str, row: Dict, idx: int = 0,
                           template: str = "vicuna_v1") -> str:
    """Render row → the per-benchmark instruction the reference eval driver
    builds, then wrap it in the conversation template.

    Mirrors (structure, tags and task hints — paraphrase pools are fresh):
      vqav2/gqa/okvqa  QuestionAnswer template, <question> → <qes>q</qes>
                       (model_vqav2.py:406-408, model_gqa.py:223-225)
      vsr              question + " Is it correct? Answer with Yes or No."
                       through QuestionAnswer (model_vsr.py:175-178)
      iconqa/seed      ChoiceQuestionAnswer + lettered <opt> block
                       (model_seed.py:224-231)
      v7wgrounding     ChoiceQuestionAnswer, options are <loc>-wrapped
                       candidate boxes (model_v7wgrounding.py:181-188)
      vg               VisualGrounding, <expr> → <des>expr</des>
                       (model_vg_base_batch.py:54-56)
      object365        GroundingCaption, <objs> → <loc>[box]</loc>
                       (model_object365.py:324-326)
      pointingvqa_*    "{question} <loc>[x,y]</loc>" / bbox variant, raw
                       1/width scaling, no expand2square
                       (model_pointingvqa_local.py:180-190)

    Rows reuse the generic jsonl schema (`question`, `options`, `bbox`,
    `point`, `expr`/`caption`, `width`, `height`).
    """
    q = str(row.get("question", ""))
    if benchmark in ("vqa", "vqav2", "gqa", "okvqa", "vsr"):
        if benchmark == "vsr":
            q = (str(row.get("caption", q))
                 + " Is it correct? Answer with Yes or No.")
        instr = _cycle(QUESTION_ANSWER_TEMPLATES, idx).replace(" <image>", "")
        instr = instr.replace("<question>",
                              BEGIN_QUESTION + q + END_QUESTION)
    elif benchmark in ("mc", "iconqa", "seed", "v7wgrounding"):
        opts = list(row.get("options", []))
        if benchmark == "v7wgrounding" and opts and not isinstance(
                opts[0], str):  # candidate boxes given as [x1,y1,x2,y2]
            w, h = float(row.get("width", 1.0)), float(row.get("height", 1.0))
            opts = ["[{:.3f},{:.3f},{:.3f},{:.3f}]".format(
                b[0] / w, b[1] / h, b[2] / w, b[3] / h) for b in opts]
        instr = _cycle(CHOICE_QUESTION_TEMPLATES, idx).replace(" <image>", "")
        instr = instr.replace("<question>",
                              BEGIN_QUESTION + q + END_QUESTION)
        instr = instr.replace("<option>", _format_options(
            opts, idx_to_loc=benchmark == "v7wgrounding"))
    elif benchmark in ("grounding", "vg"):
        expr = str(row.get("expr", row.get("caption", q)))
        instr = _cycle(VISUAL_GROUNDING_EVAL_TEMPLATES, idx).replace(
            " <image>", "")
        instr = instr.replace(
            "<expr>", BEGIN_DESCRIPTION + expr + END_DESCRIPTION)
    elif benchmark in ("object365", "caption"):
        from antmmf_tpu.datasets.processors.pink_processors import (
            serialize_box,
        )

        box = row.get("bbox", (0.0, 0.0, 1.0, 1.0))
        loc = serialize_box(box, float(row.get("width", 1.0)),
                            float(row.get("height", 1.0)),
                            expand2square=False)
        instr = _cycle(GROUNDING_CAPTION_TEMPLATES, idx).replace(
            " <image>", "")
        instr = instr.replace("<objs>", loc)
    elif benchmark in ("pointing", "pointingvqa_local",
                       "pointingvqa_looktwice"):
        w, h = float(row.get("width", 1.0)), float(row.get("height", 1.0))
        if "point" in row:
            px, py = row["point"]
            loc = "[{:.3f},{:.3f}]".format(px / w, py / h)
        else:
            b = row["bbox"]
            loc = "[{:.3f},{:.3f},{:.3f},{:.3f}]".format(
                b[0] / w, b[1] / h, b[2] / w, b[3] / h)
        instr = f"{q} {BEGIN_LOC}{loc}{END_LOC}"
    else:
        instr = q
    return build_prompt(instr, template)


def build_prompt(question: str, template: str = "vicuna_v1") -> str:
    from antmmf_tpu.utils.conversation import get_conv_template

    conv = get_conv_template(template)
    conv.append_message(conv.roles[0], question)
    conv.append_message(conv.roles[1], None)
    return conv.get_prompt()


def main(argv: Optional[Sequence[str]] = None) -> None:
    # honor JAX_PLATFORMS even when a plugin registered itself
    # programmatically (the env var alone loses to in-process registration,
    # e.g. TPU relays) — same contract as antmmf_tpu.run / predictors.cli
    if os.environ.get("JAX_PLATFORMS") in ("cpu",):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from antmmf_tpu.common.build import build_config
    from antmmf_tpu.datasets.processors.image_processors import (
        NormalizedImageProcessor,
    )
    from antmmf_tpu.models.base_model import build_model
    from antmmf_tpu.predictors.caption_predictor import ids_to_caption
    from antmmf_tpu.utils.tokenization import BertTokenizer

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--annotations", required=True)
    parser.add_argument("--image_dir", required=True)
    parser.add_argument("--task", default="vqa",
                        choices=("vqa", "gqa", "okvqa", "grounding",
                                 "pointing", "mc", "binary", "caption")
                        + tuple(BENCHMARK_ALIASES))
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--vocab_file",
                        default="tests/data/vocabs/"
                                "bert-base-uncased_30522_vocab.txt")
    parser.add_argument("--template", default="vicuna_v1")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--max_prompt_len", type=int, default=64)
    parser.add_argument("--max_new_tokens", type=int, default=24)
    parser.add_argument("--num_beams", type=int, default=1)
    parser.add_argument("--speculate", type=int, default=0, metavar="GAMMA",
                        help="prompt-lookup speculative greedy decoding "
                             "(tokens identical to greedy; faster on "
                             "prompt-grounded answers)")
    parser.add_argument("--do_sample", action="store_true")
    parser.add_argument("--top_p", type=float, default=0.9)
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--image_size", type=int, default=224)
    parser.add_argument("--out", default=None,
                        help="optional jsonl of per-row predictions")
    args = parser.parse_args(argv)

    cfg = build_config(args.config)
    shell = build_model(cfg, for_test=True, online_serving=True)
    tok = BertTokenizer(args.vocab_file)
    proc = NormalizedImageProcessor({"size": args.image_size,
                                     "resize": args.image_size + 32})

    rows = [json.loads(l) for l in open(args.annotations) if l.strip()]

    import cv2

    def tokenize(text: str):
        ids = tok.convert_tokens_to_ids(
            ["[CLS]"] + tok.tokenize(text)[: args.max_prompt_len - 1])
        out = np.zeros(args.max_prompt_len, np.int32)
        msk = np.zeros(args.max_prompt_len, np.int32)
        out[: len(ids)] = ids
        msk[: len(ids)] = 1
        return out, msk

    example = {
        "image_data": np.zeros((1, args.image_size, args.image_size, 3),
                               np.float32),
        "input_ids": np.zeros((1, args.max_prompt_len), np.int64),
        "input_mask": np.ones((1, args.max_prompt_len), np.int64),
    }
    variables = shell.init(jax.random.PRNGKey(0), example)
    if args.checkpoint:
        from antmmf_tpu.common.checkpoint import Checkpoint

        ck = Checkpoint(cfg, load_only=True)
        state_like = type("S", (), {"variables": variables})()
        state_like, _ = ck.load_model_weights(state_like, args.checkpoint)
        variables = state_like.variables

    module = shell.module
    predictions: List[str] = []
    bs = args.batch_size
    for s in range(0, len(rows), bs):
        chunk = rows[s: s + bs]
        ids, masks, imgs = [], [], []
        for ri, r in enumerate(chunk):
            i, m = tokenize(build_benchmark_prompt(
                args.task, r, idx=s + ri, template=args.template))
            ids.append(i)
            masks.append(m)
            img = cv2.imread(os.path.join(args.image_dir, r["image"]))
            imgs.append(proc.transform_array(
                img[:, :, ::-1] if img is not None else np.zeros(
                    (args.image_size, args.image_size, 3), np.uint8)))
        pad = bs - len(chunk)
        batch = {
            "input_ids": np.stack(ids + [ids[-1]] * pad),
            "input_mask": np.stack(masks + [masks[-1]] * pad),
            "image_data": np.stack(imgs + [imgs[-1]] * pad),
        }
        tokens, lens = module.generate(
            variables, batch, max_length=args.max_new_tokens,
            num_beams=args.num_beams, speculative=args.speculate,
            do_sample=args.do_sample, top_p=args.top_p,
            temperature=args.temperature)
        tokens, lens = np.asarray(tokens), np.asarray(lens)
        for bi in range(len(chunk)):
            gen = tokens[bi, lens[bi]: lens[bi] + args.max_new_tokens]
            predictions.append(ids_to_caption(tok, gen))

    summary = score_rows(rows, predictions,
                         BENCHMARK_ALIASES.get(args.task, args.task))
    if args.out:
        with open(args.out, "w") as f:
            for row, pred in zip(rows, predictions):
                f.write(json.dumps({**row, "prediction": pred}) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
