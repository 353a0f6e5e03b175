"""Generation predictor: online text generation for the LLM family.

Reference parity: the serving role of the Pink / M2-omni eval drivers
(reference ``prj/Pink/pink/eval/model_*.py`` — prompt → ``model.generate`` →
decoded answer; ``prj/M2_omni`` serves through HF ``GenerationMixin``).
TPU-native serving surface: one predictor behind ``predictors/cli.py`` that
renders the conversation prompt, runs the jitted KV-cache generate (greedy
or beams), and detokenizes.

``predict({"text": "...", "image": HxWx3?}) →
{"generated_text": str, "generated_ids": ...}``.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np

from antmmf_tpu.common.registry import registry
from antmmf_tpu.predictors.base_predictor import BasePredictor
from antmmf_tpu.predictors.caption_predictor import ids_to_caption


@registry.register_predictor("generation_predictor")
class GenerationPredictor(BasePredictor):
    """Serves any model exposing ``generate(variables, batch, ...)`` over a
    [vision; text] prompt — Pink and M2-omni."""

    def example_data(self) -> Dict[str, Any]:
        mc = dict(self.model_config.get("model_attributes", {}) or {})
        name = list(mc)[0] if mc else ""
        size = int(dict(mc.get(name, {})).get("image_size", 224))
        if getattr(self, "unified", None) is not None:
            mn = self.unified.image_processor.min_pixels
            side = max(int(round(mn ** 0.5)), 56)
            return {"text": "describe <image>",
                    "images": [np.zeros((side, side, 3), np.uint8)]}
        return {"text": "example", "image": np.zeros((size, size, 3),
                                                     np.float32)}

    def load(self, with_ckpt: bool = True) -> "GenerationPredictor":
        from antmmf_tpu.utils.tokenization import BertTokenizer

        # attributes first: super().load() builds the init example through
        # our build_sample
        from antmmf_tpu.datasets.processors.text_processors import (
            _resolve_vocab_path)

        vocab = _resolve_vocab_path(self.pp.get(
            "vocab_file",
            "tests/data/vocabs/bert-base-uncased_30522_vocab.txt"))
        self.tokenizer = BertTokenizer(vocab)
        self.template = self.pp.get("template", "vicuna_v1")
        self.num_beams = int(self.pp.get("num_beams", 1))
        # prompt-lookup speculative decoding (tokens identical to greedy)
        self.speculative = int(self.pp.get("speculative", 0))
        self.do_sample = bool(self.pp.get("do_sample", False))
        self.top_p = float(self.pp.get("top_p", 0.9))
        self.temperature = float(self.pp.get("temperature", 1.0))
        self.max_new_tokens = int(self.pp.get("max_new_tokens", 24))
        self.max_prompt_len = int(self.pp.get("max_prompt_len", 64))
        self.eos_id = int(self.pp.get("eos_id", 102))
        self.model_config = self.config
        # Bailing2-parity conversation serving: a `unified_processor` config
        # block turns on the reference user flow (processing_m2omni.py —
        # chat template → in-place token expansion → pixel grids). Patch-
        # token ids are injected from the model's splice ids so the
        # processor and the model agree by construction.
        up_cfg = self.pp.get("unified_processor")
        self.unified = None
        if up_cfg is not None:
            from antmmf_tpu.datasets.processors.m2omni_processing import (
                M2OmniUnifiedProcessor)

            cfg = dict(up_cfg)
            mc = dict(self.config.get("model_attributes", {}) or {})
            name = list(mc)[0] if mc else ""
            mcfg = dict(mc.get(name, {}))
            sp = dict(cfg.get("special_token_ids", {}) or {})
            if mcfg.get("image_token_id") is not None:
                sp.setdefault("<imagePatch>", int(mcfg["image_token_id"]))
                sp.setdefault("<videoPatch>", int(mcfg["image_token_id"]))
            if mcfg.get("audio_token_id") is not None:
                sp.setdefault("<audioPatch>", int(mcfg["audio_token_id"]))
            cfg["special_token_ids"] = sp
            self.unified = M2OmniUnifiedProcessor(cfg)
        super().load(with_ckpt=with_ckpt)
        # tensor-parallel serving: `predictor_parameters.tensor_parallel: N`
        # Megatron-splits the decoder (and encoder-tower) weights over a
        # ("data", "model") mesh — 7B decoders don't fit one chip
        # (parallel/tp_serving.py; tokens match single-device serving)
        tp = int(self.pp.get("tensor_parallel", 0) or 0)
        # weight-only decode quantization: `decode_quant: int8|int4` serves
        # through quantize_for_decode records (per-step dequant behind an
        # optimization barrier — int8 measured +67% tokens/s on omni_1b)
        dq = self.pp.get("decode_quant")
        if dq:
            if tp > 1:
                raise ValueError(
                    "decode_quant and tensor_parallel are mutually "
                    "exclusive (TP rules shard float kernels, not "
                    "quantized records)")
            from antmmf_tpu.predictors.quantization import quantize_for_decode

            bits = {"int8": 8, "int4": 4}.get(str(dq))
            if bits is None:
                raise ValueError(f"decode_quant must be int8|int4, got {dq!r}")
            self.variables = quantize_for_decode(
                self.variables, bits=bits,
                min_size=int(self.pp.get("decode_quant_min_size", 65536)))
        if tp > 1:
            from antmmf_tpu.parallel.tp_serving import (
                shard_variables_for_serving,
                tp_serving_mesh,
            )

            self.variables = shard_variables_for_serving(
                self.variables, tp_serving_mesh(n_model=tp))
        return self

    def _build_unified_sample(self, data: Mapping[str, Any]):
        from antmmf_tpu.structures.sample import Sample, SampleList

        out = self.unified(dict(data))
        sample = Sample()
        sample["input_ids"] = out["input_ids"]
        sample["input_mask"] = out["input_mask"]
        if out.get("image_data"):
            if len(out["image_data"]) != 1:
                raise ValueError(
                    "generation_predictor serves one image per request; "
                    f"got {len(out['image_data'])}")
            sample["image_data"] = np.asarray(out["image_data"][0],
                                              np.float32)
        elif out.get("video_data"):
            if len(out["video_data"]) != 1:
                raise ValueError("one video per request")
            sample["image_data"] = np.asarray(out["video_data"][0],
                                              np.float32)
        if "fbank" in out:
            sample["audio"] = np.asarray(out["fbank"], np.float32)
            sample["audio_mask"] = np.asarray(out["fbank_mask"], np.int32)
        return SampleList.from_samples([sample])

    def build_sample(self, data: Mapping[str, Any]):
        if getattr(self, "unified", None) is not None and (
                "conversation" in data or "images" in data
                or "video" in data or "waveform" in data
                or any(t in str(data.get("text", ""))
                       for t in ("<image>", "<video>", "<audio>"))):
            return self._build_unified_sample(data)
        from antmmf_tpu.scripts.pink_eval import build_prompt
        from antmmf_tpu.structures.sample import Sample

        prompt = build_prompt(str(data.get("text", data.get("caption", ""))),
                              self.template)
        tokens = ["[CLS]"] + self.tokenizer.tokenize(prompt)
        ids = self.tokenizer.convert_tokens_to_ids(
            tokens[: self.max_prompt_len])
        L = self.max_prompt_len
        input_ids = np.zeros((L,), np.int64)
        mask = np.zeros((L,), np.int64)
        input_ids[: len(ids)] = ids
        mask[: len(ids)] = 1
        sample = Sample()
        sample["input_ids"] = input_ids
        sample["input_mask"] = mask
        img = data.get("image", data.get("image_data"))
        if img is not None:
            from antmmf_tpu.datasets.processors.image_processors import (
                NormalizedImageProcessor)

            mc = dict(self.model_config.get("model_attributes", {}) or {})
            name = list(mc)[0]
            size = int(dict(mc.get(name, {})).get("image_size", 224))
            proc = NormalizedImageProcessor({"size": size})
            sample["image_data"] = proc.transform_array(
                np.asarray(img, np.float32))
        from antmmf_tpu.structures.sample import SampleList

        return SampleList.from_samples([sample])

    def predict(self, data: Mapping[str, Any],
                json_obj: Optional[Mapping] = None) -> Dict[str, Any]:
        sample = self.build_sample(data)
        arrays = {k: np.asarray(v) for k, v in sample.arrays().items()}
        module = self.shell.module
        if not hasattr(module, "generate"):
            raise NotImplementedError(
                f"{type(module).__name__} has no generate()")
        tokens, lens = module.generate(
            self.variables, arrays, eos_id=self.eos_id,
            max_length=self.max_new_tokens, num_beams=self.num_beams,
            speculative=self.speculative, do_sample=self.do_sample,
            top_p=self.top_p, temperature=self.temperature)
        tokens, lens = np.asarray(tokens), np.asarray(lens)
        outs = []
        for b in range(tokens.shape[0]):
            gen = tokens[b, lens[b]: lens[b] + self.max_new_tokens]
            outs.append(ids_to_caption(self.tokenizer, gen))
        return {"generated_text": outs[0] if len(outs) == 1 else outs,
                "generated_ids": tokens}
