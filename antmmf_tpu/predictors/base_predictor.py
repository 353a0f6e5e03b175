"""Online-serving predictors.

Reference parity: ``/root/reference/antmmf/predictors/base_predictor.py:23-294``
— ``load()`` builds the model via ``build_for_test`` (random init, no downloads),
restores weights from a saved ``model_dir`` (config.yaml + final weights),
builds a standalone processor pipeline (no DataLoader), and ``predict(data)``
runs processors → Sample → batch → jitted forward → formatted result.
Losses/metrics are disabled in serving state (models/base_model.py:222-231 —
here ``ModelShell(online_serving=True)``).
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict, List, Mapping, Optional

import jax
import numpy as np

from antmmf_tpu.common.configuration import Configuration, convert_to_config
from antmmf_tpu.common.registry import registry
from antmmf_tpu.datasets.processors.processors import build_processors
from antmmf_tpu.structures.sample import Sample, SampleList


@registry.register_predictor("base_predictor")
class BasePredictor:
    def __init__(self, config: Mapping):
        self.config = convert_to_config(config)
        self.pp = self.config.get("predictor_parameters", {})
        self.shell = None
        self.variables = None
        self._jitted = None

    # -------------------------------------------------------------------- load
    def load(self, with_ckpt: bool = True) -> "BasePredictor":
        import antmmf_tpu.models  # registry side effects
        from antmmf_tpu.models.base_model import build_model

        model_dir = self.pp.get("model_dir")
        if model_dir and os.path.exists(os.path.join(model_dir, "config.yaml")):
            saved = Configuration.from_file(os.path.join(model_dir, "config.yaml"))
            cfg = saved
        else:
            cfg = self.config
        self.model_config = cfg
        self.shell = build_model(cfg, for_test=True, online_serving=True)

        example = self.build_sample(self.example_data())
        self.variables = self.shell.init(jax.random.PRNGKey(0), example.arrays())
        if with_ckpt and model_dir:
            self._load_checkpoint(model_dir)

        self.processors = build_processors(
            self.pp.get("processors", cfg.get("predictor_parameters", {}).get(
                "processors", {})))

        shell = self.shell

        def forward(variables, arrays):
            out = shell.apply(variables, arrays, deterministic=True)
            return {k: v for k, v in out.items()
                    if hasattr(v, "shape")}

        self._jitted = jax.jit(forward)
        return self

    def _load_checkpoint(self, model_dir: str) -> None:
        import orbax.checkpoint as ocp

        from antmmf_tpu.common.checkpoint import merge_params_tolerant

        def ckpt_key(path):
            # model_<iter> sorts numerically — lexicographic would pick
            # model_999 over model_1000
            tail = os.path.basename(path).rsplit("_", 1)[-1]
            return (0, int(tail), "") if tail.isdigit() else (1, 0, path)

        candidates = sorted(glob.glob(os.path.join(model_dir, "*_final"))) or \
            sorted(glob.glob(os.path.join(model_dir, "models", "best"))) or \
            sorted(glob.glob(os.path.join(model_dir, "models", "model_*")),
                   key=ckpt_key)
        if not candidates:
            raise FileNotFoundError(f"No checkpoint found in {model_dir!r}")
        with ocp.PyTreeCheckpointer() as ck:
            raw = ck.restore(os.path.abspath(candidates[-1]))
        loaded = raw.get("variables", raw)
        merged, report = merge_params_tolerant(self.variables, loaded)
        self.variables = jax.tree_util.tree_map(
            lambda t, m: np.asarray(m, dtype=getattr(t, "dtype", None)),
            self.variables, merged)

    # ----------------------------------------------------------------- predict
    def example_data(self) -> Dict[str, Any]:
        """Subclasses provide a synthetic example for init; base guesses a
        video-text record."""
        return {
            "image_data": np.zeros((2, 32, 32, 3), np.float32),
            "caption": "example",
        }

    def build_sample(self, data: Mapping[str, Any]) -> SampleList:
        """data → processors → Sample → single-element batch."""
        sample = Sample()
        if "image_data" in data:
            sample["image_data"] = np.asarray(data["image_data"], np.float32)
            sample["video_mask"] = np.ones(
                (sample["image_data"].shape[0],), np.int64)
        for name, proc in getattr(self, "processors", {}).items():
            field = name.replace("_processor", "")
            if field in data or "text" in data or "caption" in data:
                src = data.get(field, data.get("caption", data.get("text")))
                out = proc({"text": src} if isinstance(src, str) else src)
                if isinstance(out, Mapping):
                    prefix = "caption_" if field in ("caption", "text") else ""
                    for k, v in out.items():
                        if isinstance(v, np.ndarray):
                            sample[f"{prefix}{k}"] = v
        if "caption_input_ids" not in sample and ("caption" in data or "text" in data):
            from antmmf_tpu.datasets.processors.text_processors import (
                MaskedTokenProcessor,
            )

            if not hasattr(self, "_fallback_text_proc"):
                self._fallback_text_proc = MaskedTokenProcessor({
                    "vocab_file":
                        "tests/data/vocabs/bert-base-uncased_30522_vocab.txt",
                    "max_seq_length": 30})
            out = self._fallback_text_proc(
                {"text": data.get("caption", data.get("text"))}, probability=0.0)
            for k in ("input_ids", "input_mask", "segment_ids"):
                sample[f"caption_{k}"] = out[k]
        return SampleList.from_samples([sample])

    def predict(self, data: Mapping[str, Any]) -> Dict[str, Any]:
        batch = self.build_sample(data)
        out = self._jitted(self.variables, batch.arrays())
        return self.format_result(jax.device_get(out))

    def format_result(self, output: Mapping[str, Any]) -> Dict[str, Any]:
        result = {}
        for key in ("logits", "sim", "text_embed", "visual_embed", "scores"):
            if key in output:
                result[key] = np.asarray(output[key]).tolist()
        return result or {k: np.asarray(v).tolist() for k, v in output.items()}


@registry.register_predictor("batch_predictor")
class BatchPredictor(BasePredictor):
    """Batches multiple requests into one forward (reference batch_predictor.py)."""

    def predict_batch(self, datas: List[Mapping[str, Any]]) -> List[Dict[str, Any]]:
        samples = [self.build_sample(d) for d in datas]
        merged = SampleList.from_samples([
            Sample({k: v[0] for k, v in s.items()}) for s in samples
        ])
        out = jax.device_get(self._jitted(self.variables, merged.arrays()))
        results = []
        for i in range(len(datas)):
            row = {}
            for k, v in out.items():
                arr = np.asarray(v)
                row[k] = arr[i].tolist() if arr.ndim >= 1 and arr.shape[0] == len(datas) \
                    else arr.tolist()
            results.append(row)
        return results
