"""Saliency interpreters: gradient-based input attribution.

Reference parity: ``/root/reference/antmmf/modules/interpret/`` —
``saliency_interpreter.py:13-258`` (grad hooks on the embedding layer + export),
``simple_gradient.py:11``, ``integrated_gradient.py:9``; built via
``modules/build.py:38-52`` and driven by ``BaseTrainer.interpret``
(base_trainer.py:834-850).

TPU mapping: torch's forward/backward hooks become ``jax.grad`` w.r.t. an
explicit embedding injection point: the model is re-applied with
``perturb_embeddings`` — an additive zero tensor whose gradient IS the saliency
(standard JAX trick replacing hook machinery). Saliency = |grad ⊙ embedding|
summed over hidden dim, normalised per sample.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.common.registry import registry


class SaliencyInterpreter:
    """Base: subclasses implement ``saliency(loss_fn, embeddings) -> [B, L]``.

    ``embed_fn(batch) -> [B, L, C]`` and ``loss_from_embeddings(emb, batch) ->
    scalar`` are provided by the model adapter.
    """

    def __init__(self, params: Optional[Mapping[str, Any]] = None):
        self.params = dict(params or {})

    def interpret(
        self,
        embed_fn: Callable[[Mapping], jnp.ndarray],
        loss_from_embeddings: Callable[[jnp.ndarray, Mapping], jnp.ndarray],
        batch: Mapping[str, Any],
    ) -> np.ndarray:
        emb = embed_fn(batch)
        sal = self.saliency(lambda e: loss_from_embeddings(e, batch), emb)
        sal = np.asarray(sal)
        denom = sal.sum(axis=-1, keepdims=True)
        return sal / np.maximum(denom, 1e-9)

    def saliency(self, loss_fn, embeddings):
        raise NotImplementedError


@registry.register_interpreter("simple-gradient")
class SimpleGradientInterpreter(SaliencyInterpreter):
    """|∂L/∂e ⊙ e| summed over the hidden dim."""

    def saliency(self, loss_fn, embeddings):
        g = jax.grad(loss_fn)(embeddings)
        return jnp.abs((g * embeddings).sum(-1))


@registry.register_interpreter("integrated-gradient")
class IntegratedGradientInterpreter(SaliencyInterpreter):
    """Integrated gradients along the zero→input path (Riemann sum)."""

    def saliency(self, loss_fn, embeddings):
        steps = int(self.params.get("steps", 10))
        grad_fn = jax.grad(loss_fn)
        alphas = jnp.linspace(1.0 / steps, 1.0, steps)

        def body(carry, a):
            return carry + grad_fn(embeddings * a), None

        total, _ = jax.lax.scan(body, jnp.zeros_like(embeddings), alphas)
        avg_grad = total / steps
        return jnp.abs((avg_grad * embeddings).sum(-1))


def export_saliency(
    results,
    out_dir: str,
    tokenizer=None,
) -> list:
    """Write saliency results to files (the reference interpreter's export
    surface, saliency_interpreter.py:97-210): one JSON per batch plus a
    self-contained HTML heatmap for quick inspection. ``results`` is
    ``BaseTrainer.interpret`` output ([{saliency [B, L], input_ids [B, L]}]).
    """
    import json
    import os

    import numpy as np

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    html_rows = []
    for bi, res in enumerate(results):
        sal = np.asarray(res["saliency"], np.float32)
        ids = np.asarray(res["input_ids"])
        record = {"saliency": sal.tolist(), "input_ids": ids.tolist()}
        tokens = None
        if tokenizer is not None:
            tokens = [tokenizer.convert_ids_to_tokens(list(map(int, row)))
                      for row in ids]
            record["tokens"] = tokens
        path = os.path.join(out_dir, f"saliency_{bi:04d}.json")
        with open(path, "w", encoding="utf-8") as f:
            json.dump(record, f)
        paths.append(path)
        for ri in range(sal.shape[0]):
            row = sal[ri]
            toks = tokens[ri] if tokens else [str(t) for t in ids[ri]]
            peak = max(float(row.max()), 1e-9)
            spans = "".join(
                f'<span style="background: rgba(255,80,80,{min(1.0, float(w) / peak):.3f})">'
                f"{tok}</span> "
                for tok, w in zip(toks, row))
            html_rows.append(f"<div>{spans}</div>")
    html = ("<html><body style='font-family: monospace'>"
            + "\n".join(html_rows) + "</body></html>")
    html_path = os.path.join(out_dir, "saliency.html")
    with open(html_path, "w", encoding="utf-8") as f:
        f.write(html)
    paths.append(html_path)
    return paths


def build_interpreter(config: Optional[Mapping[str, Any]]):
    if not config:
        return None
    if isinstance(config, str):
        config = {"type": config}
    cls = registry.get_interpreter_class(config["type"])
    return cls(config.get("params", {}))
