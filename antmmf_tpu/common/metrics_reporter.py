"""MetricsReporter: FLOPs / "green-AI" telemetry.

Reference parity: ``/root/reference/antmmf/common/metrics_reporter.py:16`` —
dry-run forward FLOPs profile (:138-151), train FLOPs = fwd × 3 × world
(:191-196), async POST from a daemon via mp.Queue (:97-103, :247-262).

TPU mapping: FLOPs come from **XLA cost analysis** of the compiled step (exact,
free — no hook machinery); telemetry posting degrades to a local jsonl sink when
no endpoint is configured (zero-egress environments).
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time
from typing import Any, Dict, Mapping, Optional


def flops_of_compiled(compiled) -> Optional[float]:
    """FLOPs of one execution of a compiled jax function."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops")) if ca else None
    except Exception:
        return None


def flops_of_fn(fn, *args, **kwargs) -> Optional[float]:
    import jax

    try:
        compiled = jax.jit(fn).lower(*args, **kwargs).compile()
        return flops_of_compiled(compiled)
    except Exception:
        return None


class MetricsReporter:
    def __init__(self, config: Mapping, logger: Optional[Any] = None):
        tp = config.get("training_parameters", {}) if hasattr(config, "get") else {}
        self.save_dir = tp.get("save_dir", "./save") if tp else "./save"
        self.endpoint = (tp.get("green_ai_endpoint") if tp else None) or \
            os.environ.get("GREEN_AI_ENDPOINT")
        self.logger = logger
        self.step_flops: Optional[float] = None
        self._q: "queue.Queue" = queue.Queue()
        self._worker: Optional[threading.Thread] = None

    # ------------------------------------------------------------------ profile
    def profile_step(self, compiled_step) -> Optional[float]:
        """Record FLOPs of the full compiled train step (fwd+bwd+update)."""
        self.step_flops = flops_of_compiled(compiled_step)
        return self.step_flops

    def train_flops(self, iterations: int, world_size: int = 1) -> Optional[float]:
        """Total training FLOPs across the fleet. The train step already
        contains fwd+bwd+update, so no 3× heuristic is needed — the reference
        multiplies fwd FLOPs by 3 (:191-196) because torch hooks only see the
        forward; XLA gives us the real number."""
        if self.step_flops is None:
            return None
        return self.step_flops * iterations * world_size

    # ---------------------------------------------------------------- telemetry
    def report(self, payload: Dict[str, Any]) -> None:
        payload = dict(payload, ts=time.time())
        if self._worker is None:
            self._worker = threading.Thread(target=self._drain, daemon=True)
            self._worker.start()
        self._q.put(payload)

    def _drain(self) -> None:
        sink = os.path.join(self.save_dir, "green_ai.jsonl")
        os.makedirs(self.save_dir, exist_ok=True)
        while True:
            payload = self._q.get()
            if payload is None:
                return
            try:
                if self.endpoint:
                    import urllib.request

                    req = urllib.request.Request(
                        self.endpoint, data=json.dumps(payload).encode(),
                        headers={"Content-Type": "application/json"})
                    urllib.request.urlopen(req, timeout=5)
                else:
                    with open(sink, "a") as f:
                        f.write(json.dumps(payload) + "\n")
            except Exception:
                pass

    def close(self) -> None:
        if self._worker is not None:
            self._q.put(None)
            self._worker.join(timeout=2)
            self._worker = None
