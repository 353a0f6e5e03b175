"""Early stopping: monitor a validation metric, track best, signal stop.

Reference parity: ``/root/reference/antmmf/utils/early_stopping.py:8-104`` —
main-process monitor with patience in iterations, ``val/`` metric prefixing,
minimize/maximize modes; stop decision broadcast to all processes
(base_trainer.py:785) — here via ``collectives.broadcast_scalar``.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Optional

from antmmf_tpu.parallel import collectives as coll


class EarlyStopping:
    def __init__(
        self,
        monitored_metric: str = "total_loss",
        patience: int = 30000,
        minimize: bool = True,
        should_stop: bool = True,
    ):
        self.monitored_metric = monitored_metric
        if not monitored_metric.startswith("val") and monitored_metric != "total_loss":
            self.monitored_metric = f"val/{monitored_metric}"
        self.patience = int(patience)
        self.minimize = bool(minimize)
        self.enabled = bool(should_stop)
        self.best_value = math.inf if minimize else -math.inf
        self.best_iteration = 0
        self.activated = False

    def improved(self, value: float) -> bool:
        return value < self.best_value if self.minimize else value > self.best_value

    def __call__(self, iteration: int, metrics: Mapping[str, Any]) -> bool:
        """Returns True when training should stop (globally agreed)."""
        is_best = False
        stop = 0.0
        if coll.is_main_process():
            value = metrics.get(self.monitored_metric)
            if value is None:
                # fall back to raw name (metrics may already carry prefixes)
                value = metrics.get(self.monitored_metric.replace("val/", ""))
            if value is not None:
                value = float(value)
                if self.improved(value):
                    self.best_value = value
                    self.best_iteration = int(iteration)
                    is_best = True
                elif self.enabled and iteration - self.best_iteration > self.patience:
                    self.activated = True
                    stop = 1.0
        # Broadcast BOTH decisions: checkpoint.save_best is a collective Orbax
        # save, so every process must take the same is_best branch or the pod
        # deadlocks at the commit barrier (reference broadcasts only the stop
        # flag, base_trainer.py:785, because its save is rank0-only).
        stop = coll.broadcast_scalar(stop)
        self._last_is_best = bool(coll.broadcast_scalar(1.0 if is_best else 0.0) > 0.5)
        return bool(stop > 0.5)

    @property
    def is_best(self) -> bool:
        return getattr(self, "_last_is_best", False)

    def summary(self) -> Dict[str, Any]:
        return {
            "metric": self.monitored_metric,
            "best_value": self.best_value,
            "best_iteration": self.best_iteration,
            "early_stopped": self.activated,
        }
