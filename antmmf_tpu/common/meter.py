"""Windowed metric smoothing for training telemetry.

Reference parity: ``/root/reference/antmmf/common/meter.py`` — ``SmoothedValue``
(deque window with median/avg/global_avg) and ``Meter`` (ordered dict of smoothed
series, ``update``/``get_scalar_dict``/log-string formatting). Values are plain
floats on the host; device→host transfer happens once per logged step upstream.
"""

from __future__ import annotations

import collections
from typing import Any, Dict, Mapping

import numpy as np


class SmoothedValue:
    def __init__(self, window_size: int = 20):
        self.window_size = window_size
        self.deque: collections.deque = collections.deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1) -> None:
        value = float(value)
        self.deque.append(value)
        self.total += value * n
        self.count += n

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    def get_latest(self) -> float:
        return self.deque[-1] if self.deque else 0.0


class Meter:
    def __init__(self, delimiter: str = ", "):
        self.meters: "collections.OrderedDict[str, SmoothedValue]" = collections.OrderedDict()
        self.delimiter = delimiter

    def update(self, update_dict: Mapping[str, Any], n: int = 1) -> None:
        for key, value in update_dict.items():
            if hasattr(value, "item"):
                value = value.item()
            self.meters.setdefault(key, SmoothedValue()).update(float(value), n)

    def get_scalar_dict(self) -> Dict[str, float]:
        return {key: m.get_latest() for key, m in self.meters.items()}

    def __getattr__(self, attr: str) -> SmoothedValue:
        meters = object.__getattribute__(self, "meters")
        if attr in meters:
            return meters[attr]
        raise AttributeError(attr)

    def __str__(self) -> str:
        out = []
        for name, meter in self.meters.items():
            if "train" in name:
                out.append(f"{name}: {meter.median:.4f} ({meter.global_avg:.4f})")
            else:
                out.append(f"{name}: {meter.global_avg:.4f}")
        return self.delimiter.join(out)

    def reset(self) -> None:
        self.meters.clear()
