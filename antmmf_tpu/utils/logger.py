"""Logging: per-process log files, stdout on process 0, optional TensorBoard scalars.

Reference parity: ``/root/reference/antmmf/utils/logger.py`` — ``Logger.write`` with
level / donot_print / log_all semantics, per-rank files named by config hash +
timestamp, tensorboard scalars on the main process; ``StdoutLogger`` for serving.

TPU-native deltas: rank identity comes from ``jax.process_index()`` (lazily — the
logger must be constructible before JAX initialises); tensorboard writing degrades to
a no-op when tensorboardX is absent (not baked into the image).
"""

from __future__ import annotations

import hashlib
import logging
import os
import sys
import time
from typing import Any, Dict, Optional


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return int(os.environ.get("JAX_PROCESS_INDEX", 0))


class Logger:
    def __init__(self, config: Optional[Any] = None, name: str = "antmmf_tpu"):
        self.config = config
        self._rank = None
        self.logger = logging.getLogger(f"{name}.{id(self):x}")
        self.logger.setLevel(logging.DEBUG)
        self.logger.propagate = False
        self.log_file: Optional[str] = None
        self._tb = None

        fmt = logging.Formatter(
            "%(asctime)s %(levelname)s: %(message)s", datefmt="%Y-%m-%dT%H:%M:%S"
        )

        save_dir = None
        should_log_file = True
        if config is not None:
            tp = config.get("training_parameters", {}) or {}
            save_dir = tp.get("save_dir", "./save")
            should_log_file = bool(tp.get("should_log", True) if hasattr(tp, "get") else True)

        if save_dir and should_log_file:
            log_dir = os.path.join(save_dir, "logs")
            os.makedirs(log_dir, exist_ok=True)
            digest = "nocfg"
            if config is not None:
                try:
                    digest = hashlib.sha1(str(config.to_dict()).encode()).hexdigest()[:8]
                except Exception:
                    pass
            stamp = time.strftime("%Y-%m-%dT%H-%M-%S")
            self.log_file = os.path.join(
                log_dir, f"{digest}_{stamp}_rank{self.rank}.log"
            )
            fh = logging.FileHandler(self.log_file, encoding="utf-8")
            fh.setFormatter(fmt)
            self.logger.addHandler(fh)

        if self.rank == 0:
            sh = logging.StreamHandler(sys.stdout)
            sh.setFormatter(fmt)
            self.logger.addHandler(sh)

        if self.rank == 0 and save_dir:
            try:
                from tensorboardX import SummaryWriter  # optional

                self._tb = SummaryWriter(os.path.join(save_dir, "tensorboard"))
            except Exception:
                self._tb = None

    @property
    def rank(self) -> int:
        if self._rank is None:
            self._rank = _process_index()
        return self._rank

    def write(
        self,
        message: Any,
        level: str = "info",
        donot_print: bool = False,
        log_all: bool = False,
    ) -> None:
        if self.rank != 0 and not log_all and self.log_file is None:
            return
        fn = getattr(self.logger, level, self.logger.info)
        if donot_print:
            # log to file handlers only: temporarily raise stream handler levels
            stream_handlers = [
                h for h in self.logger.handlers if isinstance(h, logging.StreamHandler)
                and not isinstance(h, logging.FileHandler)
            ]
            for h in stream_handlers:
                h.setLevel(logging.CRITICAL + 1)
            try:
                fn(message)
            finally:
                for h in stream_handlers:
                    h.setLevel(logging.NOTSET)
        else:
            fn(message)

    def add_scalars(self, scalars: Dict[str, float], step: int) -> None:
        if self._tb is None:
            return
        for key, val in scalars.items():
            try:
                self._tb.add_scalar(key, float(val), step)
            except Exception:
                pass

    def single_write(self, message: Any, level: str = "info") -> None:
        if self.rank == 0:
            self.write(message, level=level)


class StdoutLogger:
    """Minimal logger for online serving: plain stdout, no files."""

    def write(self, message: Any, level: str = "info", **kwargs: Any) -> None:
        print(f"[{level}] {message}")

    def add_scalars(self, scalars: Dict[str, float], step: int) -> None:
        pass

    def single_write(self, message: Any, level: str = "info") -> None:
        self.write(message, level)
