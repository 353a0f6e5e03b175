"""Wall-clock timers for coarse phase profiling.

Reference parity: ``/root/reference/antmmf/utils/timer.py`` (Timer with
get_current/reset/get_time_since_start humanized strings).
"""

from __future__ import annotations

import time


class Timer:
    def __init__(self) -> None:
        self.start = time.time()

    def reset(self) -> None:
        self.start = time.time()

    def get_current(self) -> str:
        return self._humanize(time.time() - self.start)

    def unix_time_since_start(self) -> float:
        return time.time() - self.start

    def get_time_since_start(self) -> str:
        return self._humanize(time.time() - self.start)

    @staticmethod
    def _humanize(seconds: float) -> str:
        ms = int(seconds * 1000)
        h, rem = divmod(ms, 3600 * 1000)
        m, rem = divmod(rem, 60 * 1000)
        s, ms = divmod(rem, 1000)
        if h:
            return f"{h:02d}h {m:02d}m {s:02d}s {ms:03d}ms"
        if m:
            return f"{m:02d}m {s:02d}s {ms:03d}ms"
        return f"{s:02d}s {ms:03d}ms"
