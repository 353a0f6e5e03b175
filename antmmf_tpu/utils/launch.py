"""Multi-process launcher with poll-based failure detection.

Reference parity: ``/root/reference/antmmf/utils/launch.py`` — spawns one
process per worker with the env plumbing, polls every 10 s, and tears the job
down if any rank dies (``pool_processes`` :199-217, 7-day watchdog :201).

TPU mapping: SPMD needs one process per **host** (not per chip). This launcher
starts N processes with ``JAX_NUM_PROCESSES``/``JAX_PROCESS_INDEX``/
coordinator env (consumed by ``collectives.init_distributed``) — used for
multi-process testing on CPU (each process gets a slice of virtual devices)
and as the template for multi-host schedulers. Failure semantics preserved:
any dead rank kills the survivors and the launcher exits non-zero.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time
from typing import List, Optional, Sequence

POLL_SECONDS = 10
WATCHDOG_SECONDS = 7 * 24 * 3600


def pool_processes(processes: List[subprocess.Popen],
                   poll_seconds: float = POLL_SECONDS,
                   watchdog_seconds: float = WATCHDOG_SECONDS) -> int:
    """Supervise ranks; returns the job's exit code."""
    start = time.time()
    try:
        while True:
            codes = [p.poll() for p in processes]
            if any(c is not None and c != 0 for c in codes):
                bad = next(i for i, c in enumerate(codes)
                           if c is not None and c != 0)
                sys.stderr.write(
                    f"[launch] rank {bad} exited with {codes[bad]}; "
                    f"terminating survivors\n")
                for p in processes:
                    if p.poll() is None:
                        p.terminate()
                for p in processes:
                    try:
                        p.wait(timeout=30)
                    except subprocess.TimeoutExpired:
                        p.kill()
                return codes[bad] or 1
            if all(c == 0 for c in codes):
                return 0
            if time.time() - start > watchdog_seconds:
                sys.stderr.write("[launch] watchdog expired; killing job\n")
                for p in processes:
                    if p.poll() is None:
                        p.kill()
                return 1
            time.sleep(poll_seconds)
    except KeyboardInterrupt:
        for p in processes:
            if p.poll() is None:
                p.terminate()
        return 130


def launch(
    script_args: Sequence[str],
    nproc: int = 2,
    coordinator_port: int = 12355,
    poll_seconds: float = POLL_SECONDS,
    extra_env: Optional[dict] = None,
) -> int:
    processes: List[subprocess.Popen] = []
    for rank in range(nproc):
        env = dict(os.environ)
        env.update({
            "JAX_NUM_PROCESSES": str(nproc),
            "JAX_PROCESS_INDEX": str(rank),
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{coordinator_port}",
        })
        env.update(extra_env or {})
        processes.append(subprocess.Popen(
            [sys.executable, *script_args], env=env))
    return pool_processes(processes, poll_seconds)


def main(argv: Optional[Sequence[str]] = None) -> None:
    parser = argparse.ArgumentParser("antmmf_tpu.utils.launch", allow_abbrev=False)
    parser.add_argument("--nproc_per_node", type=int, default=2)
    parser.add_argument("--coordinator_port", type=int, default=12355)
    parser.add_argument("script_and_args", nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)
    sys.exit(launch(args.script_and_args, args.nproc_per_node,
                    args.coordinator_port))


if __name__ == "__main__":
    main()
