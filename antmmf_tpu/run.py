"""Entry point: ``python -m antmmf_tpu.run --config <yaml> [k v ...]``.

Reference parity: ``/root/reference/antmmf/run.py:40-63`` (``plain_run``). The
multi-process launcher is gone: single-host SPMD needs one process for all local
chips; multi-host runs start one process per host (GKE/batch scheduler) and call
``jax.distributed.initialize`` via ``collectives.init_distributed``.
"""

from __future__ import annotations

import importlib
from typing import Any, Optional, Sequence

from antmmf_tpu.common.build import build_config
from antmmf_tpu.trainers.build import build_trainer
from antmmf_tpu.utils.flags import get_parser


def plain_run(args: Any) -> None:
    if getattr(args, "prj", None):
        importlib.import_module(args.prj)  # registry side effects
    opts = [o for o in (args.opts or []) if o != "--"]
    config = build_config(args.config, args.config_override, opts, args)
    trainer = build_trainer(config)
    trainer.load()
    trainer.train()


def main(argv: Optional[Sequence[str]] = None) -> None:
    # honor JAX_PLATFORMS even when a plugin registered itself programmatically
    # (the env var alone loses to in-process registration, e.g. TPU relays)
    import os

    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms in ("cpu",):
        import jax

        jax.config.update("jax_platforms", platforms)
    parser = get_parser()
    args = parser.parse_args(argv)
    plain_run(args)


if __name__ == "__main__":
    main()
