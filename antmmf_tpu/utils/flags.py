"""Command-line flags shared by all entry points.

Reference parity: ``/root/reference/antmmf/utils/flags.py:5-53`` — ``--config``,
``--config_override``, ``--local_rank``, trailing ``opts``, ``--prj``.
"""

from __future__ import annotations

import argparse


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="antmmf_tpu", allow_abbrev=False)
    parser.add_argument("--config", type=str, default=None, help="path to yaml config")
    parser.add_argument(
        "--config_override", type=str, default=None, help="path to override yaml"
    )
    parser.add_argument("--local_rank", type=int, default=None)
    parser.add_argument("--prj", type=str, default=None, help="project package to import")
    parser.add_argument(
        "opts",
        nargs=argparse.REMAINDER,
        default=None,
        help="dotted-path overrides: key value ... or key=value",
    )
    return parser


flags = get_parser()
