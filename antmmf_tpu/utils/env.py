"""Seeding and environment setup.

Reference parity: ``/root/reference/antmmf/utils/env.py:16-31`` (``set_seed``
with deterministic-cudnn). JAX is deterministic by construction given the PRNG
key; this seeds the *host-side* RNGs (numpy shuffles, samplers, maskers).
"""

from __future__ import annotations

import os
import random
from typing import Optional

import numpy as np


def set_seed(seed: Optional[int]) -> int:
    if seed is None or seed == -1:
        seed = int.from_bytes(os.urandom(4), "little") % (2**31)
    random.seed(seed)
    np.random.seed(seed % (2**32))
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed
