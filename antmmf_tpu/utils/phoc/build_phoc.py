"""PHOC text features: ctypes binding to the native C kernel, with auto-build.

Reference parity: ``/root/reference/antmmf/utils/phoc/build_phoc.py`` +
``src/cphoc.c`` (the reference's one in-repo native component, a CPython
extension). Here the C code exposes a plain ABI and is compiled on first use
with the system compiler into ``_cphoc.so``; a pure-python fallback keeps the
feature available without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

PHOC_DIM = 604
_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "cphoc.c")
_LIB = os.path.join(_HERE, "_cphoc.so")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False

UNIGRAMS = "abcdefghijklmnopqrstuvwxyz0123456789"
# must match the reference table exactly for feature compatibility
# (/root/reference/antmmf/utils/phoc/src/cphoc.c:29)
BIGRAMS = [
    "th", "he", "in", "er", "an", "re", "es", "on", "st", "nt",
    "en", "at", "ed", "nd", "to", "or", "ea", "ti", "ar", "te",
    "ng", "al", "it", "as", "is", "ha", "et", "se", "ou", "of",
    "le", "sa", "ve", "ro", "ra", "ri", "hi", "ne", "me", "de",
    "co", "ta", "ec", "si", "ll", "so", "na", "li", "la", "el",
]
_LEVELS = (2, 3, 4, 5)


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
        for cc in ("cc", "gcc", "clang"):
            try:
                subprocess.run(
                    [cc, "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
                    check=True, capture_output=True, timeout=60)
                break
            except (OSError, subprocess.SubprocessError):
                continue
        else:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB)
        lib.build_phoc.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_float)]
        lib.build_phoc.restype = None
        _lib = lib
    except OSError:
        _build_failed = True
        return None
    return _lib


def _build_phoc_py(token: str) -> np.ndarray:
    """Pure-python fallback with identical semantics to the C kernel."""
    out = np.zeros(PHOC_DIM, np.float32)
    token = token.lower()
    n = len(token)
    if n == 0:
        return out

    f32 = np.float32

    def in_region(clo, chi, r, L):
        # single-precision on purpose: matches the reference's float math
        # at exact-0.5 overlap boundaries (cphoc.c:56-61)
        lo, hi = max(clo, f32(r) / f32(L)), min(chi, f32(r + 1) / f32(L))
        return f32(hi - lo) / f32(chi - clo) >= f32(0.5)

    for i, ch in enumerate(token):
        ci = UNIGRAMS.find(ch)
        if ci < 0:
            continue
        clo, chi = f32(i) / f32(n), f32(i + 1) / f32(n)
        offset = 0
        for L in _LEVELS:
            for r in range(L):
                if in_region(clo, chi, r, L):
                    out[(offset + r) * len(UNIGRAMS) + ci] = 1.0
            offset += L
    base = 14 * len(UNIGRAMS)
    for i in range(n - 1):
        bg = token[i:i + 2]
        if bg in BIGRAMS:
            b = BIGRAMS.index(bg)
            clo, chi = f32(i) / f32(n), f32(i + 2) / f32(n)
            for r in range(2):
                if in_region(clo, chi, r, 2):
                    out[base + r * len(BIGRAMS) + b] = 1.0
    return out


def build_phoc(token: str) -> np.ndarray:
    """604-dim float32 PHOC vector for a token."""
    lib = _load_lib()
    if lib is None:
        return _build_phoc_py(token)
    out = np.zeros(PHOC_DIM, np.float32)
    lib.build_phoc(token.encode("utf-8", "ignore"),
                   out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
