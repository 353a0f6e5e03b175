"""ctypes bindings for the native host data-plane (``src/host_plane.cc``).

Auto-builds ``_host_plane.so`` with the system compiler on first use (same
pattern as ``utils/phoc/build_phoc.py``); every entry point has a pure-Python
twin so nothing here is load-bearing without a toolchain.

Unicode parity contract: the C++ tokenizer receives flat per-codepoint tables
(classification flags + a lower/accent-strip map) built HERE from the host
interpreter's ``unicodedata``, so native and Python tokenization agree by
construction. Codepoints whose lowering is context-sensitive (e.g. Greek
capital sigma) or not expressible as a single codepoint after NFD-strip are
marked COMPLEX; the native encoder refuses such strings (returns None) and
the caller falls back to the Python path for that one string. Tables are
cached on disk keyed by the Unicode database version.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import unicodedata
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "host_plane.cc")
_LIB = os.path.join(_HERE, "_host_plane.so")

UNICODE_MAX = 0x110000

UC_WHITESPACE = 1
UC_CONTROL = 2
UC_PUNCT = 4
UC_CJK = 8
UC_DROP = 16

LOWER_REMOVE = -1
LOWER_COMPLEX = -2

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed or os.environ.get("ANTMMF_NATIVE", "1") == "0":
        return None
    if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
        for cxx in ("g++", "c++", "clang++"):
            try:
                subprocess.run(
                    [cxx, "-O2", "-std=c++17", "-shared", "-fPIC",
                     "-o", _LIB, _SRC],
                    check=True, capture_output=True, timeout=180)
                break
            except (OSError, subprocess.SubprocessError):
                continue
        else:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        _build_failed = True
        return None
    lib.wp_create.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p]
    lib.wp_create.restype = ctypes.c_void_p
    lib.wp_free.argtypes = [ctypes.c_void_p]
    lib.wp_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_long]
    lib.wp_encode.restype = ctypes.c_long
    lib.mdblite_open.argtypes = [ctypes.c_char_p]
    lib.mdblite_open.restype = ctypes.c_void_p
    lib.mdblite_close.argtypes = [ctypes.c_void_p]
    lib.mdblite_entries.argtypes = [ctypes.c_void_p]
    lib.mdblite_entries.restype = ctypes.c_long
    lib.mdblite_get.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_long)]
    lib.mdblite_get.restype = ctypes.c_int
    lib.mdblite_keys.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                 ctypes.c_long]
    lib.mdblite_keys.restype = ctypes.c_long
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


# ---------------------------------------------------------------------------
# Unicode tables (exact mirrors of utils/tokenization.py predicates)
# ---------------------------------------------------------------------------

def _is_whitespace(ch: str) -> bool:
    return ch in " \t\n\r" or unicodedata.category(ch) == "Zs"


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) \
            or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF
        or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F
        or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF
        or 0x2F800 <= cp <= 0x2FA1F
    )


def _strip_accents(text: str) -> str:
    return "".join(ch for ch in unicodedata.normalize("NFD", text)
                   if unicodedata.category(ch) != "Mn")


def _lower_of(ch: str) -> int:
    """Single-codepoint result of lower()+NFD-strip, or a sentinel.

    COMPLEX when the lowering is context-sensitive (differs mid-word /
    word-final), when NFD emits a reorderable non-Mn mark (so per-char
    stripping would diverge from whole-string stripping), or when the result
    is more than one codepoint."""
    l_alone = ch.lower()
    if ("x" + ch + "x").lower()[1:-1] != l_alone:
        return LOWER_COMPLEX
    if ("x" + ch).lower()[1:] != l_alone:
        return LOWER_COMPLEX
    for d in unicodedata.normalize("NFD", l_alone):
        if unicodedata.combining(d) != 0 \
                and unicodedata.category(d) != "Mn":
            return LOWER_COMPLEX
    s = _strip_accents(l_alone)
    if len(s) == 0:
        return LOWER_REMOVE
    if len(s) == 1:
        return ord(s)
    return LOWER_COMPLEX


def _table_cache_path() -> str:
    ver = unicodedata.unidata_version.replace(".", "_")
    py = f"{sys.version_info.major}{sys.version_info.minor}"
    return os.path.join(_HERE, f"_uc_tables_{ver}_py{py}.npz")


_tables: Optional[tuple] = None


def _build_tables() -> tuple:
    global _tables
    if _tables is not None:
        return _tables
    cache = _table_cache_path()
    if os.path.exists(cache):
        try:
            z = np.load(cache)
            _tables = (np.ascontiguousarray(z["flags"], np.uint8),
                       np.ascontiguousarray(z["lower"], np.int32))
            return _tables
        except Exception:
            pass
    flags = np.zeros(UNICODE_MAX, np.uint8)
    lower = np.zeros(UNICODE_MAX, np.int32)
    for cp in range(UNICODE_MAX):
        if 0xD800 <= cp <= 0xDFFF:  # surrogates: unencodable from Python str
            flags[cp] = UC_CONTROL
            lower[cp] = LOWER_COMPLEX
            continue
        ch = chr(cp)
        f = 0
        if cp == 0 or cp == 0xFFFD:
            f |= UC_DROP
        if _is_whitespace(ch):
            f |= UC_WHITESPACE
        elif _is_control(ch):
            f |= UC_CONTROL
        if _is_punctuation(ch):
            f |= UC_PUNCT
        if _is_cjk(cp):
            f |= UC_CJK
        flags[cp] = f
        lower[cp] = cp if f & (UC_DROP | UC_CONTROL | UC_WHITESPACE) \
            else _lower_of(ch)
    try:
        np.savez_compressed(cache, flags=flags, lower=lower)
    except OSError:
        pass
    _tables = (flags, lower)
    return _tables


# ---------------------------------------------------------------------------
# WordPiece
# ---------------------------------------------------------------------------

class NativeWordPiece:
    """C++ BERT tokenizer: text -> token ids. ``encode`` returns None when
    the string needs the Python fallback (COMPLEX codepoint)."""

    def __init__(self, vocab_file: str, do_lower_case: bool = True,
                 unk_token: str = "[UNK]", max_chars_per_word: int = 100):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native host plane unavailable")
        self._lib = lib
        flags, lower = _build_tables()
        self._keepalive = (flags, lower)
        with open(vocab_file, "rb") as f:
            blob = f.read()
        self._h = lib.wp_create(
            blob, len(blob),
            flags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            lower.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            int(do_lower_case), int(max_chars_per_word),
            unk_token.encode("utf-8"))
        if not self._h:
            raise RuntimeError(f"wp_create failed for {vocab_file!r} "
                               f"(missing {unk_token}?)")
        self._out = (ctypes.c_int32 * 8192)()

    def __del__(self):
        h = getattr(self, "_h", None)
        if h and getattr(self, "_lib", None) is not None:
            self._lib.wp_free(h)
            self._h = None

    def encode(self, text: str) -> Optional[List[int]]:
        raw = text.encode("utf-8")
        n = self._lib.wp_encode(self._h, raw, len(raw), self._out,
                                len(self._out))
        if n == -2:  # output buffer too small: grow and retry once
            self._out = (ctypes.c_int32 * (len(raw) * 2 + 16))()
            n = self._lib.wp_encode(self._h, raw, len(raw), self._out,
                                    len(self._out))
        if n < 0:
            return None
        return list(self._out[:n])


# ---------------------------------------------------------------------------
# LMDB
# ---------------------------------------------------------------------------

class NativeLmdbReader:
    """mmap-backed C++ LMDB reader with the ``open_lmdb`` surface
    (``get``/``keys``/``__len__``). Raises on open failure so callers can
    fall back to the pure-Python ``LmdbLiteReader``."""

    def __init__(self, path: str):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native host plane unavailable")
        self._lib = lib
        self._h = lib.mdblite_open(path.encode("utf-8"))
        if not self._h:
            raise RuntimeError(f"mdblite_open failed: {path!r}")

    def close(self):
        if getattr(self, "_h", None):
            self._lib.mdblite_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __len__(self) -> int:
        return self._lib.mdblite_entries(self._h)

    def get(self, key) -> Optional[bytes]:
        if isinstance(key, str):
            key = key.encode("utf-8")
        out = ctypes.c_char_p()
        outlen = ctypes.c_long()
        rc = self._lib.mdblite_get(self._h, key, len(key),
                                   ctypes.byref(out), ctypes.byref(outlen))
        if rc == 1:
            return ctypes.string_at(out, outlen.value)
        if rc == 0:
            return None
        raise RuntimeError("corrupt LMDB file")

    def keys(self) -> List[bytes]:
        need = self._lib.mdblite_keys(self._h, None, 0)
        if need < 0:
            raise RuntimeError("corrupt LMDB file")
        if need == 0:
            return []
        buf = ctypes.create_string_buffer(need)
        got = self._lib.mdblite_keys(self._h, buf, need)
        if got != need:
            raise RuntimeError("corrupt LMDB file")
        raw = buf.raw
        keys, off = [], 0
        while off < need:
            klen = int.from_bytes(raw[off:off + 4], "little")
            keys.append(raw[off + 4:off + 4 + klen])
            off += 4 + klen
        return keys
