"""Native (C++) host data-plane: fast WordPiece tokenization + LMDB reads.

See ``host_plane.py`` for the ctypes bindings and ``src/host_plane.cc`` for
the kernel. Reference counterpart: the reference's host pipeline leans on
native dependencies (HF fast tokenizers, liblmdb, decord —
``/root/reference/antmmf/datasets/processors/text_processors.py:101``,
``antmmf/datasets/database/video_database.py:289-335``); this package is the
TPU build's in-tree equivalent with pure-Python fallbacks.
"""

from antmmf_tpu.native.host_plane import (  # noqa: F401
    NativeLmdbReader,
    NativeWordPiece,
    native_available,
)
