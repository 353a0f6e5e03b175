"""Download utilities — checksum-verified fetch with zero-egress gating.

Reference parity: ``/root/reference/antmmf/utils/download.py`` (457 LoC). In
air-gapped/TPU-pod environments downloads are disabled unless
``ANTMMF_TPU_ALLOW_DOWNLOADS=1``; builders must treat a DownloadDisabled as
"data must already be on disk" (the reference's main-process-only _build
barrier still applies, base_dataset_builder.py:107-110).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import urllib.request
from typing import Optional


class DownloadDisabled(RuntimeError):
    pass


def downloads_allowed() -> bool:
    return os.environ.get("ANTMMF_TPU_ALLOW_DOWNLOADS") == "1"


def check_sha256(path: str, expected: str) -> bool:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest() == expected


def download(
    url: str,
    dest: str,
    sha256: Optional[str] = None,
    force: bool = False,
) -> str:
    if os.path.exists(dest) and not force:
        if sha256 is None or check_sha256(dest, sha256):
            return dest
    if not downloads_allowed():
        raise DownloadDisabled(
            f"Refusing to download {url!r} (zero-egress environment). Place "
            f"the file at {dest!r} or set ANTMMF_TPU_ALLOW_DOWNLOADS=1.")
    os.makedirs(os.path.dirname(os.path.abspath(dest)), exist_ok=True)
    tmp = dest + ".part"
    with urllib.request.urlopen(url, timeout=60) as r, open(tmp, "wb") as f:
        shutil.copyfileobj(r, f)
    if sha256 is not None and not check_sha256(tmp, sha256):
        os.unlink(tmp)
        raise IOError(f"Checksum mismatch for {url!r}")
    os.replace(tmp, dest)
    return dest
