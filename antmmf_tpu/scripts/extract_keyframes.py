"""Offline keyframe extraction: mp4 tree → `<root>_keyframes/<clip>/NNN.jpg`.

The thin-host input-pipeline fast path (BASELINE.md): mp4 seek-decode costs
~8 clips/s/core while jpeg keyframe reads are ~10× cheaper; extracting frames
once offline lets ``MultiSourceLoader(source="auto")`` skip video decode at
train time entirely (reference ``KeyFramesDatabase``,
video_database.py:230-245).

Usage::

    python -m antmmf_tpu.scripts.extract_keyframes \
        --video_root data/mp4 --frames 32 [--out_root data/mp4_keyframes]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

_VID_EXTS = (".mp4", ".avi", ".mkv", ".mov", ".webm")


def extract_keyframes(video_root: str, out_root: str = None,
                      frames: int = 32, quality: int = 92,
                      size: int = 0) -> int:
    """``size`` > 0 pre-resizes the short side at extraction time — the real
    thin-host lever: train-time cost drops to small-jpeg decode + crop."""
    import cv2

    from antmmf_tpu.utils.video_utils import VideoReader

    out_root = out_root or video_root.rstrip("/") + "_keyframes"
    count = 0
    for dirpath, _, files in os.walk(video_root):
        for f in sorted(files):
            if not f.lower().endswith(_VID_EXTS):
                continue
            src = os.path.join(dirpath, f)
            rel = os.path.relpath(src, video_root)
            clip = os.path.splitext(rel)[0]
            dst = os.path.join(out_root, clip)
            os.makedirs(dst, exist_ok=True)
            with VideoReader(src) as vr:
                n = min(frames, vr.num_frames)
                idx = np.linspace(0, vr.num_frames - 1, n).astype(int)
                imgs = vr.read_frames(idx)
            for i, img in enumerate(imgs):
                if size > 0:
                    h, w = img.shape[:2]
                    s = size / min(h, w)
                    img = cv2.resize(
                        img, (max(1, round(w * s)), max(1, round(h * s))),
                        interpolation=cv2.INTER_AREA)
                cv2.imwrite(os.path.join(dst, f"{i:04d}.jpg"),
                            img[:, :, ::-1],
                            [cv2.IMWRITE_JPEG_QUALITY, quality])
            count += 1
    print(f"extracted keyframes for {count} clips into {out_root}")
    return count


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--video_root", required=True)
    parser.add_argument("--out_root", default=None)
    parser.add_argument("--frames", type=int, default=32)
    parser.add_argument("--quality", type=int, default=92)
    parser.add_argument("--size", type=int, default=0,
                        help="pre-resize short side at extraction (0 = keep)")
    parser.add_argument("--pack_lmdb", default=None,
                        help="also pack frames into a .lmdb environment "
                             "(npy uint8 [F,H,W,3] per clip; readable by "
                             "MultiSourceLoader source=lmdb)")
    args = parser.parse_args(argv)
    out_root = extract_keyframes_out(args)
    if args.pack_lmdb:
        pack_lmdb(out_root, args.pack_lmdb)


def extract_keyframes_out(args):
    out_root = args.out_root or args.video_root.rstrip("/") + "_keyframes"
    extract_keyframes(args.video_root, args.out_root, args.frames,
                      args.quality, args.size)
    return out_root


def pack_lmdb(keyframes_root: str, lmdb_path: str) -> str:
    """Pack keyframe dirs into one LMDB env: key = clip name, value =
    npy-encoded uint8 frame stack (LmdbVideoDatabase's format). Uses the
    pure-Python writer when the lmdb package is absent."""
    import io

    import cv2
    import numpy as np

    from antmmf_tpu.utils.lmdb_lite import LmdbLiteWriter

    w = LmdbLiteWriter(lmdb_path)
    n = 0
    # recurse: extract_keyframes preserves subdirectory structure, so keys
    # are paths relative to the keyframes root
    for dirpath, _, files in sorted(os.walk(keyframes_root)):
        frames = []
        for f in sorted(files):
            if f.lower().endswith((".jpg", ".jpeg", ".png")):
                frames.append(
                    cv2.imread(os.path.join(dirpath, f))[:, :, ::-1])
        if not frames:
            continue
        clip = os.path.relpath(dirpath, keyframes_root).replace(os.sep, "/")
        buf = io.BytesIO()
        np.save(buf, np.stack(frames).astype(np.uint8))
        w.put(clip, buf.getvalue())
        n += 1
    path = w.save()
    print(f"packed {n} clips into {path}")
    return path


if __name__ == "__main__":
    main()
