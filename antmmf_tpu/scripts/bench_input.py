"""Input-pipeline throughput: host video decode + preprocess rate.

The north-star requires preprocessing never to stall the accelerator. This
script measures the full host path (cv2 decode → resize → crop → normalize →
collate) on real mp4s and reports frames/sec/core plus the host-core count
needed to keep one chip fed at a given step rate.

Usage: python -m antmmf_tpu.scripts.bench_input [--video path.mp4]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None) -> None:
    from antmmf_tpu.datasets.processors.image_processors import (
        NormalizedImageProcessor,
    )
    from antmmf_tpu.utils.video_utils import VideoReader

    parser = argparse.ArgumentParser(allow_abbrev=False)
    parser.add_argument("--video",
                        default="tests/data/video/data/mp4/video9770.mp4")
    parser.add_argument("--frames_per_clip", type=int, default=8)
    parser.add_argument("--image_size", type=int, default=224)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--step_ms", type=float, default=85.6,
                        help="measured train-step time (bench.py)")
    parser.add_argument("--batch", type=int, default=32)
    args = parser.parse_args(argv)

    proc = NormalizedImageProcessor(
        {"size": args.image_size, "resize": args.image_size + 32})

    # warm cache
    with VideoReader(args.video) as vr:
        frames = vr.sample(args.frames_per_clip)
    t0 = time.perf_counter()
    n_frames = 0
    for _ in range(args.iters):
        with VideoReader(args.video) as vr:
            frames = vr.sample(args.frames_per_clip)
        batch = np.stack([proc.transform_array(f) for f in frames])
        n_frames += len(frames)
    dt = time.perf_counter() - t0

    fps_core = n_frames / dt
    clips_core = fps_core / args.frames_per_clip
    need_clips_sec = args.batch / (args.step_ms / 1000.0)
    cores_needed = need_clips_sec / clips_core
    print(f"host decode+preprocess: {fps_core:.1f} frames/s/core "
          f"({clips_core:.2f} clips/s/core at {args.frames_per_clip}f)")
    print(f"train step consumes {need_clips_sec:.1f} clips/s/chip "
          f"→ {cores_needed:.1f} host cores per chip keep the TPU fed")


if __name__ == "__main__":
    main()
