"""Video processors: temporal sampling + per-frame spatial transforms.

Reference parity: ``/root/reference/antmmf/datasets/processors/video_processors.py``
(the ``fmpeg`` ffmpeg-pipe decode+crop+fps-resample processor :18-217). This build
decodes with OpenCV in ``utils/video_utils.VideoReader`` and reuses the image
transform stack per frame; output is float32[n_frames, H, W, 3] with a frame
validity mask (fixed shapes — short videos repeat their last frame).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np

from antmmf_tpu.common.registry import registry
from antmmf_tpu.datasets.processors.image_processors import NormalizedImageProcessor
from antmmf_tpu.datasets.processors.processors import BaseProcessor
from antmmf_tpu.utils.video_utils import VideoReader


@registry.register_processor("video_frames")
@registry.register_processor("fmpeg")
class VideoFramesProcessor(BaseProcessor):
    """Decode ``num_frames`` frames (optionally within [start, end] seconds) and
    apply resize/crop/normalize. Input item: {"video": path, "start":, "end":} or
    {"frames": uint8 array}."""

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *args: Any, **kw: Any):
        super().__init__(config)
        cfg = self.config
        self.num_frames = int(cfg.get("num_frames", 8))
        self.strategy = cfg.get("strategy", "uniform")
        self.train_strategy = cfg.get("train_strategy", "random")
        self.image_processor = NormalizedImageProcessor(cfg.get("image", {}))
        self.rng = np.random.default_rng(cfg.get("seed", None))

    def __call__(
        self, item: Mapping[str, Any], is_training: bool = False, *args: Any, **kw: Any
    ) -> Dict[str, Any]:
        strategy = self.train_strategy if is_training else self.strategy
        if "frames" in item:
            frames = np.asarray(item["frames"])
            from antmmf_tpu.utils.video_utils import sample_frame_indices

            idx = sample_frame_indices(len(frames), self.num_frames, strategy, self.rng)
            frames = frames[idx]
        else:
            with VideoReader(item["video"]) as vr:
                frames = vr.sample(
                    self.num_frames,
                    start=item.get("start"),
                    end=item.get("end"),
                    strategy=strategy,
                    rng=self.rng,
                )
        out = np.stack([self.image_processor.transform_array(f) for f in frames])
        n_valid = out.shape[0]
        if n_valid < self.num_frames:  # repeat last frame to fixed shape
            pad = np.repeat(out[-1:], self.num_frames - n_valid, axis=0)
            out = np.concatenate([out, pad], axis=0)
        mask = np.zeros((self.num_frames,), dtype=np.int64)
        mask[:n_valid] = 1
        return {"video": out[: self.num_frames], "video_mask": mask}
