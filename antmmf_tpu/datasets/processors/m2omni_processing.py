"""M2-omni unified preprocessing — Bailing2 processor parity.

Host-side data plane for the M2-omni (Bailing2) model family:

- ``smart_resize`` + ``M2OmniImageProcessor``: dynamic-resolution image/video
  preprocessing producing flatten patches ``[grid_t*grid_h*grid_w,
  C*tps*ps*ps]`` + ``grid_thw`` in the exact reference layout
  (``/root/reference/prj/M2_omni/models/image_processing_m2omni.py:94-452``).
- In-place ``<image>``/``<video>``/``<audio>`` token expansion and the
  chat/system templates
  (``/root/reference/prj/M2_omni/models/processing_m2omni.py:134-372``).
- ``fetch_image``/``fetch_video``/``sample_frames``/``process_vision_info``
  conversation media loading
  (``/root/reference/prj/M2_omni/models/m2omni_utils.py:46-436``), built on
  PIL + cv2 instead of torchvision/decord.

Everything here is host-side numpy; the TPU compute path consumes either
dense frames (``frames_from_patches`` inverts the flatten-patch layout — the
model's conv3d-as-Dense patchify then reproduces the reference embedding
exactly) or the flatten patches directly.
"""

from __future__ import annotations

import math
import os
import re
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple, Union

import numpy as np

from antmmf_tpu.common.registry import registry
from antmmf_tpu.datasets.processors.processors import BaseProcessor

# ---------------------------------------------------------------------------
# Constants (processing_m2omni.py:41-61, m2omni_utils.py:29-40)
# ---------------------------------------------------------------------------

IMAGE_FACTOR = 28
MIN_PIXELS = 4 * 28 * 28
MAX_PIXELS = 16384 * 28 * 28
MAX_RATIO = 200

VIDEO_MIN_PIXELS = 128 * 28 * 28
VIDEO_MAX_PIXELS = 768 * 28 * 28
VIDEO_TOTAL_PIXELS = 7680 * 28 * 28
FRAME_FACTOR = 2
FPS = 2.0
FPS_MIN_FRAMES = 4
FPS_MAX_FRAMES = 120

DEFAULT_IMAGE_PATCH_TOKEN = "<imagePatch>"
DEFAULT_VIDEO_PATCH_TOKEN = "<videoPatch>"
DEFAULT_IM_START_TOKEN = "<image>"
DEFAULT_IM_END_TOKEN = "</image>"
DEFAULT_VID_START_TOKEN = "<video>"
DEFAULT_VID_END_TOKEN = "</video>"
DEFAULT_AUDIO_PATCH_TOKEN = "<audioPatch>"
DEFAULT_AU_START_TOKEN = "<audio>"
DEFAULT_AU_END_TOKEN = "</audio>"

OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


# ---------------------------------------------------------------------------
# smart_resize family (image_processing_m2omni.py:94-122, m2omni_utils.py:46-56)
# ---------------------------------------------------------------------------

def round_by_factor(number: int, factor: int) -> int:
    """Closest integer to ``number`` divisible by ``factor``."""
    return round(number / factor) * factor


def ceil_by_factor(number: int, factor: int) -> int:
    return math.ceil(number / factor) * factor


def floor_by_factor(number: int, factor: int) -> int:
    return math.floor(number / factor) * factor


def smart_resize(height: int, width: int, factor: int = 28,
                 min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280) -> Tuple[int, int]:
    """Reference ``smart_resize`` exactly: factor-divisible dims whose pixel
    count lands in [min_pixels, max_pixels], aspect ratio preserved
    (image_processing_m2omni.py:94-122)."""
    if height < factor or width < factor:
        raise ValueError(
            f"height:{height} or width:{width} must be larger than "
            f"factor:{factor}")
    if max(height, width) / min(height, width) > MAX_RATIO:
        raise ValueError(
            "absolute aspect ratio must be smaller than "
            f"{MAX_RATIO}, got {max(height, width) / min(height, width)}")
    h_bar = round(height / factor) * factor
    w_bar = round(width / factor) * factor
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = math.floor(height / beta / factor) * factor
        w_bar = math.floor(width / beta / factor) * factor
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


# ---------------------------------------------------------------------------
# Image / video preprocessing
# ---------------------------------------------------------------------------

def _to_hwc_uint8(image: Any) -> np.ndarray:
    """Accept PIL image / HWC / CHW numpy, return HWC uint8 RGB."""
    try:  # PIL passthrough
        from PIL import Image
        if isinstance(image, Image.Image):
            return np.asarray(image.convert("RGB"))
    except ImportError:
        pass
    arr = np.asarray(image)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.ndim == 3 and arr.shape[0] in (1, 3) and arr.shape[-1] not in (1, 3):
        arr = arr.transpose(1, 2, 0)  # CHW -> HWC
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    if arr.dtype != np.uint8:
        if arr.max() <= 1.0:
            arr = (arr * 255.0).round()
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    return arr


def resize_bicubic(image_hwc: np.ndarray, height: int, width: int) -> np.ndarray:
    """PIL bicubic resize (the reference path: transformers ``resize`` →
    PIL.Image.resize(BICUBIC)); cv2 INTER_CUBIC fallback when PIL absent."""
    try:
        from PIL import Image
        pil = Image.fromarray(_to_hwc_uint8(image_hwc))
        return np.asarray(pil.resize((width, height), Image.BICUBIC))
    except ImportError:
        import cv2
        return cv2.resize(_to_hwc_uint8(image_hwc), (width, height),
                          interpolation=cv2.INTER_CUBIC)


def patchify(frames_tchw: np.ndarray, patch_size: int = 14,
             temporal_patch_size: int = 2, merge_size: int = 2
             ) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """[T, C, H, W] normalized frames → (flatten patches
    [t*h*w, C*tps*ps*ps], (grid_t, grid_h, grid_w)) in the exact reference
    transpose order (image_processing_m2omni.py:286-309): token order
    (t, h/m, w/m, m, m); patch vector order (C, tps, ps, ps)."""
    patches = np.asarray(frames_tchw)
    if patches.shape[0] % temporal_patch_size:
        # the reference tiles a single image to tps frames (:290-291); for
        # odd frame counts we repeat the last frame the same way
        pad = temporal_patch_size - patches.shape[0] % temporal_patch_size
        patches = np.concatenate(
            [patches, np.repeat(patches[-1:], pad, axis=0)], axis=0)
    T, channel, H, W = patches.shape
    ps, tps, m = patch_size, temporal_patch_size, merge_size
    grid_t = T // tps
    grid_h, grid_w = H // ps, W // ps
    patches = patches.reshape(grid_t, tps, channel, grid_h // m, m, ps,
                              grid_w // m, m, ps)
    patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    flat = patches.reshape(grid_t * grid_h * grid_w, channel * tps * ps * ps)
    return flat, (grid_t, grid_h, grid_w)


def frames_from_patches(flat: np.ndarray, grid_thw: Sequence[int],
                        patch_size: int = 14, temporal_patch_size: int = 2,
                        merge_size: int = 2) -> np.ndarray:
    """Exact inverse of :func:`patchify`: flatten patches → dense
    [T, H, W, C] frames ready for ``Qwen2VisionTransformer`` (which redoes the
    same permutation on-device before its Dense patch embed)."""
    grid_t, grid_h, grid_w = (int(g) for g in grid_thw)
    ps, tps, m = patch_size, temporal_patch_size, merge_size
    channel = flat.shape[-1] // (tps * ps * ps)
    x = flat.reshape(grid_t, grid_h // m, grid_w // m, m, m, channel, tps,
                     ps, ps)
    # invert transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    x = x.transpose(0, 6, 5, 1, 3, 7, 2, 4, 8)
    x = x.reshape(grid_t * tps, channel, grid_h * ps, grid_w * ps)
    return x.transpose(0, 2, 3, 1)  # TCHW -> THWC


class M2OmniImageProcessor:
    """Dynamic-resolution flatten-patch processor
    (``Bailing2ImageProcessor``, image_processing_m2omni.py:124-452)."""

    def __init__(self, do_resize: bool = True, do_rescale: bool = True,
                 rescale_factor: float = 1.0 / 255.0,
                 do_normalize: bool = True,
                 image_mean: Sequence[float] = OPENAI_CLIP_MEAN,
                 image_std: Sequence[float] = OPENAI_CLIP_STD,
                 min_pixels: int = 56 * 56,
                 max_pixels: int = 28 * 28 * 1280,
                 patch_size: int = 14, temporal_patch_size: int = 2,
                 merge_size: int = 2):
        self.do_resize = do_resize
        self.do_rescale = do_rescale
        self.rescale_factor = rescale_factor
        self.do_normalize = do_normalize
        self.image_mean = np.asarray(image_mean, np.float32)
        self.image_std = np.asarray(image_std, np.float32)
        self.min_pixels = min_pixels
        self.max_pixels = max_pixels
        self.patch_size = patch_size
        self.temporal_patch_size = temporal_patch_size
        self.merge_size = merge_size

    def _preprocess(self, images: Union[Any, Sequence[Any]],
                    do_resize: Optional[bool] = None
                    ) -> Tuple[np.ndarray, Tuple[int, int, int]]:
        """One image or one video's frame list → (flatten patches fp32,
        grid_thw). Mirrors ``Bailing2ImageProcessor._preprocess``
        (:192-309): the smart_resize target comes from the FIRST frame."""
        do_resize = self.do_resize if do_resize is None else do_resize
        if isinstance(images, np.ndarray) and images.ndim == 4:
            images = list(images)
        elif not isinstance(images, (list, tuple)):
            images = [images]
        frames = [_to_hwc_uint8(im) for im in images]
        height, width = frames[0].shape[:2]
        if do_resize:
            rh, rw = smart_resize(
                height, width, factor=self.patch_size * self.merge_size,
                min_pixels=self.min_pixels, max_pixels=self.max_pixels)
            frames = [resize_bicubic(f, rh, rw) for f in frames]
        out = []
        for f in frames:
            x = f.astype(np.float32)
            if self.do_rescale:
                x = x * self.rescale_factor
            if self.do_normalize:
                x = (x - self.image_mean) / self.image_std
            out.append(x.transpose(2, 0, 1))  # HWC -> CHW
        stack = np.stack(out, axis=0)  # [T, C, H, W]
        if stack.shape[0] == 1:
            stack = np.tile(stack, (self.temporal_patch_size, 1, 1, 1))
        return patchify(stack, self.patch_size, self.temporal_patch_size,
                        self.merge_size)

    def preprocess(self, images: Any = None, videos: Any = None,
                   do_resize: Optional[bool] = None) -> Dict[str, np.ndarray]:
        """List-of-images → ``{pixel_values, image_grid_thw}``; list-of-videos
        (each a [T,H,W,C] array or frame list) → ``{pixel_values_videos,
        video_grid_thw}`` (:311-452)."""
        data: Dict[str, np.ndarray] = {}
        if images is not None:
            if not isinstance(images, (list, tuple)) or (
                    isinstance(images, (list, tuple)) and images
                    and isinstance(images[0], (int, float))):
                images = [images]
            pix, grids = [], []
            for im in images:
                p, g = self._preprocess(im, do_resize=do_resize)
                pix.append(p)
                grids.append(g)
            data["pixel_values"] = np.concatenate(pix, axis=0)
            data["image_grid_thw"] = np.asarray(grids, np.int64)
        if videos is not None:
            if isinstance(videos, np.ndarray) and videos.ndim == 4:
                videos = [videos]
            pix, grids = [], []
            for vid in videos:
                p, g = self._preprocess(vid, do_resize=do_resize)
                pix.append(p)
                grids.append(g)
            data["pixel_values_videos"] = np.concatenate(pix, axis=0)
            data["video_grid_thw"] = np.asarray(grids, np.int64)
        return data


# ---------------------------------------------------------------------------
# Media fetching (m2omni_utils.py:131-436)
# ---------------------------------------------------------------------------

def sample_frames(num_frames: int, total_frames: int, sample: str = "random",
                  rng: Optional[np.random.Generator] = None) -> List[int]:
    """Frame-index sampling, reference semantics (m2omni_utils.py:175-202):
    ``sequence`` = linspace, ``uniform`` = interval midpoints, ``random`` =
    one per interval."""
    if sample == "sequence":
        return list(np.linspace(0, total_frames - 1, num_frames, dtype=int))
    intervals = np.linspace(start=0, stop=total_frames, num=num_frames + 1,
                            dtype=int)
    ranges = [(intervals[i], intervals[i + 1] - 1)
              for i in range(num_frames)]
    if sample == "random":
        rng = rng or np.random.default_rng()
        try:
            idx = [int(rng.integers(lo, hi)) if hi > lo else int(lo)
                   for lo, hi in ranges]
        except Exception:
            idx = sorted(rng.permutation(total_frames)[:num_frames].tolist())
        if len(idx) < num_frames:
            idx = idx + [idx[-1]] * (num_frames - len(idx))
        return idx
    if sample == "uniform":
        idx = [int((lo + hi) // 2) for lo, hi in ranges]
        if len(idx) < num_frames:
            idx = [idx[int((num_frames - 1) * i / (num_frames - 1) + 0.5)]
                   for i in range(num_frames)]
        return idx
    raise NotImplementedError(sample)


def get_frames(ele: Mapping[str, Any], total_frames: int) -> int:
    """Number of model-input frames for a video (m2omni_utils.py:204-224)."""
    min_frames = ceil_by_factor(FPS_MIN_FRAMES, FRAME_FACTOR)
    max_frames = floor_by_factor(FPS_MAX_FRAMES, FRAME_FACTOR)
    if "nframes" in ele:
        num_frames = min(total_frames, int(ele["nframes"]), max_frames)
    else:
        num_frames = min(total_frames, max_frames)
    return round_by_factor(max(num_frames, min_frames), FRAME_FACTOR)


def fetch_image(ele: Mapping[str, Any],
                size_factor: int = IMAGE_FACTOR) -> np.ndarray:
    """Load + smart-resize one image → HWC uint8 (m2omni_utils.py:131-173;
    local paths / file:// / PIL / numpy — no network, zero egress)."""
    image = ele.get("image", ele.get("image_url"))
    if isinstance(image, str):
        path = image[7:] if image.startswith("file://") else image
        from PIL import Image
        arr = _to_hwc_uint8(Image.open(path))
    else:
        arr = _to_hwc_uint8(image)
    if "resized_height" in ele and "resized_width" in ele:
        rh, rw = smart_resize(int(ele["resized_height"]),
                              int(ele["resized_width"]), factor=size_factor)
    else:
        h, w = arr.shape[:2]
        rh, rw = smart_resize(
            h, w, factor=size_factor,
            min_pixels=int(ele.get("min_pixels", MIN_PIXELS)),
            max_pixels=int(ele.get("max_pixels", MAX_PIXELS)))
    return resize_bicubic(arr, rh, rw)


def _read_video_cv2(path: str, ele: Mapping[str, Any]) -> np.ndarray:
    """cv2 full-decode + uniform sampling → [T, H, W, C] uint8 (replaces the
    reference's torchvision/decord backends, m2omni_utils.py:226-318)."""
    import cv2
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video {path}")
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) or 0
    num_frames = get_frames(ele, max(total, 1))
    want = set(sample_frames(num_frames, max(total, 1), sample="uniform"))
    frames, i = {}, 0
    while True:
        ok = cap.grab()
        if not ok:
            break
        if i in want:
            ok, frame = cap.retrieve()
            if ok:
                frames[i] = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        i += 1
    cap.release()
    if not frames:
        raise IOError(f"no frames decoded from {path}")
    keys = sorted(want)
    last = None
    out = []
    for k in keys:
        if k in frames:
            last = frames[k]
        out.append(last if last is not None else next(iter(frames.values())))
    return np.stack(out, axis=0)


def fetch_video(ele: Mapping[str, Any],
                image_factor: int = IMAGE_FACTOR
                ) -> Union[np.ndarray, List[np.ndarray]]:
    """Video path → resized float frames [T,H,W,C]; frame-list input →
    list of fetched images padded to FRAME_FACTOR (m2omni_utils.py:320-365).
    The per-frame pixel budget shrinks with frame count exactly like the
    reference (VIDEO_TOTAL_PIXELS cap)."""
    video = ele["video"]
    if isinstance(video, str):
        path = video[7:] if video.startswith("file://") else video
        frames = _read_video_cv2(path, ele)
        if "resized_height" in ele and "resized_width" in ele:
            rh, rw = smart_resize(int(ele["resized_height"]),
                                  int(ele["resized_width"]),
                                  factor=image_factor)
        else:
            nf, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
            max_pixels = max(
                min(VIDEO_MAX_PIXELS, VIDEO_TOTAL_PIXELS * FRAME_FACTOR // nf),
                int(VIDEO_MIN_PIXELS * 1.05))
            rh, rw = smart_resize(h, w, factor=28,
                                  min_pixels=VIDEO_MIN_PIXELS,
                                  max_pixels=max_pixels)
        return np.stack([resize_bicubic(f, rh, rw) for f in frames],
                        axis=0).astype(np.float32)
    assert isinstance(video, (list, tuple))
    info = {k: v for k, v in ele.items() if k not in ("type", "video")}
    images = [fetch_image({"image": v, **info}, size_factor=image_factor)
              for v in video]
    nframes = ceil_by_factor(len(images), FRAME_FACTOR)
    if len(images) < nframes:
        images.extend([images[-1]] * (nframes - len(images)))
    return images


def load_wav(path: str, sample_rate: int = 16000) -> np.ndarray:
    """16-bit PCM wav → float32 mono waveform at ``sample_rate`` (linear
    resample). Replaces the reference's torchaudio.load + Resample
    (m2omni_utils.py:81-101)."""
    import wave
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported wav sample width {width}")
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1)
    if sr != sample_rate:
        t_out = np.linspace(0.0, len(data) - 1, int(len(data) * sample_rate / sr))
        data = np.interp(t_out, np.arange(len(data)), data).astype(np.float32)
    return data


def fetch_audio(ele: Mapping[str, Any]) -> np.ndarray:
    """Audio path / array → float32 waveform (m2omni_utils.py:367-387)."""
    audio = ele.get("audio", ele.get("audio_url"))
    sample_rate = int(ele.get("sample_rate", 16000))
    if isinstance(audio, str):
        path = audio[7:] if audio.startswith("file://") else audio
        return load_wav(path, sample_rate=sample_rate)
    return np.asarray(audio, np.float32)


def extract_vision_info(conversations: Sequence[Any]) -> List[Dict[str, Any]]:
    """m2omni_utils.py:388-404."""
    infos: List[Dict[str, Any]] = []
    if conversations and isinstance(conversations[0], dict):
        conversations = [conversations]
    for conversation in conversations:
        for message in conversation:
            if isinstance(message.get("content"), list):
                for ele in message["content"]:
                    if ("image" in ele or "image_url" in ele
                            or "video" in ele
                            or ele.get("type") in ("image", "image_url",
                                                   "video")):
                        infos.append(ele)
                    elif "audio" in ele or "audio_url" in ele:
                        infos.append(ele)
    return infos


def process_vision_info(conversations: Sequence[Any],
                        size_factor: int = IMAGE_FACTOR,
                        min_pixels: Optional[int] = None,
                        max_pixels: Optional[int] = None) -> Tuple[
        Optional[List[np.ndarray]], Optional[List[Any]],
        Optional[List[np.ndarray]]]:
    """Conversation → (images, videos, audios) lists (m2omni_utils.py:405-436).

    ``size_factor``/``min_pixels``/``max_pixels`` default to the reference
    constants (factor 28 == patch 14 × merge 2); non-default vision-tower
    geometries thread their own bounds through."""
    image_inputs: List[np.ndarray] = []
    video_inputs: List[Any] = []
    audio_inputs: List[np.ndarray] = []
    bounds = {}
    if min_pixels is not None:
        bounds["min_pixels"] = int(min_pixels)
    if max_pixels is not None:
        bounds["max_pixels"] = int(max_pixels)
    for info in extract_vision_info(conversations):
        if "image" in info or "image_url" in info:
            img = info.get("image", info.get("image_url"))
            if isinstance(img, (tuple, list)):
                for one in img:
                    image_inputs.append(fetch_image(
                        {"type": "image", "image": one, **bounds},
                        size_factor=size_factor))
            else:
                image_inputs.append(fetch_image({**bounds, **info},
                                                size_factor=size_factor))
        elif "video" in info or "video_url" in info:
            video_inputs.append(fetch_video(info, image_factor=size_factor))
        elif "audio" in info or "audio_url" in info:
            aud = info.get("audio", info.get("audio_url"))
            if isinstance(aud, (tuple, list)):
                for one in aud:
                    audio_inputs.append(fetch_audio({"type": "audio",
                                                     "audio": one}))
            else:
                audio_inputs.append(fetch_audio(info))
        else:
            raise ValueError(
                "image, image_url, video, video_url, audio or audio_url "
                "should in content.")
    return (image_inputs or None, video_inputs or None, audio_inputs or None)


# ---------------------------------------------------------------------------
# Token expansion + chat template (processing_m2omni.py:222-372)
# ---------------------------------------------------------------------------

def expand_image_tokens(text: List[str], image_grid_thw: np.ndarray,
                        special_token: str = "<image>",
                        merge_size: int = 2) -> List[str]:
    """Replace each ``<image>`` in order with ``<image> + n*<imagePatch> +
    </image>``, n = prod(grid)/merge² (processing_m2omni.py:317-337)."""
    grids = np.asarray(image_grid_thw).reshape(-1, 3)
    num_query_token = grids.prod(axis=1) // (merge_size * merge_size)
    out, image_index = [], 0
    for sample in text:
        num_images = sample.count(special_token)
        for i in range(image_index, num_images + image_index):
            img_text = (DEFAULT_IM_START_TOKEN
                        + int(num_query_token[i]) * DEFAULT_IMAGE_PATCH_TOKEN
                        + DEFAULT_IM_END_TOKEN)
            sample = sample.replace(special_token, img_text, 1)
        image_index += num_images
        out.append(sample)
    return out


def expand_video_tokens(text: List[str], video_grid_thw: np.ndarray,
                        special_token: str = "<video>",
                        merge_size: int = 2) -> List[str]:
    """processing_m2omni.py:338-358."""
    grids = np.asarray(video_grid_thw).reshape(-1, 3)
    num_query_token = grids.prod(axis=1) // (merge_size * merge_size)
    out, video_index = [], 0
    for sample in text:
        num_videos = sample.count(special_token)
        for i in range(video_index, num_videos + video_index):
            vid_text = (DEFAULT_VID_START_TOKEN
                        + int(num_query_token[i]) * DEFAULT_VIDEO_PATCH_TOKEN
                        + DEFAULT_VID_END_TOKEN)
            sample = sample.replace(special_token, vid_text, 1)
        video_index += num_videos
        out.append(sample)
    return out


def expand_audio_tokens(text: List[str], num_audio_tokens: int = 256,
                        special_token: str = "<audio>") -> List[str]:
    """processing_m2omni.py:359-374: in-place replacement, or appended with a
    trailing newline when the text has no ``<audio>`` marker."""
    audio_text = (DEFAULT_AU_START_TOKEN
                  + num_audio_tokens * DEFAULT_AUDIO_PATCH_TOKEN
                  + DEFAULT_AU_END_TOKEN)
    out = []
    for sample in text:
        if special_token in sample:
            sample = sample.replace(special_token, audio_text)
        else:
            sample = sample + audio_text + "\n"
        out.append(sample)
    return out


def apply_system_template(text: str) -> str:
    """EN/CN system prompt selection by CJK presence
    (processing_m2omni.py:222-236)."""
    def if_all_en(raw_text):
        for c_char in raw_text:
            if 0x4E00 <= ord(c_char) <= 0x9FFF:
                return False
        return True

    if if_all_en(text):
        sys_template = (
            "You are a helpful language, vision and audio assistant. You are "
            "able to understand the visual and audio content that the user "
            "provides, and assist the user with a variety of tasks using "
            "natural language.")
    else:
        sys_template = (
            "你是一个有帮助的语言,视觉和音频助手。你能理解用户提供的视觉与音"
            "频内容，并用自然语言帮助用户完成各种任务。")
    return ("<|start_header_id|>system<|end_header_id|>\n\n"
            f"{sys_template} <|eot_id|>")


def apply_chat_template(conversation: Sequence[Mapping[str, Any]],
                        bos_token: str = "<s>",
                        add_generation_prompt: bool = False) -> str:
    """The reference's ``use_system=True`` chat-template branch
    (processing_m2omni.py:272-306): llama3-style headers, auto-inserted
    ``<image>``/``<video>``/``<audio>`` placeholders for content entries the
    text didn't already mark, EN/CN system prompt prepended."""
    text = ""
    for message in conversation:
        text += "<|start_header_id|>" + message["role"] + \
            "<|end_header_id|>\n\n"
        image_counts = str(message["content"]).count("<image>")
        video_counts = str(message["content"]).count("<video>")
        audio_counts = str(message["content"]).count("<audio>")
        for cid, content in enumerate(message["content"]):
            if cid > 0:
                text += "\n"
            if content["type"] == "image":
                img = content["image"]
                num_images = 1 if isinstance(img, (str, np.ndarray)) or \
                    not isinstance(img, (list, tuple)) else len(img)
                if image_counts < num_images:
                    placeholder = "<image>\n" * (num_images - image_counts)
                    text += placeholder.rstrip("\n")
            elif content["type"] == "video":
                assert video_counts <= 1, "Video count must be at most 1!"
                if video_counts == 0:
                    text += "<video>"
            elif content["type"] == "audio":
                aud = content["audio"]
                num_audios = 1 if isinstance(aud, str) or \
                    not isinstance(aud, (list, tuple)) else len(aud)
                if audio_counts < num_audios:
                    placeholder = "<audio>\n" * (num_audios - audio_counts)
                    text += placeholder.rstrip("\n")
            elif content["type"] == "text":
                text += content["text"]
        text += "<|eot_id|>"
    if add_generation_prompt:
        text += "<|start_header_id|>assistant<|end_header_id|>\n\n"
    return bos_token + apply_system_template(text) + text


# ---------------------------------------------------------------------------
# Special-token-aware tokenization
# ---------------------------------------------------------------------------

def encode_with_special_tokens(text: str, tokenize_fn,
                               special_token_ids: Mapping[str, int]
                               ) -> List[int]:
    """Split ``text`` on the special-token strings (longest-first so
    ``</image>`` wins over ``<image>``), map those to their configured ids,
    and run ``tokenize_fn`` (str → List[int]) on the plain segments — the
    role the reference delegates to added-special-token Llama tokenizers."""
    if not special_token_ids:
        return list(tokenize_fn(text))
    pattern = "|".join(
        re.escape(t) for t in
        sorted(special_token_ids, key=len, reverse=True))
    ids: List[int] = []
    pos = 0
    for mobj in re.finditer(pattern, text):
        if mobj.start() > pos:
            seg = text[pos:mobj.start()]
            if seg.strip():
                ids.extend(tokenize_fn(seg))
        ids.append(int(special_token_ids[mobj.group(0)]))
        pos = mobj.end()
    if pos < len(text):
        seg = text[pos:]
        if seg.strip():
            ids.extend(tokenize_fn(seg))
    return ids


DEFAULT_SPECIAL_IDS = {
    # start/end markers deliberately share the patch id's neighborhood so a
    # tiny test vocab works; production configs override with real ids.
    DEFAULT_IMAGE_PATCH_TOKEN: 1,
    DEFAULT_AUDIO_PATCH_TOKEN: 2,
    DEFAULT_VIDEO_PATCH_TOKEN: 3,
    DEFAULT_IM_START_TOKEN: 4,
    DEFAULT_IM_END_TOKEN: 5,
    DEFAULT_AU_START_TOKEN: 6,
    DEFAULT_AU_END_TOKEN: 7,
    DEFAULT_VID_START_TOKEN: 8,
    DEFAULT_VID_END_TOKEN: 9,
}


@registry.register_processor("m2_omni_processor")
class M2OmniUnifiedProcessor(BaseProcessor):
    """Bailing2-parity unified processor: conversation or placeholder text +
    images/videos/audio → model-ready ids with IN-PLACE patch-token runs,
    dynamic-resolution pixel values + grids, and SANM fbank features.

    Sample keys consumed: ``text`` (str with ``<image>``/``<video>``/
    ``<audio>`` markers) or ``conversation`` (role/content list, reference
    chat format); ``images`` (list of HWC arrays/paths), ``video`` ([T,H,W,C]
    frames or path), ``waveform``/``audio``.

    Output: ``input_ids``/``input_mask`` (padded to ``max_seq_length``),
    ``pixel_values`` + ``image_grid_thw`` (flatten patches, reference
    layout), ``image_data`` dense frames per image (our tower's input;
    ``frames_from_patches`` of the same patches), video/audio analogues.
    """

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *a, **k):
        super().__init__(config)
        cfg = self.config
        from antmmf_tpu.datasets.processors.text_processors import (
            MaskedTokenProcessor,
        )
        self.text_processor = MaskedTokenProcessor(
            {**dict(cfg.get("text", {})), "mask_probability": 0.0})
        self.max_seq_length = int(
            dict(cfg.get("text", {})).get("max_seq_length", 128))
        img_cfg = dict(cfg.get("image", {}))
        vid_cfg = dict(cfg.get("video", {}))
        self.image_processor = M2OmniImageProcessor(
            min_pixels=int(img_cfg.get("min_pixels", 78400)),
            max_pixels=int(img_cfg.get("max_pixels", 2007040)),
            patch_size=int(img_cfg.get("patch_size", 14)),
            temporal_patch_size=int(img_cfg.get("temporal_patch_size", 2)),
            merge_size=int(img_cfg.get("merge_size", 2)))
        self.video_processor = M2OmniImageProcessor(
            min_pixels=int(vid_cfg.get("min_pixels", 100352)),
            max_pixels=int(vid_cfg.get("max_pixels", 602112)),
            patch_size=self.image_processor.patch_size,
            temporal_patch_size=self.image_processor.temporal_patch_size,
            merge_size=self.image_processor.merge_size)
        from antmmf_tpu.datasets.processors.audio_processors import (
            SANMAudioProcessor,
        )
        self.audio_processor = SANMAudioProcessor(cfg.get("audio", {}))
        self.num_audio_tokens = int(cfg.get("num_audio_tokens", 256))
        self.special_token_ids = dict(DEFAULT_SPECIAL_IDS)
        self.special_token_ids.update(
            {str(t): int(i)
             for t, i in dict(cfg.get("special_token_ids", {})).items()})
        self.bos_token = str(cfg.get("bos_token", "<s>"))

    # -- tokenization -----------------------------------------------------
    def _tokenize_ids(self, text: str) -> List[int]:
        tok = self.text_processor.tokenizer

        def plain(seg: str) -> List[int]:
            return tok.convert_tokens_to_ids(tok.tokenize(seg))

        return encode_with_special_tokens(text, plain,
                                          self.special_token_ids)

    def __call__(self, item: Mapping[str, Any], *a, **k) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        if "conversation" in item:
            text = apply_chat_template(
                item["conversation"], bos_token=self.bos_token,
                add_generation_prompt=bool(
                    item.get("add_generation_prompt", True)))
            ip = self.image_processor
            images, videos, audios = process_vision_info(
                [item["conversation"]],
                size_factor=ip.patch_size * ip.merge_size,
                min_pixels=ip.min_pixels, max_pixels=ip.max_pixels)
        else:
            text = str(item.get("text", ""))
            images = item.get("images")
            if images is None and item.get("image") is not None:
                images = [item["image"]]
            videos = [item["video"]] if item.get("video") is not None else None
            wav = item.get("waveform", item.get("audio"))
            audios = [np.asarray(wav, np.float32)] if wav is not None else None

        texts = [text]
        m = self.image_processor.merge_size
        if images:
            pix = self.image_processor.preprocess(images=list(images))
            out["pixel_values"] = pix["pixel_values"]
            out["image_grid_thw"] = pix["image_grid_thw"]
            texts = expand_image_tokens(texts, pix["image_grid_thw"],
                                        merge_size=m)
            out["image_data"] = [
                frames_from_patches(
                    p, g, self.image_processor.patch_size,
                    self.image_processor.temporal_patch_size, m)
                for p, g in _split_by_grid(pix["pixel_values"],
                                           pix["image_grid_thw"])]
        if videos:
            # fetch_video already resized path inputs; arrays resize here
            vids = [fetch_video({"video": v}) if isinstance(v, str) else v
                    for v in videos]
            pixv = self.video_processor.preprocess(videos=vids)
            out["pixel_values_videos"] = pixv["pixel_values_videos"]
            out["video_grid_thw"] = pixv["video_grid_thw"]
            texts = expand_video_tokens(texts, pixv["video_grid_thw"],
                                        merge_size=m)
            out["video_data"] = [
                frames_from_patches(
                    p, g, self.video_processor.patch_size,
                    self.video_processor.temporal_patch_size, m)
                for p, g in _split_by_grid(pixv["pixel_values_videos"],
                                           pixv["video_grid_thw"])]
        if audios:
            texts = expand_audio_tokens(texts, self.num_audio_tokens)
            out.update(self.audio_processor(
                {"waveform": audios[0],
                 "sampling_rate": item.get("sampling_rate", 16000)}))

        ids = self._tokenize_ids(texts[0])
        L = self.max_seq_length
        arr = np.zeros(L, np.int64)
        n = min(len(ids), L)
        arr[:n] = np.asarray(ids[:n], np.int64)
        mask = np.zeros(L, np.int64)
        mask[:n] = 1
        out["input_ids"] = arr
        out["input_mask"] = mask
        out["text"] = texts[0]
        return out


def _split_by_grid(pixel_values: np.ndarray, grids: np.ndarray):
    """Yield (per-item flatten patches, grid) from the concatenated rows."""
    off = 0
    for g in np.asarray(grids).reshape(-1, 3):
        n = int(np.prod(g))
        yield pixel_values[off:off + n], g
        off += n
