"""Online feature extractors: serving/offline feature computation classes.

Reference parity: ``/root/reference/antmmf/datasets/features/vision/`` —
``OnlineFeatureExtractor`` (base_extractor.py:9: preprocessor → extractor →
postprocessor pipeline), ``ClassificationFeatureExtractor`` /
``ResNetFeatureExtractor`` (imagenet_feature.py:22/:98),
``S3DGFeatureExtractor`` (video_feature.py), ``BaseSaver`` feature dumps
(feature_saver.py: `<name>.npy` + `<name>_info.npy` sidecars — exactly the
layout ``database/feature_readers.py`` reads back), and the detectron
region extractor (detectron_feature.py:20 — detectron2 is not in this
image; region features come from ``scripts/extract_features.py --mode
region`` or precomputed dumps, and requesting it raises with guidance).

TPU design: extractors jit one apply and reuse it across calls (static
input shape per extractor); inputs are numpy HWC uint8/float images.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.datasets.processors.image_processors import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    center_crop,
    normalize,
    resize_shorter_side,
)


class OnlineFeatureExtractor:
    """preprocessor → extractor → postprocessor (ref base_extractor.py:9)."""

    def __init__(self, *args: Any, **kwargs: Any):
        self._preprocessor = self._build_preprocessor()
        self._extractor = self._build_extractor()
        self._postprocessor = self._build_postprocessor()

    def get_model_name(self) -> str:
        raise NotImplementedError

    def get_feature_name(self) -> str:
        raise NotImplementedError

    def _build_preprocessor(self) -> Callable:
        raise NotImplementedError

    def _build_extractor(self) -> Callable:
        raise NotImplementedError

    def _build_postprocessor(self) -> Callable:
        return lambda x: x

    def extract_features(self, images) -> Tuple[np.ndarray, Optional[list]]:
        batch = np.stack([self._preprocessor(np.asarray(im))
                          for im in images])
        feats = self._extractor(batch)
        return self._postprocessor(feats), None

    def print_extractor_summary(self) -> str:
        return f"{self.get_model_name()} -> {self.get_feature_name()}"


class ClassificationFeatureExtractor(OnlineFeatureExtractor):
    """Imagenet-style pooled/grid features from a classification backbone
    (ref imagenet_feature.py:22): shorter-side resize + center crop +
    normalize, then the backbone's pooled vector (or token grid)."""

    def __init__(self, image_size: int = 224, pooled: bool = True,
                 dtype: str = "float32", **kwargs: Any):
        self.image_size = image_size
        self.pooled = pooled
        self.dtype = dtype
        super().__init__(**kwargs)

    def _build_preprocessor(self):
        def preprocess(img: np.ndarray) -> np.ndarray:
            img = resize_shorter_side(img, int(self.image_size * 1.14))
            img = center_crop(img, (self.image_size, self.image_size))
            return normalize(img.astype(np.float32) / 255.0,
                             IMAGENET_MEAN, IMAGENET_STD)

        return preprocess

    def _backbone(self):
        raise NotImplementedError

    def _build_extractor(self):
        module = self._backbone()
        params = module.init(jax.random.PRNGKey(0), jnp.zeros(
            (1, self.image_size, self.image_size, 3), jnp.float32))
        self.variables = params

        @jax.jit
        def run(variables, batch):
            out = module.apply(variables, batch)
            return out["pooled"] if self.pooled else out["grid"]

        return lambda batch: np.asarray(run(self.variables,
                                            jnp.asarray(batch)))

    def load_weights(self, variables) -> None:
        """Swap in trained weights (the init weights are random —
        ``build_for_test`` convention)."""
        self.variables = variables


class ResNetFeatureExtractor(ClassificationFeatureExtractor):
    """ResNet pooled features (ref imagenet_feature.py:98)."""

    def __init__(self, model_arch: str = "resnet50", **kwargs: Any):
        self.model_arch = model_arch
        super().__init__(**kwargs)

    def get_model_name(self) -> str:
        return self.model_arch

    def get_feature_name(self) -> str:
        return f"{self.model_arch}_{'pooled' if self.pooled else 'grid'}"

    def _backbone(self):
        from antmmf_tpu.modules.vision.resnet import ResNet

        return ResNet(preset=self.model_arch, dtype=jnp.dtype(self.dtype))


class ViTFeatureExtractor(ClassificationFeatureExtractor):
    """ViT pooled/grid features (the CLIP-visual analogue of the
    reference's imagenet extractors)."""

    def __init__(self, preset: str = "vit_base_patch32", **kwargs: Any):
        self.preset = preset
        super().__init__(**kwargs)

    def get_model_name(self) -> str:
        return self.preset

    def get_feature_name(self) -> str:
        return f"{self.preset}_{'pooled' if self.pooled else 'tokens'}"

    def _backbone(self):
        from antmmf_tpu.modules.vision.vit import PRESETS, VisionTransformer

        vit = VisionTransformer(image_size=self.image_size,
                                dtype=jnp.dtype(self.dtype),
                                **dict(PRESETS[self.preset]))

        class _Wrap:
            def init(self, rng, x):
                return vit.init(rng, x)

            def apply(self, variables, x):
                out = vit.apply(variables, x)
                return {"pooled": out["pooled"], "grid": out["sequence"]}

        return _Wrap()


class S3DGFeatureExtractor(OnlineFeatureExtractor):
    """S3D-G video clip features (ref video_feature.py): [F, H, W, 3]
    uint8 clips → pooled clip vector."""

    def __init__(self, width: int = 64, num_blocks: int = 4,
                 image_size: int = 224, **kwargs: Any):
        self.width = width
        self.num_blocks = num_blocks
        self.image_size = image_size
        super().__init__(**kwargs)

    def get_model_name(self) -> str:
        return "s3dg"

    def get_feature_name(self) -> str:
        return "s3dg_pooled"

    def _build_preprocessor(self):
        def preprocess(clip: np.ndarray) -> np.ndarray:
            frames = [center_crop(resize_shorter_side(
                f, int(self.image_size * 1.14)),
                (self.image_size, self.image_size)) for f in clip]
            return np.stack(frames).astype(np.float32) / 255.0

        return preprocess

    def _build_extractor(self):
        from antmmf_tpu.modules.vision.s3d import S3DG

        module = S3DG(width=self.width, num_blocks=self.num_blocks,
                      dtype=jnp.float32)
        example = jnp.zeros((1, 2, self.image_size, self.image_size, 3))
        self.variables = module.init(jax.random.PRNGKey(0), example)

        @jax.jit
        def run(variables, batch):
            return module.apply(variables, batch)["pooled"]

        return lambda batch: np.asarray(run(self.variables,
                                            jnp.asarray(batch)))

    def load_weights(self, variables) -> None:
        self.variables = variables


class DetectronFeatureExtractor(OnlineFeatureExtractor):
    """Region features via detectron2 (ref detectron_feature.py:20) —
    the library is not in this image; raises with the supported routes."""

    def __init__(self, *args: Any, **kwargs: Any):
        raise ImportError(
            "detectron2 is not available in this image. Region features: "
            "use `python -m antmmf_tpu.scripts.extract_features --mode "
            "region` (DETR-head regions) or precomputed npy dumps read by "
            "database/feature_readers.py.")


class BaseSaver:
    """`<name>.npy` (+ `<name>_info.npy`) feature dumps (reference
    feature_saver.py) — the exact layout feature_readers reads back."""

    def __init__(self, save_dir: str):
        os.makedirs(save_dir, exist_ok=True)
        self._save_dir = save_dir

    def get_save_dir(self) -> str:
        return self._save_dir

    def get_save_path(self, image_path: str) -> Tuple[str, str]:
        base = os.path.basename(image_path).split(".")[0]
        return (os.path.join(self._save_dir, base + ".npy"),
                os.path.join(self._save_dir, base + "_info.npy"))

    def save_one(self, image_path: str, feature: np.ndarray,
                 feature_info: Optional[Dict[str, Any]] = None) -> str:
        feat_path, info_path = self.get_save_path(image_path)
        np.save(feat_path, np.asarray(feature))
        if feature_info is not None:
            np.save(info_path, np.array(feature_info))
        return feat_path

    def save_batch(self, image_paths: Sequence[str], *feats_res) -> None:
        features = feats_res[0]
        infos = feats_res[1] if len(feats_res) == 2 else [None] * len(
            image_paths)
        for path, feat, info in zip(image_paths, features, infos):
            self.save_one(path, feat, info)
