"""Online feature extractors + feature saver (reference
antmmf/datasets/features/vision/)."""

import numpy as np
import pytest

from antmmf_tpu.datasets.features import (
    BaseSaver,
    ResNetFeatureExtractor,
    S3DGFeatureExtractor,
    ViTFeatureExtractor,
)


def test_resnet_extractor_and_saver_roundtrip(tmp_path):
    ext = ResNetFeatureExtractor(model_arch="resnet_tiny_test",
                                 image_size=32)
    imgs = [np.random.default_rng(i).integers(
        0, 255, (40, 50, 3)).astype(np.uint8) for i in range(2)]
    feats, infos = ext.extract_features(imgs)
    assert feats.shape[0] == 2 and feats.ndim == 2
    assert "resnet_tiny_test" in ext.print_extractor_summary()

    saver = BaseSaver(str(tmp_path))
    saver.save_batch(["/x/a.jpg", "/x/b.jpg"], feats,
                     [{"n": 1}, {"n": 2}])
    # readable by the feature-reader family (the round-trip contract)
    from antmmf_tpu.datasets.database.feature_readers import FeatureReader

    r = FeatureReader(str(tmp_path), ndim=2, max_features=4)
    back, info = r.read("a.npy")
    assert back.shape[0] == 4 and info["n"] == 1


def test_vit_extractor_grid():
    ext = ViTFeatureExtractor(preset="vit_tiny_test", image_size=32,
                              pooled=False)
    feats, _ = ext.extract_features(
        [np.zeros((32, 32, 3), np.uint8)])
    assert feats.ndim == 3  # [1, tokens, C]


def test_s3dg_extractor():
    ext = S3DGFeatureExtractor(width=16, num_blocks=2, image_size=32)
    clip = np.zeros((2, 40, 48, 3), np.uint8)
    feats, _ = ext.extract_features([clip])
    assert feats.shape[0] == 1 and feats.ndim == 2


def test_detectron_extractor_gated():
    from antmmf_tpu.datasets.features.extractors import (
        DetectronFeatureExtractor,
    )

    with pytest.raises(ImportError):
        DetectronFeatureExtractor()
