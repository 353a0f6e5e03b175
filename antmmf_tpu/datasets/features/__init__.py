from antmmf_tpu.datasets.features.extractors import (  # noqa: F401
    BaseSaver,
    ClassificationFeatureExtractor,
    OnlineFeatureExtractor,
    ResNetFeatureExtractor,
    S3DGFeatureExtractor,
    ViTFeatureExtractor,
)
