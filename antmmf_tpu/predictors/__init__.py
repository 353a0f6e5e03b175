from antmmf_tpu.predictors import base_predictor  # noqa: F401  (registry side effects)
from antmmf_tpu.predictors import caption_predictor  # noqa: F401
from antmmf_tpu.predictors import mmbt_predictor  # noqa: F401
from antmmf_tpu.predictors.export import export_serving_fn, load_serving_fn  # noqa: F401
from antmmf_tpu.predictors import m2_encoder_predictor  # noqa: F401
from antmmf_tpu.predictors import generation_predictor  # noqa: F401
