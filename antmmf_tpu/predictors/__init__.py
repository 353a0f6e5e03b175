from antmmf_tpu.predictors import base_predictor  # noqa: F401  (registry side effects)
