from antmmf_tpu.modules.metrics import evaluators, extended, metrics  # noqa: F401
from antmmf_tpu.modules.metrics.metrics import Metrics  # noqa: F401
