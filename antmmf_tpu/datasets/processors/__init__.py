
from antmmf_tpu.datasets.processors import mm_processors  # noqa: F401
