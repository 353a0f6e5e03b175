
from antmmf_tpu.datasets.processors import audio_processors  # noqa: F401
from antmmf_tpu.datasets.processors import augment  # noqa: F401
from antmmf_tpu.datasets.processors import image_processors_ext  # noqa: F401
from antmmf_tpu.datasets.processors import m2omni_processing  # noqa: F401
from antmmf_tpu.datasets.processors import mm_processors  # noqa: F401
from antmmf_tpu.datasets.processors import pink_processors  # noqa: F401
from antmmf_tpu.datasets.processors import region_processors  # noqa: F401
from antmmf_tpu.datasets.processors import text_processors_ext  # noqa: F401
