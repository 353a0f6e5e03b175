from antmmf_tpu.datasets import graph_dataset  # noqa: F401  (registry side effects)
from antmmf_tpu.datasets import mcqa_dataset  # noqa: F401
from antmmf_tpu.datasets import mm_dataset  # noqa: F401
from antmmf_tpu.datasets import pink_instruct_dataset  # noqa: F401
from antmmf_tpu.datasets import roi_dataset  # noqa: F401
from antmmf_tpu.datasets import samplers  # noqa: F401
from antmmf_tpu.datasets import video_text_dataset  # noqa: F401
from antmmf_tpu.datasets.processors import (  # noqa: F401
    image_processors,
    processors,
    text_processors,
    video_processors,
)
