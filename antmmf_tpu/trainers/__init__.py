from antmmf_tpu.trainers import adv_trainer  # noqa: F401  (registry side effects)
from antmmf_tpu.trainers import base_trainer  # noqa: F401
from antmmf_tpu.trainers import distill_trainer  # noqa: F401
from antmmf_tpu.trainers import remote_trainer  # noqa: F401
from antmmf_tpu.trainers import retrieval_trainer  # noqa: F401
from antmmf_tpu.trainers.build import build_trainer  # noqa: F401
