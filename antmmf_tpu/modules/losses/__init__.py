from antmmf_tpu.modules.losses import contrastive, extended, losses  # noqa: F401
from antmmf_tpu.modules.losses.losses import Losses  # noqa: F401
