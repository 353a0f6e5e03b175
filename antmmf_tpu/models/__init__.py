from antmmf_tpu.models.base_model import BaseModel, ModelShell, build_model  # noqa: F401
from antmmf_tpu.models import adversarial  # noqa: F401  (registry side effects)
from antmmf_tpu.models import classic  # noqa: F401
from antmmf_tpu.models import dmae  # noqa: F401
from antmmf_tpu.models import layoutlm  # noqa: F401
from antmmf_tpu.models import m2_encoder  # noqa: F401
from antmmf_tpu.models import m2_omni  # noqa: F401
from antmmf_tpu.models import pink  # noqa: F401
from antmmf_tpu.models import pipelined_lm  # noqa: F401
from antmmf_tpu.models import simple  # noqa: F401
from antmmf_tpu.models import univl  # noqa: F401
from antmmf_tpu.models import univl_caption  # noqa: F401
from antmmf_tpu.models import univl_cls  # noqa: F401
from antmmf_tpu.models import univl_mcqa  # noqa: F401
from antmmf_tpu.models import univl_pretrain  # noqa: F401
from antmmf_tpu.models import univl_roi  # noqa: F401
from antmmf_tpu.models import video_audio  # noqa: F401
from antmmf_tpu.models import vilbert  # noqa: F401
from antmmf_tpu.modules import graph as _graph  # noqa: F401  (comp_gcn model)
from antmmf_tpu.models import aliases  # noqa: F401  (reference-name aliases)
from antmmf_tpu.models import m2_encoder_ref  # noqa: F401  (BEiT3 eval twin)
