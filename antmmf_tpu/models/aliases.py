"""Reference registry-name aliases so reference YAML configs resolve verbatim.

The reference registers several models under CamelCase or legacy names
(``antmmf`` :models/ant_mmf.py:19, ``antmmf_image_only``/``antmmf_question_only``
ablations :308/:334, ``AntmmfLayoutLM`` :layoutlm.py:639, ``AttriMMBT``
:mmbt.py:125, ``SpkResNet`` :spk_resnet.py:151, ``roi_model`` :roi/model.py:427).
This module maps each onto the equivalent class here.
"""

from __future__ import annotations

from antmmf_tpu.common.registry import registry
from antmmf_tpu.models.classic import TwoTowerVQA


@registry.register_model("antmmf")
class AntMMFAlias(TwoTowerVQA):
    pass


@registry.register_model("antmmf_image_only")
class AntMMFImageOnly(TwoTowerVQA):
    modality: str = "image_only"


@registry.register_model("antmmf_question_only")
class AntMMFQuestionOnly(TwoTowerVQA):
    modality: str = "text_only"


def _alias(name: str, target: str) -> None:
    registry.register_class(
        "model", name, registry.get_model_class(target), force=True)


_alias("AntmmfLayoutLM", "layoutlm")
_alias("AttriMMBT", "attri_mmbt")
_alias("SpkResNet", "spk_resnet")
_alias("roi_model", "univl_roi")
