"""Processor framework: registry-driven data transforms applied on the host.

Reference parity: ``/root/reference/antmmf/datasets/processors/processors.py``
(``BaseProcessor``, lazy ``Processor`` wrapper :220-284, ``copy`` :220,
``hier_label_encoder`` :237). Processors are configured as
``{type: <registry name>, params: {...}}`` and composed per-dataset; datasets call
them as plain callables producing dict fields merged into the Sample.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

from antmmf_tpu.common.configuration import Configuration, convert_to_config
from antmmf_tpu.common.registry import registry


class BaseProcessor:
    """A host-side transform. Subclasses implement ``__call__(item) -> dict``."""

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *args: Any, **kwargs: Any):
        self.config = convert_to_config(config or {})

    def __call__(self, item: Any, *args: Any, **kwargs: Any) -> Any:
        return item


class Processor:
    """Lazy wrapper: resolves the registered processor class on first use so config
    construction never triggers heavy init (vocab loads etc.)."""

    def __init__(self, config: Mapping[str, Any], **extra: Any):
        config = convert_to_config(config)
        if "type" not in config:
            raise ValueError("Processor config needs a 'type' key")
        self._type = config["type"]
        self._params = config.get("params", Configuration({}))
        self._extra = extra
        self._processor: Optional[BaseProcessor] = None

    def _init(self) -> BaseProcessor:
        if self._processor is None:
            cls = registry.get_processor_class(self._type)
            self._processor = cls(self._params, **self._extra)
        return self._processor

    def __call__(self, item: Any, *args: Any, **kwargs: Any) -> Any:
        return self._init()(item, *args, **kwargs)

    def __getattr__(self, name: str) -> Any:
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(self._init(), name)


def build_processors(
    processors_config: Optional[Mapping[str, Any]], **extra: Any
) -> Dict[str, Processor]:
    """Build every ``*_processor`` entry of a dataset config (reference
    BaseDataset processor auto-init, base_dataset.py:48-62)."""
    out: Dict[str, Processor] = {}
    for key, cfg in dict(processors_config or {}).items():
        out[key] = Processor(cfg, **extra)
    return out


@registry.register_processor("copy")
class CopyProcessor(BaseProcessor):
    """Copy a field through unchanged (reference processors.py:220)."""

    def __call__(self, item: Any, *args: Any, **kwargs: Any) -> Any:
        return item


@registry.register_processor("hier_label_encoder")
class HierLabelEncoder(BaseProcessor):
    """Encode hierarchical labels into class indices (reference
    ``processors/processors.py:237``).

    Two config forms:
    * ``levels``: per-level vocab lists; "a/b/c" → per-level indices in
      ``{"hier_label": [...]}`` (-1 for missing levels);
    * ``hier_label_schema``: a nested schema or schema-file path — labels
      encode through ``modules.hier_tree.HierTree.encode_label_str`` into
      the grouped-softmax contract ``{"hier_label", "hier_param"}``
      consumed by ``hier_softmax_loss``.
    """

    def __init__(self, config: Optional[Mapping[str, Any]] = None, *args: Any, **kw: Any):
        super().__init__(config)
        self.levels = [list(lv) for lv in self.config.get("levels", [])]
        self.sep = self.config.get("separator", "/")
        self.tree = None
        schema = self.config.get("hier_label_schema")
        if schema is not None:
            from antmmf_tpu.modules.hier_tree import build_hier_tree

            self.tree = build_hier_tree(
                list(schema) if not isinstance(schema, str) else schema)

    def __call__(self, item: Any, *args: Any, **kwargs: Any) -> Dict[str, Any]:
        text = item["label"] if isinstance(item, Mapping) else item
        if self.tree is not None:
            from antmmf_tpu.modules.hier_tree import HIER_CLASS_SEP

            label = HIER_CLASS_SEP.join(str(text).split(self.sep)) \
                if self.sep != HIER_CLASS_SEP else str(text)
            hier_label, hier_param = self.tree.encode_label_str(label)
            return {"hier_label": hier_label, "hier_param": hier_param}
        parts = str(text).split(self.sep)
        encoded = []
        for i, vocab in enumerate(self.levels):
            if i < len(parts) and parts[i] in vocab:
                encoded.append(vocab.index(parts[i]))
            else:
                encoded.append(-1)
        return {"hier_label": encoded}
