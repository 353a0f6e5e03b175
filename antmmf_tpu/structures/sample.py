"""Sample / SampleList — the record and batch containers of the data plane.

Reference parity: ``/root/reference/antmmf/structures/sample.py`` (``Sample:21``,
``SampleList:58``). API kept: dict-with-attribute-access records, field-wise batch
stacking, ``get_batch_size``, ``fields``.

TPU-native deltas (SURVEY.md §7 architecture deltas):
  * a SampleList is a **pytree of numpy arrays with static, padded shapes** — XLA
    recompiles on shape change, so ragged fields are padded to fixed maxima by the
    collator (never list-carried like the reference's SampleList list fields);
  * non-array metadata (dataset_name, raw strings) lives in a separate
    ``metadata`` dict that never reaches the device;
  * ``.to(device)`` is replaced by the trainer's sharded ``jax.device_put``.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, List, Mapping, Optional, Sequence

import numpy as np

# Fields that are per-batch metadata, flattened from per-sample lists to scalars by
# the collator (reference batch_collator.py:25-26).
_SCALAR_META_FIELDS = ("dataset_type", "dataset_name")


class Sample(dict):
    """One dataset record: field name → numpy array / scalar / string."""

    def __init__(self, init: Optional[Mapping[str, Any]] = None):
        super().__init__()
        if init:
            self.update(init)

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def fields(self) -> List[str]:
        return list(self.keys())


class SampleList(dict):
    """A batch: field name → stacked numpy array; non-batchable fields in
    ``.metadata``. Construct via ``SampleList.from_samples`` (the collate path) or
    directly from a dict of arrays."""

    def __init__(self, init: Optional[Mapping[str, Any]] = None):
        super().__init__()
        object.__setattr__(self, "metadata", {})
        if init:
            for k, v in init.items():
                self[k] = v

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    @classmethod
    def from_samples(cls, samples: Sequence[Mapping[str, Any]]) -> "SampleList":
        if not samples:
            return cls()
        batch = cls()
        keys = list(samples[0].keys())
        for s in samples[1:]:
            if list(s.keys()) != keys:
                # allow different ordering but require same field set
                if set(s.keys()) != set(keys):
                    raise ValueError(
                        f"Inconsistent sample fields: {sorted(keys)} vs {sorted(s.keys())}"
                    )
        for key in keys:
            values = [s[key] for s in samples]
            if key in _SCALAR_META_FIELDS:
                batch.metadata[key] = values[0]
                continue
            first = values[0]
            if isinstance(first, (np.ndarray, np.generic, int, float, bool, np.bool_)):
                try:
                    batch[key] = np.stack([np.asarray(v) for v in values])
                except ValueError as e:
                    shapes = [np.asarray(v).shape for v in values]
                    raise ValueError(
                        f"Field {key!r} has ragged shapes {shapes}; pad in the "
                        f"processor before collation (static shapes required)"
                    ) from e
            else:
                batch.metadata[key] = values  # strings, ids, arbitrary objects
        return batch

    def get_batch_size(self) -> int:
        for v in self.values():
            if isinstance(v, np.ndarray) and v.ndim > 0:
                return int(v.shape[0])
        raise ValueError("Empty SampleList has no batch size")

    def fields(self) -> List[str]:
        return list(self.keys())

    def arrays(self) -> Dict[str, np.ndarray]:
        """The jittable pytree: array fields only."""
        return dict(self)

    def copy(self) -> "SampleList":
        out = SampleList(dict(self))
        out.metadata.update(self.metadata)
        return out

    def select_fields(self, prefixes: Iterable[str]) -> "SampleList":
        """Subset by field prefixes — the prefix-routing modality API
        (reference Univl.group_inputs, univl_model.py:37-51)."""
        prefixes = tuple(prefixes)
        out = SampleList({k: v for k, v in self.items() if k.startswith(prefixes)})
        out.metadata.update(self.metadata)
        return out
