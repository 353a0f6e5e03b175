"""SizedDataStructure: the structures base class (index/iterate/fields).

Reference parity: ``/root/reference/antmmf/structures/base.py`` (216 LoC torch
``SizedDataStructure``): a main tensor plus named per-item fields, sliceable
and iterable together. Numpy-native here — device movement is the trainer's
job (sharded device_put), so ``.to`` disappears.
"""

from __future__ import annotations

import copy
from typing import Any, Dict

import numpy as np


class SizedDataStructure:
    """A main array + named per-item fields that index/iterate together.

    Example::

        boxes = SizedDataStructure(np.random.rand(3, 4))
        boxes.score = np.random.rand(3)
        assert len(boxes) == 3
        one = boxes[1]          # fields slice along with the tensor
        some = boxes[[0, 2]]
    """

    def __init__(self, tensor, **kwargs):
        self.__dict__["__fields__"] = {}
        self.__dict__["tensor"] = np.asarray(tensor)
        self.__dict__["kwargs"] = dict(kwargs)

    # ------------------------------------------------------------------ fields
    def __setattr__(self, name: str, value: Any) -> None:
        if name in ("tensor", "kwargs"):
            self.__dict__[name] = value
            return
        if hasattr(value, "__len__") and len(value) != len(self):
            raise ValueError(
                f"field {name!r} has length {len(value)} != {len(self)}")
        self.__fields__[name] = value

    def __getattr__(self, name: str) -> Any:
        fields = self.__dict__.get("__fields__", {})
        if name in fields:
            return fields[name]
        raise AttributeError(name)

    def has_field(self, field: str) -> bool:
        return field in self.__fields__

    def get_fields(self) -> Dict[str, Any]:
        return dict(self.__fields__)

    # ------------------------------------------------------------- protocol
    def __len__(self) -> int:
        return len(self.tensor)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    def __getitem__(self, item):
        if isinstance(item, int):
            if item >= len(self) or item < -len(self):
                raise IndexError(f"{item} out of range ({len(self)})")
            item = slice(item, item + 1) if item != -1 else slice(-1, None)
        instance = type(self).__new__(type(self))
        instance.__dict__["__fields__"] = {}
        instance.__dict__["tensor"] = self.tensor[item]
        instance.__dict__["kwargs"] = dict(self.kwargs)
        for key, value in self.__fields__.items():
            sliced = value[item] if hasattr(value, "__getitem__") else value
            instance.__fields__[key] = sliced
        return instance

    def clone(self) -> "SizedDataStructure":
        instance = type(self).__new__(type(self))
        instance.__dict__["__fields__"] = copy.deepcopy(self.__fields__)
        instance.__dict__["tensor"] = np.array(self.tensor)
        instance.__dict__["kwargs"] = copy.deepcopy(self.kwargs)
        return instance

    def __repr__(self) -> str:
        return (f"{type(self).__name__}(shape={tuple(self.tensor.shape)}, "
                f"fields={sorted(self.__fields__)})")
