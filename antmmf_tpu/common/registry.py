"""Global component registry — the dependency-injection backbone of the framework.

Components (models, losses, metrics, processors, builders, trainers, ...) register
themselves under a string name; YAML configs refer to components by that name and the
framework resolves them here at build time.

Reference parity: mirrors the public surface of AntMMF's registry
(``/root/reference/antmmf/common/registry.py:30-716``): the ``register_*`` decorator
family, ``get_*_class`` lookups, and the dotted-path state store
(``registry.register("writer", obj)`` / ``registry.get("writer")``).

Implementation is fresh: a single class-map dict keyed by kind, plus a nested state
store. No torch, no import side effects.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Type

# Kinds of registrable components. Each kind gets a `register_<kind>` decorator and a
# `get_<kind>_class` accessor generated below.
_KINDS = (
    "trainer",
    "task",
    "builder",
    "model",
    "loss",
    "metric",
    "processor",
    "optimizer",
    "lr_scheduler",
    "sampler",
    "fusion",
    "encoder",
    "head",
    "adversarial",
    "interpreter",
    "decoder",
    "predictor",
    "iteration_strategy",
)


class Registry:
    """Name → class maps for each component kind, plus a dotted-path state store."""

    def __init__(self) -> None:
        self._maps: Dict[str, Dict[str, type]] = {kind: {} for kind in _KINDS}
        self._state: Dict[str, Any] = {}

    # ------------------------------------------------------------------ classes
    def register_class(self, kind: str, name: str, cls: type, *, force: bool = False) -> type:
        if kind not in self._maps:
            raise KeyError(f"Unknown registry kind {kind!r}; known: {sorted(self._maps)}")
        table = self._maps[kind]
        if name in table and not force and table[name] is not cls:
            raise KeyError(f"{kind} {name!r} already registered to {table[name]!r}")
        table[name] = cls
        return cls

    def get_class(self, kind: str, name: str, *, default: Any = ...) -> type:
        table = self._maps.get(kind)
        if table is None:
            raise KeyError(f"Unknown registry kind {kind!r}")
        if name in table:
            return table[name]
        if default is not ...:
            return default
        known = ", ".join(sorted(table)) or "<empty>"
        raise KeyError(f"No {kind} named {name!r} in registry. Registered: {known}")

    def list_names(self, kind: str) -> list:
        return sorted(self._maps[kind])

    def mapping(self, kind: str) -> Dict[str, type]:
        return dict(self._maps[kind])

    # -------------------------------------------------------------- state store
    def register(self, key: str, obj: Any) -> None:
        """Store an arbitrary object under a dotted path, e.g. ``"config.training"``."""
        parts = key.split(".")
        node = self._state
        for part in parts[:-1]:
            node = node.setdefault(part, {})
            if not isinstance(node, dict):
                raise TypeError(f"Cannot descend into non-dict at {part!r} for key {key!r}")
        node[parts[-1]] = obj

    def get(self, key: str, default: Any = None, no_warning: bool = True) -> Any:
        node: Any = self._state
        for part in key.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def unregister(self, key: str, default: Any = None) -> Any:
        node: Any = self._state
        parts = key.split(".")
        for part in parts[:-1]:
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        if isinstance(node, dict):
            return node.pop(parts[-1], default)
        return default

    # ------------------------------------------------------------------ helpers
    def _decorator(self, kind: str, name: Optional[str] = None) -> Callable[[type], type]:
        def wrap(cls: type) -> type:
            key = name if name is not None else getattr(cls, "__name__", str(cls))
            self.register_class(kind, key, cls)
            return cls

        return wrap


def _make_register(kind: str):
    def register(self: Registry, name: Optional[str] = None):
        # Support bare usage: @registry.register_model  (class passed directly)
        if isinstance(name, type):
            cls = name
            self.register_class(kind, cls.__name__, cls)
            return cls
        return self._decorator(kind, name)

    register.__name__ = f"register_{kind}"
    return register


def _make_get(kind: str):
    def get(self: Registry, name: str, default: Any = ...):
        return self.get_class(kind, name, default=default)

    get.__name__ = f"get_{kind}_class"
    return get


for _kind in _KINDS:
    setattr(Registry, f"register_{_kind}", _make_register(_kind))
    setattr(Registry, f"get_{_kind}_class", _make_get(_kind))


registry = Registry()
