"""YAML configuration system with includes, env expansion, overrides, and freezing.

Reference parity (``/root/reference/antmmf/common/configuration.py``):
  * ``includes:`` recursive merge (:126-140 in the reference) — a yaml file may list
    other yaml files whose contents are deep-merged underneath it.
  * ``${ENV_VAR}`` expansion (:120-124).
  * dotted-path command-line overrides with literal-eval typing (:46-60, :152-175).
  * freeze/defrost mutation control; attribute-style access.
  * priority: cmdline opts > override file > base yaml > defaults.

Fresh implementation on plain PyYAML — no omegaconf dependency.
"""

from __future__ import annotations

import ast
import collections.abc
import copy
import os
import re
from typing import Any, Dict, Iterator, List, Mapping, Optional, Sequence

import yaml

_ENV_PATTERN = re.compile(r"\$\{(\w+)\}")


class _SharedNode(dict):
    """Marker dict: a nested node whose storage is shared with a parent config."""


def _expand_env(text: str) -> str:
    return _ENV_PATTERN.sub(lambda m: os.environ.get(m.group(1), m.group(0)), text)


def _decode_value(value: str) -> Any:
    """Best-effort typed decode of a command-line override string."""
    value = value.strip()
    if value.lower() == "true":
        return True
    if value.lower() == "false":
        return False
    if value.lower() in ("none", "null"):
        return None
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        return value


def _to_plain(obj: Any) -> Any:
    """Normalise a value for storage: mappings become ``_SharedNode`` trees so child
    Configuration views can alias them by identity (write-through)."""
    if isinstance(obj, Configuration):
        obj = obj.to_dict()  # assignment across configs copies
    if isinstance(obj, collections.abc.Mapping):
        return _SharedNode({k: _to_plain(v) for k, v in obj.items()})
    if isinstance(obj, (list, tuple)):
        return [_to_plain(v) for v in obj]
    return obj


def nested_dict_update(base: Dict[str, Any], update: Mapping[str, Any]) -> Dict[str, Any]:
    """Deep-merge ``update`` into ``base`` (in place); dicts merge, scalars/lists replace."""
    for key, val in update.items():
        if isinstance(val, collections.abc.Mapping) and isinstance(base.get(key), dict):
            nested_dict_update(base[key], val)
        else:
            base[key] = _to_plain(val)
    return base


def load_yaml_with_includes(path: str) -> Dict[str, Any]:
    """Load a yaml file, recursively merging any files named under ``includes:``.

    The including file's own keys win over included files'; later includes win over
    earlier ones (reference semantics, ``configuration.py:126-140``).
    """
    with open(path, "r", encoding="utf-8") as f:
        text = _expand_env(f.read())
    data = yaml.safe_load(text) or {}
    if not isinstance(data, dict):
        raise TypeError(f"Top level of config {path!r} must be a mapping")

    includes = data.pop("includes", [])
    if isinstance(includes, str):
        includes = [includes]
    merged: Dict[str, Any] = {}
    base_dir = os.path.dirname(os.path.abspath(path))
    for inc in includes:
        inc_path = inc if os.path.isabs(inc) else os.path.join(base_dir, inc)
        if not os.path.exists(inc_path):
            alt = os.path.abspath(inc)  # repo-root-relative includes also allowed
            if os.path.exists(alt):
                inc_path = alt
            else:
                raise FileNotFoundError(f"Included config not found: {inc!r} (from {path})")
        nested_dict_update(merged, load_yaml_with_includes(inc_path))
    nested_dict_update(merged, data)
    return merged


class Configuration(collections.abc.Mapping):
    """An immutable-by-default nested mapping with attribute access.

    ``freeze()``/``defrost()`` toggle write protection on this node. Nested dict
    values are wrapped lazily as child ``Configuration`` views that share storage,
    so ``cfg.a.b = 1`` (while defrosted) is visible from the root.
    """

    __slots__ = ("_data", "_frozen")

    def __init__(self, data: Optional[Mapping[str, Any]] = None, frozen: bool = False):
        if isinstance(data, _SharedNode):
            object.__setattr__(self, "_data", data)  # alias: child view of a parent
        else:
            object.__setattr__(self, "_data", _to_plain(dict(data or {})))
        object.__setattr__(self, "_frozen", frozen)

    # ------------------------------------------------------------ construction
    @classmethod
    def from_file(cls, path: str) -> "Configuration":
        return cls(load_yaml_with_includes(path))

    # ---------------------------------------------------------------- mapping
    def __getitem__(self, key: str) -> Any:
        val = self._data[key]
        return self._wrap(val)

    def _wrap(self, val: Any) -> Any:
        if isinstance(val, _SharedNode):
            return Configuration(val, frozen=self._frozen)
        if isinstance(val, dict):  # plain dict snuck into storage: normalise in place
            return Configuration(_SharedNode(val), frozen=self._frozen)
        if isinstance(val, list):
            return [self._wrap(v) if isinstance(v, dict) else v for v in val]
        return val

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def __contains__(self, key: object) -> bool:
        return key in self._data

    def get(self, key: str, default: Any = None) -> Any:
        if key in self._data:
            return self[key]
        return default

    # -------------------------------------------------------------- attribute
    def __getattr__(self, key: str) -> Any:
        if key.startswith("_"):
            raise AttributeError(key)
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(f"Config has no key {key!r}") from e

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __setitem__(self, key: str, value: Any) -> None:
        if self._frozen:
            raise AttributeError(f"Config is frozen; cannot set {key!r}")
        self._data[key] = _to_plain(value)

    def __delitem__(self, key: str) -> None:
        if self._frozen:
            raise AttributeError(f"Config is frozen; cannot delete {key!r}")
        del self._data[key]

    # ----------------------------------------------------------------- freeze
    def freeze(self) -> "Configuration":
        object.__setattr__(self, "_frozen", True)
        return self

    def defrost(self) -> "Configuration":
        object.__setattr__(self, "_frozen", False)
        return self

    @property
    def frozen(self) -> bool:
        return self._frozen

    # ---------------------------------------------------------------- utility
    def to_dict(self) -> Dict[str, Any]:
        def conv(node: Any) -> Any:
            if isinstance(node, dict):
                return {k: conv(v) for k, v in node.items()}
            if isinstance(node, list):
                return [conv(v) for v in node]
            return copy.deepcopy(node)

        return conv(self._data)

    def clone(self) -> "Configuration":
        return Configuration(self.to_dict())

    def merge(self, other: Mapping[str, Any]) -> "Configuration":
        if self._frozen:
            raise AttributeError("Config is frozen; cannot merge")
        nested_dict_update(self._data, other)
        return self

    def override_with_opts(self, opts: Sequence[str]) -> "Configuration":
        """Apply ``key.path value key.path value ...`` or ``key=value`` overrides."""
        if self._frozen:
            raise AttributeError("Config is frozen; cannot override")
        pairs: List[tuple] = []
        i = 0
        opts = list(opts or [])
        while i < len(opts):
            if "=" in opts[i]:
                k, v = opts[i].split("=", 1)
                pairs.append((k, v))
                i += 1
            else:
                if i + 1 >= len(opts):
                    raise ValueError(f"Dangling override key {opts[i]!r} (no value)")
                pairs.append((opts[i], opts[i + 1]))
                i += 2
        for key, raw in pairs:
            self.set_dotted(key, _decode_value(raw))
        return self

    def set_dotted(self, dotted_key: str, value: Any) -> None:
        if self._frozen:
            raise AttributeError("Config is frozen")
        node = self._data
        parts = dotted_key.split(".")
        for part in parts[:-1]:
            nxt = node.get(part)
            if not isinstance(nxt, dict):
                nxt = {}
                node[part] = nxt
            node = nxt
        node[parts[-1]] = _to_plain(value)

    def get_dotted(self, dotted_key: str, default: Any = None) -> Any:
        node: Any = self._data
        for part in dotted_key.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return self._wrap(node)

    def pretty(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False, default_flow_style=False)

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            f.write(self.pretty())

    def __repr__(self) -> str:
        return f"Configuration({self._data!r})"

    def __deepcopy__(self, memo):
        return Configuration(self.to_dict(), frozen=self._frozen)

    def __reduce__(self):
        return (Configuration, (self.to_dict(), self._frozen))


def convert_to_config(obj: Any) -> Configuration:
    if isinstance(obj, Configuration):
        return obj
    return Configuration(obj)


def dataclass_from_config(cls, config: Any, **overrides: Any):
    """Instantiate a dataclass from a config mapping, keeping only known fields
    (reference ``AntMMFConfig.create_from``, configuration.py:197-237)."""
    import dataclasses

    fields = {f.name for f in dataclasses.fields(cls)}
    kwargs = {k: v for k, v in dict(config or {}).items() if k in fields}
    kwargs.update({k: v for k, v in overrides.items() if k in fields})
    return cls(**kwargs)


def get_zoo_config(
    key: str,
    zoo_config_path: str = "configs/zoo/models.yml",
    variation: str = "defaults",
):
    """Resolve a model-zoo entry ``key`` → (version, resources) from a zoo yaml
    (reference ``get_zoo_config``, configuration.py:178-194). Zoo format::

        my_model:
          defaults:
            version: "1.0"
            resources: [{url: ..., sha256: ...}]
    """
    if not os.path.exists(zoo_config_path):
        return None, None
    zoo = load_yaml_with_includes(zoo_config_path)
    node = zoo
    for part in key.split("."):
        if not isinstance(node, dict) or part not in node:
            return None, None
        node = node[part]
    if isinstance(node, dict) and variation in node:
        node = node[variation]
    if not isinstance(node, dict):
        return None, None
    return node.get("version"), node.get("resources")
