import os

import pytest

from antmmf_tpu.common.build import build_config
from antmmf_tpu.common.configuration import Configuration, load_yaml_with_includes


def test_basic_mapping_and_attr_access():
    cfg = Configuration({"a": {"b": 1}, "c": [1, 2]})
    assert cfg.a.b == 1
    assert cfg["a"]["b"] == 1
    assert cfg.c == [1, 2]
    assert "a" in cfg and len(cfg) == 2


def test_freeze_defrost():
    cfg = Configuration({"a": {"b": 1}})
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.x = 2
    with pytest.raises(AttributeError):
        cfg.a.b = 2  # nested views share frozen state
    cfg.defrost()
    cfg.a.b = 2
    assert cfg.a.b == 2  # write through the child view reaches the root


def test_nested_write_through_shared_view():
    cfg = Configuration({"m": {"n": {"o": 1}}})
    child = cfg.m.n
    child.o = 42
    assert cfg.m.n.o == 42


def test_override_opts_typing():
    cfg = Configuration({"tp": {"bs": 1, "flag": False, "name": "x"}})
    cfg.override_with_opts(["tp.bs", "32", "tp.flag", "true", "tp.name=relu", "tp.lst", "[1,2]"])
    assert cfg.tp.bs == 32
    assert cfg.tp.flag is True
    assert cfg.tp.name == "relu"
    assert cfg.tp.lst == [1, 2]


def test_includes_and_env(tmp_path, monkeypatch):
    monkeypatch.setenv("MY_ROOT", "/data/root")
    (tmp_path / "inc.yml").write_text("a: 1\nnested: {x: 1, y: 2}\n")
    (tmp_path / "main.yml").write_text(
        "includes:\n  - inc.yml\nnested: {y: 3}\npath: ${MY_ROOT}/f\n"
    )
    data = load_yaml_with_includes(str(tmp_path / "main.yml"))
    assert data == {"a": 1, "nested": {"x": 1, "y": 3}, "path": "/data/root/f"}


def test_build_config_defaults_and_priority(tmp_path):
    cfg_file = tmp_path / "exp.yml"
    cfg_file.write_text("training_parameters: {batch_size: 64}\nmodel_attributes: {m: {}}\n")
    cfg = build_config(str(cfg_file), opts=["training_parameters.batch_size", "16"])
    assert cfg.training_parameters.batch_size == 16  # cmdline wins
    assert cfg.training_parameters.trainer == "base_trainer"  # defaults present
    assert cfg.frozen
    with pytest.raises(AttributeError):
        cfg.training_parameters.batch_size = 1


def test_pretty_roundtrip(tmp_path):
    cfg = Configuration({"a": {"b": [1, 2]}, "s": "text"})
    path = str(tmp_path / "out" / "cfg.yml")
    cfg.save(path)
    again = Configuration.from_file(path)
    assert again.to_dict() == cfg.to_dict()


def test_dataclass_from_config():
    import dataclasses

    from antmmf_tpu.common.configuration import dataclass_from_config

    @dataclasses.dataclass
    class Head:
        hidden: int = 8
        dropout: float = 0.0

    out = dataclass_from_config(Head, {"hidden": 32, "bogus": 1}, dropout=0.5)
    assert out.hidden == 32 and out.dropout == 0.5


def test_get_zoo_config(tmp_path):
    from antmmf_tpu.common.configuration import get_zoo_config

    zoo = tmp_path / "zoo.yml"
    zoo.write_text(
        "bert:\n  defaults:\n    version: '1.1'\n"
        "    resources: [{url: http://x, sha256: abc}]\n")
    version, resources = get_zoo_config("bert", str(zoo))
    assert version == "1.1" and resources[0]["url"] == "http://x"
    assert get_zoo_config("missing", str(zoo)) == (None, None)
    assert get_zoo_config("x", str(tmp_path / "none.yml")) == (None, None)
