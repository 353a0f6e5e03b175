import pytest

from antmmf_tpu.common.registry import Registry, registry


def test_register_and_get_class():
    r = Registry()

    @r.register_model("toy")
    class Toy:
        pass

    assert r.get_model_class("toy") is Toy
    assert r.list_names("model") == ["toy"]


def test_duplicate_raises_unless_same():
    r = Registry()

    @r.register_loss("l")
    class L:
        pass

    with pytest.raises(KeyError):
        @r.register_loss("l")
        class M:
            pass

    # re-registering the identical class is a no-op
    r.register_class("loss", "l", L)


def test_missing_lookup_message():
    r = Registry()
    with pytest.raises(KeyError, match="No model named"):
        r.get_model_class("nope")
    assert r.get_model_class("nope", default=None) is None


def test_state_store_dotted_paths():
    r = Registry()
    r.register("config.training.batch_size", 8)
    assert r.get("config.training.batch_size") == 8
    assert r.get("config.training") == {"batch_size": 8}
    assert r.get("missing.path", default="d") == "d"
    assert r.unregister("config.training.batch_size") == 8
    assert r.get("config.training.batch_size") is None


def test_global_singleton_exists():
    assert isinstance(registry, Registry)


def test_bare_decorator_usage():
    r = Registry()

    @r.register_trainer
    class MyTrainer:
        pass

    assert r.get_trainer_class("MyTrainer") is MyTrainer
