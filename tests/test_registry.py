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


def test_reference_model_names_resolve():
    """Every model name a reference YAML can mention resolves here."""
    import antmmf_tpu.models  # noqa: F401

    from antmmf_tpu.common.registry import registry

    reference_names = [
        "antmmf", "antmmf_image_only", "antmmf_question_only", "bert", "cnn",
        "cnn_lstm", "comp_gcn", "concat_bert", "image_model", "mmbt",
        "multitask_model", "openai_clip", "s3d", "top_down_bottom_up",
        "univl", "vilbert", "visual_bert", "AntmmfLayoutLM", "AttriMMBT",
        "SpkResNet", "roi_model",
    ]
    for name in reference_names:
        assert registry.get_model_class(name, default=None) is not None, name


def test_reference_loss_names_resolve():
    import antmmf_tpu.modules.losses.extended  # noqa: F401
    import antmmf_tpu.modules.losses.losses  # noqa: F401

    from antmmf_tpu.common.registry import registry

    reference_names = [
        "asymmetric_loss", "attention_supervision", "bce", "bce_kl_combined",
        "bce_ls", "caption_cross_entropy", "cos_amssoftmax", "cosarc",
        "cross_entropy", "custom", "discount_infonce", "eet", "hier_loss",
        "hier_multilabel_loss", "kg_margin_contrastive", "kn_dis_loss",
        "label_smooth_ce", "logit_bce", "m4c_decoding_bce_with_mask",
        "mce_loss", "mil-margin-contrastive", "mil-nce", "mse", "multi",
        "nce", "nll_loss", "ordinal_loss", "pairwise_loss", "softmax_kldiv",
        "weighted_softmax", "wrong",
    ]
    for name in reference_names:
        assert registry.get_loss_class(name, default=None) is not None, name
