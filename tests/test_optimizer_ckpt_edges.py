"""Optimizer schedule/accumulation and checkpoint/early-stopping edge paths."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from antmmf_tpu.common.checkpoint import Checkpoint, merge_params_tolerant
from antmmf_tpu.optimizer.build import (
    build_lr_schedule,
    build_optimizer,
    make_lr_multiplier_mask,
    make_weight_decay_mask,
)
from antmmf_tpu.trainers.train_state import TrainState
from antmmf_tpu.utils.early_stopping import EarlyStopping


def test_lr_schedule_warmup_and_steps():
    sched = build_lr_schedule({
        "use_warmup": True, "warmup_iterations": 100, "warmup_factor": 0.1,
        "lr_steps": [200, 300], "lr_ratio": 0.1}, base_lr=1.0)
    np.testing.assert_allclose(float(sched(0)), 0.1)
    np.testing.assert_allclose(float(sched(50)), 0.55)
    np.testing.assert_allclose(float(sched(100)), 1.0)
    np.testing.assert_allclose(float(sched(250)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(350)), 0.01, rtol=1e-6)


def test_weight_decay_and_multiplier_masks():
    params = {"enc": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,)),
                      "layer_norm": {"scale": jnp.ones((2,))}}}
    wd = make_weight_decay_mask(params)
    assert wd["enc"]["kernel"] is True
    assert wd["enc"]["bias"] is False
    assert wd["enc"]["layer_norm"]["scale"] is False

    mult = make_lr_multiplier_mask(params, [["enc/kernel", 0.1]])
    assert mult["enc"]["kernel"] == 0.1
    assert mult["enc"]["bias"] == 1.0


def test_gradient_accumulation_equivalence():
    """MultiSteps(k) over k microbatches == one step on the mean gradient."""
    params = {"w": jnp.ones((3,))}
    grads = [{"w": jnp.array([1.0, 2.0, 3.0])}, {"w": jnp.array([3.0, 2.0, 1.0])}]

    tx_plain, _ = build_optimizer(params, {"type": "sgd", "params": {
        "lr": 0.1, "momentum": 0.0}}, {"gradient_accumulation_steps": 1})
    tx_accum, _ = build_optimizer(params, {"type": "sgd", "params": {
        "lr": 0.1, "momentum": 0.0}}, {"gradient_accumulation_steps": 2})

    mean_grad = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, *grads)
    s = tx_plain.init(params)
    upd, _ = tx_plain.update(mean_grad, s, params)
    ref = optax.apply_updates(params, upd)

    s2 = tx_accum.init(params)
    p = params
    for g in grads:
        upd, s2 = tx_accum.update(g, s2, p)
        p = optax.apply_updates(p, upd)
    np.testing.assert_allclose(np.asarray(p["w"]), np.asarray(ref["w"]),
                               rtol=1e-6)


def test_early_stopping_patience_and_best():
    es = EarlyStopping("recall", patience=10, minimize=False, should_stop=True)
    assert not es(0, {"val/recall": 0.5})
    assert es.is_best
    assert not es(5, {"val/recall": 0.4})
    assert not es.is_best
    assert not es(10, {"val/recall": 0.6})  # new best resets patience
    assert not es(15, {"val/recall": 0.5})
    assert es(21, {"val/recall": 0.5})  # 21 - 10 > patience → stop
    assert es.summary()["early_stopped"]


def test_checkpoint_gc_and_best(tmp_path):
    cfg = {"training_parameters": {"save_dir": str(tmp_path),
                                   "max_ckpt_num": 2}}
    ckpt = Checkpoint(cfg)
    tx = optax.sgd(0.1)
    state = TrainState.create({"params": {"w": jnp.ones((2,))}}, tx,
                              jax.random.PRNGKey(0))
    for it in (1, 2, 3):
        state = state.replace(step=jnp.asarray(it))
        ckpt.save(state, it)
    ckpt.save_best(state)
    ckpt.finalize_writes()  # saves are async; join before listing
    names = sorted(os.listdir(os.path.join(str(tmp_path), "models")))
    assert "model_1" not in names  # GC'd
    assert "model_2" in names and "model_3" in names and "best" in names

    restored, ok = ckpt.restore_state(state)
    assert ok and int(restored.step) == 3


def test_merge_params_tolerant_reports():
    target = {"a": {"kernel": np.zeros((2, 2))}, "b": np.zeros((3,))}
    loaded = {"a": {"kernel": np.ones((2, 2))}, "c": np.ones((1,)),
              "b": np.ones((4,))}  # b mismatched, c unexpected
    merged, report = merge_params_tolerant(target, loaded)
    np.testing.assert_allclose(merged["a"]["kernel"], 1.0)
    np.testing.assert_allclose(merged["b"], 0.0)  # skipped, keeps target
    assert report["loaded"] == ["a/kernel"]
    assert any("b" in s for s in report["shape_mismatch"])
    assert report["unexpected"] == ["c"]


def test_merge_params_pretrained_mapping():
    target = {"student": {"kernel": np.zeros((2,))}}
    loaded = {"teacher": {"kernel": np.ones((2,))}}
    merged, report = merge_params_tolerant(
        target, loaded, pretrained_mapping={"teacher": "student"})
    np.testing.assert_allclose(merged["student"]["kernel"], 1.0)


def test_combined_optimizer_per_group_types():
    params = {"img_encoder": {"kernel": jnp.ones((2, 2))},
              "head": {"kernel": jnp.ones((2, 2))}}
    tx, sched = build_optimizer(params, {
        "type": "combined",
        "groups": [
            {"pattern": "img_encoder", "type": "sgd",
             "params": {"lr": 0.5, "momentum": 0.0}},
            {"pattern": "head", "type": "sgd",
             "params": {"lr": 0.1, "momentum": 0.0}},
        ]}, {"clip_gradients": False})
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    s = tx.init(params)
    upd, _ = tx.update(grads, s, params)
    new = optax.apply_updates(params, upd)
    # different lrs per group applied
    np.testing.assert_allclose(np.asarray(new["img_encoder"]["kernel"]), 0.5)
    np.testing.assert_allclose(np.asarray(new["head"]["kernel"]), 0.9)


def test_lr_schedule_cosine_and_linear():
    from antmmf_tpu.optimizer.build import build_lr_schedule

    tp = {"use_warmup": True, "warmup_iterations": 10, "warmup_factor": 0.1,
          "lr_decay": "cosine", "max_iterations": 110, "min_lr_ratio": 0.1}
    s = build_lr_schedule(tp, 1.0)
    assert abs(float(s(0)) - 0.1) < 1e-6            # warmup start
    assert abs(float(s(10)) - 1.0) < 1e-6           # warmup end = peak
    mid = float(s(60))                               # halfway through decay
    assert abs(mid - (0.1 + 0.9 * 0.5)) < 1e-5
    assert abs(float(s(110)) - 0.1) < 1e-5          # floor = min_lr_ratio

    lin = build_lr_schedule({"lr_decay": "linear", "max_iterations": 100}, 2.0)
    assert abs(float(lin(0)) - 2.0) < 1e-6
    assert abs(float(lin(50)) - 1.0) < 1e-5
    assert abs(float(lin(100)) - 0.0) < 1e-6

    with pytest.raises(ValueError):
        build_lr_schedule({"lr_decay": "cosine"}, 1.0)  # no horizon
    with pytest.raises(ValueError):
        build_lr_schedule({"lr_decay": "bogus", "max_iterations": 5}, 1.0)


def test_custom_schedule_overrides_config():
    from antmmf_tpu.optimizer.build import build_optimizer

    params = {"w": jnp.zeros((4, 4), jnp.float32)}
    tx, sched = build_optimizer(
        params, {"type": "adam_w", "params": {"lr": 1e-3}},
        {"use_warmup": True, "warmup_iterations": 5},
        custom_schedule=lambda c: jnp.asarray(0.123, jnp.float32))
    assert abs(float(sched(0)) - 0.123) < 1e-6
    assert abs(float(sched(999)) - 0.123) < 1e-6
    state = tx.init(params)
    g = {"w": jnp.ones((4, 4), jnp.float32)}
    updates, _ = tx.update(g, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_model_optimizer_grouping_hook():
    """encoder_lr_decay flows from the model hook into lr multipliers
    (reference get_optimizer_parameters, univl_video_ret.py:482-520)."""
    from antmmf_tpu.models.univl import UnivlForVideoTextRetrieval
    from antmmf_tpu.optimizer.build import make_lr_multiplier_mask

    m = UnivlForVideoTextRetrieval(vit_preset="vit_tiny_test",
                                   bert_preset="bert_tiny_test")
    assert m.optimizer_lr_multipliers({}) == []
    rules = m.optimizer_lr_multipliers({"encoder_lr_decay": 0.1})
    assert rules and rules[0][1] == 0.1

    params = {"base": {"img_encoder": {"k": jnp.zeros(2)},
                       "text_encoder": {"k": jnp.zeros(2)}},
              "logit_scale": jnp.zeros(())}
    mask = make_lr_multiplier_mask(params, rules)
    assert float(mask["base"]["img_encoder"]["k"]) == 0.1
    assert float(mask["base"]["text_encoder"]["k"]) == 0.1
    assert float(mask["logit_scale"]) == 1.0


def test_frozen_params_no_state_no_update():
    """optimizer_attributes.frozen_params: frozen subtrees get zero updates
    and allocate NO optimizer state (reference freezes via requires_grad_,
    prj/Pink/pink/model/adapter.py mark_only_adapter_as_trainable)."""
    params = {"tower": {"kernel": jnp.ones((4, 4))},
              "lora": {"lora_a": jnp.ones((4, 2)),
                       "lora_b": jnp.zeros((2, 4))}}
    tx, _ = build_optimizer(
        params,
        {"type": "adam_w", "params": {"lr": 0.1, "weight_decay": 0.1},
         "frozen_params": ["tower.*"]},
        {})
    state = tx.init(params)
    # no m/v allocated under the frozen tower
    leaves = jax.tree_util.tree_leaves(state)
    n_tower_like = sum(1 for l in leaves
                       if hasattr(l, "shape") and l.shape == (4, 4))
    assert n_tower_like == 0
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    # frozen: exactly zero update (weight decay must NOT leak onto the
    # frozen tower — stop_gradient alone would still decay it under adamw)
    np.testing.assert_array_equal(np.asarray(updates["tower"]["kernel"]), 0.0)
    assert float(jnp.abs(updates["lora"]["lora_a"]).sum()) > 0.0


def test_frozen_params_with_accumulation():
    """frozen_params composes with MultiSteps: no accumulators on frozen
    leaves, trainable trajectory identical to an unfrozen-path run where the
    frozen grads happen to be zero."""
    params = {"tower": {"kernel": jnp.ones((4, 4))},
              "head": {"kernel": jnp.ones((4, 4))}}
    tx, _ = build_optimizer(
        params,
        {"type": "adam_w", "params": {"lr": 0.1},
         "frozen_params": [r"tower/.*"]},
        {"gradient_accumulation_steps": 2})
    state = tx.init(params)
    leaves_with_shape = [l for l in jax.tree_util.tree_leaves(state)
                         if hasattr(l, "shape") and l.shape == (4, 4)]
    # adam m+v + MultiSteps accumulator on head ONLY = 3 tensors
    assert len(leaves_with_shape) == 3
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    p = params
    for _ in range(2):
        updates, state = tx.update(grads, state, p)
        p = optax.apply_updates(p, updates)
    np.testing.assert_array_equal(np.asarray(p["tower"]["kernel"]), 1.0)
    assert not np.allclose(np.asarray(p["head"]["kernel"]), 1.0)


def test_frozen_params_checkpoint_roundtrip(tmp_path):
    """MaskedNode optimizer state (frozen_params) survives Orbax
    save/restore and the restored state can keep training — the
    preemption/resume path for the 7B LoRA configs."""
    from antmmf_tpu.common.configuration import convert_to_config

    params = {"tower": {"kernel": jnp.ones((4, 4))},
              "head": {"kernel": jnp.ones((4, 4))}}
    tx, _ = build_optimizer(
        params, {"type": "adam_w", "params": {"lr": 0.1},
                 "frozen_params": ["tower/.*"]}, {})
    state = TrainState.create({"params": params}, tx, jax.random.PRNGKey(0))
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    state = state.apply_gradients(grads, tx)

    cfg = convert_to_config(
        {"training_parameters": {"save_dir": str(tmp_path)}})
    ck = Checkpoint(cfg)
    path = ck.save(state, iteration=1)
    restored, ok = ck.restore_state(state, path)
    assert ok
    np.testing.assert_array_equal(
        np.asarray(restored.params["head"]["kernel"]),
        np.asarray(state.params["head"]["kernel"]))
    after = restored.apply_gradients(grads, tx)
    # frozen subtree still pinned, trainable subtree still moving
    np.testing.assert_array_equal(
        np.asarray(after.params["tower"]["kernel"]), 1.0)
    assert not np.allclose(np.asarray(after.params["head"]["kernel"]),
                           np.asarray(restored.params["head"]["kernel"]))
