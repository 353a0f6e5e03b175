"""Full MoCo: momentum towers + queue, reachable from YAML
(reference moco_utils.py momentum encoders, VERDICT round-1 item 7)."""

import os

import jax
import numpy as np
import pytest

from antmmf_tpu.common.build import build_config
from antmmf_tpu.trainers.build import build_trainer

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(ROOT, "projects", "base_vtp", "configs",
                   "video_retrieval_moco.local.yml")


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    cfg = build_config(CFG, opts=[
        "training_parameters.save_dir",
        str(tmp_path_factory.mktemp("moco")),
        "training_parameters.max_iterations", "4",
        "training_parameters.seed", "5",
    ])
    trainer = build_trainer(cfg)
    trainer.load()
    init_mom = jax.device_get(trainer.state.variables["momentum"])
    init_params = jax.device_get(
        {k: trainer.state.params[k] for k in init_mom})
    trainer.train()
    return trainer, init_mom, init_params


def test_momentum_collection_created(trained):
    trainer, init_mom, _ = trained
    assert "momentum" in trainer.state.variables
    assert "base" in trainer.state.variables["momentum"]


def test_momentum_params_ema_update(trained):
    trainer, init_mom, init_params = trained
    final_mom = jax.device_get(trainer.state.variables["momentum"])
    final_params = jax.device_get(
        {k: trainer.state.params[k] for k in final_mom})

    def norm_delta(a, b):
        return sum(float(np.abs(x - y).sum()) for x, y in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))

    d_mom = norm_delta(final_mom, init_mom)
    d_online = norm_delta(final_params, init_params)
    assert d_mom > 0.0, "momentum params never updated"
    # EMA at m=0.99 moves far slower than the online params
    assert d_mom < 0.5 * d_online


def test_moco_loss_trains_and_queue_rolls(trained):
    trainer, _, _ = trained
    series = trainer.meter.meters.get("train/total_loss")
    assert series is not None and np.isfinite(series.get_latest())
    q = jax.device_get(trainer.state.variables["moco"]["text_queue"])
    assert int(q["filled"]) == 64  # random-init queue reports full
    assert int(q["ptr"]) > 0       # keys were enqueued


def test_momentum_survives_checkpoint_roundtrip(trained, tmp_path_factory):
    trainer, _, _ = trained
    save_dir = str(tmp_path_factory.mktemp("moco_ckpt"))
    cfg = build_config(CFG, opts=[
        "training_parameters.save_dir", save_dir,
        "training_parameters.max_iterations", "2",
        "training_parameters.snapshot_interval", "2",
        "training_parameters.seed", "5",
    ])
    t1 = build_trainer(cfg)
    t1.load()
    t1.train()
    cfg2 = build_config(CFG, opts=[
        "training_parameters.save_dir", save_dir,
        "training_parameters.resume", "true",
        "training_parameters.seed", "5",
    ])
    t2 = build_trainer(cfg2)
    t2.load()
    a = jax.device_get(t1.state.variables["momentum"])
    b = jax.device_get(t2.state.variables["momentum"])
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(x, y, rtol=1e-6)
