"""End-to-end slice: config → trainer → jitted sharded train steps on the 8-device
CPU mesh → loss decreases → checkpoint save/resume → retrieval eval."""

import glob
import os

import numpy as np
import pytest

from antmmf_tpu.common.build import build_config
from antmmf_tpu.trainers.build import build_trainer

CFG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "projects", "base_vtp", "configs", "video_retrieval.local.yml")


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    save_dir = str(tmp_path_factory.mktemp("save"))
    cfg = build_config(CFG, opts=[
        "training_parameters.save_dir", save_dir,
        "training_parameters.max_iterations", "6",
        "training_parameters.seed", "7",
    ])
    trainer = build_trainer(cfg)
    trainer.load()
    trainer.train()
    return trainer, save_dir


def test_loss_decreases(trained):
    trainer, _ = trained
    series = trainer.meter.meters.get("train/total_loss")
    assert series is not None and series.count >= 2
    first, last = series.deque[0], series.get_latest()
    assert np.isfinite(last)
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_checkpoints_written(trained):
    _, save_dir = trained
    assert os.path.isdir(os.path.join(save_dir, "models"))
    names = os.listdir(os.path.join(save_dir, "models"))
    assert any(n.startswith("model_") for n in names)
    assert os.path.exists(os.path.join(save_dir, "config.yaml"))
    finals = glob.glob(os.path.join(save_dir, "*_final"))
    assert finals


def test_eval_produces_retrieval_metrics(trained):
    trainer, _ = trained
    metrics = trainer.evaluate_set("val")
    assert "t2v-r@1" in metrics and "mean_recall" in metrics
    assert 0.0 <= metrics["t2v-r@1"] <= 100.0
    # fixture has 4 captions over 2 unique videos → v2t gts are multi-gt
    assert "v2t-median_rank" in metrics


def test_resume_from_checkpoint(trained):
    trainer, save_dir = trained
    cfg = build_config(CFG, opts=[
        "training_parameters.save_dir", save_dir,
        "training_parameters.max_iterations", "7",
        "training_parameters.resume", "true",
        "training_parameters.seed", "7",
    ])
    t2 = build_trainer(cfg)
    t2.load()
    assert int(t2.state.step) >= 4  # resumed from snapshot, not 0


def test_interpret_saliency_loop(trained):
    trainer, _ = trained
    results = trainer.interpret("val", max_batches=1)
    assert len(results) == 1
    sal = results[0]["saliency"]
    assert sal.shape == results[0]["input_ids"].shape
    np.testing.assert_allclose(sal.sum(-1), 1.0, rtol=1e-4)


def test_flops_profile_recorded(trained):
    trainer, _ = trained
    assert trainer.metrics_reporter.step_flops is None or \
        trainer.metrics_reporter.step_flops > 0


def test_evalai_inference_dump(trained):
    trainer, save_dir = trained
    trainer.tp = trainer.config.get("training_parameters", {})
    import glob

    cfg = build_config(CFG, opts=[
        "training_parameters.save_dir", save_dir,
        "training_parameters.evalai_inference", "true",
        "training_parameters.run_type", "inference",
        "training_parameters.resume", "true",
        "training_parameters.seed", "7",
    ])
    t = build_trainer(cfg)
    t.load()
    t.inference()
    reports = glob.glob(os.path.join(save_dir, "reports", "*"))
    assert reports


def test_retrieval_trainer_two_stage_eval(trained):
    _, save_dir = trained
    cfg = build_config(CFG, opts=[
        "training_parameters.save_dir", save_dir,
        "training_parameters.trainer", "retrieval_trainer",
        "training_parameters.resume", "true",
        "training_parameters.seed", "7",
    ])
    t = build_trainer(cfg)
    assert type(t).__name__ == "RetrievalTrainer"
    t.load()
    metrics = t.evaluate_set("val")
    assert "l1_simi_t2v-r@1" in metrics and "mean_recall" in metrics
    assert metrics["l1_simi_t2v-median_rank"] >= 1.0


def test_predictor_serving_roundtrip(trained):
    _, save_dir = trained
    import numpy as np

    from antmmf_tpu.predictors.base_predictor import BasePredictor

    pred = BasePredictor({"predictor_parameters": {"model_dir": save_dir}})
    pred.load()
    result = pred.predict({
        "image_data": np.zeros((2, 64, 64, 3), np.float32),
        "caption": "a little girl does gymnastics",
    })
    assert "text_embed" in result or "logits" in result
    # serving state: no losses in output
    assert "losses" not in result


def test_batch_is_sharded_over_mesh(trained):
    trainer, _ = trained
    batch = trainer._cached_first_batch
    sharded = trainer._shard_batch(batch)
    arr = sharded["image_data"]
    # 4-way data sharding × 2-way model replication = one buffer per device
    assert len(arr.addressable_shards) == 8
    assert arr.addressable_shards[0].data.shape[0] == 1  # 4 / data-axis 4


def test_stage2_cross_encoder_rerank(trained, tmp_path_factory):
    _, save_dir = trained
    cfg = build_config(CFG, opts=[
        "training_parameters.save_dir", str(tmp_path_factory.mktemp("s2")),
        "training_parameters.trainer", "retrieval_trainer",
        "training_parameters.stage2_topk", "2",
        "training_parameters.stage2_chunk", "4",
        "training_parameters.max_iterations", "2",
        "training_parameters.snapshot_interval", "100",
        "training_parameters.log_interval", "1",
        "training_parameters.seed", "9",
        "model_attributes.univl_retrieval.with_cross_encoder", "true",
        "model_attributes.univl_retrieval.cross_layers", "1",
    ])
    t = build_trainer(cfg)
    t.load()
    t.train()
    metrics = t.evaluate_set("val")
    assert "l2_simi_t2v-r@1" in metrics, metrics.keys()
    assert 0.0 <= metrics["l2_simi_t2v-r@1"] <= 100.0
    # training emitted the level2 loss
    scalars = t.meter.get_scalar_dict()
    assert any("level2_similarity_loss" in k for k in scalars)
