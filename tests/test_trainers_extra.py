"""Adversarial and distillation trainer smoke runs on the fixture config."""

import os

import numpy as np
import pytest

from antmmf_tpu.common.build import build_config
from antmmf_tpu.trainers.build import build_trainer

CFG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "projects", "base_vtp", "configs", "video_retrieval.local.yml")


def test_adv_trainer_runs_fgm(tmp_path):
    cfg = build_config(CFG, opts=[
        "training_parameters.save_dir", str(tmp_path),
        "training_parameters.trainer", "adv_trainer",
        "training_parameters.adversarial.type", "fgm",
        "training_parameters.adversarial.params.epsilon", "0.5",
        "training_parameters.max_iterations", "2",
        "training_parameters.snapshot_interval", "100",
        "training_parameters.log_interval", "1",
        "training_parameters.seed", "3",
    ])
    t = build_trainer(cfg)
    t.load()
    t.train()
    scalars = t.meter.get_scalar_dict()
    assert any("adv_loss" in k for k in scalars), scalars.keys()
    assert np.isfinite(scalars["train/total_loss"])


def test_distill_trainer_runs(tmp_path):
    cfg = build_config(CFG, opts=[
        "training_parameters.save_dir", str(tmp_path),
        "training_parameters.trainer", "distill_trainer",
        "training_parameters.model", "univl_retrieval",
        "training_parameters.distill.teacher_model", "teacher",
        "training_parameters.distill.kd_weight", "0.5",
        "training_parameters.max_iterations", "2",
        "training_parameters.snapshot_interval", "100",
        "training_parameters.log_interval", "1",
        "training_parameters.seed", "3",
        # teacher: same architecture, separate attributes entry
        "model_attributes.teacher.model_class", "univl_retrieval",
        "model_attributes.teacher.vit_preset", "vit_tiny_test",
        "model_attributes.teacher.bert_preset", "bert_tiny_test",
        "model_attributes.teacher.image_size", "64",
        "model_attributes.teacher.embed_dim", "32",
        "model_attributes.teacher.dtype_str", "float32",
    ])
    t = build_trainer(cfg)
    t.load()
    t.train()
    scalars = t.meter.get_scalar_dict()
    assert any("kd_loss" in k for k in scalars), scalars.keys()


def test_dmae_project_local_config(tmp_path):
    dmae_cfg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "projects", "dmae_vtp", "configs", "msrvtt_retrieval.local.yml")
    cfg = build_config(dmae_cfg, opts=[
        "training_parameters.save_dir", str(tmp_path),
        "training_parameters.seed", "5",
    ])
    t = build_trainer(cfg)
    assert type(t).__name__ == "RetrievalTrainer"
    t.load()
    t.train()
    metrics = t.evaluate_set("val")
    assert "l1_simi_t2v-r@1" in metrics
    scalars = t.meter.get_scalar_dict()
    assert any("level3_similarity_loss" in k for k in scalars)


def test_adv_trainer_generate_adversarial_data(tmp_path):
    cfg = build_config(CFG, opts=[
        "training_parameters.save_dir", str(tmp_path),
        "training_parameters.trainer", "adv_trainer",
        "training_parameters.adversarial.type", "fgm",
        "training_parameters.max_iterations", "1",
        "training_parameters.log_interval", "1",
        "training_parameters.snapshot_interval", "100",
        "training_parameters.seed", "3",
    ])
    t = build_trainer(cfg)
    t.load()
    out_path = str(tmp_path / "adv.jsonl")
    n = t.generate_adversarial_data("val", out_path=out_path, max_batches=1)
    assert n == 4  # every fixture caption got a pseudo label
    import json

    rows = [json.loads(l) for l in open(out_path)]
    assert all("pseudo_label" in r for r in rows)


def test_m2_encoder_project_local_config(tmp_path):
    m2_cfg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "projects", "m2_encoder", "configs", "m2_encoder.local.yml")
    cfg = build_config(m2_cfg, opts=[
        "training_parameters.save_dir", str(tmp_path),
        "training_parameters.seed", "2",
    ])
    t = build_trainer(cfg)
    t.load()
    t.train()
    scalars = t.meter.get_scalar_dict()
    assert any("contrastive_loss" in k for k in scalars)
    assert any("moe_aux_loss" in k for k in scalars)


def test_hotflip_text_generation_end_to_end(tmp_path):
    """MMHotFlip drives caption token flips through the trained retrieval
    model (the adversarial data-generation run type)."""
    import numpy as np

    from antmmf_tpu.common.build import build_config
    from antmmf_tpu.trainers.build import build_trainer

    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = build_config(
        os.path.join(root, "projects", "base_vtp", "configs",
                     "video_retrieval.local.yml"),
        opts=["training_parameters.save_dir", str(tmp_path),
              "training_parameters.trainer", "adv_trainer",
              "training_parameters.adversarial.type", "fgm",
              "training_parameters.max_iterations", "2",
              "training_parameters.log_interval", "1",
              "training_parameters.snapshot_interval", "100",
              "training_parameters.seed", "4"])
    trainer = build_trainer(cfg)
    trainer.load()
    results = trainer.generate_hotflip_text("val", max_batches=1, steps=2)
    assert len(results) == 1
    orig, flipped, info = results[0]
    assert orig.shape == flipped.shape
    n_changed = int((orig != flipped).sum())
    assert n_changed == orig.shape[0] * 2  # 2 flips per caption
    assert int(info["n_flipped"]) == orig.shape[0] * 2


def test_adversarial_generate_run_type(tmp_path):
    """run_type adversarial_val_generate routes to data generation (the
    reference's extra run_types, adv_trainer.py:20-24)."""
    import os

    from antmmf_tpu.common.build import build_config
    from antmmf_tpu.trainers.build import build_trainer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = build_config(
        os.path.join(root, "projects", "base_vtp", "configs",
                     "video_retrieval.local.yml"),
        opts=["training_parameters.save_dir", str(tmp_path),
              "training_parameters.trainer", "adv_trainer",
              "training_parameters.run_type", "adversarial_val_generate",
              "training_parameters.adversarial.type", "fgm",
              "training_parameters.seed", "4"])
    trainer = build_trainer(cfg)
    trainer.load()
    trainer.train()  # runs generation, not the training loop
    assert int(trainer.state.step) == 0  # no optimizer steps happened
