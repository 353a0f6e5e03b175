"""Trainer-path decoder sequence parallelism: the full glue — config mesh
{data, seq} → trainer registers the mesh → PinkModel's decoder reads it via
the registry and runs causal ring attention over the seq axis inside the
trainer's jitted sharded train step. Complements tests/test_decoder_sp.py
(module-level numerics) with the end-to-end wiring the long-video configs
(projects/m2_omni/configs/m2_omni_longvideo.yml) rely on."""

import os

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(ROOT, "projects", "pink", "configs",
                   "pink_instruct.local.yml")


def test_trainer_trains_with_decoder_sp(tmp_path):
    from antmmf_tpu.common.build import build_config
    from antmmf_tpu.trainers.build import build_trainer

    cfg = build_config(CFG, opts=[
        "training_parameters.save_dir", str(tmp_path),
        "training_parameters.max_iterations", "4",
        "training_parameters.mesh.model", "1",
        "training_parameters.mesh.data", "2",
        "training_parameters.mesh.seq", "4",
        "model_attributes.pink.sequence_parallel", "ring",
    ])
    trainer = build_trainer(cfg)
    trainer.load()
    assert trainer.mesh.shape["seq"] == 4
    trainer.train()
    series = trainer.meter.meters.get("train/total_loss")
    vals = list(series.deque)
    assert np.isfinite(vals).all()
    assert vals[-1] < vals[0] * 1.5  # trains without blowup
