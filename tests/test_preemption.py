"""Graceful preemption: SIGTERM mid-training saves a checkpoint and exits
cleanly; `resume: true` continues from the saved step."""

import glob
import os
import signal
import threading

from antmmf_tpu.common.build import build_config
from antmmf_tpu.trainers.build import build_trainer

CFG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "projects", "base_vtp", "configs",
                   "video_retrieval.local.yml")


def test_sigterm_saves_and_exits(tmp_path):
    save_dir = str(tmp_path / "save")
    cfg = build_config(CFG, opts=[
        "training_parameters.save_dir", save_dir,
        "training_parameters.max_iterations", "500",
        "training_parameters.snapshot_interval", "400",
        "training_parameters.log_interval", "400",
    ])
    trainer = build_trainer(cfg)
    trainer.load()

    # deliver SIGTERM shortly after the loop starts
    timer = threading.Timer(
        1.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        trainer.train()  # returns (no exception) well before iter 500
    finally:
        timer.cancel()

    it = int(trainer.state.step)
    assert 0 < it < 500, f"expected early preemption exit, got iter {it}"
    ckpts = glob.glob(os.path.join(save_dir, "models", "model_*"))
    assert ckpts, "no preemption checkpoint written"

    # handler restored to default after train()
    assert signal.getsignal(signal.SIGTERM) in (
        signal.SIG_DFL, signal.default_int_handler)

    # resume picks up from the preempted step
    cfg2 = build_config(CFG, opts=[
        "training_parameters.save_dir", save_dir,
        "training_parameters.max_iterations", str(it + 2),
        "training_parameters.resume", "true",
    ])
    trainer2 = build_trainer(cfg2)
    trainer2.load()
    assert int(trainer2.state.step) == it
    trainer2.train()
    assert int(trainer2.state.step) == it + 2
