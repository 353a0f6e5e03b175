"""training_parameters.remat_policy: the trainer wraps the loss forward in
jax.checkpoint under the declared XLA policy. Remat trades recompute for
activation memory and must be a pure perf knob — the loss trajectory has to
match the no-remat run bit-for-bit (same data order, same dropout rngs).

The reference's only activation-memory knob is fp16 AMP
(antmmf/trainers/base_trainer.py:575-607); remat is the TPU-native
equivalent surface (SURVEY.md §5 long-context obligation).
"""

import os

import numpy as np
import pytest

from antmmf_tpu.common.build import build_config
from antmmf_tpu.trainers.base_trainer import _remat_policy
from antmmf_tpu.trainers.build import build_trainer

CFG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "projects", "base_vtp", "configs",
                   "video_retrieval.local.yml")


def _losses(tmp_path, policy: str, max_iter: int = 4):
    cfg = build_config(CFG, opts=[
        "training_parameters.save_dir", str(tmp_path / policy),
        "training_parameters.max_iterations", str(max_iter),
        "training_parameters.seed", "11",
        "training_parameters.remat_policy", policy,
        "training_parameters.log_interval", "1",
        "training_parameters.snapshot_interval", "100",
    ])
    trainer = build_trainer(cfg)
    trainer.load()
    trainer.train()
    return list(trainer.meter.meters["train/total_loss"].deque)


def test_remat_matches_no_remat(tmp_path):
    # not bitwise: XLA fuses the rematerialized forward differently, so
    # float reassociation drifts at ~1e-7/step; a 4-step trajectory within
    # 1e-4 relative means the policy is a pure memory/compute trade
    base = _losses(tmp_path, "none")
    remat = _losses(tmp_path, "dots_saveable")
    np.testing.assert_allclose(np.asarray(base), np.asarray(remat),
                               rtol=1e-4, atol=1e-5)


def test_policy_names_resolve():
    assert _remat_policy("none") is None
    assert _remat_policy(None) is None
    for name in ("dots_saveable", "everything_saveable", "nothing_saveable",
                 "checkpoint_dots_with_no_batch_dims"):
        assert callable(_remat_policy(name))
    with pytest.raises(ValueError):
        _remat_policy("not_a_policy")
