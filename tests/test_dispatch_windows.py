"""steps_per_dispatch (train dispatch windows): one jitted lax.scan over K
stacked batches must train EXACTLY like K sequential per-step dispatches —
same data order (seeded samplers), same per-step dropout rngs (fold_in of
state.step), same optimizer trajectory. The feature amortizes per-step host
dispatch, which the reference pays every iteration
(antmmf/trainers/base_trainer.py:545-675)."""

import os

import jax
import numpy as np
import pytest

from antmmf_tpu.common.build import build_config
from antmmf_tpu.trainers.build import build_trainer

CFG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "projects", "base_vtp", "configs", "video_retrieval.local.yml")


def _train(tmp_path, window: int, max_iter: int = 7):
    cfg = build_config(CFG, opts=[
        "training_parameters.save_dir", str(tmp_path / f"w{window}"),
        "training_parameters.max_iterations", str(max_iter),
        "training_parameters.seed", "11",
        "training_parameters.steps_per_dispatch", str(window),
        # keep log/snapshot out of the way so the two runs do identical work
        "training_parameters.log_interval", "100",
        "training_parameters.snapshot_interval", "100",
    ])
    trainer = build_trainer(cfg)
    trainer.load()
    trainer.train()
    return trainer


@pytest.fixture(scope="module")
def runs(tmp_path_factory):
    base = tmp_path_factory.mktemp("windows")
    seq = _train(base, window=1)
    win = _train(base, window=3)  # 7 iters = 2 full windows + remainder of 1
    return seq, win


def test_same_final_params(runs):
    seq, win = runs
    assert int(seq.state.step) == int(win.state.step) == 7
    leaves_a = jax.tree_util.tree_leaves_with_path(seq.state.params)
    leaves_b = dict(jax.tree_util.tree_leaves_with_path(win.state.params))
    assert len(leaves_a) == len(leaves_b)
    for path, a in leaves_a:
        b = leaves_b[path]
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-5, atol=2e-6, err_msg=jax.tree_util.keystr(path))


def test_same_loss_trajectory(runs):
    seq, win = runs
    a = seq.meter.meters.get("train/total_loss")
    b = win.meter.meters.get("train/total_loss")
    # window mode logs at window edges with the LAST step's scalars; with
    # log_interval pushed out both runs only carry what finalize recorded,
    # so compare the final loss value instead of the series shape
    if a is not None and b is not None and a.count and b.count:
        np.testing.assert_allclose(a.get_latest(), b.get_latest(), rtol=1e-4)


def test_stack_windows_shape_change_flushes():
    from antmmf_tpu.datasets.loader import stack_windows

    batches = [
        {"x": np.zeros((2, 4))}, {"x": np.zeros((2, 4))},
        {"x": np.zeros((2, 8))},  # padding maximum changed mid-chain
        {"x": np.zeros((2, 8))}, {"x": np.zeros((2, 8))},
        {"x": np.zeros((2, 8))},
    ]
    got = list(stack_windows(iter(batches), window=3))
    assert [k for _, k in got] == [2, 3, 1]
    assert got[0][0]["x"].shape == (2, 2, 4)
    assert got[1][0]["x"].shape == (3, 2, 8)


def test_stack_windows_budget():
    from antmmf_tpu.datasets.loader import stack_windows

    batches = ({"x": np.zeros((2,))} for _ in range(10))
    got = list(stack_windows(batches, window=4, budget=6))
    assert [k for _, k in got] == [4, 2]
