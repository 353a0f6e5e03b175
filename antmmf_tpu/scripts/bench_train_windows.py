"""Measure train dispatch windows (steps_per_dispatch) on the flagship step.

Legs, same chip, same run (one JSON line each):
  k1        — per-step jit, async-pipelined dispatch (bench.py's measurement)
  k1_synced — per-step jit, full host sync every step (the reference's loop
              structure: antmmf/trainers/base_trainer.py:545-675)
  k4 / k8   — ONE jitted lax.scan over K stacked batches per dispatch

The window legs bound how much of the per-step dispatch/launch overhead on a
remote-attached chip survives async pipelining: scan removes the inter-program
gap entirely (device runs K steps back-to-back inside one XLA program).

Usage:  python -m antmmf_tpu.scripts.bench_train_windows [--steps 24]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

BATCH = 32
FRAMES = 8
SIZE = 224
TEXT_LEN = 30


def build(on_tpu: bool):
    import jax

    from antmmf_tpu.models.base_model import build_model
    from antmmf_tpu.optimizer.build import build_optimizer
    from antmmf_tpu.parallel.mesh import batch_spec, build_mesh
    from antmmf_tpu.parallel.state_sharding import shard_state
    from antmmf_tpu.trainers.train_state import TrainState

    batch = BATCH if on_tpu else 8
    frames = FRAMES if on_tpu else 2
    size = SIZE if on_tpu else 64
    config = {
        "model_attributes": {
            "univl_retrieval": {
                "vit_preset": "vit_base_patch32" if on_tpu else "vit_tiny_test",
                "bert_preset": "bert_base" if on_tpu else "bert_tiny_test",
                "image_size": size,
                "embed_dim": 512 if on_tpu else 32,
                "n_clips": 1,
                "dtype_str": "bfloat16" if on_tpu else "float32",
            }
        },
        "optimizer_attributes": {
            "type": "adam_w",
            "params": {"lr": 5e-5, "weight_decay": 0.01,
                       "mu_dtype": "bfloat16"},
        },
        "training_parameters": {"clip_gradients": True,
                                "max_grad_l2_norm": 1.0},
    }
    mesh = build_mesh({"data": -1})
    shell = build_model(config)
    rng = np.random.default_rng(0)
    host_batch = {
        "image_data": rng.standard_normal(
            (batch, frames, size, size, 3)).astype(np.float32),
        "video_mask": np.ones((batch, frames), dtype=np.int64),
        "caption_input_ids": rng.integers(
            0, 30522, (batch, TEXT_LEN)).astype(np.int64),
        "caption_input_mask": np.ones((batch, TEXT_LEN), dtype=np.int64),
        "caption_segment_ids": np.zeros((batch, TEXT_LEN), dtype=np.int64),
    }
    variables = shell.init(jax.random.PRNGKey(0), host_batch)
    tx, _ = build_optimizer(variables["params"],
                            config["optimizer_attributes"],
                            config["training_parameters"])
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    state = shard_state(state, mesh)

    def train_step(state, batch):
        def loss_of(p):
            loss, (_, scalars) = shell.loss_fn(
                {**state.variables, "params": p}, batch,
                rngs={"dropout": jax.random.fold_in(state.rng, state.step)},
                deterministic=False,
            )
            return loss, scalars

        (loss, _), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        return state.apply_gradients(grads, tx), loss

    sharding = jax.sharding.NamedSharding(mesh, batch_spec())
    wsharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, *batch_spec()))
    return train_step, state, host_batch, batch, sharding, wsharding


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=24,
                    help="steps per timed leg (rounded down to window size)")
    args = ap.parse_args()

    import jax

    on_tpu = jax.default_backend() not in ("cpu",)
    steps = args.steps if on_tpu else 4
    warm = 2 if on_tpu else 1

    train_step, state0, host_batch, batch, sharding, wsharding = build(on_tpu)

    # every leg DONATES its state into the jit — each must start from a
    # fresh device copy or the next leg reads deleted buffers
    def clone(tree):
        return jax.tree_util.tree_map(lambda a: a.copy(), tree)

    results = {}

    # ---- leg: per-step jit, pipelined (control; == bench.py) and synced
    step = jax.jit(train_step, donate_argnums=(0,))
    device_batch = jax.device_put(host_batch, sharding)
    state = clone(state0)
    for _ in range(warm):
        state, loss = step(state, device_batch)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = step(state, device_batch)
    float(loss)
    dt = time.perf_counter() - t0
    results["k1"] = {"ms_per_step": round(dt / steps * 1e3, 2),
                     "clips_per_sec": round(batch * steps / dt, 1)}
    print(json.dumps({"leg": "k1", **results["k1"]}), flush=True)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = step(state, device_batch)
        float(loss)  # full host round-trip each step
    dt = time.perf_counter() - t0
    results["k1_synced"] = {"ms_per_step": round(dt / steps * 1e3, 2),
                            "clips_per_sec": round(batch * steps / dt, 1)}
    print(json.dumps({"leg": "k1_synced", **results["k1_synced"]}),
          flush=True)
    del state, device_batch

    # ---- legs: scan windows
    for K in (4, 8):
        nwin = max(1, steps // K)

        def train_window(state, stacked):
            return jax.lax.scan(train_step, state, stacked)

        window = jax.jit(train_window, donate_argnums=(0,))
        stacked_host = {f: np.stack([v] * K) for f, v in host_batch.items()}
        device_stack = jax.device_put(stacked_host, wsharding)
        state = clone(state0)
        for _ in range(warm):
            state, losses = window(state, device_stack)
        float(losses[-1])
        t0 = time.perf_counter()
        for _ in range(nwin):
            state, losses = window(state, device_stack)
        float(losses[-1])
        dt = time.perf_counter() - t0
        n = nwin * K
        results[f"k{K}"] = {"ms_per_step": round(dt / n * 1e3, 2),
                            "clips_per_sec": round(batch * n / dt, 1)}
        print(json.dumps({"leg": f"k{K}", **results[f"k{K}"]}), flush=True)
        del state, device_stack, window

    base = results["k1"]["clips_per_sec"]
    best = max(results, key=lambda k: results[k]["clips_per_sec"])
    print(json.dumps({
        "summary": results,
        "best": best,
        "win_vs_pipelined_pct": round(
            100.0 * (results[best]["clips_per_sec"] / base - 1.0), 1),
    }), flush=True)


if __name__ == "__main__":
    main()
