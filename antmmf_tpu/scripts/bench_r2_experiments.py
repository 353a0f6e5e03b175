"""Round-2 TPU throughput experiments (run on the real chip, background).

Measures the flagship retrieval step under variants (batch size, LayerNorm
compute dtype), plus the heavier workloads round 1 never benched: the
MLM+ITM+VTC pretrain step and the cross-encoder step with hard-negative
mining, and the loader-fed vs synthetic step-time ratio (input-pipeline
stall). Prints one JSON line per experiment.
"""

from __future__ import annotations

import json
import time

import numpy as np

TEXT_LEN = 30
VOCAB = 30522


def timed_steps(step, state, batch, warmup=3, steps=10):
    import jax

    for _ in range(warmup):
        state, loss = step(state, batch)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = step(state, batch)
    float(loss)
    dt = time.perf_counter() - t0
    return dt / steps, state


def flops_of(step, state, batch):
    try:
        compiled = step.lower(state, batch).compile()
        an = compiled.cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception:
        return 0.0


def make_batch(batch, frames, size, rng=None, text_len=TEXT_LEN):
    rng = rng or np.random.default_rng(0)
    return {
        "image_data": rng.standard_normal(
            (batch, frames, size, size, 3)).astype(np.float32),
        "video_mask": np.ones((batch, frames), dtype=np.int64),
        "caption_input_ids": rng.integers(
            0, VOCAB, (batch, text_len)).astype(np.int64),
        "caption_input_mask": np.ones((batch, text_len), dtype=np.int64),
        "caption_segment_ids": np.zeros((batch, text_len), dtype=np.int64),
    }


def build(config_model, batch_example, opt_params=None):
    import jax

    from antmmf_tpu.models.base_model import build_model
    from antmmf_tpu.optimizer.build import build_optimizer
    from antmmf_tpu.parallel.mesh import batch_spec, build_mesh
    from antmmf_tpu.parallel.state_sharding import shard_state
    from antmmf_tpu.trainers.train_state import TrainState

    config = {
        "model_attributes": config_model,
        "optimizer_attributes": {
            "type": "adam_w",
            "params": dict(opt_params or
                           {"lr": 5e-5, "weight_decay": 0.01})},
        "training_parameters": {"clip_gradients": True,
                                "max_grad_l2_norm": 1.0},
    }
    mesh = build_mesh({"data": -1})
    shell = build_model(config)
    variables = shell.init(jax.random.PRNGKey(0), batch_example)
    tx, _ = build_optimizer(variables["params"],
                            config["optimizer_attributes"],
                            config["training_parameters"])
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    state = shard_state(state, mesh)
    sharding = jax.sharding.NamedSharding(mesh, batch_spec())

    def train_step(state, batch):
        def loss_of(p):
            loss, (_, scalars) = shell.loss_fn(
                {**state.variables, "params": p}, batch,
                rngs={"dropout": jax.random.fold_in(state.rng, state.step)},
                deterministic=False)
            return loss, scalars

        (loss, _), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        return state.apply_gradients(grads, tx), loss

    import jax as _jax

    step = _jax.jit(train_step, donate_argnums=(0,))
    return step, state, sharding, mesh


RETRIEVAL = {
    "univl_retrieval": {
        "vit_preset": "vit_base_patch32", "bert_preset": "bert_base",
        "image_size": 224, "embed_dim": 512, "n_clips": 1,
        "dtype_str": "bfloat16",
    }
}


def run_retrieval(batch_size, tag, ln_bf16=False):
    import jax

    if ln_bf16:
        _patch_layernorm_bf16()
    try:
        host = make_batch(batch_size, 8, 224)
        step, state, sharding, _ = build(RETRIEVAL, host)
        dbatch = jax.device_put(host, sharding)
        fl = flops_of(step, state, dbatch)
        dt, _ = timed_steps(step, state, dbatch)
        cps = batch_size / dt / len(jax.devices())
        print(json.dumps({
            "exp": tag, "batch": batch_size, "ms_per_step": round(dt * 1e3, 2),
            "clips_per_sec_per_chip": round(cps, 1),
            "tflops_per_step": round(fl / 1e12, 3),
            "achieved_tflops": round(fl / dt / 1e12, 1),
        }), flush=True)
    finally:
        if ln_bf16:
            _unpatch_layernorm()


_orig_ln_call = None


def _patch_layernorm_bf16():
    """Experiment: LayerNorm statistics still fp32 (XLA reduces in fp32) but
    no explicit fp32 materialisation of activations."""
    global _orig_ln_call
    import flax.linen as nn
    import jax.numpy as jnp

    from antmmf_tpu.modules import layers

    _orig_ln_call = layers.LayerNorm.__call__

    def bf16_call(self, x):
        out = nn.LayerNorm(epsilon=self.epsilon, dtype=self.dtype,
                           param_dtype=self.param_dtype)(x)
        return out.astype(self.dtype)

    layers.LayerNorm.__call__ = bf16_call


def _unpatch_layernorm():
    from antmmf_tpu.modules import layers

    if _orig_ln_call is not None:
        layers.LayerNorm.__call__ = _orig_ln_call


def run_pretrain(batch_size):
    import jax

    host = make_batch(batch_size, 8, 224)
    # pretrain extras: masked ids + labels + itm target
    rng = np.random.default_rng(1)
    host["caption_lm_label_ids"] = np.where(
        rng.uniform(size=(batch_size, TEXT_LEN)) < 0.15,
        host["caption_input_ids"], -1).astype(np.int64)
    host["caption_raw_input_ids"] = host["caption_input_ids"].copy()
    host["itm_targets"] = rng.integers(0, 2, (batch_size,)).astype(np.int64)
    cfg = {"univl_pretrain": {
        "vit_preset": "vit_base_patch32", "bert_preset": "bert_base",
        "image_size": 224, "embed_dim": 512,
        "with_vtc": True, "with_vtm": True, "with_mlm": True,
        "dtype_str": "bfloat16"}}
    step, state, sharding, _ = build(cfg, host)
    dbatch = jax.device_put(host, sharding)
    fl = flops_of(step, state, dbatch)
    dt, _ = timed_steps(step, state, dbatch)
    cps = batch_size / dt / len(jax.devices())
    print(json.dumps({
        "exp": "pretrain_mlm_itm_vtc", "batch": batch_size,
        "ms_per_step": round(dt * 1e3, 2),
        "clips_per_sec_per_chip": round(cps, 1),
        "tflops_per_step": round(fl / 1e12, 3),
        "achieved_tflops": round(fl / dt / 1e12, 1),
    }), flush=True)


def run_cross_mining(batch_size, k):
    import jax

    cfg = {"univl_retrieval": {
        **RETRIEVAL["univl_retrieval"],
        "with_cross_encoder": True, "cross_layers": 2, "hard_mining_k": k}}
    host = make_batch(batch_size, 8, 224)
    step, state, sharding, _ = build(cfg, host)
    dbatch = jax.device_put(host, sharding)
    fl = flops_of(step, state, dbatch)
    dt, _ = timed_steps(step, state, dbatch, warmup=2, steps=6)
    cps = batch_size / dt / len(jax.devices())
    print(json.dumps({
        "exp": f"retrieval_cross_mined_k{k}", "batch": batch_size,
        "ms_per_step": round(dt * 1e3, 2),
        "clips_per_sec_per_chip": round(cps, 1),
        "tflops_per_step": round(fl / 1e12, 3),
        "achieved_tflops": round(fl / dt / 1e12, 1),
    }), flush=True)


def run_loader_fed(batch_size=4):
    """Input-pipeline claim: loader-fed vs synthetic step time (stall %)."""
    import itertools

    import jax

    from antmmf_tpu.common.build import build_config
    from antmmf_tpu.trainers.build import build_trainer

    cfg = build_config(
        "projects/base_vtp/configs/video_retrieval.yml",
        opts=[
            "task_attributes.univl_task.dataset_attributes."
            "video_text_retrieval.data_root_dir", "tests/data/video",
            "task_attributes.univl_task.dataset_attributes."
            "video_text_retrieval.annotations.train", "msrvtt_train.jsonl",
            "task_attributes.univl_task.dataset_attributes."
            "video_text_retrieval.annotations.val", "msrvtt_train.jsonl",
            "task_attributes.univl_task.dataset_attributes."
            "video_text_retrieval.annotations.test", "msrvtt_train.jsonl",
            "task_attributes.univl_task.dataset_attributes."
            "video_text_retrieval.video_root", "",
            "task_attributes.univl_task.dataset_attributes."
            "video_text_retrieval.frames_per_clip", "8",
            "training_parameters.batch_size", str(batch_size),
            "training_parameters.num_workers", "2",
            "training_parameters.max_iterations", "1",
            "training_parameters.save_dir", "/tmp/bench_loader",
            "training_parameters.mesh.data", "-1",
        ])
    trainer = build_trainer(cfg)
    trainer.load()
    from antmmf_tpu.datasets.loader import prefetch_to_device

    loaders = trainer.task_loader.get_loaders("train")

    def run_n(feed, n):
        it = iter(feed)
        state = trainer.state
        t0 = time.perf_counter()
        cnt = 0
        last = None
        for sharded in it:
            state, scalars = trainer._train_step(state, sharded)
            last = scalars
            cnt += 1
            if cnt >= n:
                break
        float(jax.device_get(last["total_loss"]))
        return (time.perf_counter() - t0) / max(cnt, 1), state

    # warmup/compile on one real batch
    first = next(iter(loaders[0]))
    sharded = trainer._shard_batch(first)
    state, scalars = trainer._train_step(trainer.state, sharded)
    trainer.state = state
    float(jax.device_get(scalars["total_loss"]))

    # synthetic: same device batch over and over
    def synth():
        while True:
            yield sharded

    n = 12
    t_synth, trainer.state = run_n(synth(), n)

    # loader-fed: real mp4 decode through prefetch_to_device
    def fed():
        batches = (b for b in itertools.chain(*itertools.cycle([loaders[0]]))
                   if b.get_batch_size() > 0)
        yield from prefetch_to_device(batches, trainer._shard_batch)

    t_fed, trainer.state = run_n(fed(), n)
    print(json.dumps({
        "exp": "loader_fed_vs_synthetic", "batch": batch_size,
        "ms_synthetic": round(t_synth * 1e3, 2),
        "ms_loader_fed": round(t_fed * 1e3, 2),
        "stall_ratio": round(t_fed / t_synth, 3),
    }), flush=True)


def main():
    import jax

    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "backend": jax.default_backend()}), flush=True)
    for fn in (
        lambda: run_retrieval(32, "retrieval_b32_baseline"),
        lambda: run_retrieval(64, "retrieval_b64"),
        lambda: run_retrieval(128, "retrieval_b128"),
        lambda: run_retrieval(32, "retrieval_b32_ln_bf16", ln_bf16=True),
        lambda: run_pretrain(32),
        lambda: run_cross_mining(16, 4),
        lambda: run_loader_fed(4),
    ):
        try:
            fn()
        except Exception as e:  # keep going; record the failure
            print(json.dumps({"exp_error": type(e).__name__,
                              "msg": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
