"""M2-Encoder MoE train step on the real chip: tokens/s + drop telemetry.

The EP/MoE path (GShard top-2 gating + capacity + expert all-to-all,
reference prj/M2_Encoder/vlmo/torchscale/component/xmoe/moe_layer.py:121-290)
was CPU-mesh-tested in round 2 but never measured on hardware. This bench
runs a single-chip m2_encoder config with token-routed MoE blocks (experts
colocated — the all-to-all degenerates to local dispatch, which is exactly
the per-chip compute a pod-scale EP run performs between collectives) and
reports step time, routed tokens/s, and ``frac_tokens_dropped`` (capacity
overflow) vs the dense equivalent.

One JSON line per measurement.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python -m antmmf_tpu.scripts.bench_moe [--tiny]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from antmmf_tpu.scripts.bench_r2_experiments import make_batch


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--experts", type=int, default=8)
    p.add_argument("--capacity_factor", type=float, default=1.25)
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from antmmf_tpu.models.base_model import build_model
    from antmmf_tpu.trainers.train_state import TrainState

    preset = "m2_tiny_test" if args.tiny else "m2_encoder_0b4"
    n_layers = 2 if args.tiny else 12
    moe_layers = [1] if args.tiny else [3, 7, 11]
    B = 4 if args.tiny else args.batch
    S = 32 if args.tiny else 224
    L = 16 if args.tiny else 52

    host = make_batch(B, 1, S, text_len=L)
    batch = {"image": host["image_data"][:, 0],
             "input_ids": host["caption_input_ids"],
             "input_mask": host["caption_input_mask"]}

    def run(tag, moe, dispatch_mode="scatter"):
        config = {"model_attributes": {"m2_encoder": {
            "preset": preset, "image_size": S, "patch_size": 16,
            "vocab_size": 30522, "embed_dim_out": 64 if args.tiny else 512,
            "moe_layers": moe_layers if moe else [],
            "moe_num_experts": args.experts,
            "moe_capacity_factor": args.capacity_factor,
            "moe_dispatch_mode": dispatch_mode,
            "dtype_str": "float32" if args.tiny else "bfloat16",
        }}}
        shell = build_model(config)
        variables = shell.init(jax.random.PRNGKey(0), batch)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(
            variables["params"]))
        tx = optax.adamw(1e-4)
        state = TrainState.create(variables, tx, jax.random.PRNGKey(1))

        @jax.jit
        def step(state, batch):
            def loss(params):
                # train-mode routing: capacity_factor 1.25 (not the 2.0
                # eval capacity) so frac_tokens_dropped is the real
                # training drop rate
                total, (out, scalars) = shell.loss_fn(
                    {**state.variables, "params": params}, batch,
                    rngs={"dropout": state.rng}, deterministic=False)
                return total, scalars

            (l, scalars), grads = jax.value_and_grad(
                loss, has_aux=True)(state.params)
            state = state.apply_gradients(grads, tx)
            return state, l, scalars

        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        # XLA-counted step FLOPs: MoE at top-2/capacity-1.25 does ~2.5x the
        # MLP FLOPs of the dense leg in each converted layer (dispatched
        # buffer = E*C = 2.5*T slots) — the flop-normalized ratio below
        # separates "paying for extra compute" from "paying for dispatch"
        flops = None
        try:
            cost = step.lower(state, jb).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0)) or None
        except Exception:
            pass
        for _ in range(3):
            state, l, scalars = step(state, jb)
        float(l)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, l, scalars = step(state, jb)
        float(l)
        dt = (time.perf_counter() - t0) / args.steps
        host_scalars = {k: float(v) for k, v in
                        jax.device_get(scalars).items()}
        # routed tokens per step: text+image tokens through each moe layer
        tokens = B * ((S // 16) ** 2 + L)
        row = {"exp": f"moe_{tag}",
               "dispatch": dispatch_mode if moe else None,
               "params_m": round(n_params / 1e6, 1),
               "step_ms": round(dt * 1e3, 2),
               "samples_per_sec": round(B / dt, 1),
               "routed_tokens_per_sec": round(
                   tokens * len(moe_layers) / dt, 0) if moe else 0}
        if flops:
            row["step_tflops"] = round(flops / 1e12, 4)
        fd = host_scalars.get("metrics/frac_tokens_dropped")
        if fd is not None:
            row["frac_tokens_dropped"] = round(fd, 4)
        print(json.dumps(row), flush=True)
        return dt, flops

    print(json.dumps({"backend": __import__("jax").default_backend(),
                      "experts": args.experts,
                      "capacity_factor": args.capacity_factor}), flush=True)
    dt_dense, fl_dense = run("dense", False)
    dt_sc, fl_sc = run(f"top2_e{args.experts}_scatter", True, "scatter")
    dt_ei, fl_ei = run(f"top2_e{args.experts}_einsum", True, "einsum")
    row = {"exp": "moe_overhead_vs_dense",
           "scatter_ratio": round(dt_sc / dt_dense, 3),
           "einsum_ratio": round(dt_ei / dt_dense, 3),
           "scatter_speedup": round(dt_ei / dt_sc, 3)}
    if fl_dense and fl_sc:
        # time-ratio / flop-ratio: 1.0 == every extra ms is paid-for FLOPs
        # (dispatch itself is free); >1 == dispatch/memory overhead beyond
        # the extra expert compute
        flop_ratio = fl_sc / fl_dense
        row["scatter_flop_ratio"] = round(flop_ratio, 3)
        row["scatter_overhead_beyond_flops"] = round(
            (dt_sc / dt_dense) / flop_ratio, 3)
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
