"""Tensor-parallel serving (parallel/tp_serving.py): Megatron-style weight
sharding over the mesh ``model`` axis must leave the KV-cache decode math
unchanged — the reference can only serve per-GPU (HF generate,
prj/Pink/pink/eval/model_vqav2.py:141); here a 7B decoder spreads its
weights (and the per-decode-step HBM read) across chips with zero model-code
changes, via GSPMD propagation from the sharded variables.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from antmmf_tpu.models.m2_omni import LM_PRESETS
from antmmf_tpu.models.pink import PinkModel
from antmmf_tpu.modules.llm import init_decoder_cache
from antmmf_tpu.parallel.tp_serving import (
    LLM_TP_RULES,
    serving_shardings,
    shard_variables_for_serving,
    tp_serving_mesh,
)


@pytest.fixture(scope="module")
def pink_tp():
    model = PinkModel(lm_preset="omni_tiny_test", vit_preset="vit_tiny_test",
                      image_size=32, lora_rank=2, dtype_str="float32")
    rng = jax.random.PRNGKey(3)
    batch = {
        "input_ids": jnp.array([[5, 6, 7, 8, 0, 0], [9, 10, 11, 12, 13, 14]],
                               jnp.int32),
        "input_mask": jnp.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]],
                                jnp.int32),
        "image_data": jax.random.normal(rng, (2, 32, 32, 3)),
    }
    variables = model.init(rng, batch)
    return model, variables, batch


def test_tp_rules_shard_the_decoder(pink_tp):
    """q/k/v/gate/up split on output features, o/down on input features,
    lm_head on vocab; norms/embeddings/vision tower replicate."""
    model, variables, _ = pink_tp
    mesh = tp_serving_mesh(n_model=2, devices=jax.devices()[:2])
    sh = serving_shardings(variables, mesh)

    flat = jax.tree_util.tree_flatten_with_path(sh)[0]

    def spec_of(suffix):
        hits = [s.spec for path, s in flat
                if "/".join(str(getattr(p, "key", p)) for p in path)
                .endswith(suffix)]
        assert hits, suffix
        return hits[0]

    assert tuple(spec_of("q_proj/kernel")) == (None, "model")
    assert tuple(spec_of("o_proj/kernel")) == ("model", None)
    assert tuple(spec_of("gate_proj/kernel")) == (None, "model")
    assert tuple(spec_of("down_proj/kernel")) == ("model", None)
    assert tuple(spec_of("lm_head/kernel")) == (None, "model")
    # the ViT tower's encoder blocks split too (same Megatron pattern,
    # encoder naming)
    assert tuple(spec_of("out_proj/kernel")) == ("model", None)
    assert tuple(spec_of("fc1/kernel")) == (None, "model")
    assert tuple(spec_of("fc2/kernel")) == ("model", None)
    # replicated leaves: no 'model' anywhere
    for suffix in ("token_embed/embedding", "vision_proj/base/kernel"):
        assert "model" not in tuple(spec_of(suffix))


def test_tp_decode_logits_match_single_device(pink_tp):
    """Prefill + teacher-forced decode under 2-way TP must reproduce the
    single-device logits (psum reassociation only — atol covers fp32
    reduction-order noise; token-level greedy equality is NOT asserted for
    the same near-tie reason as the kv_int8 test)."""
    model, variables, batch = pink_tp
    preset = LM_PRESETS[model.lm_preset]
    lens = jnp.asarray(batch["input_mask"]).sum(-1).astype(jnp.int32)
    B = 2
    Lv = model.num_vision_tokens(batch)
    T = Lv + batch["input_ids"].shape[1] + 4
    n_kv = preset["num_kv_heads"] or preset["num_heads"]

    def run(vs):
        cache = init_decoder_cache(
            preset["num_layers"], B, n_kv, T,
            preset["hidden"] // preset["num_heads"], jnp.float32)
        logits, cache = model.apply(vs, batch, cache, lens,
                                    method=PinkModel.prefill)
        out = [logits]
        pos = Lv + lens
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        for _ in range(3):
            logits, cache = model.apply(vs, tok, pos, cache,
                                        method=PinkModel.decode_step)
            out.append(logits)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            pos = pos + 1
        return np.asarray(jnp.stack(out))

    want = run(variables)
    mesh = tp_serving_mesh(n_model=2, devices=jax.devices()[:2])
    sharded = shard_variables_for_serving(variables, mesh)
    got = run(sharded)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_tp_generate_runs_end_to_end(pink_tp):
    """The memoized cached-generate jit accepts TP-sharded variables as-is
    (weights enter as arguments, so GSPMD re-lowers the same program SPMD):
    full greedy + speculative legs produce valid shapes and preserve the
    prompt."""
    model, variables, batch = pink_tp
    mesh = tp_serving_mesh(n_model=2, devices=jax.devices()[:2])
    sharded = shard_variables_for_serving(variables, mesh)
    toks, lens = model.generate(sharded, batch, eos_id=1, max_length=4)
    Lp = batch["input_ids"].shape[1]
    assert toks.shape == (2, Lp + 4)
    # each row's prompt (first lens[b] slots — generations are written
    # AFTER the prompt, inside the padding for short rows) is preserved
    toks_np, lens_np = np.asarray(toks), np.asarray(lens)
    ids_np = np.asarray(batch["input_ids"])
    for b in range(2):
        np.testing.assert_array_equal(toks_np[b, :lens_np[b]],
                                      ids_np[b, :lens_np[b]])
    spec, _ = model.generate(sharded, batch, eos_id=1, max_length=4,
                             speculative=2)
    assert spec.shape == toks.shape


def test_tp_serving_mesh_shapes():
    mesh = tp_serving_mesh(n_model=4)
    assert mesh.shape["model"] == 4
    assert mesh.shape["data"] == len(jax.devices()) // 4
    with pytest.raises(ValueError):
        tp_serving_mesh(n_model=3)


def test_generation_predictor_tensor_parallel():
    """`predictor_parameters.tensor_parallel: N` TP-shards the loaded
    variables; predict() serves through the same generate surface."""
    import antmmf_tpu.predictors  # noqa: F401
    from antmmf_tpu.common.registry import registry

    cls = registry.get_predictor_class("generation_predictor")
    pred = cls({
        "model_attributes": {"pink": {
            "lm_preset": "omni_tiny_test", "vit_preset": "vit_tiny_test",
            "image_size": 32, "lora_rank": 2, "dtype_str": "float32"}},
        "predictor_parameters": {"max_new_tokens": 4, "max_prompt_len": 12,
                                 "tensor_parallel": 2}})
    pred.load(with_ckpt=False)
    flat = jax.tree_util.tree_flatten_with_path(pred.variables)[0]
    q = [l for p, l in flat
         if "/".join(str(getattr(x, "key", x)) for x in p)
         .endswith("decoder/layer_0/attention/q_proj/kernel")]
    assert q and "model" in tuple(q[0].sharding.spec)
    out = pred.predict({"text": "what is in the image?",
                        "image": np.zeros((32, 32, 3), np.float32)})
    assert "generated_text" in out and isinstance(out["generated_text"], str)


def test_tp_continuous_batching_engine(pink_tp):
    """The serving engine's prefill/admit/step jits take ``variables`` as
    arguments, so TP-sharded weights drop straight in — continuous batching
    and tensor parallel compose."""
    from antmmf_tpu.predictors.serving_engine import (
        ContinuousBatchingEngine,
        PinkAdapter,
    )

    model, variables, batch = pink_tp
    mesh = tp_serving_mesh(n_model=2, devices=jax.devices()[:2])
    sharded = shard_variables_for_serving(variables, mesh)
    ad = PinkAdapter(model, sharded, max_prompt_len=6, max_new_tokens=3,
                     has_image=True)
    eng = ContinuousBatchingEngine(ad, slots=2, max_new_tokens=3, eos_id=1,
                                   step_tokens=1)
    reqs = [(f"r{i}", {
        "input_ids": np.asarray(batch["input_ids"][i % 2], np.int32),
        "input_mask": np.asarray(batch["input_mask"][i % 2], np.int32),
        "image_data": np.asarray(batch["image_data"][i % 2], np.float32),
    }) for i in range(3)]
    result = eng.run(reqs)
    assert set(result["outputs"]) == {"r0", "r1", "r2"}
    for toks in result["outputs"].values():
        assert 1 <= len(toks) <= 3


def test_tp_relaxes_non_divisible():
    """A matched dim whose size doesn't divide the model axis relaxes to
    replication instead of failing (same rules serve any preset/mesh —
    e.g. GQA n_kv features smaller than an 8-way axis)."""
    fake = {"params": {"blk": {"q_proj": {"kernel": np.zeros((4, 6))}}}}
    mesh = tp_serving_mesh(n_model=8)
    sh = serving_shardings(fake, mesh)
    assert "model" not in tuple(sh["params"]["blk"]["q_proj"]["kernel"].spec)
