import jax
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.models.base_model import build_model
from antmmf_tpu.predictors.export import export_serving_fn, load_serving_fn


def test_stablehlo_export_roundtrip(tmp_path):
    cfg = {"model_attributes": {"univl_retrieval": {
        "vit_preset": "vit_tiny_test", "bert_preset": "bert_tiny_test",
        "image_size": 32, "embed_dim": 16, "dtype_str": "float32"}}}
    shell = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "image_data": rng.standard_normal((1, 2, 32, 32, 3)).astype(np.float32),
        "video_mask": np.ones((1, 2), np.int64),
        "caption_input_ids": rng.integers(0, 30522, (1, 8)).astype(np.int64),
        "caption_input_mask": np.ones((1, 8), np.int64),
        "caption_segment_ids": np.zeros((1, 8), np.int64),
    }
    variables = shell.init(jax.random.PRNGKey(0), batch)

    def serve(v, b):
        out = shell.apply(v, b, deterministic=True)
        return {"text_embed": out["text_embed"], "sim": out["sim"]}

    path = str(tmp_path / "model.stablehlo")
    exported = export_serving_fn(serve, variables, batch, path)
    direct = serve(variables, {k: jnp.asarray(v) for k, v in batch.items()})

    loaded = load_serving_fn(path)
    roundtrip = loaded({k: jnp.asarray(v) for k, v in batch.items()})
    np.testing.assert_allclose(np.asarray(roundtrip["text_embed"]),
                               np.asarray(direct["text_embed"]), atol=1e-6)


def test_decode_program_export_roundtrip(tmp_path):
    """Prefill + decode_step export as StableHLO with WEIGHTS AS ARGUMENTS
    (a parameter tree baked into the HLO is unusable at 1-7B scale, and
    argument weights let one program serve fp/int8/int4 trees). The
    reference has no decode export at all — serving is Python-side HF
    generate (prj/Pink/pink/eval/model_vqav2.py:141)."""
    from jax import export as jexport

    from antmmf_tpu.models.pink import PinkModel
    from antmmf_tpu.modules.llm import init_decoder_cache
    from antmmf_tpu.predictors.export import export_decode_programs

    model = PinkModel(lm_preset="omni_tiny_test", vit_preset="vit_tiny_test",
                      image_size=32, lora_rank=2, dtype_str="float32")
    rng = jax.random.PRNGKey(0)
    B, Lp, new = 2, 6, 3
    batch = {
        "input_ids": jnp.tile(jnp.arange(5, 5 + Lp, dtype=jnp.int32)[None],
                              (B, 1)),
        "input_mask": jnp.ones((B, Lp), jnp.int32),
        "image_data": jax.random.normal(rng, (B, 32, 32, 3)),
    }
    variables = model.init(rng, batch)
    lens = np.full((B,), Lp, np.int32)
    Lv = (32 // 16) ** 2 + 1  # vit_tiny_test patch tokens + cls

    def fresh_cache():
        return init_decoder_cache(2, B, 1, Lv + Lp + new, 32, jnp.float32)

    prefix = str(tmp_path / "pink_decode")
    export_decode_programs(model, variables, batch, fresh_cache(), lens,
                           dtype=jnp.float32, out_prefix=prefix)

    with open(prefix + ".prefill.shlo", "rb") as f:
        prefill = jexport.deserialize(f.read()).call
    with open(prefix + ".decode.shlo", "rb") as f:
        decode = jexport.deserialize(f.read()).call

    # direct reference path
    logits_d, cache_d = model.apply(variables, batch, fresh_cache(),
                                    jnp.asarray(lens),
                                    method=PinkModel.prefill)
    logits_e, cache_e = prefill(variables, batch, fresh_cache(),
                                jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(logits_e), np.asarray(logits_d),
                               atol=2e-5, rtol=2e-5)

    tok_d = jnp.argmax(logits_d, -1).astype(jnp.int32)
    pos = jnp.asarray(Lv + lens, jnp.int32)
    for step in range(2):
        logits_d, cache_d = model.apply(variables, tok_d, pos + step, cache_d,
                                        method=PinkModel.decode_step)
        logits_e, cache_e = decode(variables, tok_d, pos + step, cache_e)
        np.testing.assert_allclose(np.asarray(logits_e),
                                   np.asarray(logits_d),
                                   atol=2e-5, rtol=2e-5)
        tok_d = jnp.argmax(logits_d, -1).astype(jnp.int32)

    # the same exported program serves an int4-packed tree of the same
    # structure (records export the dequant/routing graph)
    from antmmf_tpu.predictors.quantization import quantize_for_decode

    q4 = quantize_for_decode(variables, min_size=256, bits=4, group=32)
    exported_q4 = export_decode_programs(model, q4, batch, fresh_cache(),
                                         lens, dtype=jnp.float32)
    lq, _ = exported_q4["prefill"].call(q4, batch, fresh_cache(),
                                        jnp.asarray(lens))
    assert np.isfinite(np.asarray(lq)).all()
