import jax
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.models.base_model import build_model
from antmmf_tpu.modules.llm import (
    DecoderLM,
    RMSNorm,
    apply_rope,
    apply_rope_3d,
)
from antmmf_tpu.modules.lora import LoRADense, merge_lora_params

KEY = jax.random.PRNGKey(0)


def test_rope_preserves_norm_and_relativity():
    x = jax.random.normal(KEY, (1, 2, 4, 8))
    pos = jnp.array([[0, 1, 2, 3]])
    out = apply_rope(x, pos)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1),
                               np.linalg.norm(np.asarray(x), axis=-1),
                               rtol=1e-5)
    # relative property: q(p1)·k(p2) depends only on p1-p2
    q = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 1, 8))
    k = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 1, 8))
    def dot_at(pq, pk):
        qr = apply_rope(q, jnp.array([[pq]]))
        kr = apply_rope(k, jnp.array([[pk]]))
        return float(jnp.sum(qr * kr))
    np.testing.assert_allclose(dot_at(3, 1), dot_at(7, 5), rtol=1e-5)


def test_rope_3d_shapes():
    x = jax.random.normal(KEY, (1, 2, 4, 12))
    pos = jnp.zeros((1, 4, 3), jnp.int32).at[:, :, 0].set(jnp.arange(4))
    out = apply_rope_3d(x, pos)
    assert out.shape == x.shape


def test_decoder_lm_causality():
    lm = DecoderLM(num_layers=1, num_heads=2, num_kv_heads=1, dtype=jnp.float32)
    x1 = jax.random.normal(KEY, (1, 5, 16))
    x2 = x1.at[:, 4].set(9.0)
    pos = jnp.arange(5)[None]
    params = lm.init(KEY, x1, pos)
    o1 = lm.apply(params, x1, pos)
    o2 = lm.apply(params, x2, pos)
    np.testing.assert_allclose(np.asarray(o1[:, :4]), np.asarray(o2[:, :4]),
                               atol=1e-5)


def _omni_batch(B=2, with_av=True):
    rng = np.random.default_rng(0)
    b = {"input_ids": rng.integers(0, 1000, (B, 6)).astype(np.int64),
         "input_mask": np.ones((B, 6), np.int64),
         "labels": rng.integers(0, 1000, (B, 6)).astype(np.int64)}
    if with_av:
        b["image_data"] = rng.standard_normal((B, 1, 32, 32, 3)).astype(np.float32)
        b["audio"] = rng.standard_normal((B, 16, 20)).astype(np.float32)
    return b


def test_m2_omni_all_modalities():
    cfg = {"model_attributes": {"m2_omni": {
        "lm_preset": "omni_tiny_test", "vit_preset": "vit_tiny_test",
        "image_size": 32, "audio_hidden": 32, "dtype_str": "float32"}}}
    shell = build_model(cfg)
    b = _omni_batch()
    variables = shell.init(KEY, b)
    out = shell.apply(variables, b)
    assert out["logits"].shape == (2, 6, 1000)
    assert np.isfinite(float(out["losses"]["lm_loss"]))


def test_m2_omni_text_only():
    cfg = {"model_attributes": {"m2_omni": {
        "lm_preset": "omni_tiny_test", "vit_preset": "vit_tiny_test",
        "image_size": 32, "dtype_str": "float32"}}}
    shell = build_model(cfg)
    b = _omni_batch(with_av=False)
    variables = shell.init(KEY, b)
    out = shell.apply(variables, b)
    assert out["logits"].shape == (2, 6, 1000)


def test_pink_lora_only_gradients():
    cfg = {"model_attributes": {"pink": {
        "lm_preset": "omni_tiny_test", "vit_preset": "vit_tiny_test",
        "image_size": 32, "lora_rank": 4, "dtype_str": "float32"}}}
    shell = build_model(cfg)
    b = _omni_batch()
    del b["audio"]
    variables = shell.init(KEY, b)

    def loss(p):
        out = shell.apply({"params": p}, b)
        return out["losses"]["lm_loss"]

    g = jax.grad(loss)(variables["params"])
    # frozen-base adapter: base kernel gradient is exactly zero, lora_b nonzero
    oa = g["output_adapter"]
    assert float(jnp.abs(oa["base"]["kernel"]).sum()) == 0.0
    assert float(jnp.abs(oa["lora_b"]).sum()) > 0.0


def test_lora_merge():
    layer = LoRADense(4, rank=2, alpha=16.0, freeze_base=False,
                      dtype=jnp.float32)
    x = jnp.ones((1, 3))
    params = layer.init(KEY, x)["params"]
    params = jax.tree_util.tree_map(
        lambda a: a + 0.1, params)  # nonzero lora_b
    before = layer.apply({"params": params}, x)
    merged = merge_lora_params(params)
    after = layer.apply({"params": merged}, x)
    np.testing.assert_allclose(np.asarray(before), np.asarray(after), rtol=1e-4)


def test_m2_omni_placeholder_splicing():
    """Interleaved prompt_wrap layout (reference modeling_m2omni.py:695-771):
    <image> placeholder ids inside input_ids are replaced by vision
    embeddings; image content must flow into the logits."""
    rng = np.random.default_rng(0)
    IMG_ID = 999
    # vit_tiny_test at 32px/patch16 → 4 patch tokens per frame, 1 frame
    n_img_tok = 4
    ids = np.array([[5, 7] + [IMG_ID] * n_img_tok + [9, 11]] * 2, np.int64)
    batch = {
        "input_ids": ids,
        "input_mask": np.ones_like(ids),
        "labels": np.where(ids == IMG_ID, -100, ids),
        "image_data": rng.standard_normal((2, 32, 32, 3)).astype(np.float32),
    }
    cfg = {"model_attributes": {"m2_omni": {
        "lm_preset": "omni_tiny_test", "vit_preset": "vit_tiny_test",
        "image_size": 32, "image_token_id": IMG_ID, "dtype_str": "float32"}}}
    shell = build_model(cfg)
    variables = shell.init(KEY, batch)
    out = shell.apply(variables, batch)
    assert out["logits"].shape == (2, ids.shape[1], 1000)  # in-place splice
    assert np.isfinite(float(out["losses"]["lm_loss"]))

    # different image → different logits (vision actually spliced in)
    batch2 = dict(batch)
    batch2["image_data"] = batch["image_data"] + 1.0
    out2 = shell.apply(variables, batch2)
    assert not np.allclose(out["logits"], out2["logits"])
    # but text-only positions before the image are unaffected (causal)
    np.testing.assert_allclose(out["logits"][:, :2], out2["logits"][:, :2],
                               atol=1e-5)


def test_m2_omni_llm_lora():
    """wrap_llm_lora analogue: decoder q/v LoRA params exist when rank>0."""
    cfg = {"model_attributes": {"m2_omni": {
        "lm_preset": "omni_tiny_test", "vit_preset": "vit_tiny_test",
        "image_size": 32, "llm_lora_rank": 4, "dtype_str": "float32"}}}
    shell = build_model(cfg)
    b = _omni_batch(with_av=False)
    variables = shell.init(KEY, b)
    leaves = jax.tree_util.tree_leaves_with_path(variables["params"])
    lora = [p for p, _ in leaves if "lora" in str(p).lower()]
    assert lora, "expected LoRA params in the decoder"


def test_m2omni_rope1d_ablation_attr():
    """rope_3d=False (the MFU-attribution ablation) runs the spliced
    forward with 1D rotary over the temporal channel and changes logits
    vs the 3D default (same params)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from antmmf_tpu.models.m2_omni import M2Omni

    kw = dict(lm_preset="omni_tiny_test", vit_preset="vit_tiny_test",
              image_size=32, image_token_id=999, dtype_str="float32")
    m3 = M2Omni(**kw)
    m1 = M2Omni(rope_3d=False, **kw)
    rng = np.random.default_rng(0)
    ids = np.concatenate([np.full((2, 4), 999), rng.integers(4, 900, (2, 8))],
                         axis=1).astype(np.int32)
    batch = {"input_ids": ids, "input_mask": np.ones_like(ids),
             "image_data": rng.standard_normal((2, 1, 32, 32, 3)).astype(
                 np.float32)}
    variables = m3.init(jax.random.PRNGKey(0), batch)
    out3 = m3.apply(variables, batch)["logits"]
    out1 = m1.apply(variables, batch)["logits"]
    assert np.isfinite(np.asarray(out1)).all()
    assert not np.allclose(np.asarray(out3), np.asarray(out1))
