"""Int8 serving quantization: round-trip accuracy, size, ranking stability
(beyond-reference serving feature; predictors/quantization.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.predictors.quantization import (
    dequantize_params,
    load_quantized,
    quantize_params,
    save_quantized,
)


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    params = {"dense": {"kernel": rng.standard_normal(
        (256, 64)).astype(np.float32), "bias": np.zeros(64, np.float32)},
        "norm": {"scale": np.ones(64, np.float32)}}
    q, stats = quantize_params(params, min_size=1024)
    assert stats["quantized"] == 1  # only the kernel
    assert stats["bytes_after"] < stats["bytes_before"] / 3
    back = dequantize_params(q)
    w = params["dense"]["kernel"]
    err = np.abs(back["dense"]["kernel"] - w)
    # per-channel bound: scale/2 = max|w_col| / 254
    bound = np.abs(w).max(axis=0) / 254 + 1e-6
    assert (err <= bound[None, :]).all()
    np.testing.assert_array_equal(back["dense"]["bias"],
                                  params["dense"]["bias"])


def test_int4_pack_dequant_roundtrip_error_bound():
    """Group-int4: nibble pack/unpack is exact on the quantized grid and
    the dequantized weight is within scale/2 per element (scale = group
    max-abs / 7)."""
    from antmmf_tpu.predictors.quantization import (
        dequantize_for_compute, quantize_for_decode)

    rng = np.random.default_rng(1)
    w = rng.standard_normal((256, 48)).astype(np.float32)
    tree = {"proj": {"kernel": w}}
    q4 = quantize_for_decode(tree, min_size=1024, bits=4, group=64)
    rec = q4["proj"]["kernel"]
    assert set(rec) == {"q4", "scale"}
    assert rec["q4"].shape == (128, 48) and rec["q4"].dtype == np.uint8
    assert rec["scale"].shape == (4, 48)
    back = np.asarray(dequantize_for_compute(q4, jnp.float32)
                      ["proj"]["kernel"])
    bound = np.repeat(np.asarray(rec["scale"]), 64, axis=0) / 2 + 1e-6
    assert (np.abs(back - w) <= bound).all()


def test_int4_non_divisible_falls_back_to_int8():
    from antmmf_tpu.predictors.quantization import (
        dequantize_for_compute, quantize_for_decode)

    rng = np.random.default_rng(2)
    w = rng.standard_normal((100, 48)).astype(np.float32)  # 100 % 128 != 0
    q = quantize_for_decode({"k": w}, min_size=1024, bits=4)
    assert set(q["k"]) == {"q", "scale"}  # int8 record
    back = np.asarray(dequantize_for_compute(q, jnp.float32)["k"])
    assert np.abs(back - w).max() <= np.abs(w).max() / 254 + 1e-6


def test_quantized_retrieval_rankings_stable(tmp_path):
    """The flagship retrieval model keeps identical t2v/v2t rankings after
    int8 weight round-trip on the fixture batch."""
    from antmmf_tpu.models.univl import UnivlForVideoTextRetrieval

    kw = dict(vit_preset="vit_tiny_test", bert_preset="bert_tiny_test",
              image_size=32, embed_dim=32, dtype_str="float32")
    model = UnivlForVideoTextRetrieval(**kw)
    rng = np.random.default_rng(0)
    B, F, L = 4, 2, 12
    batch = {
        "image_data": rng.standard_normal((B, F, 32, 32, 3)).astype(np.float32),
        "video_mask": np.ones((B, F), np.int64),
        "caption_input_ids": rng.integers(0, 30522, (B, L)).astype(np.int64),
        "caption_input_mask": np.ones((B, L), np.int64),
        "caption_segment_ids": np.zeros((B, L), np.int64),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)
    ref = np.asarray(model.apply(variables, batch)["l1_simi"])

    path = str(tmp_path / "weights_int8.pkl")
    stats = save_quantized(variables, path, min_size=512)
    assert stats["quantized"] > 10
    restored = load_quantized(path)
    out = np.asarray(model.apply(restored, batch)["l1_simi"])
    # rankings identical, sims close
    np.testing.assert_array_equal(np.argsort(-ref, 1), np.argsort(-out, 1))
    # sims are temperature-scaled (×e^2.66≈14): 0.1 absolute ≈ 0.7% relative
    assert np.abs(ref - out).max() < 0.1
    assert stats["bytes_after"] < stats["bytes_before"]
