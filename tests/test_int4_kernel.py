"""Group-int4 decode path: Pallas GEMV (interpret mode), QuantDense
drop-in equivalence, and make_live_vars' sibling routing.

The serving contract under test: ``quantize_for_decode(bits=4)`` packs
decoder projection kernels as global top/bottom-half nibbles;
``make_live_vars`` routes those records to ``kernel_q4``/``kernel_scale``
siblings consumed by QuantDense (modules/qdense.py), whose TPU decode path
is the Pallas GEMV in ops/pallas/int4_matmul.py (reads 4-bit weights from
HBM, unpacks on the VPU between the load and the MXU feed). Reference
role: serving-efficiency counterpart of prj/M2_omni's fp16 HF serving.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from antmmf_tpu.ops.pallas.int4_matmul import (
    _pick_tiles, gemv_eligible, int4_gemv, pack_int4, unpack_int4)
from antmmf_tpu.predictors.quantization import (
    _route_q4_siblings, dequantize_for_compute, make_live_vars,
    quantize_for_decode)


@pytest.mark.parametrize("fin,fout,group", [
    (2048, 512, 128), (2048, 2048, 128), (4096, 1024, 128),
    (2048, 2560, 64),
])
def test_int4_gemv_matches_unpack_matmul(fin, fout, group):
    """Interpret-mode GEMV == XLA unpack matmul within bf16 rounding
    (the kernel feeds bf16 sub-blocks to the MXU; the reference path
    materializes the same bf16 weights)."""
    rng = np.random.default_rng(0)
    w = rng.normal(size=(fin, fout)).astype(np.float32)
    packed, scale = pack_int4(w, group=group)
    assert packed.dtype == np.uint8 and packed.shape == (fin // 2, fout)
    assert scale.shape == (fin // group, fout)
    x = rng.normal(size=(3, fin)).astype(np.float32)
    ref = np.asarray(
        x @ np.asarray(unpack_int4(jnp.asarray(packed), jnp.asarray(scale),
                                   jnp.float32)))
    y = np.asarray(int4_gemv(jnp.asarray(x), jnp.asarray(packed),
                             jnp.asarray(scale), interpret=True))
    rel = np.abs(y - ref).max() / (np.abs(ref).std() + 1e-9)
    assert rel < 2.5e-2, rel


def test_pack_int4_grid_is_exact():
    """Values already on the int4 grid round-trip exactly."""
    rng = np.random.default_rng(1)
    scale0 = rng.uniform(0.5, 2.0, size=(2, 64)).astype(np.float32)
    q = rng.integers(-7, 8, size=(256, 64)).astype(np.float32)
    w = (q.reshape(2, 128, 64) * scale0[:, None]).reshape(256, 64)
    packed, scale = pack_int4(w, group=128)
    back = np.asarray(unpack_int4(jnp.asarray(packed), jnp.asarray(scale),
                                  jnp.float32))
    np.testing.assert_allclose(back, w, rtol=0, atol=1e-5)


def test_pick_tiles_and_eligibility():
    assert _pick_tiles(2048, 2048, 128) == (1024, 512)
    assert _pick_tiles(5504, 2048, 128) is None  # half % group != 0
    assert gemv_eligible(1, 2048, 2048, 128)
    assert not gemv_eligible(64, 2048, 2048, 128)  # prefill-sized


def test_quantdense_is_dense_drop_in():
    """Same param name/shape/values as nn.Dense(use_bias=False) under the
    same rng — checkpoints, importers, and sharding rules are unchanged."""
    import flax.linen as nn

    from antmmf_tpu.modules.qdense import QuantDense

    x = jnp.ones((2, 64))
    qd = QuantDense(32, dtype=jnp.float32)
    dd = nn.Dense(32, use_bias=False, dtype=jnp.float32,
                  param_dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    vq = qd.init(key, x)
    vd = dd.init(key, x)
    assert set(vq["params"]) == set(vd["params"]) == {"kernel"}
    np.testing.assert_array_equal(np.asarray(vq["params"]["kernel"]),
                                  np.asarray(vd["params"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(qd.apply(vq, x)),
                                  np.asarray(dd.apply(vd, x)))


def _decoder_tree():
    # nested under a wrapper so the "decoder" scope appears in the params
    # tree, exactly like PinkModel/M2Omni (self.decoder) and bench_decode —
    # the sibling router keys on that ancestor
    import flax.linen as nn

    from antmmf_tpu.modules.llm import DecoderLM

    class Wrapper(nn.Module):
        @nn.compact
        def __call__(self, emb, pos):
            return DecoderLM(num_layers=1, num_heads=4,
                             dtype=jnp.bfloat16, name="decoder")(emb, pos)

    model = Wrapper()
    emb = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 8, 256)), jnp.bfloat16)
    pos = jnp.tile(jnp.arange(8)[None], (2, 1))
    variables = model.init(jax.random.PRNGKey(0), emb, pos)
    return model, variables, emb, pos


def test_sibling_routing_targets_decoder_projections_only():
    _, variables, _, _ = _decoder_tree()
    q4 = quantize_for_decode(variables, min_size=256, bits=4, group=64)
    routed = _route_q4_siblings(q4)
    attn = routed["params"]["decoder"]["layer_0"]["attention"]
    for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
        assert set(attn[proj]) == {"kernel_q4", "kernel_scale"}, proj
    # a vision-style tree (same module names, no decoder ancestor) is
    # untouched — its nn.Dense modules still need "kernel"
    vis = {"params": {"vision_tower": {"layer_0": {"attention": {
        "q_proj": q4["params"]["decoder"]["layer_0"]["attention"]
        ["q_proj"]}}}}}
    routed_vis = _route_q4_siblings(vis)
    assert set(routed_vis["params"]["vision_tower"]["layer_0"]["attention"]
               ["q_proj"]) == {"kernel"}


def test_live_vars_int4_apply_matches_dequantized_tree():
    """The routed QuantDense fallback (CPU) computes the same bf16 weights
    as dequantize_for_compute — logits are exact."""
    model, variables, emb, pos = _decoder_tree()
    q4 = quantize_for_decode(variables, min_size=256, bits=4, group=64)
    live = make_live_vars(q4, jnp.bfloat16)
    out_live = model.apply(live(), emb, pos)
    out_ref = model.apply(dequantize_for_compute(q4, jnp.bfloat16), emb, pos)
    np.testing.assert_array_equal(np.asarray(out_live, np.float32),
                                  np.asarray(out_ref, np.float32))


def test_row_padded_packing_for_unservable_fin():
    """A 5504-row down_proj (no legal GEMV tiling: 2752 has no group that
    is a multiple of 8 with aligned tiles) zero-pads to 5632 (+2.3%) at
    quantize time; int4_apply pads activations to match and the pad rows
    contribute nothing."""
    from antmmf_tpu.ops.pallas.int4_matmul import (
        _pick_tiles, int4_apply, pad_rows_for_kernel, unpack_int4)

    assert pad_rows_for_kernel(5504, 256, 128) == 5632
    assert _pick_tiles(5632, 256, 88) is not None

    rng = np.random.default_rng(3)
    w = (rng.normal(size=(5504, 256)) * 0.02).astype(np.float32)
    tree = {"decoder": {"layer_0": {"mlp": {"down_proj": {
        "kernel": w}}}}}
    q4 = quantize_for_decode(tree, min_size=1024, bits=4)
    rec = q4["decoder"]["layer_0"]["mlp"]["down_proj"]["kernel"]
    assert rec["q4"].shape == (2816, 256)       # 5632 / 2 packed rows
    assert rec["scale"].shape == (64, 256)      # group 88

    x = jnp.asarray(rng.normal(size=(2, 5504)), jnp.float32)
    y = np.asarray(int4_apply(x, jnp.asarray(rec["q4"]),
                              jnp.asarray(rec["scale"]), jnp.float32))
    w_back = np.asarray(unpack_int4(jnp.asarray(rec["q4"]),
                                    jnp.asarray(rec["scale"]),
                                    jnp.float32))
    assert np.abs(w_back[5504:]).max() == 0.0   # pad rows are exact zeros
    ref = np.asarray(x) @ w_back[:5504]
    np.testing.assert_allclose(y, ref, atol=1e-4, rtol=1e-4)
    # quantization itself is faithful on the unpadded rows
    err = np.abs(w_back[:5504] - w).max()
    assert err < 0.02 * 8 / 7  # <= scale/2 bound at these magnitudes
