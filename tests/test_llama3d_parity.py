"""Full-decoder LLaMA-3D parity + composite LLM checkpoint importers.

Reference: /root/reference/prj/M2_omni/models/modeling_llama_3d.py
(Llama3dForCausalLM — HF-LLaMA with 3D mrope, default sections [16, 24, 24]
for head_dim 128). The torch model runs in-process at a tiny config with
head_dim 128 (the hardcoded mrope default requires it); weights import via
``llama_3d_state_dict_to_params`` into our DecoderLM substrate; logits must
match ≤ 1e-3 on MIXED text+vision position streams.

Composite archs: ``m2_omni_state_dict_to_params`` (language_model +
vision_model Qwen2-ViT + audio_model SANM + linear_proj MLPs) and
``pink_state_dict_to_params`` (LLaMA + serial adapters + CLIP tower +
mm_projector) must cover our models' param trees leaf-for-leaf.
"""

import importlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import flax.linen as nn  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from reference_compat import load_m2omni_models, reference_available  # noqa: E402

from antmmf_tpu.modules.llm import DecoderLM  # noqa: E402
from antmmf_tpu.utils.torch_import import (  # noqa: E402
    llama_3d_state_dict_to_params, m2_omni_state_dict_to_params)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")

# head_dim MUST be 128: apply_rotary_pos_emb hardcodes mrope_section
# [16, 24, 24] (modeling_llama_3d.py:197)
HIDDEN, HEADS, KV, LAYERS, VOCAB = 256, 2, 1, 2, 500


class OursForCausalLM(nn.Module):
    """token_embed + DecoderLM + lm_head with the importer's naming."""

    @nn.compact
    def __call__(self, ids, positions, mask):
        emb = nn.Embed(VOCAB, HIDDEN, dtype=jnp.float32,
                       param_dtype=jnp.float32, name="token_embed")(ids)
        h = DecoderLM(num_layers=LAYERS, num_heads=HEADS, num_kv_heads=KV,
                      rope_3d=True, dtype=jnp.float32, name="decoder")(
                          emb, positions, mask)
        return nn.Dense(VOCAB, use_bias=False, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="lm_head")(h)


@pytest.fixture(scope="module")
def ref_model():
    load_m2omni_models()
    cfgmod = importlib.import_module(
        "ref_m2omni_models.configuration_llama_3d")
    m = importlib.import_module("ref_m2omni_models.modeling_llama_3d")
    # the reference's BC path passes rope_kwargs the installed transformers
    # no longer accepts — substitute the equivalent default-rope init
    def _default_rope(config=None, device=None, seq_len=None, **kw):
        dim = kw.get("dim")
        base = kw.get("base", 10000.0)
        if dim is None and config is not None:
            dim = config.hidden_size // config.num_attention_heads
            base = config.rope_theta
        inv = 1.0 / (base ** (torch.arange(0, dim, 2).float() / dim))
        return inv, 1.0

    m.ROPE_INIT_FUNCTIONS = dict(m.ROPE_INIT_FUNCTIONS)
    m.ROPE_INIT_FUNCTIONS["default"] = _default_rope

    cfg = cfgmod.Llama3dConfig(
        hidden_size=HIDDEN, intermediate_size=int(HIDDEN * 2.6875),
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=KV, vocab_size=VOCAB, rms_norm_eps=1e-6,
        max_position_embeddings=512, tie_word_embeddings=False,
        attention_bias=False, attention_dropout=0.0,
        _attn_implementation="eager")
    torch.manual_seed(0)
    ref = m.Llama3dForCausalLM(cfg)
    ref.eval()
    return ref


def test_full_decoder_logits_parity_mixed_positions(ref_model):
    B, L = 2, 10
    rng = np.random.default_rng(0)
    ids = rng.integers(3, VOCAB, (B, L))
    mask = np.ones((B, L), np.int64)
    mask[0, 8:] = 0
    # mixed position streams: slots 2..5 carry a fake 1x2x2 vision grid
    pos = np.zeros((3, B, L), np.int64)
    for b in range(B):
        base = 0
        t = []
        for i in range(L):
            if 2 <= i < 6:
                g = i - 2
                t.append((2, 2 + g // 2, 2 + g % 2))
            else:
                t.append((base, base, base))
            base += 1
        pos[:, b, :] = np.array(t).T

    with torch.no_grad():
        want = ref_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            position_ids=torch.tensor(pos)).logits.numpy()

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = llama_3d_state_dict_to_params(sd)
    ours = OursForCausalLM()
    got = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32),
        jnp.asarray(np.transpose(pos, (1, 2, 0)), jnp.int32),
        jnp.asarray(mask, jnp.int32)), np.float32)

    np.testing.assert_allclose(got[0, :8], want[0, :8], atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(got[1], want[1], atol=1e-3, rtol=1e-3)


def test_tied_embeddings_fall_back_to_embed(ref_model):
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    sd.pop("lm_head.weight")
    params = llama_3d_state_dict_to_params(sd)
    np.testing.assert_array_equal(
        params["lm_head"]["kernel"],
        np.asarray(sd["model.embed_tokens.weight"]).T)


def _tree_paths(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_tree_paths(v, path))
        else:
            out[path] = tuple(np.shape(v))
    return out


def test_m2omni_composite_importer_covers_model_tree(ref_model):
    """Synthetic Bailing2-shaped state dict (language_model + Qwen2-ViT +
    SANM + projs) → our M2Omni(qwen2+sanm) param tree, leaf-for-leaf."""
    from test_sanm_parity import TorchSANMEncoder, IN as SANM_IN, OUT as SANM_OUT
    from antmmf_tpu.models.m2_omni import M2Omni

    load_m2omni_models()
    qv = importlib.import_module("ref_m2omni_models.qwen2_vit")
    cfgmod = importlib.import_module(
        "ref_m2omni_models.configuration_qwen2_vit")
    torch.manual_seed(1)
    vit = qv.Qwen2ViT(cfgmod.Qwen2VLVisionConfig(
        depth=2, embed_dim=32, hidden_size=48, num_heads=2, mlp_ratio=2,
        patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
        _attn_implementation="eager"))
    sanm = TorchSANMEncoder()
    import torch.nn as tnn

    sd = {}
    for k, v in ref_model.state_dict().items():
        sd[f"language_model.{k}"] = v.detach().numpy()
    for k, v in vit.state_dict().items():
        sd[f"vision_model.{k}"] = v.detach().numpy()
    for k, v in sanm.state_dict().items():
        sd[f"audio_model.encoder.{k}"] = v.detach().numpy()
    lp = tnn.Sequential(tnn.Linear(48, HIDDEN), tnn.GELU(),
                        tnn.Linear(HIDDEN, HIDDEN))
    lpa = tnn.Sequential(tnn.Linear(SANM_OUT * 3, HIDDEN), tnn.GELU(),
                         tnn.Linear(HIDDEN, HIDDEN))
    for k, v in lp.state_dict().items():
        sd[f"linear_proj.{k}"] = v.detach().numpy()
    for k, v in lpa.state_dict().items():
        sd[f"linear_proj_audio.{k}"] = v.detach().numpy()

    imported = m2_omni_state_dict_to_params(sd)

    from antmmf_tpu.models.m2_omni import LM_PRESETS
    LM_PRESETS["omni_parity_test"] = dict(
        hidden=HIDDEN, num_layers=LAYERS, num_heads=HEADS,
        num_kv_heads=KV, vocab_size=VOCAB)
    try:
        from antmmf_tpu.modules.encoders.sanm_audio import SANM_PRESETS
        SANM_PRESETS["sanm_parity_test"] = dict(
            input_size=SANM_IN, output_size=SANM_OUT, attention_heads=2,
            linear_units=32, num_blocks=3, kernel_size=5, sanm_shift=0)
        model = M2Omni(lm_preset="omni_parity_test", visual_tower="qwen2",
                       qwen2_preset="qwen2_vit_tiny_test", image_size=16,
                       audio_tower="sanm", sanm_preset="sanm_parity_test",
                       mlp_depths=2, image_token_id=3, audio_token_id=4,
                       dtype_str="float32")
        rng = jax.random.PRNGKey(0)
        N = 4
        ids = jnp.asarray(
            np.array([[5] + [3] * N + [4] * 3 + [6, 7]]), jnp.int32)
        batch = {"input_ids": ids,
                 "input_mask": jnp.ones_like(ids),
                 "image_data": jax.random.normal(rng, (1, 1, 16, 16, 3)),
                 "audio": jax.random.normal(rng, (1, 9, SANM_IN))}
        variables = model.init(rng, batch)
        want_paths = _tree_paths(
            jax.tree_util.tree_map(np.shape, variables["params"]))
        got_paths = _tree_paths(
            jax.tree_util.tree_map(np.shape, imported))
        assert set(want_paths) == set(got_paths), (
            sorted(set(want_paths) ^ set(got_paths))[:20])
        for k in want_paths:
            assert want_paths[k] == got_paths[k], (k, want_paths[k],
                                                   got_paths[k])
        # imported params actually run
        out = model.apply({"params": imported}, batch)
        assert np.isfinite(np.asarray(out["logits"], np.float32)).all()
    finally:
        LM_PRESETS.pop("omni_parity_test", None)
        from antmmf_tpu.modules.encoders.sanm_audio import SANM_PRESETS
        SANM_PRESETS.pop("sanm_parity_test", None)


def test_serial_adapter_matches_reference_math():
    """Our SerialAdapter == the reference AdapterLayer (x + B(act(A(x))),
    adapter.py:24-58) after weight import."""
    import torch.nn as tnn

    from antmmf_tpu.modules.llm import SerialAdapter

    torch.manual_seed(3)
    a = tnn.Linear(16, 4)
    b = tnn.Linear(4, 16)
    x = np.random.default_rng(0).standard_normal((2, 5, 16)).astype(np.float32)
    with torch.no_grad():
        want = (b(torch.nn.functional.silu(a(torch.from_numpy(x)))) +
                torch.from_numpy(x)).numpy()
    params = {
        "down": {"kernel": a.weight.detach().numpy().T,
                 "bias": a.bias.detach().numpy()},
        "up": {"kernel": b.weight.detach().numpy().T,
               "bias": b.bias.detach().numpy()},
    }
    mod = SerialAdapter(hidden_dim=4, non_linear=True, dtype=jnp.float32)
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_pink_composite_importer_covers_model_tree(ref_model):
    """Synthetic Pink-shaped state dict (LLaMA + serial adapters + HF-CLIP
    tower + mm_projector) → our PinkModel(adapter_style='pink') params,
    leaf-for-leaf."""
    import torch.nn as tnn
    from transformers import CLIPVisionConfig, CLIPVisionModel

    from antmmf_tpu.models.pink import PinkModel
    from antmmf_tpu.models.m2_omni import LM_PRESETS
    from antmmf_tpu.utils.torch_import import pink_state_dict_to_params

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    torch.manual_seed(4)
    # serial adapters on every decoder layer (adapter_attn only — the
    # reference default adapter_mlp=False, pink.py:95)
    for i in range(LAYERS):
        a = tnn.Linear(HIDDEN, 8)
        b = tnn.Linear(8, HIDDEN)
        sd[f"model.layers.{i}.adapter_attn.tune_adapter_a.weight"] = \
            a.weight.detach().numpy()
        sd[f"model.layers.{i}.adapter_attn.tune_adapter_a.bias"] = \
            a.bias.detach().numpy()
        sd[f"model.layers.{i}.adapter_attn.tune_adapter_b.weight"] = \
            b.weight.detach().numpy()
        sd[f"model.layers.{i}.adapter_attn.tune_adapter_b.bias"] = \
            b.bias.detach().numpy()
    clip = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=256, image_size=32, patch_size=16))
    for k, v in clip.state_dict().items():
        sd[f"vision_model.{k}"] = v.detach().numpy()
    proj = tnn.Linear(64, HIDDEN)
    sd["mm_projector.weight"] = proj.weight.detach().numpy()
    sd["mm_projector.bias"] = proj.bias.detach().numpy()

    imported = pink_state_dict_to_params(sd)

    LM_PRESETS["pink_parity_test"] = dict(
        hidden=HIDDEN, num_layers=LAYERS, num_heads=HEADS,
        num_kv_heads=KV, vocab_size=VOCAB)
    try:
        model = PinkModel(lm_preset="pink_parity_test", visual_tower="vit",
                          vit_preset="vit_tiny_test", image_size=32,
                          adapter_style="pink", adapter_dim=8,
                          dtype_str="float32")
        rng = jax.random.PRNGKey(0)
        batch = {"input_ids": jnp.asarray([[5, 6, 7, 8]], jnp.int32),
                 "input_mask": jnp.ones((1, 4), jnp.int32),
                 "image_data": jax.random.normal(rng, (1, 32, 32, 3))}
        variables = model.init(rng, batch)
        want_paths = _tree_paths(
            jax.tree_util.tree_map(np.shape, variables["params"]))
        got_paths = _tree_paths(jax.tree_util.tree_map(np.shape, imported))
        assert set(want_paths) == set(got_paths), (
            sorted(set(want_paths) ^ set(got_paths))[:20])
        out = model.apply({"params": imported}, batch)
        assert np.isfinite(np.asarray(out["logits"], np.float32)).all()
    finally:
        LM_PRESETS.pop("pink_parity_test", None)
