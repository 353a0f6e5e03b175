"""FULL-COMPOSITE Pink parity: the reference ``pink/model/pink.py``
PinkModel (stock HF LlamaForCausalLM + CLIPVisionInitModel at
clip_select_layer=-2 + mm_projector + contiguous patch-token splice) runs
in-process at a tiny config; its weights import through
``pink_state_dict_to_params`` and our ``models/pink.PinkModel`` matches the
text-position logits end-to-end.

Scope notes:
- The serial LLM adapters cannot execute inside the reference composite on
  the installed transformers (its ``adapter()`` context manager's
  LlamaAdapterDecoderLayer targets a pre-4.4x layer contract: 3-tuple
  attention returns, tuple layer returns), so the composite runs with
  ``adapter_llm_enable=False`` and we inject adapter weights with the
  reference's OWN init (tune_adapter_b zeroed, pink.py:170-175 — the serial
  adapter is then exactly identity) into the state dict; the adapter MATH is
  pinned separately (test_llama3d_parity.test_serial_adapter_matches_reference_math).
- The reference splices image features at the contiguous ``<im_patch>`` run
  (pink.py:235-248); our layout prepends vision. The two agree exactly when
  the patch run leads the sequence — the comparison below is constructed
  that way, pinning towers + select-layer + projector + decoder together.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from reference_compat import REFERENCE_ROOT, reference_available  # noqa: E402

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not present")

HIDDEN, HEADS, KV, LAYERS, VOCAB = 64, 2, 2, 2, 500
ADAPTER_DIM = 8


def _load_ref_pink():
    """Import prj/Pink/pink/model/pink.py with its package context:
    ``.adapter`` (needs LlamaFlashAttention2/LlamaSdpaAttention shims on
    transformers ≥4.4x and a ``pink.model.eva_vit`` alias) and ``.eva_vit``
    (timm stubs from reference_compat)."""
    if "ref_pink_model.pink" in sys.modules:
        return sys.modules["ref_pink_model.pink"]

    from reference_compat import load_pink_eva_vit

    eva = load_pink_eva_vit()

    import transformers.models.llama.modeling_llama as mllama
    if not hasattr(mllama, "LlamaFlashAttention2"):
        mllama.LlamaFlashAttention2 = mllama.LlamaAttention
    if not hasattr(mllama, "LlamaSdpaAttention"):
        mllama.LlamaSdpaAttention = mllama.LlamaAttention

    d = os.path.join(REFERENCE_ROOT, "prj/Pink/pink/model")
    pkg = types.ModuleType("ref_pink_model")
    pkg.__path__ = [d]
    sys.modules["ref_pink_model"] = pkg
    # adapter.py's absolute `import pink.model.eva_vit`
    pink_pkg = types.ModuleType("pink")
    pink_model_pkg = types.ModuleType("pink.model")
    pink_model_pkg.eva_vit = eva
    pink_pkg.model = pink_model_pkg
    sys.modules.setdefault("pink", pink_pkg)
    sys.modules.setdefault("pink.model", pink_model_pkg)
    sys.modules.setdefault("pink.model.eva_vit", eva)
    sys.modules.setdefault("ref_pink_model.eva_vit", eva)

    for name in ("adapter", "pink"):
        path = os.path.join(d, f"{name}.py")
        spec = importlib.util.spec_from_file_location(
            f"ref_pink_model.{name}", path)
        mod = importlib.util.module_from_spec(spec)
        mod.__package__ = "ref_pink_model"
        sys.modules[f"ref_pink_model.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["ref_pink_model.pink"]


@pytest.fixture(scope="module")
def ref_pink(tmp_path_factory):
    from transformers import CLIPVisionConfig, CLIPVisionModel

    mod = _load_ref_pink()
    clip_dir = str(tmp_path_factory.mktemp("tiny_clip"))
    torch.manual_seed(0)
    CLIPVisionModel(CLIPVisionConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=256, image_size=32, patch_size=16,
    )).save_pretrained(clip_dir)

    cfg = mod.PinkConfig(
        clip_path=clip_dir, clip_select_layer=-2, crop_size=32,
        adapter_llm_enable=False, adapter_vision_enable=False,
        hidden_size=HIDDEN, intermediate_size=int(HIDDEN * 2.6875),
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=KV, vocab_size=VOCAB, rms_norm_eps=1e-6,
        max_position_embeddings=512, tie_word_embeddings=False,
        attention_bias=False, attention_dropout=0.0,
        _attn_implementation="eager")
    cfg.im_patch_token = 7
    torch.manual_seed(1)
    ref = mod.PinkModel(cfg)
    ref.eval()
    return ref


def _our_model_and_params(ref):
    from antmmf_tpu.models.m2_omni import LM_PRESETS
    from antmmf_tpu.models.pink import PinkModel
    from antmmf_tpu.utils.torch_import import pink_state_dict_to_params

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    # serial adapters at the reference's init (tune_adapter_b zero,
    # PinkModel._init_weights): the adapter contributes exactly nothing,
    # matching the adapter-free composite run
    rng = np.random.default_rng(7)
    for i in range(LAYERS):
        b = f"model.layers.{i}.adapter_attn"
        sd[f"{b}.tune_adapter_a.weight"] = rng.standard_normal(
            (ADAPTER_DIM, HIDDEN)).astype(np.float32) * 0.02
        sd[f"{b}.tune_adapter_a.bias"] = np.zeros(ADAPTER_DIM, np.float32)
        sd[f"{b}.tune_adapter_b.weight"] = np.zeros((HIDDEN, ADAPTER_DIM),
                                                    np.float32)
        sd[f"{b}.tune_adapter_b.bias"] = np.zeros(HIDDEN, np.float32)
    params = pink_state_dict_to_params(sd, clip_select_layer=-2)
    LM_PRESETS["pink_full_parity"] = dict(
        hidden=HIDDEN, num_layers=LAYERS, num_heads=HEADS, num_kv_heads=KV,
        vocab_size=VOCAB)
    model = PinkModel(lm_preset="pink_full_parity", visual_tower="vit",
                      vit_preset="vit_tiny_test", image_size=32,
                      adapter_style="pink", adapter_dim=ADAPTER_DIM,
                      clip_select_layer=-2, dtype_str="float32")
    return model, params


def test_full_forward_logits_parity_leading_image(ref_pink):
    """[<im_patch>*4][text] through the reference == [vision; text] through
    ours: CLIP penultimate layer + mm_projector + decoder, same logits."""
    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    num_patches = (32 // 16) ** 2
    text_ids = rng.integers(10, VOCAB, size=(1, 7))
    ref_ids = np.concatenate(
        [np.full((1, num_patches), 7, np.int64), text_ids], axis=1)

    with torch.no_grad():
        want = ref_pink(
            input_ids=torch.tensor(ref_ids),
            attention_mask=torch.ones_like(torch.tensor(ref_ids)),
            images=torch.tensor(img), has_images=[True]).logits.numpy()

    model, params = _our_model_and_params(ref_pink)
    batch = {"input_ids": jnp.asarray(text_ids, jnp.int32),
             "input_mask": jnp.ones_like(jnp.asarray(text_ids, jnp.int32)),
             "image_data": jnp.asarray(img.transpose(0, 2, 3, 1))}
    got = np.asarray(model.apply({"params": params}, batch)["logits"],
                     np.float32)
    np.testing.assert_allclose(got, want[:, num_patches:], atol=2e-3,
                               rtol=2e-3)
    np.testing.assert_array_equal(got.argmax(-1),
                                  want[:, num_patches:].argmax(-1))


def test_text_only_parity(ref_pink):
    rng = np.random.default_rng(1)
    ids = rng.integers(10, VOCAB, size=(2, 6))
    with torch.no_grad():
        want = ref_pink(
            input_ids=torch.tensor(ids),
            attention_mask=torch.ones_like(torch.tensor(ids)),
            images=torch.zeros(2, 3, 32, 32), has_images=[False, False],
        ).logits.numpy()
    model, params = _our_model_and_params(ref_pink)
    got = np.asarray(model.apply(
        {"params": params},
        {"input_ids": jnp.asarray(ids, jnp.int32),
         "input_mask": jnp.ones_like(jnp.asarray(ids, jnp.int32))})["logits"],
        np.float32)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
