"""FULL-COMPOSITE M2-omni parity: the reference
``Bailing2NativeForConditionalGeneration`` (modeling_m2omni.py:203-640 —
Qwen2-ViT extract_image_feature + linear_proj + F.normalize + prompt_wrap
splice + get_rope_index 3D positions + LLaMA-3D decoder + lm loss) runs
in-process at a tiny config; its weights import through
``m2_omni_state_dict_to_params`` and our assembled ``models/m2_omni.M2Omni``
must produce the same logits end-to-end.

Audio leg: ``extract_audio_feature`` (SANM encoder → compress-by-3 reshape →
linear_proj_audio → F.normalize, modeling_m2omni.py:640-693) is pinned
directly against our ``M2Omni._audio_tokens``. The full-forward audio path is
NOT comparable: the reference's ``prompt_wrap_audio`` builds its scatter mask
from ``config.image_token_id`` instead of the audio token
(modeling_m2omni.py:749-755), so audio embeddings land at image-token
positions — a reference defect; we implement the documented intent (scatter
at audio placeholders).
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from reference_compat import load_m2omni_models, reference_available  # noqa: E402

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not present")

# head_dim must be 128: mrope_section [16, 24, 24] is hardcoded
# (modeling_llama_3d.py:197)
HIDDEN, HEADS, KV, LAYERS, VOCAB = 256, 2, 1, 2, 500
IMG_PATCH, IMG_START, IMG_END = 3, 4, 5
AUD_PATCH = 8


class _AudioStub(torch.nn.Module):
    """Stands in for BailingAudioModel (funasr absent): ``.encoder`` is the
    funasr-op SANM transcription proven in test_sanm_parity, state-dict keys
    land at ``audio_model.encoder.*`` exactly like the reference."""

    def __init__(self, encoder):
        super().__init__()
        self.encoder = encoder

    def forward(self, feats, mask):
        return self.encoder(feats, mask)


@pytest.fixture(scope="module")
def ref_composite():
    from test_sanm_parity import TorchSANMEncoder

    load_m2omni_models()

    import typing

    import transformers.image_utils as iu
    if not hasattr(iu, "VideoInput"):
        iu.VideoInput = typing.Any

    # modeling_m2omni imports .configuration_bailing2 (shipped as
    # configuration_m2omni.py) and .sanm_audio (funasr-backed)
    cfg_m2 = importlib.import_module("ref_m2omni_models.configuration_m2omni")
    sys.modules.setdefault("ref_m2omni_models.configuration_bailing2", cfg_m2)
    if "ref_m2omni_models.sanm_audio" not in sys.modules:
        sa = types.ModuleType("ref_m2omni_models.sanm_audio")
        sa.BailingAudioModel = _AudioStub
        sa.fix_audio_encoder_bf16_ = lambda m: None
        sys.modules["ref_m2omni_models.sanm_audio"] = sa

    # the reference's BC rope path (same patch as test_llama3d_parity)
    m3d = importlib.import_module("ref_m2omni_models.modeling_llama_3d")

    def _default_rope(config=None, device=None, seq_len=None, **kw):
        dim = kw.get("dim")
        base = kw.get("base", 10000.0)
        if dim is None and config is not None:
            dim = config.hidden_size // config.num_attention_heads
            base = config.rope_theta
        inv = 1.0 / (base ** (torch.arange(0, dim, 2).float() / dim))
        return inv, 1.0

    m3d.ROPE_INIT_FUNCTIONS = dict(m3d.ROPE_INIT_FUNCTIONS)
    m3d.ROPE_INIT_FUNCTIONS["default"] = _default_rope

    mm = importlib.import_module("ref_m2omni_models.modeling_m2omni")

    cfg = cfg_m2.Bailing2Config(
        vision_config=dict(
            vision_type="qwen2_vit", depth=2, embed_dim=32, hidden_size=48,
            num_heads=2, mlp_ratio=2, patch_size=4, temporal_patch_size=2,
            spatial_merge_size=2, _attn_implementation="eager"),
        llm_config=dict(
            llm_type="llama3_1_3d", hidden_size=HIDDEN,
            intermediate_size=int(HIDDEN * 2.6875),
            num_hidden_layers=LAYERS, num_attention_heads=HEADS,
            num_key_value_heads=KV, vocab_size=VOCAB, rms_norm_eps=1e-6,
            max_position_embeddings=512, tie_word_embeddings=False,
            attention_bias=False, attention_dropout=0.0,
            _attn_implementation="eager"),
        audio_config=dict(audio_output_size=16, audio_compress=3),
        mlp_depths=2, num_query_token_audio=3,
        _attn_implementation="eager")
    # tiny-vocab token ids (the shipped ids are 128268+; PretrainedConfig
    # attributes are plain ints we can override); frame_patch_token is
    # REQUIRED by get_rope_index but missing from init_mm_special_tokens —
    # without it the reference silently falls back to 1D text positions
    # (forward's bare try/except, modeling_m2omni.py:564-567)
    cfg.image_patch_token = IMG_PATCH
    cfg.image_start_token = IMG_START
    cfg.image_end_token = IMG_END
    cfg.frame_patch_token = 6
    cfg.video_start_token = 7
    cfg.audio_patch_token = AUD_PATCH
    cfg.end_of_audio_token = 9
    cfg.use_cache = False

    torch.manual_seed(0)
    lm = m3d.Llama3dForCausalLM(cfg.llm_config)  # fp32 (not the fp16 default)
    ref = mm.Bailing2NativeForConditionalGeneration(
        cfg, audio_model=_AudioStub(TorchSANMEncoder()), language_model=lm)
    ref.llm_dytpe = torch.float32
    ref.eval()
    return ref


def _our_model_and_params(ref, **overrides):
    from test_sanm_parity import IN as SANM_IN, OUT as SANM_OUT

    from antmmf_tpu.models.m2_omni import LM_PRESETS, M2Omni
    from antmmf_tpu.modules.encoders.sanm_audio import SANM_PRESETS
    from antmmf_tpu.utils.torch_import import m2_omni_state_dict_to_params

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = m2_omni_state_dict_to_params(sd)

    LM_PRESETS["omni_full_parity"] = dict(
        hidden=HIDDEN, num_layers=LAYERS, num_heads=HEADS, num_kv_heads=KV,
        vocab_size=VOCAB)
    SANM_PRESETS["sanm_full_parity"] = dict(
        input_size=SANM_IN, output_size=SANM_OUT, attention_heads=2,
        linear_units=32, num_blocks=3, kernel_size=5, sanm_shift=0)
    kw = dict(lm_preset="omni_full_parity", visual_tower="qwen2",
              qwen2_preset="qwen2_vit_tiny_test", image_size=16,
              audio_tower="sanm", sanm_preset="sanm_full_parity",
              mlp_depths=2, audio_compress=3,
              image_token_id=IMG_PATCH, audio_token_id=AUD_PATCH,
              dtype_str="float32")
    kw.update(overrides)
    model = M2Omni(**kw)
    return model, params


def test_full_forward_logits_parity_image_text(ref_composite):
    """End-to-end: pixel patches from OUR host processor → both models →
    identical logits (vision extract + normalize + splice + 3D rope +
    decoder)."""
    from antmmf_tpu.datasets.processors.m2omni_processing import (
        M2OmniImageProcessor, frames_from_patches)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    proc = M2OmniImageProcessor(min_pixels=256, max_pixels=256, patch_size=4,
                                merge_size=2)
    pix, grid = proc._preprocess(img)  # [16, 96], (1, 4, 4)
    assert tuple(grid) == (1, 4, 4)
    n_merged = int(np.prod(grid)) // 4

    ids = np.array([[10, 11, IMG_START] + [IMG_PATCH] * n_merged
                    + [IMG_END, 12, 13, 14]], np.int64)
    mask = np.ones_like(ids)

    with torch.no_grad():
        want = ref_composite(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(pix, dtype=torch.float32),
            image_grid_thw=torch.tensor(np.asarray(grid)[None]),
        ).logits.numpy()

    model, params = _our_model_and_params(ref_composite)
    frames = frames_from_patches(pix, grid, patch_size=4,
                                 temporal_patch_size=2, merge_size=2)
    batch = {"input_ids": jnp.asarray(ids, jnp.int32),
             "input_mask": jnp.asarray(mask, jnp.int32),
             "image_data": jnp.asarray(frames[None], jnp.float32)}
    got = np.asarray(model.apply({"params": params}, batch)["logits"],
                     np.float32)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
    # the rankings agree everywhere
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_full_forward_text_only_parity(ref_composite):
    """No vision: positions degrade to 1D text indices in both."""
    rng = np.random.default_rng(1)
    ids = rng.integers(10, VOCAB, size=(2, 9))
    mask = np.ones_like(ids)
    mask[0, 7:] = 0
    with torch.no_grad():
        want = ref_composite(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask)).logits.numpy()
    model, params = _our_model_and_params(ref_composite)
    batch = {"input_ids": jnp.asarray(ids, jnp.int32),
             "input_mask": jnp.asarray(mask, jnp.int32)}
    got = np.asarray(model.apply({"params": params}, batch)["logits"],
                     np.float32)
    np.testing.assert_allclose(got[0, :7], want[0, :7], atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(got[1], want[1], atol=2e-3, rtol=2e-3)


def test_audio_leg_parity(ref_composite):
    """``extract_audio_feature`` == our ``_audio_tokens`` (SANM → reshape
    compress-by-3 → MLP → L2 normalize) when the frame count fills n_query
    exactly (no end_of_audio padding)."""
    from test_sanm_parity import IN as SANM_IN

    rng = np.random.default_rng(2)
    T = 9  # 9 frames / compress 3 == n_query 3 → no padding leg
    feats = rng.standard_normal((1, T, SANM_IN)).astype(np.float32)
    amask = np.ones((1, T), np.int64)
    with torch.no_grad():
        want = ref_composite.extract_audio_feature(
            torch.tensor(feats), torch.tensor(amask), n_query=3,
            audio_compress=3).numpy()

    model, params = _our_model_and_params(ref_composite)
    batch = {"audio": jnp.asarray(feats), "audio_mask": jnp.asarray(amask),
             "input_ids": jnp.zeros((1, 4), jnp.int32)}
    got = np.asarray(model.apply(
        {"params": params}, batch, True,
        method=lambda mdl, b, d: mdl._audio_tokens(b, d)), np.float32)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_full_forward_loss_parity(ref_composite):
    """Masked-shift LM loss agrees on a fully-attended batch."""
    rng = np.random.default_rng(3)
    ids = rng.integers(10, VOCAB, size=(1, 8))
    mask = np.ones_like(ids)
    labels = rng.integers(10, VOCAB, size=(1, 8))
    with torch.no_grad():
        want = float(ref_composite(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            labels=torch.tensor(labels)).loss)
    model, params = _our_model_and_params(ref_composite)
    out = model.apply({"params": params},
                      {"input_ids": jnp.asarray(ids, jnp.int32),
                       "input_mask": jnp.asarray(mask, jnp.int32),
                       "labels": jnp.asarray(labels, jnp.int32)})
    got = float(out["losses"]["lm_loss"])
    assert abs(got - want) < 2e-3, (got, want)


FRAME_PATCH, VID_START = 6, 7


def _mixed_row(ref_composite):
    """Build the 2-images + 1-video mixed row: per-modality patch streams
    through OUR processor (byte-compatible with the reference's), the
    spliced input_ids row, and the dense frames our towers consume."""
    from antmmf_tpu.datasets.processors.m2omni_processing import (
        M2OmniImageProcessor, frames_from_patches)

    rng = np.random.default_rng(7)
    img1 = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    img2 = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    vid = rng.integers(0, 256, size=(4, 16, 16, 3), dtype=np.uint8)
    proc = M2OmniImageProcessor(patch_size=4, merge_size=2)
    pix1, g1 = proc._preprocess(img1, do_resize=False)   # (1, 4, 4)
    pix2, g2 = proc._preprocess(img2, do_resize=False)   # (1, 6, 6)
    pixv, gv = proc._preprocess(list(vid), do_resize=False)  # (2, 4, 4)
    assert tuple(g1) == (1, 4, 4) and tuple(g2) == (1, 6, 6) \
        and tuple(gv) == (2, 4, 4)
    n1, n2, nv = 4, 9, 8  # merged token counts (t*h*w / merge^2)

    row = ([10, 11, IMG_START] + [IMG_PATCH] * n1 + [IMG_END, 12, IMG_START]
           + [IMG_PATCH] * n2 + [IMG_END, 13, VID_START] + [FRAME_PATCH] * nv
           + [14, 15])
    ids = np.asarray([row], np.int64)
    mask = np.ones_like(ids)

    frames1 = frames_from_patches(pix1, g1, patch_size=4)
    frames2 = frames_from_patches(pix2, g2, patch_size=4)
    framesv = frames_from_patches(pixv, gv, patch_size=4)
    return {
        "ids": ids, "mask": mask,
        "pixel_values": np.concatenate([pix1, pix2], 0),
        "image_grid_thw": np.stack([g1, g2]),
        "pixel_values_videos": pixv, "video_grid_thw": np.asarray(gv)[None],
        "image_data": (jnp.asarray(frames1[None], jnp.float32),
                       jnp.asarray(frames2[None], jnp.float32)),
        "video_data": jnp.asarray(framesv[None], jnp.float32),
    }


def test_mixed_row_rope_index_parity(ref_composite):
    """get_rope_index on the 2-image + video + audio row: the reference
    gives VIDEO runs 3D grids but silently degrades IMAGE runs to
    sequential text positions when a video is present (image_nums is only
    counted when video_grid_thw is None, modeling_m2omni.py:398-404) and
    treats audio placeholders as plain text. Our default reproduces all of
    it; mixed_vision_grid_positions=True restores image grids."""
    m = _mixed_row(ref_composite)
    # append an audio run (text positions in both implementations)
    ids = np.concatenate(
        [m["ids"], [[16] + [AUD_PATCH] * 3 + [17]]], axis=1)
    mask = np.ones_like(ids)
    want_pos, want_delta = ref_composite.get_rope_index(
        torch.tensor(ids), torch.tensor(m["image_grid_thw"]),
        torch.tensor(m["video_grid_thw"]), torch.tensor(mask))
    want_pos = want_pos.numpy().transpose(1, 2, 0)  # [3,B,L] -> [B,L,3]

    from test_sanm_parity import IN as SANM_IN

    model, params = _our_model_and_params(
        ref_composite, video_token_id=FRAME_PATCH)
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((1, 9, SANM_IN)).astype(np.float32)
    batch = {"image_data": m["image_data"], "video_data": m["video_data"],
             "audio": jnp.asarray(feats),
             "audio_mask": jnp.ones((1, 9), jnp.int32)}
    _, got_pos, got_next = model.apply(
        {"params": params}, batch, jnp.asarray(ids, jnp.int32), True,
        method=lambda mdl, b, i, d: mdl._assemble_spliced(b, i, d))
    np.testing.assert_array_equal(np.asarray(got_pos), want_pos)
    # continuation base == mrope delta convention: max position + 1
    assert int(np.asarray(got_next)[0]) == int(want_delta[0, 0]) + ids.shape[1]


def test_mixed_row_full_forward_logits_parity(ref_composite):
    """End-to-end logits on the 2-image + 1-video row: both prompt_wrap
    splices (image, video) + the degraded-image/grid-video positions +
    LLaMA-3D decoder. (Audio is excluded here: the reference's
    prompt_wrap_audio scatters at image-token positions — a defect pinned
    in this file's module docstring — so a full forward with audio cannot
    agree.)"""
    m = _mixed_row(ref_composite)
    with torch.no_grad():
        want = ref_composite(
            input_ids=torch.tensor(m["ids"]),
            attention_mask=torch.tensor(m["mask"]),
            pixel_values=torch.tensor(m["pixel_values"], dtype=torch.float32),
            image_grid_thw=torch.tensor(m["image_grid_thw"]),
            pixel_values_videos=torch.tensor(m["pixel_values_videos"],
                                             dtype=torch.float32),
            video_grid_thw=torch.tensor(m["video_grid_thw"]),
        ).logits.numpy()
    # guard: the reference forward swallows get_rope_index errors
    # (bare try/except) — make sure the 3D path actually ran
    pos, _ = ref_composite.get_rope_index(
        torch.tensor(m["ids"]), torch.tensor(m["image_grid_thw"]),
        torch.tensor(m["video_grid_thw"]), torch.tensor(m["mask"]))
    assert int(pos.max()) < m["ids"].shape[1] - 1  # grids compress positions

    model, params = _our_model_and_params(
        ref_composite, video_token_id=FRAME_PATCH)
    batch = {"input_ids": jnp.asarray(m["ids"], jnp.int32),
             "input_mask": jnp.asarray(m["mask"], jnp.int32),
             "image_data": m["image_data"], "video_data": m["video_data"]}
    got = np.asarray(model.apply({"params": params}, batch)["logits"],
                     np.float32)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_mixed_row_audio_splice_intent(ref_composite):
    """The audio splice places the reference's extract_audio_feature
    embeddings at the AUDIO placeholder slots (the documented intent the
    reference's prompt_wrap_audio misses by building its scatter mask from
    image_token_id, modeling_m2omni.py:749-755)."""
    from test_sanm_parity import IN as SANM_IN

    m = _mixed_row(ref_composite)
    ids = np.concatenate(
        [m["ids"], [[16] + [AUD_PATCH] * 3 + [17]]], axis=1)
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((1, 9, SANM_IN)).astype(np.float32)
    amask = np.ones((1, 9), np.int64)
    with torch.no_grad():
        want_audio = ref_composite.extract_audio_feature(
            torch.tensor(feats), torch.tensor(amask), n_query=3,
            audio_compress=3).numpy()

    model, params = _our_model_and_params(
        ref_composite, video_token_id=FRAME_PATCH)
    batch = {"image_data": m["image_data"], "video_data": m["video_data"],
             "audio": jnp.asarray(feats),
             "audio_mask": jnp.asarray(amask, jnp.int32)}
    embeds, _, _ = model.apply(
        {"params": params}, batch, jnp.asarray(ids, jnp.int32), True,
        method=lambda mdl, b, i, d: mdl._assemble_spliced(b, i, d))
    slots = np.where(ids[0] == AUD_PATCH)[0]
    got_audio = np.asarray(embeds)[0, slots]
    np.testing.assert_allclose(got_audio, want_audio[0], atol=2e-4,
                               rtol=2e-4)
