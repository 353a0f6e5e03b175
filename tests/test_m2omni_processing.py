"""Bailing2 unified-processor parity: smart_resize + dynamic-resolution
flatten-patch preprocessing vs the reference ``image_processing_m2omni.py``
run in-process, token expansion / chat templates vs ``processing_m2omni.py``,
and the end-to-end unified processor feeding the Qwen2-ViT tower."""

import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from reference_compat import REFERENCE_ROOT, reference_available  # noqa: E402

from antmmf_tpu.datasets.processors.m2omni_processing import (  # noqa: E402
    M2OmniImageProcessor,
    M2OmniUnifiedProcessor,
    apply_chat_template,
    apply_system_template,
    expand_audio_tokens,
    expand_image_tokens,
    expand_video_tokens,
    frames_from_patches,
    patchify,
    sample_frames,
    smart_resize,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not present")

VOCAB = "tests/data/vocabs/bert-base-uncased_30522_vocab.txt"


def _shim_transformers():
    """Older/newer transformers drop ``VideoInput`` (a pure type alias the
    reference only uses in annotations)."""
    import typing

    import transformers.image_utils as iu
    if not hasattr(iu, "VideoInput"):
        iu.VideoInput = typing.Any


def _ref_image_processing():
    import importlib

    from reference_compat import load_m2omni_models

    _shim_transformers()
    load_m2omni_models()
    return importlib.import_module(
        "ref_m2omni_models.image_processing_m2omni")


def _ref_processing():
    """Import processing_m2omni with its heavy siblings stubbed (torchaudio /
    torchvision-dependent modules are not needed for the string logic)."""
    import importlib

    from reference_compat import load_m2omni_models

    _shim_transformers()
    load_m2omni_models()
    if "ref_m2omni_models.feature_extraction_sanm" not in sys.modules:
        fe = types.ModuleType("ref_m2omni_models.feature_extraction_sanm")
        fe.SANMFeatureExtractor = object
        sys.modules["ref_m2omni_models.feature_extraction_sanm"] = fe
    if "ref_m2omni_models.m2omni_utils" not in sys.modules:
        mu = types.ModuleType("ref_m2omni_models.m2omni_utils")
        mu.process_vision_info = lambda conv: (None, None, None)
        sys.modules["ref_m2omni_models.m2omni_utils"] = mu
    return importlib.import_module("ref_m2omni_models.processing_m2omni")


def test_smart_resize_parity():
    ref = _ref_image_processing()
    rng = np.random.default_rng(0)
    cases = [(224, 224), (480, 640), (1080, 1920), (56, 56), (300, 57),
             (28, 29), (799, 601)]
    cases += [tuple(rng.integers(30, 3000, size=2)) for _ in range(40)]
    for h, w in cases:
        for factor, mn, mx in [(28, 56 * 56, 14 * 14 * 4 * 1280),
                               (28, 78400, 2007040),
                               (28, 100352, 602112),
                               (14, 4 * 28 * 28, 16384 * 28 * 28)]:
            try:
                exp = ref.smart_resize(int(h), int(w), factor, mn, mx)
            except ValueError:
                with pytest.raises(ValueError):
                    smart_resize(int(h), int(w), factor, mn, mx)
                continue
            got = smart_resize(int(h), int(w), factor, mn, mx)
            assert got == exp, (h, w, factor, mn, mx)


def _ref_preprocess(ref, images, min_pixels, max_pixels):
    proc = ref.Bailing2ImageProcessor(min_pixels=min_pixels,
                                      max_pixels=max_pixels)
    return proc._preprocess(
        images, do_resize=True, resample=proc.resample, do_rescale=True,
        rescale_factor=proc.rescale_factor, do_normalize=True,
        image_mean=proc.image_mean, image_std=proc.image_std,
        do_convert_rgb=True)


def test_image_preprocess_parity():
    ref = _ref_image_processing()
    rng = np.random.default_rng(1)
    for shape in [(224, 224, 3), (97, 211, 3), (640, 480, 3), (56, 56, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        want_patches, want_grid = _ref_preprocess(ref, img, 78400, 2007040)
        ours = M2OmniImageProcessor(min_pixels=78400, max_pixels=2007040)
        got_patches, got_grid = ours._preprocess(img)
        assert tuple(got_grid) == tuple(want_grid)
        np.testing.assert_allclose(got_patches,
                                   np.asarray(want_patches, np.float32),
                                   atol=2e-5, rtol=0)


def test_video_preprocess_parity():
    ref = _ref_image_processing()
    rng = np.random.default_rng(2)
    frames = [rng.integers(0, 256, size=(120, 160, 3), dtype=np.uint8)
              for _ in range(4)]
    want_patches, want_grid = _ref_preprocess(ref, frames, 100352, 602112)
    ours = M2OmniImageProcessor(min_pixels=100352, max_pixels=602112)
    got_patches, got_grid = ours._preprocess(frames)
    assert tuple(got_grid) == tuple(want_grid)
    np.testing.assert_allclose(got_patches,
                               np.asarray(want_patches, np.float32),
                               atol=2e-5, rtol=0)
    # odd frame count: reference callers pad externally; we repeat the last
    # frame, grid_t covers all frames
    got3, grid3 = ours._preprocess(frames[:3])
    assert grid3[0] == 2 and got3.shape == got_patches.shape


def test_expand_tokens_parity():
    torch = pytest.importorskip("torch")
    refp = _ref_processing()
    stub = types.SimpleNamespace(
        audio_text=("<audio>" + 256 * "<audioPatch>" + "</audio>"))

    grids = torch.tensor([[1, 8, 6], [2, 4, 4]])
    text = ["a <image> b <image> c", "no images"]
    want = refp.Bailing2Processor._expand_image_tokens(stub, list(text),
                                                       grids)
    got = expand_image_tokens(list(text), grids.numpy())
    assert got == want

    vgrids = torch.tensor([[4, 6, 8]])
    textv = ["watch <video> now"]
    wantv = refp.Bailing2Processor._expand_video_tokens(stub, list(textv),
                                                        vgrids)
    gotv = expand_video_tokens(list(textv), vgrids.numpy())
    assert gotv == wantv

    texta = ["listen <audio> ok", "no marker"]
    wanta = refp.Bailing2Processor._expand_audio_tokens(stub, list(texta))
    gota = expand_audio_tokens(list(texta), num_audio_tokens=256)
    assert gota == wanta


def test_system_and_chat_template_parity():
    refp = _ref_processing()
    stub = types.SimpleNamespace()
    stub.apply_system_template = types.MethodType(
        refp.Bailing2Processor.apply_system_template, stub)
    stub.chat_template = "x"
    stub.tokenizer = types.SimpleNamespace(bos_token="<s>")

    for text in ["hello world", "你好 world", ""]:
        assert apply_system_template(text) == \
            refp.Bailing2Processor.apply_system_template(stub, text)

    conv = [
        {"role": "user", "content": [
            {"type": "image", "image": "/tmp/a.png"},
            {"type": "text", "text": "What is in the picture?"},
        ]},
        {"role": "assistant", "content": [
            {"type": "text", "text": "A plant."}]},
        {"role": "user", "content": [
            {"type": "audio", "audio": "/tmp/b.wav"},
            {"type": "text", "text": "And this sound?"},
        ]},
    ]
    want = refp.Bailing2Processor.apply_chat_template(
        stub, conv, use_system=True, add_generation_prompt=True)
    got = apply_chat_template(conv, bos_token="<s>",
                              add_generation_prompt=True)
    assert got == want
    # video auto-placeholder branch
    conv_v = [{"role": "user", "content": [
        {"type": "video", "video": "/tmp/v.mp4"},
        {"type": "text", "text": "describe"}]}]
    want_v = refp.Bailing2Processor.apply_chat_template(
        stub, conv_v, use_system=True)
    got_v = apply_chat_template(conv_v, bos_token="<s>")
    assert got_v == want_v


def test_frames_from_patches_inverse():
    rng = np.random.default_rng(3)
    frames = rng.standard_normal((4, 3, 56, 84)).astype(np.float32)
    flat, grid = patchify(frames, patch_size=14, temporal_patch_size=2,
                          merge_size=2)
    assert flat.shape == (int(np.prod(grid)), 3 * 2 * 14 * 14)
    back = frames_from_patches(flat, grid, patch_size=14,
                               temporal_patch_size=2, merge_size=2)
    np.testing.assert_array_equal(back, frames.transpose(0, 2, 3, 1))


def test_sample_frames_deterministic_modes():
    assert sample_frames(4, 100, sample="sequence") == [0, 33, 66, 99]
    u = sample_frames(4, 100, sample="uniform")
    assert u == [12, 37, 62, 87]
    r = sample_frames(6, 50, sample="random",
                      rng=np.random.default_rng(0))
    assert len(r) == 6 and all(0 <= i < 50 for i in r)
    assert r == sorted(r) or len(set(r)) == 6  # one per interval


def test_unified_processor_in_place_expansion():
    proc = M2OmniUnifiedProcessor({
        "text": {"vocab_file": VOCAB, "max_seq_length": 64},
        "image": {"min_pixels": 56 * 56, "max_pixels": 56 * 56},
        "audio": {"max_frames": 8, "n_mels": 20, "lfr_m": 3, "lfr_n": 2},
        "num_audio_tokens": 4,
    })
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(80, 80, 3), dtype=np.uint8)
    out = proc({"text": "describe <image> briefly",
                "images": [img]})
    # 56x56 → grid (1,4,4) → 4 merged tokens in place
    assert tuple(out["image_grid_thw"][0]) == (1, 4, 4)
    ids = out["input_ids"]
    start = int(np.argmax(ids == 4))  # <image> start id
    assert ids[start] == 4
    assert (ids[start + 1:start + 5] == 1).all()  # 4 <imagePatch>
    assert ids[start + 5] == 5  # </image>
    assert ids[0] != 4  # text before the image marker
    # dense frames reconstruct for the tower: [T=2, 56, 56, 3]
    assert out["image_data"][0].shape == (2, 56, 56, 3)
    # pixel_values in the reference layout
    assert out["pixel_values"].shape == (16, 3 * 2 * 14 * 14)

    # audio: in-place expansion with start/patch*4/end
    wav = rng.standard_normal(8000).astype(np.float32)
    out2 = proc({"text": "sound <audio> here", "waveform": wav})
    ids2 = out2["input_ids"]
    s = int(np.argmax(ids2 == 6))
    assert ids2[s] == 6 and (ids2[s + 1:s + 5] == 2).all() and ids2[s + 5] == 7
    assert out2["fbank"].shape[0] == 8


def test_unified_processor_tower_consistency():
    """Patch-token count in input_ids == Qwen2-ViT output tokens for the
    same image — the host/device contract that makes splicing well-formed."""
    jax = pytest.importorskip("jax")
    from antmmf_tpu.modules.vision.qwen2_vit import Qwen2VisionTransformer

    proc = M2OmniUnifiedProcessor({
        "text": {"vocab_file": VOCAB, "max_seq_length": 96},
        "image": {"min_pixels": 56 * 56, "max_pixels": 112 * 112},
    })
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(120, 100, 3), dtype=np.uint8)
    out = proc({"text": "<image> what", "images": [img]})
    n_patch_tokens = int((out["input_ids"] == 1).sum())
    tower = Qwen2VisionTransformer(depth=1, embed_dim=32, hidden_size=16,
                                   num_heads=2, dtype=np.float32)
    frames = out["image_data"][0][None]  # [1, T, H, W, 3]
    vars_ = tower.init(jax.random.PRNGKey(0), frames)
    res = tower.apply(vars_, frames)
    assert res["sequence"].shape[1] == n_patch_tokens
    t, gh, gw = res["grid_thw"]
    g = out["image_grid_thw"][0]
    assert (t, gh * 2, gw * 2) == (g[0], g[1], g[2])


def test_conversation_end_to_end():
    from PIL import Image

    img_path = "/tmp/m2omni_proc_test.png"
    rng = np.random.default_rng(6)
    Image.fromarray(
        rng.integers(0, 256, size=(60, 60, 3), dtype=np.uint8)).save(img_path)
    proc = M2OmniUnifiedProcessor({
        "text": {"vocab_file": VOCAB, "max_seq_length": 128},
        "image": {"min_pixels": 56 * 56, "max_pixels": 56 * 56},
    })
    conv = [{"role": "user", "content": [
        {"type": "image", "image": img_path},
        {"type": "text", "text": "what is this?"}]}]
    out = proc({"conversation": conv})
    assert out["text"].startswith("<s><|start_header_id|>system")
    assert "<imagePatch>" in out["text"]
    assert out["text"].rstrip().endswith(
        "<|start_header_id|>assistant<|end_header_id|>")
    assert (out["input_ids"] == 1).sum() == 4  # (1,4,4) grid / 4
