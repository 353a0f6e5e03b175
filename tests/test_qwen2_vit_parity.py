"""Qwen2-ViT parity: our flax tower vs the reference torch Qwen2ViT.

Reference: /root/reference/prj/M2_omni/models/qwen2_vit.py (conv3d patchify,
2D rope in spatial-merge order, per-image attention, PatchMerger). The torch
model runs in-process at a tiny random-init config; weights import through
``qwen2_vit_state_dict_to_params``; outputs must match ≤ 2e-4.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from antmmf_tpu.modules.vision.qwen2_vit import (  # noqa: E402
    Qwen2VisionTransformer)
from antmmf_tpu.utils.torch_import import (  # noqa: E402
    qwen2_vit_state_dict_to_params)

from reference_compat import load_m2omni_models, reference_available  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")

DEPTH, EMBED, HEADS = 2, 32, 2
HIDDEN_OUT = 48
PS, TPS, M = 4, 2, 2


def _patchify_reference_layout(frames: np.ndarray):
    """frames [T, H, W, 3] → flat patches [L, C*tps*ps*ps] in the reference
    image-processor order: tokens (t, h/m, w/m, m, m), vector (C, tps, ps,
    ps) — the same layout our flax module builds internally."""
    T, H, W, C = frames.shape
    t, h, w = T // TPS, H // PS, W // PS
    x = frames.reshape(t, TPS, h // M, M, PS, w // M, M, PS, C)
    x = x.transpose(0, 2, 5, 3, 6, 8, 1, 4, 7)  # t,hb,wb,mh,mw,C,tps,ps,ps
    return x.reshape(t * h * w, C * TPS * PS * PS)


@pytest.fixture(scope="module")
def ref_and_ours():
    torch = pytest.importorskip("torch")
    pkg = load_m2omni_models()
    import importlib

    qv = importlib.import_module("ref_m2omni_models.qwen2_vit")
    cfgmod = importlib.import_module("ref_m2omni_models.configuration_qwen2_vit")
    cfg = cfgmod.Qwen2VLVisionConfig(
        depth=DEPTH, embed_dim=EMBED, hidden_size=HIDDEN_OUT,
        num_heads=HEADS, mlp_ratio=2, patch_size=PS,
        temporal_patch_size=TPS, spatial_merge_size=M,
        _attn_implementation="eager")
    torch.manual_seed(0)
    ref = qv.Qwen2ViT(cfg)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = qwen2_vit_state_dict_to_params(sd)
    ours = Qwen2VisionTransformer(
        depth=DEPTH, embed_dim=EMBED, hidden_size=HIDDEN_OUT,
        num_heads=HEADS, mlp_ratio=2.0, patch_size=PS,
        temporal_patch_size=TPS, spatial_merge_size=M, dtype=jnp.float32)
    return torch, ref, ours, params


def test_full_forward_parity(ref_and_ours):
    torch, ref, ours, params = ref_and_ours
    rng = np.random.default_rng(0)
    T, H, W = 2, 16, 16
    frames = rng.standard_normal((T, H, W, 3)).astype(np.float32)

    flat = _patchify_reference_layout(frames)
    grid_thw = torch.tensor([[T // TPS, H // PS, W // PS]])
    with torch.no_grad():
        want = ref(torch.from_numpy(flat), grid_thw).numpy()

    out = ours.apply({"params": params}, jnp.asarray(frames[None]))
    got = np.asarray(out["sequence"][0], np.float32)
    assert out["grid_thw"] == (T // TPS, (H // PS) // M, (W // PS) // M)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_video_multi_frame_parity(ref_and_ours):
    """4 frames → temporal grid 2: per-image attention must span the whole
    clip exactly like the reference single cu_seqlens block."""
    torch, ref, ours, params = ref_and_ours
    rng = np.random.default_rng(1)
    T, H, W = 4, 8, 16
    frames = rng.standard_normal((T, H, W, 3)).astype(np.float32)
    flat = _patchify_reference_layout(frames)
    grid_thw = torch.tensor([[T // TPS, H // PS, W // PS]])
    with torch.no_grad():
        want = ref(torch.from_numpy(flat), grid_thw).numpy()
    out = ours.apply({"params": params}, jnp.asarray(frames[None]))
    np.testing.assert_allclose(
        np.asarray(out["sequence"][0], np.float32), want,
        atol=2e-4, rtol=2e-4)


def test_batched_images_are_independent(ref_and_ours):
    """Batch dim == the reference's cu_seqlens image separation: each image's
    tokens must be unchanged by what else is in the batch."""
    _, _, ours, params = ref_and_ours
    rng = np.random.default_rng(2)
    a = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    b = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    both = ours.apply({"params": params},
                      jnp.asarray(np.stack([a, b])))["sequence"]
    solo = ours.apply({"params": params}, jnp.asarray(a[None]))["sequence"]
    np.testing.assert_allclose(np.asarray(both[0]), np.asarray(solo[0]),
                               atol=1e-5)


def test_single_image_tiles_temporal(ref_and_ours):
    """A single frame is tiled to temporal_patch_size (the reference image
    processor repeats the image — image_processing_m2omni.py)."""
    torch, ref, ours, params = ref_and_ours
    rng = np.random.default_rng(3)
    img = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    tiled = np.repeat(img, TPS, axis=0)
    flat = _patchify_reference_layout(tiled)
    grid_thw = torch.tensor([[1, 4, 4]])
    with torch.no_grad():
        want = ref(torch.from_numpy(flat), grid_thw).numpy()
    out = ours.apply({"params": params}, jnp.asarray(img[None]))
    np.testing.assert_allclose(
        np.asarray(out["sequence"][0], np.float32), want,
        atol=2e-4, rtol=2e-4)


def test_m2omni_with_qwen2_tower_splices_and_generates():
    """M2Omni configured with the faithful tower: spliced forward + cached
    generate; placeholder count == t*gh*gw from the tower grid."""
    from antmmf_tpu.models.m2_omni import M2Omni

    model = M2Omni(lm_preset="omni_tiny_test", visual_tower="qwen2",
                   qwen2_preset="qwen2_vit_tiny_test", image_size=16,
                   image_token_id=3, dtype_str="float32")
    rng = jax.random.PRNGKey(0)
    # 16x16 image, patch 4, merge 2 -> grid (1, 2, 2) = 4 merged tokens
    N = 4
    row0 = [5] + [3] * N + [6, 7, 0]
    row1 = [9] + [3] * N + [10, 11, 12]
    ids = jnp.asarray(np.array([row0, row1]), jnp.int32)
    batch = {
        "input_ids": ids,
        "input_mask": (ids != 0).astype(jnp.int32),
        "image_data": jax.random.normal(rng, (2, 1, 16, 16, 3)),
        "labels": jnp.where(ids == 0, -100, ids),
    }
    variables = model.init(rng, batch)
    out = model.apply(variables, batch)
    assert out["logits"].shape == (2, len(row0), 1000)
    assert np.isfinite(float(out["losses"]["lm_loss"]))
    tokens, lens = model.generate(variables, batch, eos_id=1, max_length=3)
    assert tokens.shape == (2, len(row0) + 3)
