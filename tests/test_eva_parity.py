"""Pink EVA-ViT parity: the reference eva_vit.VisionTransformer matches our
EvaVisionTransformer after fused-qkv weight import (full image forward:
patch conv + cls + abs pos + 2 blocks, no final norm)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "tests")
from reference_compat import load_pink_eva_vit, reference_available

if not reference_available():
    pytest.skip("reference tree unavailable", allow_module_level=True)

from antmmf_tpu.modules.vision.eva_vit import EvaVisionTransformer
from antmmf_tpu.utils.torch_import import eva_vit_state_dict_to_params

SIZE, PATCH, DIM, DEPTH, HEADS = 28, 14, 32, 2, 2


@pytest.fixture(scope="module")
def pair():
    mod = load_pink_eva_vit()
    torch.manual_seed(0)
    ref = mod.VisionTransformer(
        img_size=SIZE, patch_size=PATCH, embed_dim=DIM, depth=DEPTH,
        num_heads=HEADS, mlp_ratio=4.0, qkv_bias=True,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        use_mean_pooling=False).eval()
    with torch.no_grad():  # non-trivial cls/pos (init is zeros+trunc)
        ref.cls_token.normal_(0, 0.02)
        ref.pos_embed.normal_(0, 0.02)
        for p in (ref.blocks[0].attn.q_bias, ref.blocks[0].attn.v_bias):
            p.normal_(0, 0.02)
    ours = EvaVisionTransformer(
        image_size=SIZE, patch_size=PATCH, embed_dim=DIM,
        num_layers=DEPTH, num_heads=HEADS, mlp_ratio=4.0,
        use_pallas=False, dtype=jnp.float32)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = eva_vit_state_dict_to_params(sd, DEPTH)
    return ref, ours, params


def test_eva_forward_matches(pair):
    ref, ours, params = pair
    img = np.random.default_rng(0).standard_normal(
        (2, SIZE, SIZE, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(img).permute(0, 3, 1, 2)).numpy()
    got = ours.apply({"params": params}, jnp.asarray(img))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)


def test_import_covers_all_params(pair):
    ref, ours, params = pair
    init = ours.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, SIZE, SIZE, 3), jnp.float32))["params"]
    flat = lambda t: {"/".join(str(k.key) for k in path) for path, _ in
                      jax.tree_util.tree_flatten_with_path(t)[0]}
    missing = flat(init) - flat(params)
    assert not missing, sorted(missing)[:8]


def test_pink_with_eva_tower_trains():
    """Pink builds on the EVA tower (tiny) end-to-end: forward + LM loss."""
    from antmmf_tpu.models.pink import PinkModel

    m = PinkModel(lm_preset="omni_tiny_test", visual_tower="eva",
                  eva_preset="eva_tiny_test", image_size=28,
                  dtype_str="float32")
    rng = np.random.default_rng(3)
    batch = {
        "input_ids": rng.integers(1, 100, (2, 6)).astype(np.int64),
        "image_data": rng.standard_normal((2, 28, 28, 3)).astype(np.float32),
        "labels": rng.integers(0, 100, (2, 6)).astype(np.int64),
    }
    v = m.init(jax.random.PRNGKey(0), batch)
    out = m.apply(v, batch, deterministic=True)
    assert np.isfinite(float(out["losses"]["lm_loss"]))


def test_pos_embed_interpolation(pair):
    """Importing at a different image size resizes the abs pos grid (the
    reference interpolate_pos_embed path)."""
    from antmmf_tpu.utils.torch_import import eva_vit_state_dict_to_params

    ref, _, _ = pair
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    # 28/14 → 2x2 grid + cls = 5 tokens; target 56/14 → 4x4 + cls = 17
    params = eva_vit_state_dict_to_params(sd, DEPTH, target_tokens=17)
    assert params["pos_embed"].shape == (1, 17, DIM)

    big = EvaVisionTransformer(
        image_size=56, patch_size=PATCH, embed_dim=DIM, num_layers=DEPTH,
        num_heads=HEADS, mlp_ratio=4.0, use_pallas=False, dtype=jnp.float32)
    img = np.random.default_rng(5).standard_normal(
        (1, 56, 56, 3)).astype(np.float32)
    out = big.apply({"params": params}, jnp.asarray(img))
    assert out.shape == (1, 17, DIM)
    assert np.isfinite(np.asarray(out)).all()
