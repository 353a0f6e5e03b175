"""M2-Encoder multiway parity: the reference VLMo MultiWayTransformer block
stack (prj/M2_Encoder/vlmo/modules/multiway_transformer.py, torch CPU)
matches our MultiwayTransformer after weight import — for the vision,
language, and fused (pre- and post-vlffn) expert routes."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "tests")
from reference_compat import load_vlmo_multiway, reference_available

if not reference_available():
    pytest.skip("reference tree unavailable", allow_module_level=True)

from antmmf_tpu.models.m2_encoder import (
    FUSION_EXPERT,
    LANGUAGE_EXPERT,
    VISION_EXPERT,
    MultiwayTransformer,
)
from antmmf_tpu.utils.torch_import import vlmo_multiway_state_dict_to_params

DEPTH, DIM, HEADS, TEXT_LEN = 4, 64, 2, 4


@pytest.fixture(scope="module")
def pair():
    mod = load_vlmo_multiway()
    torch.manual_seed(0)
    ref = mod.MultiWayTransformer(
        img_size=32, patch_size=16, embed_dim=DIM, depth=DEPTH,
        num_heads=HEADS, qkv_bias=True, use_abs_pos_emb=True,
        need_relative_position_embed=False, layer_scale_init_values=0.1,
        vlffn_start_layer_index=2,
        config={"drop_path_rate": 0.0, "loss_names": {"textmlm": 0},
                "max_text_len": TEXT_LEN},
    ).eval()
    # make the random init non-trivial (trunc_normal_ leaves most zeros)
    with torch.no_grad():
        for p in ref.parameters():
            if p.ndim >= 2 and p.abs().sum() == 0:
                p.normal_(0, 0.02)
    ours = MultiwayTransformer(
        embed_dim=DIM, num_layers=DEPTH, num_heads=HEADS,
        num_ffn_experts=3, vlffn_start_layer=2, layerscale_init=0.1,
        layer_norm_eps=1e-6, ffn_activation="gelu_exact",
        use_pallas=False, dtype=jnp.float32)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = vlmo_multiway_state_dict_to_params(sd, DEPTH)
    return ref, ours, params


def _ref_stack(ref, x, modality_type):
    h = torch.tensor(x)
    with torch.no_grad():
        for blk in ref.blocks:
            h = blk(h, mask=None, modality_type=modality_type)
        h = ref.norm(h)
    return h.numpy()


@pytest.mark.parametrize("modality_type,expert", [
    ("image", VISION_EXPERT), ("text", LANGUAGE_EXPERT)])
def test_single_modality_streams_match(pair, modality_type, expert):
    ref, ours, params = pair
    x = np.random.default_rng(1).standard_normal((2, 7, DIM)).astype(
        np.float32)
    want = _ref_stack(ref, x, modality_type)
    got, _ = ours.apply({"params": params}, jnp.asarray(x), expert)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)


def test_fused_stream_matches(pair):
    """Fused route: segment-split experts before vlffn_start, the dedicated
    VL expert after (reference Block.forward:185-203)."""
    ref, ours, params = pair
    x = np.random.default_rng(2).standard_normal(
        (2, TEXT_LEN + 5, DIM)).astype(np.float32)
    want = _ref_stack(ref, x, "vl")
    got, _ = ours.apply({"params": params}, jnp.asarray(x), FUSION_EXPERT,
                        text_len=TEXT_LEN)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)


def test_import_covers_all_our_params(pair):
    ref, ours, params = pair
    x = jnp.zeros((1, TEXT_LEN + 3, DIM), jnp.float32)
    init = ours.init(jax.random.PRNGKey(0), x, FUSION_EXPERT,
                     text_len=TEXT_LEN)["params"]
    flat_init = {"/".join(str(k.key) for k in path)
                 for path, _ in jax.tree_util.tree_flatten_with_path(init)[0]}
    flat_imported = {"/".join(str(k.key) for k in path)
                     for path, _ in
                     jax.tree_util.tree_flatten_with_path(params)[0]}
    missing = flat_init - flat_imported
    assert not missing, f"unmapped params: {sorted(missing)[:10]}"
