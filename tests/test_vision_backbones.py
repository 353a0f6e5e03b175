import jax
import jax.numpy as jnp
import numpy as np
import pytest

from antmmf_tpu.modules.encoders.visual_encoder import VisualEncoder
from antmmf_tpu.modules.vision.pvt import PyramidVisionTransformer
from antmmf_tpu.modules.vision.resnet import ResNet
from antmmf_tpu.modules.vision.tsm import TSMVideoEncoder, temporal_shift
from antmmf_tpu.modules.vision.video_swin import (
    VideoSwinTransformer,
    compute_shift_mask,
    window_partition,
    window_reverse,
)

KEY = jax.random.PRNGKey(0)


def test_resnet_shapes():
    m = ResNet(preset="resnet_tiny_test", width=32, dtype=jnp.float32)
    x = jnp.ones((2, 64, 64, 3))
    params = m.init(KEY, x)
    out = m.apply(params, x)
    assert out["grid"].shape[0] == 2 and out["grid"].ndim == 4
    assert out["pooled"].shape == (2, out["grid"].shape[-1])


def test_window_partition_roundtrip():
    x = jax.random.normal(KEY, (2, 4, 8, 8, 16))
    ws = (2, 4, 4)
    w = window_partition(x, ws)
    back = window_reverse(w, ws, 2, 4, 8, 8)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_shift_mask_blocks_cross_region():
    mask = compute_shift_mask((2, 4, 4), (2, 2, 2), (1, 1, 1))
    assert mask.shape[0] == 1 * 2 * 2
    assert (np.asarray(mask) <= 0).all()
    assert (np.asarray(mask) < 0).any()  # some pairs masked


def test_video_swin_forward():
    m = VideoSwinTransformer(preset="swin_test", patch_size=(1, 4, 4),
                             window_size=(2, 2, 2), dtype=jnp.float32)
    video = jnp.ones((1, 2, 16, 16, 3))
    params = m.init(KEY, video)
    out = m.apply(params, video)
    # stage 0: (2, 4, 4); merge → (2, 2, 2); dims double
    assert out["grid"].shape == (1, 2, 2, 2, 64)
    assert out["pooled"].shape == (1, 64)


def test_temporal_shift_moves_channels():
    x = jnp.arange(2 * 2 * 1 * 1 * 8, dtype=jnp.float32).reshape(4, 1, 1, 8)
    out = temporal_shift(x, n_frames=2, fold_div=4)
    out = out.reshape(2, 2, 1, 1, 8)
    x_r = x.reshape(2, 2, 1, 1, 8)
    # fold=2: ch 0-1 shifted forward (frame t sees t+1), last frame zero
    np.testing.assert_allclose(out[:, 0, 0, 0, 0], x_r[:, 1, 0, 0, 0])
    np.testing.assert_allclose(out[:, 1, 0, 0, 0], 0.0)
    # ch 2-3 shifted backward
    np.testing.assert_allclose(out[:, 1, 0, 0, 2], x_r[:, 0, 0, 0, 2])
    # remaining channels untouched
    np.testing.assert_allclose(out[:, :, 0, 0, 4:], x_r[:, :, 0, 0, 4:])


def test_tsm_encoder():
    m = TSMVideoEncoder(resnet_preset="resnet_tiny_test", dtype=jnp.float32)
    video = jnp.ones((1, 2, 32, 32, 3))
    params = m.init(KEY, video)
    out = m.apply(params, video)
    assert out["grid"].shape[:2] == (1, 2)
    assert out["frame_pooled"].shape[:2] == (1, 2)


def test_pvt_forward():
    m = PyramidVisionTransformer(preset="pvt_test", dtype=jnp.float32)
    x = jnp.ones((2, 32, 32, 3))
    params = m.init(KEY, x)
    out = m.apply(params, x)
    assert len(out["pyramid"]) == 2
    assert out["grid"].shape == (2, 4, 4, 64)  # 32/4/2


@pytest.mark.parametrize("enc_type,preset,frames", [
    ("vit", "vit_tiny_test", 2),
    ("resnet", "resnet_tiny_test", 1),
    ("pvt", "pvt_test", 1),
    ("efficientnet", "test", 1),
    ("cctt", "cct_test", 2),
])
def test_visual_encoder_contract(enc_type, preset, frames):
    enc = VisualEncoder(encoder_type=enc_type, preset=preset, image_size=32,
                        dtype_str="float32")
    imgs = jnp.ones((2, frames, 32, 32, 3))
    params = enc.init(KEY, imgs)
    out = enc.apply(params, imgs)
    gf, gm = out["grid_feature"], out["grid_mask"]
    assert gf.ndim == 5 and gf.shape[:2] == (2, frames)
    assert gm.shape == gf.shape[:4]
    assert not bool(gm.any())  # no padding given


def test_visual_encoder_pad_mask_downsample():
    enc = VisualEncoder(encoder_type="vit", preset="vit_tiny_test",
                        image_size=32, dtype_str="float32")
    imgs = jnp.ones((1, 1, 32, 32, 3))
    pad = jnp.zeros((1, 1, 32, 32), bool).at[:, :, :, 16:].set(True)
    params = enc.init(KEY, imgs, pad)
    out = enc.apply(params, imgs, pad)
    gm = np.asarray(out["grid_mask"])  # [1, 1, 2, 2]
    assert gm[0, 0, 0, 1] and not gm[0, 0, 0, 0]
