"""SANM audio-encoder parity.

Reference: /root/reference/prj/M2_omni/models/sanm_audio.py (SANMEncoder on
funasr's MultiHeadedAttentionSANM; Bailing2 config defaults 560→512, 50
blocks, FSMN kernel 11, input_layer="pe"). funasr is not installable here
(zero egress), so the torch ground truth below is a direct transcription of
the funasr ops — fused ``linear_q_k_v``, depthwise ``fsmn_block`` conv with
(k-1)//2±shift padding and v-residual, ``forward_attention`` masking,
positions-from-1 sinusoidal PE, sqrt(output) input scaling — using the exact
funasr parameter schema, so ``sanm_state_dict_to_params`` exercises the same
key layout a real Bailing checkpoint ships.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402
import torch.nn as tnn  # noqa: E402

from antmmf_tpu.modules.encoders.sanm_audio import (  # noqa: E402
    SANMEncoder, compress_audio_tokens, sinusoidal_positions)
from antmmf_tpu.utils.torch_import import sanm_state_dict_to_params  # noqa: E402

IN, OUT, HEADS, FFN, BLOCKS, K = 24, 16, 2, 32, 3, 5


class TorchSANMAttention(tnn.Module):
    """funasr MultiHeadedAttentionSANM (sanm/attention.py), eval mode."""

    def __init__(self, n_head, in_feat, n_feat, kernel_size, sanm_shift=0):
        super().__init__()
        self.h = n_head
        self.d_k = n_feat // n_head
        self.linear_q_k_v = tnn.Linear(in_feat, n_feat * 3)
        self.linear_out = tnn.Linear(n_feat, n_feat)
        self.fsmn_block = tnn.Conv1d(n_feat, n_feat, kernel_size, stride=1,
                                     padding=0, groups=n_feat, bias=False)
        left = (kernel_size - 1) // 2 + sanm_shift
        right = kernel_size - 1 - left
        self.pad_fn = tnn.ConstantPad1d((left, right), 0.0)

    def forward(self, x, mask):
        b, t, _ = x.size()
        qkv = self.linear_q_k_v(x)
        d = self.h * self.d_k
        q, k, v = torch.split(qkv, d, dim=-1)

        m = mask.reshape(b, -1, 1).to(v.dtype)
        inputs = v * m
        mem = self.fsmn_block(self.pad_fn(inputs.transpose(1, 2)))
        mem = mem.transpose(1, 2) + inputs
        mem = mem * m

        def heads(tt):
            return tt.reshape(b, t, self.h, self.d_k).transpose(1, 2)

        qh = heads(q) * self.d_k ** -0.5
        scores = torch.matmul(qh, heads(k).transpose(-2, -1))
        bad = mask[:, None, None, :].eq(0)
        scores = scores.masked_fill(bad, torch.finfo(scores.dtype).min)
        attn = torch.softmax(scores, dim=-1).masked_fill(bad, 0.0)
        out = torch.matmul(attn, heads(v))
        out = out.transpose(1, 2).reshape(b, t, d)
        return self.linear_out(out) + mem


class TorchSANMLayer(tnn.Module):
    def __init__(self, in_size, size, n_head, ffn, kernel_size):
        super().__init__()
        self.in_size, self.size = in_size, size
        self.norm1 = tnn.LayerNorm(in_size)
        self.norm2 = tnn.LayerNorm(size)
        self.self_attn = TorchSANMAttention(n_head, in_size, size, kernel_size)
        self.feed_forward = tnn.Module()
        self.feed_forward.w_1 = tnn.Linear(size, ffn)
        self.feed_forward.w_2 = tnn.Linear(ffn, size)

    def forward(self, x, mask):
        h = self.self_attn(self.norm1(x), mask)
        x = x + h if self.in_size == self.size else h
        h = self.feed_forward.w_2(torch.relu(
            self.feed_forward.w_1(self.norm2(x))))
        return x + h


class TorchSANMEncoder(tnn.Module):
    """funasr SANMEncoder with input_layer='pe' (sanm_audio.py:215-462)."""

    def __init__(self):
        super().__init__()
        self.encoders0 = tnn.ModuleList(
            [TorchSANMLayer(IN, OUT, HEADS, FFN, K)])
        self.encoders = tnn.ModuleList(
            [TorchSANMLayer(OUT, OUT, HEADS, FFN, K)
             for _ in range(BLOCKS - 1)])
        self.after_norm = tnn.LayerNorm(OUT)

    def forward(self, feats, mask):
        x = feats * OUT ** 0.5
        t, dim = x.shape[1], x.shape[2]
        pos = torch.arange(1, t + 1, dtype=torch.float32)[None, :, None]
        log_inc = float(np.log(10000.0) / (dim / 2 - 1))
        inv = torch.exp(torch.arange(dim // 2, dtype=torch.float32) * -log_inc)
        scaled = pos * inv[None, None, :]
        x = x + torch.cat([torch.sin(scaled), torch.cos(scaled)], dim=2)
        for layer in self.encoders0:
            x = layer(x, mask)
        for layer in self.encoders:
            x = layer(x, mask)
        return self.after_norm(x)


@pytest.fixture(scope="module")
def ref_and_ours():
    torch.manual_seed(0)
    ref = TorchSANMEncoder().eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = sanm_state_dict_to_params(sd, prefix="")
    ours = SANMEncoder(input_size=IN, output_size=OUT,
                       attention_heads=HEADS, linear_units=FFN,
                       num_blocks=BLOCKS, kernel_size=K, dtype=jnp.float32)
    return ref, ours, params


def test_full_forward_parity(ref_and_ours):
    ref, ours, params = ref_and_ours
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 12, IN)).astype(np.float32)
    mask = np.ones((2, 12), np.int64)
    mask[0, 9:] = 0
    with torch.no_grad():
        want = ref(torch.from_numpy(feats), torch.from_numpy(mask)).numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(feats),
                                jnp.asarray(mask)), np.float32)
    # padded positions are garbage on both sides; compare valid frames
    np.testing.assert_allclose(got[0, :9], want[0, :9], atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(got[1], want[1], atol=2e-4, rtol=2e-4)


def test_depth_inference_from_state_dict(ref_and_ours):
    ref, ours, params = ref_and_ours
    sd = {f"encoder.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}
    p2 = sanm_state_dict_to_params(sd)  # default prefix, inferred depth
    assert f"layer_{BLOCKS - 1}" in p2 and f"layer_{BLOCKS}" not in p2


def test_positions_start_at_one():
    pos = np.asarray(sinusoidal_positions(3, 8))[0]
    # first frame encodes position 1, not 0 (funasr convention)
    assert abs(pos[0, 0] - np.sin(1.0)) < 1e-6


def test_compress_groups_of_three():
    x = jnp.arange(2 * 7 * 4, dtype=jnp.float32).reshape(2, 7, 4)
    out = compress_audio_tokens(x, 3)
    assert out.shape == (2, 2, 12)
    np.testing.assert_array_equal(
        np.asarray(out[0, 0]), np.asarray(x[0, :3]).reshape(-1))


def test_m2omni_with_sanm_tower():
    """M2Omni configured with the faithful audio tower: spliced forward with
    an <audio> run; token count = ceil(T/compress) after 3x compression."""
    from antmmf_tpu.models.m2_omni import M2Omni

    model = M2Omni(lm_preset="omni_tiny_test", audio_tower="sanm",
                   sanm_preset="sanm_tiny_test", audio_compress=3,
                   mlp_depths=2, audio_token_id=4, dtype_str="float32")
    rng = jax.random.PRNGKey(0)
    T = 9  # -> 3 compressed audio tokens
    Na = 3
    ids = jnp.asarray(
        np.array([[5] + [4] * Na + [6, 7, 8, 0]]), jnp.int32)
    batch = {
        "input_ids": ids,
        "input_mask": (ids != 0).astype(jnp.int32),
        "audio": jax.random.normal(rng, (1, T, 24)),
        "audio_mask": jnp.ones((1, T), jnp.int32),
        "labels": jnp.where(ids == 0, -100, ids),
    }
    variables = model.init(rng, batch)
    out = model.apply(variables, batch)
    assert out["logits"].shape == (1, ids.shape[1], 1000)
    assert np.isfinite(float(out["losses"]["lm_loss"]))
    # audio tokens are L2-normalized (reference F.normalize)
    tokens = model.apply(
        variables, batch, False,
        method=lambda m, b, d: m._audio_tokens(b, d))
    norms = np.linalg.norm(np.asarray(tokens, np.float32), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    toks, lens = model.generate(variables, batch, eos_id=1, max_length=3)
    assert toks.shape == (1, ids.shape[1] + 3)
