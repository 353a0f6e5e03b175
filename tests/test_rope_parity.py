"""3D-RoPE parity: our apply_rope / apply_rope_3d match the reference
M2-omni LLaMA-3D scheme (modeling_llama_3d.py apply_rotary_pos_emb +
Llama3dRotaryEmbedding) numerically."""

import importlib
import sys

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "tests")
from reference_compat import load_m2omni_models, reference_available

if not reference_available():
    pytest.skip("reference tree unavailable", allow_module_level=True)

from antmmf_tpu.modules.llm import apply_rope, apply_rope_3d, mrope_sections

B, H, L, D = 2, 3, 7, 16
THETA = 10000.0


def _ref_cos_sin(pos_3bl):
    """cos/sin exactly as Llama3dRotaryEmbedding.forward builds them
    (modeling_llama_3d.py:141-166): per-axis angle tables over the full
    head dim."""
    inv = 1.0 / (THETA ** (torch.arange(0, D, 2).float() / D))  # [D/2]
    freqs = pos_3bl.float()[..., None] * inv  # [3, B, L, D/2]
    emb = torch.cat([freqs, freqs], dim=-1)  # [3, B, L, D]
    return emb.cos(), emb.sin()


def test_rope_3d_matches_reference():
    load_m2omni_models()
    m = importlib.import_module("ref_m2omni_models.modeling_llama_3d")

    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, H, L, D)).astype(np.float32)
    k = rng.standard_normal((B, H, L, D)).astype(np.float32)
    pos = rng.integers(0, 50, (3, B, L))  # (t, h, w) streams

    sections = list(mrope_sections(D // 2))
    cos, sin = _ref_cos_sin(torch.tensor(pos))
    with torch.no_grad():
        q_ref, k_ref = m.apply_rotary_pos_emb(
            torch.tensor(q), torch.tensor(k), cos, sin,
            mrope_section=sections)

    pos_ours = np.transpose(pos, (1, 2, 0))  # [B, L, 3]
    q_ours = apply_rope_3d(jnp.asarray(q), jnp.asarray(pos_ours), THETA)
    k_ours = apply_rope_3d(jnp.asarray(k), jnp.asarray(pos_ours), THETA)
    np.testing.assert_allclose(np.asarray(q_ours), q_ref.numpy(),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(k_ours), k_ref.numpy(),
                               atol=1e-5, rtol=1e-5)


def test_rope_1d_is_3d_with_equal_streams():
    """Text rows carry (p, p, p): the reference applies plain 1D rope there;
    ours must agree between apply_rope and apply_rope_3d."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, H, L, D)).astype(np.float32)
    p = rng.integers(0, 30, (B, L))
    one = apply_rope(jnp.asarray(x), jnp.asarray(p), THETA)
    three = apply_rope_3d(
        jnp.asarray(x), jnp.asarray(np.stack([p, p, p], -1)), THETA)
    np.testing.assert_allclose(np.asarray(one), np.asarray(three),
                               atol=1e-5, rtol=1e-5)
