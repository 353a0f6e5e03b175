"""The reference M2-omni finetuning recipes: wrap_llm_lora (LoRA on ALL
seven decoder projections — q/k/v/o + gate/up/down,
modeling_m2omni.py:311-326) and wrap_vit_lora (LoRA on every Qwen2-ViT
block's qkv/proj/fc1/fc2, :301-309), with the base weights frozen.

These tests pin: the adapter parameter surface, zero-init transparency
(lora_b = 0 means the adapted model computes exactly the base model), and
the freeze semantics (gradients reach only the adapters)."""

import jax
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.models.m2_omni import M2Omni
from antmmf_tpu.modules.vision.qwen2_vit import build_qwen2_vit


def _strip_lora(tree):
    if isinstance(tree, dict):
        return {k: _strip_lora(v) for k, v in tree.items()
                if "lora_a" not in k and "lora_b" not in k}
    return tree


def _lora_leaf_names(tree, prefix=""):
    names = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            if "lora" in k:
                names.append(f"{prefix}{k}")
            names.extend(_lora_leaf_names(v, f"{prefix}{k}/"))
    return names


def _omni(**kw):
    return M2Omni(lm_preset="omni_tiny_test", vit_preset="vit_tiny_test",
                  image_size=32, dtype_str="float32", **kw)


def test_llm_lora_all_targets_surface_and_transparency():
    batch = {"input_ids": jnp.array([[5, 6, 7, 8]], jnp.int32),
             "input_mask": jnp.ones((1, 4), jnp.int32)}
    rng = jax.random.PRNGKey(0)
    model = _omni(llm_lora_rank=2, llm_lora_targets="all")
    variables = model.init(rng, batch)
    names = " ".join(_lora_leaf_names(variables["params"]))
    for t in ("q_lora_a", "k_lora_a", "v_lora_a", "o_lora_a",
              "gate_lora_a", "up_lora_a", "down_lora_a"):
        assert t in names, t

    # zero-init lora_b => adapted forward == the base model on the SAME
    # base params (the get_peft_model identity-at-init property)
    base_model = _omni(llm_lora_rank=0)
    base_vars = {"params": _strip_lora(variables["params"])}
    got = model.apply(variables, batch)["logits"]
    want = base_model.apply(base_vars, batch)["logits"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_llm_lora_freeze_gradients():
    batch = {"input_ids": jnp.array([[5, 6, 7, 8]], jnp.int32),
             "input_mask": jnp.ones((1, 4), jnp.int32),
             "labels": jnp.array([[5, 6, 7, 8]], jnp.int32)}
    model = _omni(llm_lora_rank=2, llm_lora_targets="all")
    variables = model.init(jax.random.PRNGKey(0), batch)

    def loss_fn(p):
        return model.apply({"params": p}, batch)["losses"]["lm_loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    lora_g = [np.abs(np.asarray(v)).sum() for k, v in flat
              if "lora" in jax.tree_util.keystr(k)]
    # frozen bases: every decoder projection kernel gets zero grad
    dec_kernel_g = [np.abs(np.asarray(v)).sum() for k, v in flat
                    if "decoder" in jax.tree_util.keystr(k)
                    and "proj" in jax.tree_util.keystr(k)
                    and "lora" not in jax.tree_util.keystr(k)]
    assert sum(lora_g) > 0  # adapters train (lora_a grads flow via b? b=0
    # at init kills a-grads; the b-grads are the live ones)
    assert all(g == 0 for g in dec_kernel_g), dec_kernel_g


def test_vit_lora_surface_and_transparency():
    tower = build_qwen2_vit("qwen2_vit_tiny_test", image_size=32,
                            lora_rank=2, dtype=jnp.float32)
    base = build_qwen2_vit("qwen2_vit_tiny_test", image_size=32,
                           dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    frames = jax.random.normal(rng, (1, 2, 32, 32, 3))
    variables = tower.init(rng, frames)
    names = " ".join(_lora_leaf_names(variables["params"]))
    for t in ("qkv_lora_a", "proj_lora_a", "fc1_lora_a", "fc2_lora_a"):
        assert t in names, t
    got = tower.apply(variables, frames)["sequence"]
    want = base.apply({"params": _strip_lora(variables["params"])},
                      frames)["sequence"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_vit_lora_freeze_gradients():
    tower = build_qwen2_vit("qwen2_vit_tiny_test", image_size=32,
                            lora_rank=2, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    frames = jax.random.normal(rng, (1, 2, 32, 32, 3))
    variables = tower.init(rng, frames)

    def loss_fn(p):
        return (tower.apply({"params": p}, frames)["sequence"] ** 2).mean()

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for k, v in flat:
        ks = jax.tree_util.keystr(k)
        if "layer_" in ks and "lora" not in ks and "norm" not in ks \
                and "kernel" in ks:
            assert np.abs(np.asarray(v)).sum() == 0, ks


def test_pink_qv_recipe_unchanged():
    """The default ('q','v') target set keeps the existing Pink layout —
    no k/o/mlp adapters appear."""
    from antmmf_tpu.models.pink import PinkModel

    model = PinkModel(lm_preset="omni_tiny_test", vit_preset="vit_tiny_test",
                      image_size=32, lora_rank=2, dtype_str="float32")
    batch = {"input_ids": jnp.array([[5, 6, 7, 8]], jnp.int32),
             "input_mask": jnp.ones((1, 4), jnp.int32)}
    variables = model.init(jax.random.PRNGKey(0), batch)
    names = " ".join(_lora_leaf_names(variables["params"]))
    assert "q_lora_a" in names and "v_lora_a" in names
    assert "k_lora_a" not in names and "o_lora_a" not in names
    assert "gate_lora_a" not in names


def test_frozen_base_still_propagates_activation_gradients():
    """PEFT semantics: freezing the base must stop WEIGHT grads only — the
    activation gradient still flows W^T·dy through frozen projections. At
    init (lora_b = 0) the input gradient of a frozen-base LoRA layer is
    therefore EXACTLY the no-LoRA input gradient; the old output-level
    stop_gradient restricted it to the rank-r path (zero at init)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from antmmf_tpu.modules.llm import GQAttention
    from antmmf_tpu.modules.lora import LoRADense

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 6, 32)).astype(np.float32))
    pos = jnp.tile(jnp.arange(6)[None], (2, 1))

    plain = GQAttention(num_heads=4, num_kv_heads=2, dtype=jnp.float32)
    lora = GQAttention(num_heads=4, num_kv_heads=2, lora_rank=4,
                       lora_freeze_base=True, lora_targets=("q", "v", "o"),
                       dtype=jnp.float32)
    v_plain = plain.init(jax.random.PRNGKey(0), x, pos)
    v_lora = lora.init(jax.random.PRNGKey(0), x, pos)
    # same base kernels (lora params are extra leaves)
    for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
        v_lora["params"][proj]["kernel"] = v_plain["params"][proj]["kernel"]

    g_plain = jax.grad(lambda xx: jnp.sum(
        plain.apply(v_plain, xx, pos) ** 2))(x)
    g_lora = jax.grad(lambda xx: jnp.sum(
        lora.apply(v_lora, xx, pos) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_lora), np.asarray(g_plain),
                               atol=1e-5)
    assert float(np.abs(np.asarray(g_lora)).sum()) > 0

    # frozen base kernels get NO weight grad; adapters do
    def loss(p):
        return jnp.sum(lora.apply({"params": p}, x, pos) ** 2)

    g = jax.grad(loss)(v_lora["params"])
    assert float(np.abs(np.asarray(g["q_proj"]["kernel"])).sum()) == 0.0
    assert float(np.abs(np.asarray(g["k_proj"]["kernel"])).sum()) > 0  # not targeted
    assert float(np.abs(np.asarray(g["attention_q_lora_a"]
                 if "attention_q_lora_a" in g else g["q_lora_a"])).sum()) >= 0

    # LoRADense: same contract
    ld = LoRADense(16, rank=4, freeze_base=True, dtype=jnp.float32)
    xx = jnp.asarray(np.random.default_rng(1).standard_normal(
        (4, 8)).astype(np.float32))
    vd = ld.init(jax.random.PRNGKey(2), xx)
    gd = jax.grad(lambda p: jnp.sum(ld.apply({"params": p}, xx) ** 2))(
        vd["params"])
    assert float(np.abs(np.asarray(gd["base"]["kernel"])).sum()) == 0.0
    gx = jax.grad(lambda z: jnp.sum(ld.apply(vd, z) ** 2))(xx)
    assert float(np.abs(np.asarray(gx)).sum()) > 0  # flows through base W
