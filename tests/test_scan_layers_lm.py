"""scan_layers on DecoderLM: the nn.scan layer-stack layout must be
numerically identical to the python-loop layout given the same weights
(transferred via ``stack_decoder_layers``), across the training forward,
prefill, and decode paths, and its stacked params must pick up the
layer-dim-aware default sharding rule.

This is the production-scale memory structure (BASELINE round 4 AOT
evidence): with a python loop XLA hoists every fsdp all-gather and keeps
all grads live; scan bounds per-device temp to O(one layer).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec

from antmmf_tpu.modules.llm import (
    DecoderLM, init_decoder_cache, stack_decoder_layers,
    unstack_decoder_layers)
from antmmf_tpu.parallel.partitioning import (
    DEFAULT_RULES, infer_param_specs)

NL, H, NH, NKV, B, L = 3, 64, 4, 2, 2, 10


def _models(**kw):
    loop = DecoderLM(num_layers=NL, num_heads=NH, num_kv_heads=NKV,
                     dtype=jnp.float32, **kw)
    scan = DecoderLM(num_layers=NL, num_heads=NH, num_kv_heads=NKV,
                     dtype=jnp.float32, scan_layers=True, **kw)
    return loop, scan


def _inputs(rng=0):
    r = jax.random.PRNGKey(rng)
    x = jax.random.normal(r, (B, L, H), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(L), (B, L))
    return x, pos


class TestScanLayersEquivalence:
    def test_forward_matches_loop(self):
        loop, scan = _models()
        x, pos = _inputs()
        vl = loop.init(jax.random.PRNGKey(1), x, pos)
        vs = {"params": stack_decoder_layers(vl["params"])}
        yl = loop.apply(vl, x, pos)
        ys = scan.apply(vs, x, pos)
        np.testing.assert_allclose(np.asarray(yl), np.asarray(ys),
                                   rtol=2e-5, atol=2e-5)

    def test_forward_matches_with_remat(self):
        loop, _ = _models()
        scan = DecoderLM(num_layers=NL, num_heads=NH, num_kv_heads=NKV,
                         dtype=jnp.float32, scan_layers=True, remat=True)
        x, pos = _inputs()
        vl = loop.init(jax.random.PRNGKey(1), x, pos)
        vs = {"params": stack_decoder_layers(vl["params"])}

        def loss_scan(p):
            return jnp.sum(scan.apply({"params": p}, x, pos) ** 2)

        def loss_loop(p):
            return jnp.sum(loop.apply({"params": p}, x, pos) ** 2)

        ls, gs = jax.value_and_grad(loss_scan)(vs["params"])
        ll, gl = jax.value_and_grad(loss_loop)(vl["params"])
        np.testing.assert_allclose(float(ls), float(ll), rtol=1e-5)
        # grads in scan layout == stacked loop grads
        gl_stacked = stack_decoder_layers(gl)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(gs)[0],
                jax.tree_util.tree_flatten_with_path(gl_stacked)[0]):
            assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    def test_prefill_and_decode_match_loop(self):
        loop, scan = _models()
        x, pos = _inputs()
        vl = loop.init(jax.random.PRNGKey(1), x, pos)
        vs = {"params": stack_decoder_layers(vl["params"])}
        T = L + 4
        mask = jnp.ones((B, L), jnp.int32)

        cl = init_decoder_cache(NL, B, NKV, T, H // NH, jnp.float32)
        cs = init_decoder_cache(NL, B, NKV, T, H // NH, jnp.float32,
                                stacked=True)
        yl, cl = loop.apply(vl, x, pos, mask, cache=cl)
        ys, cs = scan.apply(vs, x, pos, mask, cache=cs)
        np.testing.assert_allclose(np.asarray(yl), np.asarray(ys),
                                   rtol=2e-5, atol=2e-5)
        # stacked cache contents == stacked per-layer caches
        for key in ("k", "v"):
            want = np.stack([np.asarray(c[key]) for c in cl])
            np.testing.assert_allclose(want, np.asarray(cs[key]),
                                       rtol=2e-5, atol=2e-5)

        # one decode step at per-row slots
        xd = jax.random.normal(jax.random.PRNGKey(7), (B, 1, H), jnp.float32)
        dpos = jnp.full((B, 1), L)
        dp = jnp.full((B,), L, jnp.int32)
        ydl, _ = loop.apply(vl, xd, dpos, cache=cl, decode_pos=dp)
        yds, _ = scan.apply(vs, xd, dpos, cache=cs, decode_pos=dp)
        np.testing.assert_allclose(np.asarray(ydl), np.asarray(yds),
                                   rtol=2e-5, atol=2e-5)

    def test_lora_and_adapters_layouts(self):
        # LoRA + serial adapters must stack too (pink/m2_omni recipes)
        loop = DecoderLM(num_layers=NL, num_heads=NH, num_kv_heads=NKV,
                         dtype=jnp.float32, lora_rank=2, adapter_dim=4)
        scan = DecoderLM(num_layers=NL, num_heads=NH, num_kv_heads=NKV,
                         dtype=jnp.float32, lora_rank=2, adapter_dim=4,
                         scan_layers=True)
        x, pos = _inputs()
        vl = loop.init(jax.random.PRNGKey(1), x, pos)
        vs = {"params": stack_decoder_layers(vl["params"])}
        np.testing.assert_allclose(
            np.asarray(loop.apply(vl, x, pos)),
            np.asarray(scan.apply(vs, x, pos)), rtol=2e-5, atol=2e-5)

    def test_stack_unstack_roundtrip(self):
        loop, _ = _models()
        x, pos = _inputs()
        vl = loop.init(jax.random.PRNGKey(1), x, pos)
        back = unstack_decoder_layers(stack_decoder_layers(vl["params"]))
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(vl["params"])[0],
                jax.tree_util.tree_flatten_with_path(back)[0]):
            assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_scan_init_shapes_match_stacked_loop(self):
        loop, scan = _models()
        x, pos = _inputs()
        stacked = jax.eval_shape(
            lambda r: stack_decoder_layers(loop.init(r, x, pos)["params"]),
            jax.random.PRNGKey(1))
        vs = jax.eval_shape(scan.init, jax.random.PRNGKey(1), x, pos)
        flat_a = jax.tree_util.tree_flatten_with_path(stacked)[0]
        flat_b = jax.tree_util.tree_flatten_with_path(vs["params"])[0]
        assert [(jax.tree_util.keystr(p), v.shape) for p, v in flat_a] == \
               [(jax.tree_util.keystr(p), v.shape) for p, v in flat_b]


class TestConvertScanLayout:
    def test_decoder_subtrees_stack_towers_untouched(self):
        # a pink-like tree: the decoder stacks, the vision tower (which
        # also names its blocks layer_i) must be left alone
        from antmmf_tpu.scripts.convert_checkpoint import _to_scan_layout

        loop, scan = _models()
        x, pos = _inputs()
        dec = loop.init(jax.random.PRNGKey(1), x, pos)["params"]
        tower = {"layer_0": {"kernel": jnp.ones((4, 4))},
                 "layer_1": {"kernel": jnp.ones((4, 4))}}
        tree = {"decoder": dec, "visual_tower": tower,
                "lm_head": {"kernel": jnp.ones((H, 7))}}
        out = _to_scan_layout(tree, "pink")
        assert "layers" in out["decoder"] and "layer_0" not in out["decoder"]
        assert set(out["visual_tower"]) == {"layer_0", "layer_1"}
        # the stacked tree drives the scan model to the loop's numerics
        yl = loop.apply({"params": dec}, x, pos)
        ys = scan.apply({"params": out["decoder"]}, x, pos)
        np.testing.assert_allclose(np.asarray(yl), np.asarray(ys),
                                   rtol=2e-5, atol=2e-5)


class TestScanLayersSharding:
    def test_default_rule_skips_layer_dim(self):
        _, scan = _models()
        x, pos = _inputs()
        vs = jax.eval_shape(scan.init, jax.random.PRNGKey(1), x, pos)
        specs = infer_param_specs(vs["params"], DEFAULT_RULES)
        flat = jax.tree_util.tree_flatten_with_path(
            specs, is_leaf=lambda s: isinstance(s, PartitionSpec))[0]
        seen_stacked = 0
        for path, spec in flat:
            ps = jax.tree_util.keystr(path)
            if "layers" in ps and ps.endswith("kernel']"):
                assert spec == PartitionSpec(None, "fsdp", None), (ps, spec)
                seen_stacked += 1
            elif "final_norm" in ps:
                assert spec == PartitionSpec()
        assert seen_stacked >= 4  # q/k/v/o at least
