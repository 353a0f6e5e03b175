"""scan_layers on MultiwayTransformer: runs of identical blocks fold into
nn.scan bodies (params stacked under ``blocks_{s}_{e}``), MoE / vlffn
boundary blocks stay plain — numerics must equal the python-loop layout
given the same weights (``stack_multiway_blocks``), for every modality
stream and through grads. The production-scale memory structure for the
10B MoE config (BASELINE round 4 AOT evidence)."""

import jax
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.models.m2_encoder import (
    FUSION_EXPERT, LANGUAGE_EXPERT, VISION_EXPERT, MultiwayTransformer,
    multiway_runs, stack_multiway_blocks, stack_multiway_blocks_auto)

NL, C, NH, B, L = 5, 32, 2, 2, 6
MOE = (2,)
VL_START = 4  # the default for 5 layers: max(0, 5 - max(1, 5 // 6))


def _models():
    kw = dict(embed_dim=C, num_layers=NL, num_heads=NH, moe_layers=MOE,
              moe_num_experts=4, use_pallas=False, dtype=jnp.float32)
    return (MultiwayTransformer(**kw),
            MultiwayTransformer(scan_layers=True, **kw))


def _stack(params):
    return stack_multiway_blocks(params, NL, MOE, VL_START)


def test_runs_segmentation():
    assert multiway_runs(NL, MOE, VL_START) == [
        (0, 2, False, False), (2, 1, False, True),
        (3, 1, False, False), (4, 1, True, False)]
    # the 10B shape: 6 segments of 7 dense + 1 moe, vlffn on the last
    runs = multiway_runs(48, (7, 15, 23, 31, 39, 47), 40)
    assert len(runs) == 12 and runs[0] == (0, 7, False, False)
    assert runs[-1] == (47, 1, True, True)
    assert runs[-2] == (40, 7, True, False)


def _deep_merge(a, b):
    from collections.abc import Mapping
    out = dict(a)
    for k, v in b.items():
        out[k] = (_deep_merge(out[k], v)
                  if k in out and isinstance(v, Mapping) else out.get(k, v))
    return out


def test_all_modalities_match_loop():
    import flax.core

    loop, scan = _models()
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, C), jnp.float32)
    # compact creates params on use: init every modality stream, deep-merge
    # (shared modules get identical values — same rng, same paths)
    vp = {}
    for m, tl in ((VISION_EXPERT, 0), (LANGUAGE_EXPERT, 0),
                  (FUSION_EXPERT, 2)):
        got = flax.core.unfreeze(
            loop.init(jax.random.PRNGKey(1), x, m, text_len=tl)["params"])
        vp = _deep_merge(vp, got)
    vl = {"params": vp}
    vs = {"params": _stack(vp)}
    for m, tl in ((VISION_EXPERT, 0), (LANGUAGE_EXPERT, 0),
                  (FUSION_EXPERT, 2)):
        yl, auxl = loop.apply(vl, x, m, text_len=tl)
        ys, auxs = scan.apply(vs, x, m, text_len=tl)
        np.testing.assert_allclose(np.asarray(yl), np.asarray(ys),
                                   rtol=2e-5, atol=2e-5, err_msg=str(m))
        for k in auxl:
            np.testing.assert_allclose(float(auxl[k]), float(auxs[k]),
                                       rtol=2e-5, atol=2e-5)


def test_grads_match_loop_with_remat():
    kw = dict(embed_dim=C, num_layers=NL, num_heads=NH, moe_layers=MOE,
              moe_num_experts=4, use_pallas=False, dtype=jnp.float32)
    loop = MultiwayTransformer(**kw)
    scan = MultiwayTransformer(scan_layers=True, remat=True, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, C), jnp.float32)
    vl = loop.init(jax.random.PRNGKey(1), x, VISION_EXPERT)

    def loss_loop(p):
        y, aux = loop.apply({"params": p}, x, VISION_EXPERT)
        return jnp.sum(y ** 2) + aux.get("load_balance_loss", 0.0)

    def loss_scan(p):
        y, aux = scan.apply({"params": p}, x, VISION_EXPERT)
        return jnp.sum(y ** 2) + aux.get("load_balance_loss", 0.0)

    ll, gl = jax.value_and_grad(loss_loop)(vl["params"])
    ls, gs = jax.value_and_grad(loss_scan)(_stack(vl["params"]))
    np.testing.assert_allclose(float(ll), float(ls), rtol=1e-5)
    gl_stacked = _stack(gl)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(gs)[0],
            jax.tree_util.tree_flatten_with_path(gl_stacked)[0]):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=jax.tree_util.keystr(pa))


def test_auto_stack_matches_config_stack():
    # convert_checkpoint --scan_layers has only the param tree: the
    # structure-inferred segmentation must equal the config-driven one
    import flax.core

    loop, _ = _models()
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, C), jnp.float32)
    vp = {}
    for m, tl in ((VISION_EXPERT, 0), (LANGUAGE_EXPERT, 0),
                  (FUSION_EXPERT, 2)):
        vp = _deep_merge(vp, flax.core.unfreeze(
            loop.init(jax.random.PRNGKey(1), x, m, text_len=tl)["params"]))
    want = _stack(vp)
    got = stack_multiway_blocks_auto(vp)
    fa = jax.tree_util.tree_flatten_with_path(want)[0]
    fb = jax.tree_util.tree_flatten_with_path(got)[0]
    assert [(jax.tree_util.keystr(p), v.shape) for p, v in fa] == \
           [(jax.tree_util.keystr(p), v.shape) for p, v in fb]
    for (_, a), (_, b) in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stacked_blocks_default_sharding_skips_run_dim():
    from jax.sharding import PartitionSpec

    from antmmf_tpu.parallel.partitioning import (
        DEFAULT_RULES, infer_param_specs)

    _, scan = _models()
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, C), jnp.float32)
    vs = jax.eval_shape(lambda r: scan.init(r, x, VISION_EXPERT),
                        jax.random.PRNGKey(1))
    specs = infer_param_specs(vs["params"], DEFAULT_RULES)
    flat = jax.tree_util.tree_flatten_with_path(
        specs, is_leaf=lambda s: isinstance(s, PartitionSpec))[0]
    seen = 0
    for path, spec in flat:
        ps = jax.tree_util.keystr(path)
        if "blocks_0_1" in ps and ps.endswith("kernel']"):
            assert spec == PartitionSpec(None, "fsdp", None), (ps, spec)
            seen += 1
    assert seen >= 4  # q/k/v/out at least


def test_scan_init_shapes_match_stacked_loop():
    loop, scan = _models()
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, C), jnp.float32)
    stacked = jax.eval_shape(
        lambda r: _stack(loop.init(r, x, VISION_EXPERT)["params"]),
        jax.random.PRNGKey(1))
    vs = jax.eval_shape(lambda r: scan.init(r, x, VISION_EXPERT),
                        jax.random.PRNGKey(1))
    fa = jax.tree_util.tree_flatten_with_path(stacked)[0]
    fb = jax.tree_util.tree_flatten_with_path(vs["params"])[0]
    assert [(jax.tree_util.keystr(p), v.shape) for p, v in fa] == \
           [(jax.tree_util.keystr(p), v.shape) for p, v in fb]
