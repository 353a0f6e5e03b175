"""Production-config build/compile CI.

The reference uses its local_test configs as install verification
(reference prj/base_vtp/README.md:44-49); the production YAMLs themselves were
never machine-checked and could rot. Here EVERY ``projects/*/configs/*.yml``
(non-local included) must:

1. parse through ``build_config`` (includes/override machinery),
2. build its model at the REAL preset and shape-check ``init`` via
   ``jax.eval_shape`` (no RAM blowup — the 10B MoE stays abstract),
3. apply the declared sharding rules against a virtual 8-device mesh carrying
   the SAME axis names as the declared ``training_parameters.mesh`` (scaled
   down), with divisibility relaxation producing a valid placement,
4. for the 10B MoE config, SPMD-lower a tiny-batch loss+grad step and (when
   the backend reports it) bound per-device memory via
   ``compiled.memory_analysis()``.

A rotted production YAML (bad key, preset mismatch, unshardable rule) fails
this suite.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import ShapeDtypeStruct

import antmmf_tpu.models  # noqa: F401 — registry side-effects
import antmmf_tpu.modules.graph  # noqa: F401
from antmmf_tpu.common.build import build_config
from antmmf_tpu.models.base_model import build_model
from antmmf_tpu.parallel.mesh import MESH_AXES, build_mesh
from antmmf_tpu.parallel.partitioning import (
    infer_param_specs, relax_to_divisible, validate_specs)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(
    glob.glob(os.path.join(ROOT, "projects", "*", "configs", "*.yml")))
assert CONFIGS, "no production configs found"


def _sds(shape, dtype=jnp.float32):
    return ShapeDtypeStruct(shape, dtype)


def _frames_per_clip(config):
    """Find frames_per_clip in any task dataset_attributes; default 4."""
    for task in dict(config.get("task_attributes", {}) or {}).values():
        for ds in dict(task.get("dataset_attributes", {}) or {}).values():
            if "frames_per_clip" in ds:
                return int(ds["frames_per_clip"])
    return 4


def _text_len(config, default=30):
    for task in dict(config.get("task_attributes", {}) or {}).values():
        for ds in dict(task.get("dataset_attributes", {}) or {}).values():
            if "max_text_len" in ds:
                return int(ds["max_text_len"])
    return default


def example_batch(model_key, mc, config, batch=2):
    """Abstract (shape-only) batch for each production model family."""
    B = batch
    S = int(mc.get("image_size", 224))
    i64 = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
    if model_key in ("univl_retrieval", "univl_pretrain", "dmae_retrieval",
                     "univl_cls", "univl_mcqa", "univl_caption"):
        F = int(mc.get("n_clips", 1)) * _frames_per_clip(config)
        L = _text_len(config)
        b = {
            "image_data": _sds((B, F, S, S, 3)),
            "video_mask": _sds((B, F), i64),
            "caption_input_ids": _sds((B, L), i64),
            "caption_input_mask": _sds((B, L), i64),
            "caption_segment_ids": _sds((B, L), i64),
        }
        if model_key == "univl_pretrain":
            b["caption_lm_label_ids"] = _sds((B, L), i64)
            b["caption_raw_input_ids"] = _sds((B, L), i64)
        if model_key == "univl_cls":
            b["targets"] = _sds((B,), i64)
        return b
    if model_key == "m2_encoder":
        L = _text_len(config, 52)
        return {
            "image": _sds((B, S, S, 3)),
            "input_ids": _sds((B, L), i64),
            "input_mask": _sds((B, L), i64),
        }
    if model_key == "m2_omni":
        L = 32
        b = {
            "input_ids": _sds((B, L), jnp.int32),
            "input_mask": _sds((B, L), jnp.int32),
            "image_data": _sds((B, 1, S, S, 3)),
            "labels": _sds((B, L), jnp.int32),
        }
        if mc.get("audio_token_id") is not None:
            b["audio"] = _sds((B, 64, 80))
        return b
    if model_key == "pink":
        L = 32
        return {
            "input_ids": _sds((B, L), jnp.int32),
            "input_mask": _sds((B, L), jnp.int32),
            "image_data": _sds((B, S, S, 3)),
            "labels": _sds((B, L), jnp.int32),
        }
    if model_key == "univl_roi":
        L = _text_len(config)
        task = list(dict(config.get("task_attributes", {}) or {}).values())
        ds = dict(list(dict(task[0].get("dataset_attributes", {})
                            ).values())[0]) if task else {}
        region = dict(ds.get("region", {}) or {})
        R = int(region.get("max_features", 10))
        D = int(mc.get("region_dim", 2048))
        C = int(mc.get("region_classes", 13))
        Lo = int(dict(ds.get("ocr", {}) or {}).get("max_length", 64))
        return {
            "caption_input_ids": _sds((B, L), i64),
            "caption_input_mask": _sds((B, L), i64),
            "caption_segment_ids": _sds((B, L), i64),
            "caption_lm_label_ids": _sds((B, L), i64),
            "region_feature": _sds((B, R, D)),
            "region_boxes": _sds((B, R, 5)),
            "region_mask": _sds((B, R), i64),
            "region_to_predict": _sds((B, R), i64),
            "region_cls_dis": _sds((B, R, C)),
            "ocr_input_ids": _sds((B, Lo), i64),
            "ocr_input_mask": _sds((B, Lo), i64),
            "ocr_bboxes": _sds((B, Lo, 4), i64),
            "itm_labels": _sds((B,), i64),
        }
    if model_key == "comp_gcn":
        E = 16
        return {
            "edge_index": _sds((2, E), jnp.int32),
            "edge_type": _sds((E,), jnp.int32),
            "head": _sds((B,), jnp.int32),
            "relation": _sds((B,), jnp.int32),
            "targets": _sds((B,), jnp.int32),
        }
    raise KeyError(f"no example-batch builder for model {model_key!r} — "
                   f"add one so this config stays CI-covered")


def scaled_mesh_sizes(tp_mesh):
    """Scale the declared mesh to 8 virtual devices, KEEPING the axis names:
    every axis the config shards over (size != 1, incl. -1 fill and dcn
    factors) gets >= 2-way on the test mesh."""
    cfg = dict(tp_mesh or {"data": -1})
    dcn = dict(cfg.pop("dcn", None) or {})
    for a, s in dcn.items():
        base = cfg.get(a, 1)
        base = 1 if base in (-1, None) else int(base)
        cfg[a] = max(base, 1) * int(s)
    named = [a for a in MESH_AXES
             if cfg.get(a) is not None and cfg.get(a) != 1]
    sizes = {a: 1 for a in MESH_AXES}
    budget = 8
    for a in named:
        if budget >= 2:
            sizes[a] = 2
            budget //= 2
    first = named[0] if named else "data"
    sizes[first] *= budget
    return {a: s for a, s in sizes.items() if s > 1}


def _load(path):
    return build_config(path)


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[os.path.relpath(p, ROOT) for p in CONFIGS])
def test_config_parses_builds_and_shards(path):
    config = _load(path)
    attrs = dict(config.get("model_attributes", {}) or {})
    if not attrs:
        pytest.skip("no model_attributes (pure data/serving config)")
    model_name = list(attrs)[0]
    mc = dict(attrs[model_name])
    model_key = mc.get("model_class", model_name)

    shell = build_model(config, model_name, for_test=True)
    batch = example_batch(model_key, mc, config)
    rng = jax.random.PRNGKey(0)
    variables = jax.eval_shape(lambda r, b: shell.init(r, b), rng, batch)
    params = variables["params"]
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    assert n_params > 0

    tp = dict(config.get("training_parameters", {}) or {})
    sizes = scaled_mesh_sizes(tp.get("mesh"))
    mesh = build_mesh(sizes, devices=jax.devices()[:8])
    rules = tp.get("param_sharding_rules")
    if rules is not None:
        rules = [tuple(r) for r in rules]
    specs = infer_param_specs(params, rules)
    relaxed = relax_to_divisible(specs, params, mesh)
    problems = validate_specs(params, relaxed, mesh)
    assert problems == [], problems

    # configs that declare param sharding must actually shard something
    if rules and any(ax in sizes for ax in ("fsdp", "model")):
        sharded = [s for s in jax.tree_util.tree_leaves(
            relaxed, is_leaf=lambda x: hasattr(x, "index") and not
            isinstance(x, (list, tuple, dict)))]
        from jax.sharding import PartitionSpec
        flat = jax.tree_util.tree_leaves(
            relaxed, is_leaf=lambda x: isinstance(x, PartitionSpec))
        assert any(any(ax is not None for ax in s) for s in flat
                   if isinstance(s, PartitionSpec)), \
            "declared sharding rules relaxed away entirely"


def test_scaled_mesh_preserves_axis_names():
    assert scaled_mesh_sizes({"data": 4, "fsdp": 32, "expert": 2}) == {
        "data": 2, "fsdp": 2, "expert": 2}
    assert scaled_mesh_sizes({"data": -1}) == {"data": 8}
    assert scaled_mesh_sizes({"data": 2, "seq": 4}) == {"data": 4, "seq": 2}
    assert scaled_mesh_sizes({"data": 4, "model": 2}) == {
        "data": 4, "model": 2}
    assert scaled_mesh_sizes({"dcn": {"data": 2}, "fsdp": -1}) == {
        "data": 4, "fsdp": 2}


def test_10b_moe_step_lowers_with_declared_sharding():
    """The flagship scale config: SPMD-lower loss+grad for the REAL 10B MoE
    preset on the scaled mesh. Lowering type-checks every collective and
    sharding constraint; memory_analysis (when the backend provides it)
    bounds per-device usage."""
    path = os.path.join(ROOT, "projects", "m2_encoder", "configs",
                        "m2_encoder_10b_moe.yml")
    config = _load(path)
    shell = build_model(config, for_test=True)
    mc = dict(config["model_attributes"]["m2_encoder"])
    batch = example_batch("m2_encoder", mc, config, batch=8)
    rng = jax.random.PRNGKey(0)
    variables = jax.eval_shape(lambda r, b: shell.init(r, b), rng, batch)

    tp = dict(config.get("training_parameters", {}) or {})
    sizes = scaled_mesh_sizes(tp.get("mesh"))
    assert set(sizes) == {"data", "fsdp", "expert"}
    mesh = build_mesh(sizes, devices=jax.devices()[:8])
    rules = tp.get("param_sharding_rules")
    if rules is not None:
        rules = [tuple(r) for r in rules]
    specs = infer_param_specs(variables, rules)
    relaxed = relax_to_divisible(specs, variables, mesh)
    assert validate_specs(variables, relaxed, mesh) == []

    from jax.sharding import NamedSharding, PartitionSpec

    var_shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), relaxed,
        is_leaf=lambda x: isinstance(x, PartitionSpec))
    batch_sharding = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, PartitionSpec(("data", "fsdp"))), batch)

    def loss(variables, batch):
        total, _ = shell.loss_fn(variables, batch, deterministic=True)
        return total

    step = jax.jit(jax.value_and_grad(loss),
                   in_shardings=(var_shardings, batch_sharding))
    with mesh:
        lowered = step.lower(variables, batch)
    # SPMD lowering type-checks every collective/sharding constraint at the
    # REAL 10B preset — a rotted config or rule fails here.
    assert len(lowered.as_text(dialect="stablehlo")) > 0
    # Full XLA compile + per-device memory bound: ~18 min on the 1-core CPU
    # box, so opt-in (ANTMMF_HEAVY_CI=1); the driver's multichip dryrun
    # exercises compiled execution separately.
    if not os.environ.get("ANTMMF_HEAVY_CI"):
        return
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    if mem is not None and hasattr(mem, "argument_size_in_bytes"):
        total = (mem.argument_size_in_bytes + mem.output_size_in_bytes +
                 mem.temp_size_in_bytes)
        # Replication-blowup tripwire only: XLA:CPU's accounting is a loose
        # upper bound (bf16 temps stored f32, little fusion) and measured
        # 80.9 GB for the SAME program on the round-4 AND round-5 trees —
        # the authoritative budget check is the abstract-v5e AOT compile
        # (scripts/aot_memory.py, real 15.75 GB HBM enforced; BASELINE.md
        # round-5), which this config passes. A replicated-everything
        # program measures 200+ GB here.
        assert total < 150e9, f"per-device memory {total/1e9:.1f} GB"


def _analytic_per_device_bytes(tree, specs, sizes):
    """Per-device resident bytes for a (shape-only) pytree under declared
    PartitionSpecs on a mesh of ``sizes`` — leaves whose sharded dim does
    not divide are counted UNsharded (mirrors relax_to_divisible)."""
    from jax.sharding import PartitionSpec

    flat_t = {jax.tree_util.keystr(p): l for p, l in
              jax.tree_util.tree_leaves_with_path(tree)}
    flat_s = {jax.tree_util.keystr(p): s for p, s in
              jax.tree_util.tree_leaves_with_path(
                  specs, is_leaf=lambda x: isinstance(x, PartitionSpec))}
    total = 0
    for key, leaf in flat_t.items():
        shape = getattr(leaf, "shape", None)
        dtype = getattr(leaf, "dtype", None)
        if shape is None or dtype is None:  # MaskedNode etc. — stateless
            continue
        nbytes = int(np.prod(shape)) * jnp.dtype(dtype).itemsize \
            if shape else jnp.dtype(dtype).itemsize
        spec = flat_s.get(key)
        div = 1
        if spec is not None:
            for d, ax in enumerate(tuple(spec)):
                axes = (ax,) if isinstance(ax, str) else tuple(ax or ())
                f = 1
                for a in axes:
                    f *= int(sizes.get(a, 1))
                if f > 1 and d < len(shape) and shape[d] % f == 0:
                    div *= f
        total += nbytes // div
    return total


def _declared_mesh_sizes(tp):
    cfg = dict(tp.get("mesh") or {})
    dcn = dict(cfg.pop("dcn", None) or {})
    for a, s in dcn.items():
        base = cfg.get(a, 1)
        base = 1 if base in (-1, None) else int(base)
        cfg[a] = max(base, 1) * int(s)
    return {a: int(s) for a, s in cfg.items()
            if s not in (None,) and int(s) > 1}


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[os.path.relpath(p, ROOT) for p in CONFIGS])
def test_declared_mesh_state_fits_hbm(path):
    """Regression tripwire for mesh fiction (a config once declared v5e-8
    for a 7B full finetune that AOT-measured 121 GB/device): at the
    DECLARED mesh, per-device RESIDENT state (params + optimizer state +
    batch shard) must leave headroom for activations under the 16 GB v5e
    HBM. Analytic eval_shape accounting — no compile; the authoritative
    peak (incl. temps) is scripts/aot_memory.py (BASELINE.md table)."""
    config = _load(path)
    attrs = dict(config.get("model_attributes", {}) or {})
    if not attrs:
        pytest.skip("no model_attributes")
    tp = dict(config.get("training_parameters", {}) or {})
    sizes = _declared_mesh_sizes(tp)
    model_name = list(attrs)[0]
    mc = dict(attrs[model_name])
    model_key = mc.get("model_class", model_name)

    shell = build_model(config, model_name, for_test=True)
    batch = example_batch(model_key, mc, config,
                          batch=int(tp.get("batch_size", 8)))
    variables = jax.eval_shape(lambda r, b: shell.init(r, b),
                               jax.random.PRNGKey(0), batch)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(variables))
    if n_params < 5e8 and not sizes:
        return  # sub-0.5B on a default mesh always fits

    from antmmf_tpu.optimizer.build import build_optimizer

    tx, _ = build_optimizer(
        variables["params"],
        dict(config.get("optimizer_attributes",
                        {"type": "adam_w", "params": {"lr": 1e-4}}) or {}),
        tp)
    opt_shape = jax.eval_shape(tx.init, variables["params"])
    rules = tp.get("param_sharding_rules")
    if rules is not None:
        rules = [tuple(r) for r in rules]
    param_specs = infer_param_specs(variables, rules)
    opt_specs = infer_param_specs(opt_shape, rules)
    state = _analytic_per_device_bytes(variables, param_specs, sizes) \
        + _analytic_per_device_bytes(opt_shape, opt_specs, sizes)
    data_div = int(np.prod([sizes.get(a, 1) for a in ("data", "fsdp")]))
    batch_bytes = sum(int(np.prod(b.shape)) * jnp.dtype(b.dtype).itemsize
                      for b in jax.tree_util.tree_leaves(batch)) // max(
                          data_div, 1)
    per_device_gb = (state + batch_bytes) / 1e9
    # 12 GB resident budget leaves ≥4 GB for activations/temps (AOT-measured
    # temps on the 7B configs: 2.3-3.5 GB, BASELINE.md round-5 table)
    assert per_device_gb < 12.0, (
        f"{os.path.relpath(path, ROOT)}: {per_device_gb:.1f} GB/device of "
        f"resident state at declared mesh {sizes} — the mesh is fiction; "
        f"re-declare (see scripts/aot_memory.py)")
