"""Rule-based parameter/activation sharding.

The reference has no tensor-parallel layout machinery (DDP replicates everything);
here sharding is a first-class config surface. Param shardings are inferred from
regex rules over the flattened parameter path, e.g.::

    param_sharding_rules:
      - [".*attention.*kernel",  [null, "model"]]   # shard heads over `model`
      - [".*mlp/fc1/kernel",     [null, "model"]]
      - [".*mlp/fc2/kernel",     ["model", null]]
      - [".*kernel",             ["fsdp", null]]    # ZeRO-3 fallback
      - [".*",                   null]              # replicate the rest

First matching rule wins. ``null`` (None) entries replicate that dimension; a rule
value of null replicates the whole tensor. An entry may also be a list of axis
names to shard one dimension over multiple mesh axes.

Used by the trainer to build `NamedSharding` trees for pjit in/out shardings and by
`shard_constraint` for activation annotations inside the step function.
"""

from __future__ import annotations

import re
from typing import Any, List, Optional, Sequence, Tuple, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

Rules = Sequence[Tuple[str, Optional[Sequence[Union[str, Sequence[str], None]]]]]

# Sensible defaults: FSDP-shard every large matmul kernel over `fsdp`, replicate
# biases/scales. With fsdp=1 these all collapse to full replication.
DEFAULT_RULES: Rules = (
    # scan_layers layouts (nn.scan over the layer stack, params under a
    # "layers/" subtree) carry a leading [num_layers] dim: shard the FIRST
    # FEATURE dim over fsdp, never the layer dim (a layer-dim shard would
    # turn every scan iteration's parameter slice into a cross-device
    # gather of a 1/fsdp-resident slab)
    (r"(.*/)?layers/.*(kernel|embedding)$", (None, "fsdp", None)),
    # same for stacked multiway runs (params under "blocks_{s}_{e}/")
    (r"(.*/)?blocks_\d+_\d+/.*(kernel|embedding)$", (None, "fsdp", None)),
    # LLM vocab matrices: shard the EMBED dim of the token table (vocab-dim
    # sharding makes XLA materialize the full fp32 [V, H] grad before the
    # reduce-scatter) and the VOCAB dim of lm_head (contraction-dim sharding
    # makes XLA all-gather the full fp32 [H, V] kernel per device — cheaper
    # for it than all-reducing [T, V] logits; vocab-parallel keeps logits
    # vocab-sharded through the softmax reductions). AOT top-tensor
    # evidence: BASELINE.md round-4 m2_omni_7b breakdown.
    (r".*token_embed/embedding$", (None, "fsdp")),
    (r".*lm_head/kernel$", (None, "fsdp")),
    (r".*(kernel|embedding)$", ("fsdp", None)),
    (r".*", None),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for(path_string: str, ndim: int, rules: Rules) -> PartitionSpec:
    for pattern, spec in rules:
        if re.fullmatch(pattern, path_string):
            if spec is None:
                return PartitionSpec()
            spec = list(spec)
            if len(spec) > ndim:
                # rule longer than tensor rank (e.g. bias matched a kernel rule):
                # keep the trailing dims' entries
                spec = spec[-ndim:] if ndim else []
            while len(spec) < ndim:
                # rule shorter than tensor rank: rules describe the TRAILING
                # dims (same right-alignment as the truncation above), so a
                # 2-D kernel rule applied to an nn.scan-stacked [L, in, out]
                # kernel shards `in`, never the layer dim. Before this, a
                # config's custom 2-D rules silently replicated every
                # scanned parameter (relax_to_divisible dropped the
                # layer-dim shard) — AOT-measured 79 GB/device of state on
                # the 10B MoE config (BASELINE.md round 4).
                spec.insert(0, None)
            # lists inside the spec mean "shard this dim over multiple axes"
            spec = [tuple(s) if isinstance(s, list) else s for s in spec]
            return PartitionSpec(*spec)
    return PartitionSpec()


def infer_param_specs(params: Any, rules: Optional[Rules] = None) -> Any:
    """Map a parameter pytree to a pytree of PartitionSpec via path-regex rules."""
    rules = tuple(rules) if rules else DEFAULT_RULES
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = [spec_for(_path_str(path), getattr(leaf, "ndim", 0), rules) for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, specs)


def named_shardings(specs: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, PartitionSpec),
    )


def shard_constraint(x: Any, spec: PartitionSpec, mesh: Optional[Mesh] = None) -> Any:
    """Annotate an intermediate value's sharding inside a jitted function."""
    if mesh is None:
        return jax.lax.with_sharding_constraint(x, spec)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def relax_to_divisible(specs: Any, tree: Any, mesh: Mesh) -> Any:
    """Drop sharding on any dimension whose size doesn't divide the mesh-axis
    product (e.g. a 5-token pos_embedding matched by a generic ``.*embedding``
    rule) — replication is always correct, so rules can stay generic."""

    def fix(spec: PartitionSpec, leaf: Any) -> PartitionSpec:
        if not hasattr(leaf, "shape"):
            return PartitionSpec()
        entries = []
        for dim, entry in enumerate(spec):
            if entry is None:
                entries.append(None)
                continue
            axes = entry if isinstance(entry, tuple) else (entry,)
            size = 1
            for a in axes:
                size *= mesh.shape[a]
            entries.append(entry if leaf.shape[dim] % size == 0 else None)
        return PartitionSpec(*entries)

    return jax.tree_util.tree_map(
        lambda s, l: fix(s, l), specs, tree,
        is_leaf=lambda x: isinstance(x, PartitionSpec),
    )


def validate_specs(params: Any, specs: Any, mesh: Mesh) -> List[str]:
    """Return a list of human-readable problems (dims not divisible by axis size)."""
    problems: List[str] = []
    flat_p, _ = jax.tree_util.tree_flatten_with_path(params)
    flat_s = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, PartitionSpec)
    )
    for (path, leaf), spec in zip(flat_p, flat_s):
        for dim, entry in enumerate(spec):
            if entry is None:
                continue
            axes = entry if isinstance(entry, tuple) else (entry,)
            size = 1
            for a in axes:
                size *= mesh.shape[a]
            if leaf.shape[dim] % size:
                problems.append(
                    f"{_path_str(path)}: dim {dim} ({leaf.shape[dim]}) not divisible "
                    f"by mesh axes {axes} (size {size})"
                )
    return problems


def ambient_mesh():
    """The mesh active for the CURRENT TRACE, or None.

    ``jax.sharding.get_abstract_mesh()`` only reflects
    ``jax.sharding.use_mesh`` / ``use_abstract_mesh`` scopes — under the
    classic ``with mesh:`` context manager (what the trainer and every
    harness here use) it returns an EMPTY mesh even while tracing a jit
    whose shardings live on that mesh. Fall back to the context manager's
    thread-local physical mesh so in-model sharding hints
    (``shard_batch_dim`` / ``shard_vocab_dim`` / the MoE expert-axis
    constraint) fire in both activation styles."""
    try:
        env = jax.sharding.get_abstract_mesh()
        if env is not None and getattr(env, "axis_names", None):
            return env
    except Exception:
        pass
    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            from jax.interpreters import pxla
            m = pxla.thread_resources.env.physical_mesh
        if m is not None and getattr(m, "axis_names", None) and not m.empty:
            return m
    except Exception:
        pass
    return None


def shard_vocab_dim(x: Any) -> Any:
    """Constrain the LAST dim over ``fsdp`` (dim 0 over ``data`` when it
    divides) — the Megatron vocab-parallel layout for LM logits and
    embedding-lookup outputs.

    Paired with the `(None, "fsdp")` param rules for ``token_embed`` /
    ``lm_head``, this is what keeps the vocab matrices out of the temp
    accounting: without it GSPMD all-gathers the full fp32 [H, V] lm_head
    per device (cheaper for it than all-reducing [T, V] logits) and
    materializes the full fp32 [V, H] embedding grad before its
    reduce-scatter — AOT-measured ~22 GB/device of vocab-sized temps on the
    7B config (BASELINE.md round-4 breakdown). Constraining the logits (and
    the lookup output, before re-sharding it to the batch layout) makes the
    head matmul local over the vocab shard and routes the embedding
    cotangent through the feature-sharded form. No-ops outside a mesh
    context, on meshes without a >1 ``fsdp`` axis, and on non-divisible
    shapes; numerics are unchanged (sharding hint only)."""
    env = ambient_mesh()
    if _mesh_is_manual(env):
        return x
    names = (env.axis_names or ()) if env is not None else ()
    fsdp_ok = "fsdp" in names and env.shape["fsdp"] > 1
    if not fsdp_ok or getattr(x, "ndim", 0) < 2:
        return x
    if x.shape[-1] % env.shape["fsdp"]:
        return x
    data_ok = ("data" in names and env.shape["data"] > 1
               and x.shape[0] % env.shape["data"] == 0)
    spec = PartitionSpec("data" if data_ok else None,
                         *([None] * (x.ndim - 2)), "fsdp")
    return jax.lax.with_sharding_constraint(x, spec)


def _mesh_is_manual(env) -> bool:
    """True when the current trace is INSIDE a shard_map body (mesh axes are
    Manual) — sharding constraints are illegal there."""
    if env is None:
        return False
    try:
        from jax.sharding import AxisType

        return any(t == AxisType.Manual
                   for t in (getattr(env, "axis_types", None) or ()))
    except Exception:
        return False


def shard_batch_dim(x: Any, seq: bool = False, feature: bool = False) -> Any:
    """Constrain dim 0 (batch) over whichever data-parallel mesh axes exist
    in the ambient mesh (``data``/``fsdp``), replicating the rest.
    ``seq=True`` additionally constrains dim 1 over a ``seq`` axis when the
    mesh has one — the sequence-parallel decoder's layer-boundary layout
    (P(data, seq, None)), keeping remat-saved activations O(L/P) per device.
    ``feature=True`` switches to the 2D layout P("data", …, "fsdp") (batch
    over data ONLY, last dim over fsdp) when both divide — the layout whose
    backward reshard toward fsdp-contraction-sharded kernel grads is a pure
    all-gather over ``data``. The merged P(("data","fsdp"), …) layout needs a
    transposed-device-order hop there and GSPMD falls back to involuntary
    full rematerialization (MULTICHIP r4 tail; fixed round 5 — measured 0
    warnings with identical loss on the scan-layers Pink step).

    The annotation that keeps REMAT-SAVED activations stored sharded:
    without it, GSPMD's involuntary reshards around fsdp-sharded kernels
    leave each layer's saved boundary tensor REPLICATED per device — at 7B
    scale that measured as ~50-65 GB/device of temp in the AOT accounting
    (BASELINE.md round-4 AOT table). No-ops outside a mesh context and on
    meshes without those axes; numerics are unchanged (sharding hint only).
    """
    env = ambient_mesh()
    if _mesh_is_manual(env):
        # inside a shard_map body (pipeline stages): axes are Manual and
        # with_sharding_constraint is illegal — per-shard values are
        # already local, nothing to hint
        return x
    if feature and env is not None and getattr(x, "ndim", 0) >= 2:
        names = env.axis_names or ()
        data_ok = "data" in names and env.shape["data"] > 1 \
            and x.shape[0] % env.shape["data"] == 0
        fsdp_ok = "fsdp" in names and env.shape["fsdp"] > 1 \
            and x.shape[-1] % env.shape["fsdp"] == 0
        if data_ok and fsdp_ok:
            spec = PartitionSpec("data", *([None] * (x.ndim - 2)), "fsdp")
            return jax.lax.with_sharding_constraint(x, spec)
    axes = tuple(a for a in ("data", "fsdp")
                 if env is not None and a in (env.axis_names or ())
                 and env.shape[a] > 1)
    seq_ax = None
    if (seq and env is not None and "seq" in (env.axis_names or ())
            and env.shape["seq"] > 1 and getattr(x, "ndim", 0) >= 2
            and x.shape[1] % env.shape["seq"] == 0):
        seq_ax = "seq"
    if (not axes and seq_ax is None) or getattr(x, "ndim", 0) < 1:
        return x
    if axes and x.shape[0] % int(np.prod([env.shape[a] for a in axes])):
        axes = ()
        if seq_ax is None:
            return x
    batch_spec = (axes if len(axes) > 1 else axes[0]) if axes else None
    spec = PartitionSpec(batch_spec, seq_ax, *([None] * (x.ndim - 2))) \
        if x.ndim >= 2 else PartitionSpec(batch_spec)
    return jax.lax.with_sharding_constraint(x, spec)
