"""Pipeline parallelism: GPipe microbatch pipe over the model axis."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.parallel.mesh import build_mesh
from antmmf_tpu.parallel.pipeline import (
    pipeline_apply,
    split_microbatches,
    stack_stage_params,
)


class Block(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.tanh(nn.Dense(x.shape[-1], name="fc")(x))


def _setup(S=4, M=8, mb=2, D=16):
    mesh = build_mesh({"model": S, "data": 8 // S})
    block = Block()
    keys = jax.random.split(jax.random.PRNGKey(0), S)
    stage_list = [block.init(k, jnp.ones((mb, D)))["params"] for k in keys]
    stacked = stack_stage_params(stage_list)
    x = jax.random.normal(jax.random.PRNGKey(1), (M * mb, D))
    mbs = split_microbatches(x, M)

    def stage_fn(params, h):
        return block.apply({"params": params}, h)

    return mesh, block, stage_list, stacked, mbs, x


def _sequential_reference(block, stage_list, x):
    h = x
    for p in stage_list:
        h = block.apply({"params": p}, h)
    return h


def test_pipeline_matches_sequential():
    mesh, block, stage_list, stacked, mbs, x = _setup()
    out = pipeline_apply(
        lambda p, h: block.apply({"params": p}, h), stacked, mbs, mesh)
    ref = _sequential_reference(block, stage_list, x)
    np.testing.assert_allclose(np.asarray(out.reshape(ref.shape)),
                               np.asarray(ref), atol=1e-5)


def test_pipeline_is_differentiable():
    mesh, block, stage_list, stacked, mbs, x = _setup(S=2, M=4)

    def loss(params):
        out = pipeline_apply(
            lambda p, h: block.apply({"params": p}, h), params, mbs, mesh)
        return jnp.sum(out ** 2)

    def ref_loss(params_list):
        return jnp.sum(_sequential_reference(block, params_list, x) ** 2)

    g = jax.grad(loss)(stacked)
    g_ref = jax.grad(ref_loss)(stage_list)
    g_ref_stacked = stack_stage_params(g_ref)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-4),
        g, g_ref_stacked)


def test_split_microbatches_validates():
    import pytest

    with pytest.raises(ValueError):
        split_microbatches(jnp.ones((10, 4)), 3)
