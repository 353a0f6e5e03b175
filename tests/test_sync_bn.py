"""Train-mode (Sync)BatchNorm parity.

Reference semantics: torchvision BN under DDP with convert_sync_batchnorm
(/root/reference/antmmf/trainers/base_trainer.py:358-362) — per-step stats
over the GLOBAL batch, EMA running stats. Pinned here against
torch.nn.BatchNorm2d in train mode, and the explicit-psum path against the
full-batch computation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from antmmf_tpu.modules.layers import SyncBatchNorm

F32 = jnp.float32


def _torch_bn(C, scale, bias):
    bn = torch.nn.BatchNorm2d(C, momentum=0.1, eps=1e-5)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(scale))
        bn.bias.copy_(torch.from_numpy(bias))
    return bn


def test_train_forward_and_running_stats_match_torch():
    rng = np.random.default_rng(0)
    B, H, W, C = 8, 5, 5, 6
    scale = rng.standard_normal(C).astype(np.float32)
    bias = rng.standard_normal(C).astype(np.float32)
    bn_t = _torch_bn(C, scale, bias).train()
    bn_j = SyncBatchNorm(use_running_average=False, dtype=F32)
    variables = bn_j.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 1, C)))
    variables = {
        "params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        "batch_stats": variables["batch_stats"],
    }
    stats = variables["batch_stats"]
    for step in range(3):
        x = rng.standard_normal((B, H, W, C)).astype(np.float32)
        out_t = bn_t(torch.from_numpy(x).permute(0, 3, 1, 2))
        out_j, updated = bn_j.apply(
            {"params": variables["params"], "batch_stats": stats},
            jnp.asarray(x), mutable=["batch_stats"])
        stats = updated["batch_stats"]
        np.testing.assert_allclose(
            np.asarray(out_j),
            out_t.detach().numpy().transpose(0, 2, 3, 1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               bn_t.running_mean.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               bn_t.running_var.numpy(), atol=2e-5)


def test_eval_uses_running_stats():
    rng = np.random.default_rng(1)
    C = 4
    bn = SyncBatchNorm(use_running_average=True, dtype=F32)
    mean = rng.standard_normal(C).astype(np.float32)
    var = rng.uniform(0.5, 2.0, C).astype(np.float32)
    variables = {
        "params": {"scale": jnp.ones((C,)), "bias": jnp.zeros((C,))},
        "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
    }
    x = rng.standard_normal((2, 3, 3, C)).astype(np.float32)
    out = bn.apply(variables, jnp.asarray(x))
    want = (x - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-5)


def test_explicit_psum_path_equals_global_batch():
    """axis_name psum inside shard_map == full-batch stats (the DDP SyncBN
    contract: stats over the whole global batch, not per shard)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from antmmf_tpu.parallel.mesh import build_mesh

    rng = np.random.default_rng(2)
    B, H, W, C = 8, 4, 4, 6
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    params = {"scale": jnp.ones((C,)), "bias": jnp.zeros((C,))}
    stats = {"mean": jnp.zeros((C,)), "var": jnp.ones((C,))}
    dense = SyncBatchNorm(use_running_average=False, dtype=F32)
    ref, upd_ref = dense.apply({"params": params, "batch_stats": stats}, x,
                               mutable=["batch_stats"])
    mesh = build_mesh({"data": 8})
    synced = SyncBatchNorm(use_running_average=False, axis_name="data",
                           dtype=F32)

    def body(xs):
        out, upd = synced.apply({"params": params, "batch_stats": stats},
                                xs, mutable=["batch_stats"])
        return out, upd["batch_stats"]["mean"], upd["batch_stats"]["var"]

    out, mean, var = shard_map(
        body, mesh=mesh, in_specs=P("data"),
        out_specs=(P("data"), P(), P()), check_vma=False)(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(mean), np.asarray(upd_ref["batch_stats"]["mean"]),
        atol=2e-5)
    # per-shard n=4·16 but global n=8·16: the unbiased correction differs by
    # (n-1) — accept the tiny bias delta on variance
    np.testing.assert_allclose(
        np.asarray(var), np.asarray(upd_ref["batch_stats"]["var"]),
        rtol=2e-2)


def test_resnet_bn_mode_trains_with_stats():
    from antmmf_tpu.modules.vision.resnet import ResNet

    net = ResNet(preset="resnet_tiny_test", width=32, norm="bn", dtype=F32)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (4, 32, 32, 3)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x, deterministic=False)
    assert "batch_stats" in variables
    out, updated = net.apply(variables, x, deterministic=False,
                             mutable=["batch_stats"])
    # stats moved away from init (zeros/ones)
    leaves = jax.tree_util.tree_leaves(updated["batch_stats"])
    assert any(float(np.abs(np.asarray(l)).sum()) > 0 for l in leaves)
    assert np.isfinite(np.asarray(out["pooled"])).all()

    def loss(p):
        out = net.apply({**variables, "params": p}, x, deterministic=False,
                        mutable=["batch_stats"])[0]
        return jnp.sum(out["pooled"] ** 2)

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))
    # gn mode (the default) declares no batch_stats
    gn = ResNet(preset="resnet_tiny_test", width=32, dtype=F32)
    v2 = gn.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" not in v2
