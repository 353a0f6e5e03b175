import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from antmmf_tpu.parallel import collectives as coll
from antmmf_tpu.parallel.mesh import (
    batch_sharding,
    build_mesh,
    data_parallel_size,
    local_batch_size,
)
from antmmf_tpu.parallel.partitioning import (
    infer_param_specs,
    named_shardings,
    spec_for,
    validate_specs,
)


def test_build_mesh_fill_axis():
    mesh = build_mesh({"data": -1, "model": 2})
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    assert data_parallel_size(mesh) == 4
    assert local_batch_size(32, mesh) == 8


def test_build_mesh_rejects_bad_sizes():
    with pytest.raises(ValueError):
        build_mesh({"data": 3})
    with pytest.raises(ValueError):
        build_mesh({"data": -1, "model": -1})
    with pytest.raises(ValueError):
        build_mesh({"bogus_axis": 2})


def test_batch_sharding_places_shards():
    mesh = build_mesh({"data": 8})
    x = jnp.arange(16.0).reshape(16, 1)
    sharded = jax.device_put(x, batch_sharding(mesh, ndim=2))
    assert len(sharded.addressable_shards) == 8
    assert sharded.addressable_shards[0].data.shape == (2, 1)


def test_gather_with_grad_vjp_is_correct():
    """all_gather inside shard_map must behave like GradientAllGather: gradients of
    a loss on the gathered tensor flow back to every shard's producer."""
    mesh = build_mesh({"data": 8})

    def f(x):
        def inner(xs):
            g = coll.gather_with_grad(xs, "data")  # [8] on each replica
            return jnp.sum(g * g) / 2.0

        return shard_map(
            inner, mesh=mesh, in_specs=P("data"), out_specs=P(), check_vma=False
        )(x)

    # Every replica computes the identical replicated loss sum(x^2)/2; the global
    # function value is that scalar once, so d/dx_i must be exactly x_i — the
    # all_gather transpose (reduce-scatter) delivers the correct global gradient
    # to each shard's producer.
    x = jnp.arange(8.0)
    g = jax.grad(lambda x: f(x))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(x))


def test_pmean_dict_inside_shard_map():
    mesh = build_mesh({"data": 8})

    def step(x):
        def inner(xs):
            m = coll.pmean_dict({"loss": jnp.mean(xs)}, "data")
            return m["loss"]

        return shard_map(inner, mesh=mesh, in_specs=P("data"), out_specs=P())(x)

    x = jnp.arange(8.0)
    np.testing.assert_allclose(float(step(x)), 3.5)


def test_all_to_all_round_trip():
    mesh = build_mesh({"expert": 8, "data": 1})

    def f(x):
        def inner(xs):
            y = coll.all_to_all(xs, "expert", split_axis=0, concat_axis=0)
            return coll.all_to_all(y, "expert", split_axis=0, concat_axis=0)

        return shard_map(inner, mesh=mesh, in_specs=P("expert"), out_specs=P("expert"))(x)

    x = jnp.arange(64.0).reshape(64, 1).squeeze(-1)
    np.testing.assert_allclose(np.asarray(f(x)), np.asarray(x))


def test_host_level_helpers_single_process():
    assert coll.get_rank() == 0
    assert coll.get_world_size() == 1
    assert coll.is_main_process()
    assert coll.broadcast_scalar(3.5) == 3.5
    assert coll.all_gather_object({"a": 1}) == [{"a": 1}]
    coll.synchronize()


def test_spec_inference_rules():
    params = {
        "encoder": {"dense": {"kernel": jnp.zeros((16, 8)), "bias": jnp.zeros((8,))}},
        "embed": {"embedding": jnp.zeros((32, 16))},
    }
    rules = [
        [r".*dense/kernel", ["fsdp", "model"]],
        [r".*embedding", [None, "model"]],
        [r".*", None],
    ]
    specs = infer_param_specs(params, rules)
    assert specs["encoder"]["dense"]["kernel"] == P("fsdp", "model")
    assert specs["encoder"]["dense"]["bias"] == P()
    assert specs["embed"]["embedding"] == P(None, "model")

    mesh = build_mesh({"data": 2, "fsdp": 2, "model": 2})
    shardings = named_shardings(specs, mesh)
    placed = jax.device_put(params["encoder"]["dense"]["kernel"],
                            shardings["encoder"]["dense"]["kernel"])
    assert placed.sharding.spec == P("fsdp", "model")
    assert validate_specs(params, specs, mesh) == []

    bad = validate_specs({"w": jnp.zeros((5, 4))}, {"w": P("model", None)}, mesh)
    assert len(bad) == 1 and "not divisible" in bad[0]


def test_spec_for_rank_mismatch():
    # bias (rank 1) matching a rank-2 rule keeps trailing entries
    assert spec_for("x/kernel", 1, [(r".*kernel", ("fsdp", None))]) == P(None)
    # rules are right-aligned: a 2-D kernel rule on an nn.scan-stacked
    # [L, in, out] kernel shards `in`, never the leading layer dim
    assert spec_for("blocks_0_6/mlp/kernel", 3,
                    [(r".*kernel", ("fsdp", None))]) == P(None, "fsdp", None)
    # 3-D expert rule on a scanned 4-D [L, E, in, out] expert tensor
    assert spec_for("blocks_0_6/experts/w1", 4,
                    [(r".*experts/w1", ("expert", "fsdp", None))]) == \
        P(None, "expert", "fsdp", None)


def test_build_hybrid_dcn_mesh():
    """Multi-slice topology: dcn.data=2 slices × 4-way fsdp within each
    slice on the 8-device CPU mesh; a data-sharded matmul + psum over the
    combined axes matches the unsharded result."""
    mesh = build_mesh({"dcn": {"data": 2}, "fsdp": -1})
    assert mesh.shape["data"] == 2 and mesh.shape["fsdp"] == 4
    assert data_parallel_size(mesh) == 8

    x = np.random.default_rng(0).standard_normal((16, 8)).astype(np.float32)
    w = np.random.default_rng(1).standard_normal((8, 4)).astype(np.float32)

    @jax.jit
    def global_sum(x, w):
        return jnp.sum(x @ w)

    xs = jax.device_put(x, batch_sharding(mesh, ndim=2))
    ws = jax.device_put(w, jax.sharding.NamedSharding(mesh, P()))
    with mesh:
        got = float(global_sum(xs, ws))
    np.testing.assert_allclose(got, float(np.sum(x @ w)), rtol=2e-4)


def test_build_hybrid_dcn_mesh_validates():
    with pytest.raises(ValueError):
        build_mesh({"dcn": {"data": 3}})  # 8 % 3 != 0
    with pytest.raises(ValueError):
        build_mesh({"dcn": {"bogus": 2}})


def test_trainer_config_hybrid_dcn_mesh(tmp_path):
    """The multi-slice mesh is reachable from YAML: a trainer configured
    with mesh {dcn: {data: 2}, fsdp: -1} loads and takes train steps."""
    import os

    from antmmf_tpu.common.build import build_config
    from antmmf_tpu.trainers.build import build_trainer

    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "projects", "base_vtp", "configs", "video_retrieval.local.yml")
    cfg = build_config(cfg_path, opts=[
        "training_parameters.save_dir", str(tmp_path),
        "training_parameters.max_iterations", "2",
        "training_parameters.mesh.dcn.data", "2",
        "training_parameters.mesh.data", "1",
        "training_parameters.mesh.fsdp", "-1",
    ])
    trainer = build_trainer(cfg)
    trainer.load()
    # dcn 2 (slices) × per-slice fsdp 2 × model 2 (from the base config)
    assert trainer.mesh.shape["data"] == 2
    assert trainer.mesh.shape["fsdp"] == 2
    assert trainer.mesh.shape["model"] == 2
    trainer.train()
    assert int(trainer.state.step) == 2
