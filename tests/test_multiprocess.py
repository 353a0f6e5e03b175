"""Real multi-process distributed bootstrap: 2 CPU processes × 4 virtual
devices each via the launcher — exercising jax.distributed init,
make_array_from_process_local_data over a global mesh, cross-process reduction,
broadcast_scalar, and the barrier (the multi-host code path the driver's
dryrun cannot reach in-process)."""

import os
import sys
import textwrap

import pytest

from antmmf_tpu.utils.launch import launch

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from antmmf_tpu.parallel import collectives as coll
    coll.init_distributed(
        coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
        num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=int(os.environ["JAX_PROCESS_INDEX"]),
    )
    assert coll.get_world_size() == 2
    assert len(jax.devices()) == 8
    import numpy as np
    from antmmf_tpu.parallel.mesh import build_mesh, batch_spec
    mesh = build_mesh({{"data": -1}})
    sharding = jax.sharding.NamedSharding(mesh, batch_spec())
    local = np.full((4, 2), float(coll.get_rank() + 1), np.float32)
    arr = jax.make_array_from_process_local_data(sharding, local)
    total = jax.jit(lambda x: x.sum())(arr)
    assert abs(float(total) - 24.0) < 1e-5
    assert coll.broadcast_scalar(
        42.0 if coll.get_rank() == 0 else 0.0) == 42.0
    coll.synchronize("done")
""")


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo=repo))
    env = {k: v for k, v in os.environ.items()}
    code = launch([str(worker)], nproc=2, coordinator_port=12433,
                  poll_seconds=1)
    assert code == 0
