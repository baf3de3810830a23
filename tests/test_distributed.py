"""Multi-device scale-out path on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax

from passport_zk_circuits_tpu.parallel import distributed as dist
from passport_zk_circuits_tpu.parallel import mesh as pmesh



pytestmark = pytest.mark.slow  # big-graph compile tier (SURVEY §4 budget)

def test_hybrid_mesh_single_process_fallback():
    mesh = dist.hybrid_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("ici",)


def test_shard_and_throughput_harness():
    from __graft_entry__ import _flagship_inputs
    from passport_zk_circuits_tpu.models import register_identity as ri

    mesh = dist.hybrid_mesh()
    p, inputs = _flagship_inputs(batch=2 * mesh.devices.size)
    sharded = dist.shard_global_inputs(inputs, mesh)
    # every leaf is batch-sharded over all devices
    leaf = jax.tree_util.tree_leaves(sharded)[0]
    assert len(leaf.sharding.device_set) == mesh.devices.size

    stats = dist.throughput_harness(
        lambda i: ri.forward(p, i), sharded, mesh, iters=1)
    assert stats["valid"] == stats["batch"] == 2 * mesh.devices.size
    assert stats["witnesses_per_sec"] > 0


def test_flat_mesh_count_valid_matches():
    from __graft_entry__ import _flagship_inputs
    from passport_zk_circuits_tpu.models import register_identity as ri

    mesh = pmesh.make_mesh()
    p, inputs = _flagship_inputs(batch=mesh.devices.size)
    sharded = pmesh.shard_inputs(inputs, mesh)
    out = jax.jit(lambda i: ri.forward(p, i))(sharded)
    assert int(pmesh.count_valid(out, mesh)) == mesh.devices.size
