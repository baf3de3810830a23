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


def test_sharded_forward_lays_out_unsharded_inputs():
    """sharded_forward must shard plain host arrays itself via
    in_shardings (round-4 review: the wrapper silently required
    pre-sharded inputs)."""
    import numpy as np

    mesh = pmesh.make_mesh()
    n = mesh.devices.size
    x = np.arange(4 * n, dtype=np.int32).reshape(4, n)
    fwd = pmesh.sharded_forward(lambda a: a * 2, x, mesh)
    out = fwd(x)                      # NOT pre-sharded on purpose
    assert len(out.sharding.device_set) == n
    assert (np.asarray(out) == x * 2).all()


def test_two_process_jax_distributed_cpu():
    """Launch 2 real processes with jax.distributed over CPU: exercises
    init_distributed's coordinator path, hybrid_mesh's DCN branch, and
    shard_global_inputs at process_count > 1 (VERDICT r4 #7)."""
    import socket
    import subprocess
    import sys
    import os

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "global sum ok" in out


def test_flat_mesh_count_valid_matches():
    from __graft_entry__ import _flagship_inputs
    from passport_zk_circuits_tpu.models import register_identity as ri

    mesh = pmesh.make_mesh()
    p, inputs = _flagship_inputs(batch=mesh.devices.size)
    sharded = pmesh.shard_inputs(inputs, mesh)
    out = jax.jit(lambda i: ri.forward(p, i))(sharded)
    assert int(pmesh.count_valid(out, mesh)) == mesh.devices.size
