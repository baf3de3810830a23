"""Worker for the 2-process jax.distributed CPU test (test_distributed).

Each process owns 2 virtual CPU devices; the pair forms a 2x2 hybrid
(dcn, ici) mesh. Exercises the REAL multi-process branches of
parallel/distributed.py: init_distributed's explicit-coordinator path,
hybrid_mesh's DCN branch, and shard_global_inputs assembling a global
array from per-process local shards; a global sum then crosses the DCN
axis."""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from passport_zk_circuits_tpu.parallel import distributed as dist  # noqa: E402


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    dist.init_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 2

    mesh = dist.hybrid_mesh()
    assert mesh.axis_names == ("dcn", "ici"), mesh.axis_names
    assert mesh.devices.shape == (nproc, 2)

    # per-process local shard of the global batch (minor-most axis)
    local = (np.arange(4, dtype=np.int32).reshape(2, 2) + 10 * pid)
    g = dist.shard_global_inputs({"x": local}, mesh)["x"]
    assert g.shape == (2, 2 * nproc), g.shape

    total = int(jax.jit(lambda a: a.sum())(g))
    want = sum(10 * p + d for p in range(nproc) for d in range(4))
    assert total == want, (total, want)
    print(f"worker {pid}: global sum ok ({total})")


if __name__ == "__main__":
    main()
