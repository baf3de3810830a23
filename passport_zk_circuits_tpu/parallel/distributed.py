"""Multi-host scale-out: jax.distributed init + hybrid ICI/DCN meshes.

The reference is a single wasm process per witness (SURVEY.md §2.5); this
module is the from-scratch TPU equivalent demanded by BASELINE.json's north
star: batch-axis scaling at 1 chip / 1 host / N>=2 hosts. Passport instances
are embarrassingly parallel, so the design is pure data parallelism:

* within a host group, the batch axis rides ICI;
* across host groups, it rides DCN — `hybrid_mesh` builds a 2-D
  ('dcn', 'ici') device mesh via `create_hybrid_device_mesh` and every tensor
  shards its minor-most batch dim over both axes;
* the only cross-device traffic is the verdict-count `psum`, so scaling
  efficiency should be ~1.0 — the harness below measures it.

Single-process (or CPU-virtual-device) runs degrade gracefully to the flat
mesh of parallel.mesh.
"""

from __future__ import annotations

import time

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize jax.distributed for an N>=2 host run.

    With no args, reads the standard env/TPU-metadata auto-config (the
    normal path on a real pod slice) and degrades to a no-op on a
    single host. With an explicit coordinator, failures PROPAGATE — a
    2-process run that silently falls back to 1 process is a wrong
    topology, not a graceful degradation. (Round-4 bug, caught by
    tests/_dist_worker.py: probing `jax.process_count()` first
    initializes the backend, which makes `initialize()` itself raise —
    and the old blanket `except` swallowed that into a silent
    single-process run.)
    """
    from jax._src import distributed as _dist_state
    if getattr(_dist_state.global_state, "client", None) is not None:
        return  # already initialized by the launcher
    if coordinator is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError):
            # no auto-config available: single-host flat mesh still works
            pass
    else:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def hybrid_mesh(batch_axes: tuple[str, str] = ("dcn", "ici")) -> Mesh:
    """2-D mesh: DCN (process) major, ICI (local chips) minor.

    Falls back to a flat 1-axis mesh labelled with the ICI axis name when
    there is a single process (including CPU virtual-device test runs).
    """
    if jax.process_count() == 1:
        return Mesh(np.array(jax.devices()), (batch_axes[1],))
    from jax.experimental import mesh_utils
    # TPU pods group by slice_index; CPU/GPU multi-process runs (incl. the
    # 2-process CPU test) have no real slices, so the process is the DCN
    # granule there
    granule_is_process = jax.devices()[0].platform != "tpu"
    devs = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(1, jax.local_device_count()),
        dcn_mesh_shape=(jax.process_count(), 1),
        devices=jax.devices(),
        process_is_granule=granule_is_process)
    return Mesh(devs, batch_axes)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the minor-most (batch) dim over every mesh axis."""
    axes = tuple(mesh.axis_names)
    spec = P(*([None] * (ndim - 1) + [axes if len(axes) > 1 else axes[0]]))
    return NamedSharding(mesh, spec)


def shard_global_inputs(tree, mesh: Mesh):
    """Build global arrays from per-process local shards.

    Each process passes its *local* slice of the batch (minor-most axis);
    the result is a global jax.Array sharded batch-over-mesh, assembled
    without any cross-host transfer (each host keeps its own data —
    the analog of a per-host data-loader shard).
    """
    def leaf(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            batch_sharding(mesh, x.ndim), x)
    return jax.tree_util.tree_map(leaf, tree)


def throughput_harness(forward_fn, inputs, mesh: Mesh, iters: int = 5):
    """Measure witnesses/sec at the current topology.

    Chained-input methodology (shared with bench.py): each timed step's
    sk_identity is derived from the previous step's outputs, so steps
    serialize and every one must truly execute — repeated calls on
    identical device buffers are elided by this runtime and time only
    dispatch (the round-1/2 mistake documented in BASELINE.md:50-63).
    `inputs` must be RegisterIdentityInputs (sk_identity is the chained
    field). Returns dict with global/per-chip throughput and the verdict
    count (the psum-style reduction that actually crosses ICI/DCN).
    """
    import jax.numpy as jnp

    def step(inp):
        out = forward_fn(inp)
        mix = out["passport_hash"] ^ out["pk_identity_hash"]
        sk = (inp.sk_identity ^ mix).at[-1].set(
            (inp.sk_identity[-1] ^ mix[-1]) & jnp.uint32(0x3FF))
        return inp._replace(sk_identity=sk), out

    stepj = jax.jit(step)
    x, out = stepj(inputs)
    _ = jax.device_get(out["flow_ok"])          # compile + first run fence
    t0 = time.time()
    for _ in range(iters):
        x, out = stepj(x)
    # fetching concrete bytes of a value depending on the last step is the
    # only reliable fence here (see bench.py); block_until_ready is not.
    ok = jax.device_get(out["flow_ok"] & out["sig_ok"] & out["smt_ok"])
    _ = jax.device_get(x.sk_identity[0:1, 0:1])
    dt = (time.time() - t0) / iters

    n_ok = int(ok.sum())
    batch = int(np.prod(ok.shape))
    n_dev = len(jax.devices())
    return {
        "batch": batch,
        "valid": n_ok,
        "sec_per_step": dt,
        "witnesses_per_sec": batch / dt,
        "witnesses_per_sec_per_chip": batch / dt / n_dev,
        "devices": n_dev,
        "processes": jax.process_count(),
    }
