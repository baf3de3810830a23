"""Batch-axis SPMD over a TPU device mesh.

The reference has no distributed execution at all (single wasm process per
witness, SURVEY.md §2.5); scale-out is a first-class capability here:
passport instances are independent, so the canonical sharding is the batch
axis (minor-most in every tensor) laid across the mesh — collectives are
only needed for metric reductions (`psum` of verdict counts), which ride ICI.

Every limb/word tensor in this framework has shape (..., B); sharding spec
is therefore P(None, ..., 'batch') for each leaf.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def batch_spec(ndim: int, axis: str = "batch") -> P:
    """PartitionSpec sharding only the minor-most (batch) dimension."""
    return P(*([None] * (ndim - 1) + [axis]))


def shard_leaf(x, mesh: Mesh, axis: str = "batch"):
    x = np.asarray(x)
    return jax.device_put(x, NamedSharding(mesh, batch_spec(x.ndim, axis)))


def shard_inputs(tree, mesh: Mesh, axis: str = "batch"):
    """Shard every array leaf of a pytree along its last (batch) axis."""
    return jax.tree_util.tree_map(lambda x: shard_leaf(x, mesh, axis), tree)


def sharded_forward(forward_fn, example_inp, mesh: Mesh,
                    axis: str = "batch"):
    """jit `forward_fn` with explicit batch-axis in_shardings derived from
    `example_inp`'s pytree structure — inputs are re-laid-out onto the
    mesh even if the caller did not pre-shard them (the constraint the
    pass-through wrapper of round 4 silently relied on)."""
    in_shardings = jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, batch_spec(np.ndim(x), axis)),
        example_inp)
    return jax.jit(forward_fn, in_shardings=(in_shardings,))


def count_valid(out, mesh: Mesh):
    """Global count of fully-valid witnesses (flow & sig & smt) — the
    metric reduction that rides ICI on a real slice."""
    ok = out["flow_ok"] & out["sig_ok"] & out["smt_ok"]
    return jax.jit(lambda o: o.sum())(ok)
