"""Device-mesh scaling for sim + learner (no reference counterpart).

The reference is single-process single-GPU (SURVEY §2.3: no NCCL/MPI
anywhere).  The TPU-native multi-chip story required by BASELINE.json is
expressed entirely through ``jax.sharding``: env-batch axis sharded across
chips ("env" data parallelism for both the simulator state and the rollout),
parameters replicated (the policy networks are small MLPs/CNNs, so tensor/
pipeline parallelism would only add collective latency — the scaling
dimension of batch simulation is the env axis).  XLA inserts the gradient
all-reduce over ICI automatically from the sharding propagation; multi-host
execution uses the same code via ``jax.distributed.initialize``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def make_mesh(num_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the env-batch axis."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (ENV_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (env) axis sharded across the mesh; trailing axes replicated.

    Works for every leaf of BatchState/StepOutput pytrees: scalar leaves
    (episode counter) fall back to replication via ``replicated``; use
    ``shard_batch_pytree`` for mixed pytrees.
    """
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(tree, mesh: Mesh):
    """device_put a pytree with [N, ...] leaves sharded on axis 0 and scalar
    leaves replicated."""
    bs, rep = batch_sharding(mesh), replicated(mesh)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % mesh.size == 0:
            return jax.device_put(x, bs)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(put, tree)


def put_selfplay_state(state: dict, mesh: Mesh) -> dict:
    """Shard a SelfPlayPPO state dict onto the mesh."""
    rep = replicated(mesh)
    return {
        "params": jax.device_put(state["params"], rep),
        "opt_state": jax.device_put(state["opt_state"], rep),
        "bstate": shard_batch_pytree(state["bstate"], mesh),
        "out": shard_batch_pytree(state["out"], mesh),
        "key": jax.device_put(state["key"], rep),
    }
