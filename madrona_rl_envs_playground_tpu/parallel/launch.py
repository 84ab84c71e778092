"""Multi-host launch helpers.

The reference has no distributed story (SURVEY §2.3); this is the new
framework's.  One process per host, same program everywhere:

    from madrona_rl_envs_playground_tpu.parallel import launch
    launch.initialize()            # jax.distributed — env-driven or explicit
    mesh = make_mesh()             # all devices across all hosts
    trainer = SelfPlayPPO(..., mesh=mesh)

Under ``jit`` with the env axis sharded over the mesh, per-host shards of the
env state never leave their host; the learner's gradient all-reduce is the
only cross-host collective and XLA routes it over ICI/DCN automatically.

On a single host this module is a no-op — the same script runs unchanged.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-host.

    With no arguments, relies on the cluster environment (TPU pod metadata or
    the standard JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
    variables).  Returns True when distributed mode was initialized.
    """
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env_np = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env_np) if env_np else None
    if process_id is None:
        env_pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env_pid) if env_pid else None

    on_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES")) and num_processes is None
    if coordinator_address is None and not on_pod:
        return False  # single-process run
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except (RuntimeError, ValueError):
        # already initialized, or single-host tunnel without pod metadata
        return False


def is_primary() -> bool:
    return jax.process_index() == 0
