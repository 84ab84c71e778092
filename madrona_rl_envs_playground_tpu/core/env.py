"""Environment protocol: each env is three pure functions over SoA pytrees.

The reference expresses an env as an ECS task graph (action system -> obs
system -> checkDone with in-graph auto-reset, e.g.
``src/balance_beam_env/sim.cpp:159-175``).  The TPU-native re-expression is a
pure function ``step`` split into three phases so the batched driver can fuse
auto-reset without double-encoding observations:

  * ``transition(params, state, actions) -> (state', reward[P], done)``
      — pure dynamics, no observation work.
  * ``init_core(params, episode_idx) -> state``
      — fresh episode state (deals cards, randomizes positions, seeds the
        in-state LCG).  Cheap: NO observation encoding.
  * ``encode(params, state, just_reset) -> (state', StepOutput-fields)``
      — observation/action-mask generation.  Receives ``just_reset`` so
        turn-based envs (Hanabi) can refresh every seat's stale obs buffer on
        reset but only the active seat's otherwise, exactly matching the
        reference's obs systems (``src/hanabi_env/sim.cpp:794-810``).

All three are per-world (no batch axis) and are ``vmap``-ed by
``core.batch.Simulator``.  Static configuration lives in a hashable params
object so jit specializes per config, as the reference compiles per config.
"""

from __future__ import annotations

from typing import Any, Protocol, Tuple

import jax.numpy as jnp

Array = jnp.ndarray


class Environment(Protocol):
    """Structural interface implemented by each env module's ``Env`` class."""

    # --- static metadata -------------------------------------------------
    num_agents: int
    obs_size: int
    state_size: int
    num_actions: int
    reward_dtype: Any
    obs_dtype: Any

    # --- pure functions ---------------------------------------------------
    def init_core(self, episode_idx: Array) -> Any:
        ...

    def transition(self, state: Any, actions: Array) -> Tuple[Any, Array, Array]:
        ...

    def encode(self, state: Any, just_reset: Array):
        """Returns (state', obs, state_obs, action_mask, active)."""
        ...
