"""Core pytree containers shared by every environment.

The reference exports per-agent ECS columns (obs / action-mask / reward /
active / done) as device tensors (e.g. ``src/balance_beam_env/mgr.cpp:177-236``).
Here the same information is one struct-of-arrays pytree produced by the jitted
step function — no export/scatter dance is needed because we control layout.
"""

from __future__ import annotations

from typing import Any, Optional

import chex
import jax.numpy as jnp

Array = jnp.ndarray


@chex.dataclass(frozen=True)
class StepOutput:
    """Everything a single env instance reports after one step.

    Shapes are per-world (no batch axis): the batch axis is added by ``vmap``.

    obs:         [P, obs_size]      per-agent partial observation
    state_obs:   [P, state_size]    per-agent full-state observation (MAPPO critic)
    action_mask: [P, A]             legal-action mask (bool)
    active:      [P]                which agents act next step (bool)
    reward:      [P]                per-agent reward (float32 or int32 per env)
    done:        []                 episode terminated this step (bool)
    """

    obs: Array
    state_obs: Array
    action_mask: Array
    active: Array
    reward: Array
    done: Array


@chex.dataclass(frozen=True)
class BatchState:
    """Batched simulator state: env states stacked on axis 0 plus the episode
    counter stream.

    ``episode_counter`` replicates the reference's global atomic
    ``EpisodeManager::curEpisode`` (``src/*/init.hpp``): world ``w`` is
    constructed with episode index ``w`` and each in-step reset consumes the
    next index in world order (the CPU executor's deterministic order).
    """

    env_states: Any
    episode_counter: Array  # uint32 scalar
