"""Agent interface for the vector multi-agent API.

Contract parity with the reference's ``VectorAgent``
(``pantheonrl_extension/vectoragent.py:9-40``): ``get_action`` consumes a
batched ``VectorObservation`` and returns one int32 action per env;
``update`` delivers the rewards/dones earned since the most recent recorded
``get_action`` (multiple ``update`` calls between actions accumulate —
turn-based envs rely on this).
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import jax
import jax.numpy as jnp

from .vectorobservation import VectorObservation

Array = jnp.ndarray


class VectorAgent(ABC):
    @abstractmethod
    def get_action(self, obs: VectorObservation, record: bool = True) -> Array:
        """Return int32 actions [N] for the batch; optionally record for training."""

    @abstractmethod
    def update(self, rewards: Array, dones: Array) -> None:
        """Deliver rewards/dones for the most recent recorded action."""


class RandomVectorAgent(VectorAgent):
    """Uniform-random over legal actions (mask-aware, unlike the reference's
    sampler-callable version — turn-based envs need legal actions)."""

    def __init__(self, num_actions: int, seed: int = 0):
        self.num_actions = num_actions
        self._key = jax.random.PRNGKey(seed)
        self._sample = jax.jit(self._sample_impl)

    def _sample_impl(self, key, mask):
        logits = jnp.where(mask, 0.0, -jnp.inf)
        return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)

    def get_action(self, obs: VectorObservation, record: bool = True) -> Array:
        self._key, sub = jax.random.split(self._key)
        if obs.action_mask is None:
            n = obs.active.shape[0]
            return jax.random.randint(sub, (n,), 0, self.num_actions, dtype=jnp.int32)
        return self._sample(sub, obs.action_mask)

    def update(self, rewards: Array, dones: Array) -> None:
        return
