"""Batched simulator driver — the TPU-native analog of the reference Manager.

The reference ``Manager`` owns a CPU thread-pool / GPU megakernel executor and
steps N ECS worlds in lockstep (``src/balance_beam_env/mgr.cpp:47-124``).  Here
one jitted function steps all worlds: the env's per-world pure functions are
``vmap``-ed over a leading env axis, auto-reset is fused in with a
``jnp.where`` select, and the global episode counter is advanced in world
order (a cumsum over done flags — the deterministic analog of the reference's
``fetch_add`` sequence under the CPU executor).

Optionally the env axis is sharded over a ``jax.sharding.Mesh`` so the same
step function scales across chips/hosts with zero code change.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from .types import BatchState, StepOutput

Array = jnp.ndarray


def _select(done: Array, a, b):
    """Pytree-wise ``where(done, a, b)`` with done broadcast from [N] leaves."""

    def sel(x, y):
        d = done.reshape(done.shape + (1,) * (x.ndim - 1))
        return jnp.where(d, x, y)

    return jax.tree_util.tree_map(sel, a, b)


def batched_reset(env, num_envs: int, start_episode: int = 0) -> Tuple[BatchState, StepOutput]:
    """Construct N worlds; world w gets episode index ``start_episode + w``.

    Mirrors per-world ``Sim::Sim`` construction + initial ``resetWorld``
    (reference ``src/cartpole_env/sim.cpp:123-143``): after construction the
    done flag reads false and observations are the fresh-episode encodings.
    """
    eps = jnp.arange(num_envs, dtype=jnp.uint32) + jnp.uint32(start_episode)
    states = jax.vmap(env.init_core)(eps)
    states, obs, state_obs, mask, active = jax.vmap(
        lambda s: env.encode(s, jnp.bool_(True))
    )(states)
    out = StepOutput(
        obs=obs,
        state_obs=state_obs,
        action_mask=mask,
        active=active,
        reward=jnp.zeros((num_envs, env.num_agents), env.reward_dtype),
        done=jnp.zeros((num_envs,), jnp.bool_),
    )
    return (
        BatchState(
            env_states=states,
            episode_counter=jnp.uint32(start_episode + num_envs),
        ),
        out,
    )


def batched_step(env, bstate: BatchState, actions: Array) -> Tuple[BatchState, StepOutput]:
    """One lockstep step of all worlds with fused in-step auto-reset.

    actions: int32 [N, P].
    """
    s2, reward, done = jax.vmap(env.transition)(bstate.env_states, actions)

    # Episode-index allocation in world order (reference: global atomic
    # EpisodeManager.curEpisode.fetch_add_relaxed(1) per resetWorld call).
    done_u = done.astype(jnp.uint32)
    rank = jnp.cumsum(done_u) - done_u
    eps = bstate.episode_counter + rank
    counter2 = bstate.episode_counter + jnp.sum(done_u)

    fresh = jax.vmap(env.init_core)(eps)
    s3 = _select(done, fresh, s2)

    s4, obs, state_obs, mask, active = jax.vmap(env.encode)(s3, done)

    out = StepOutput(
        obs=obs,
        state_obs=state_obs,
        action_mask=mask,
        active=active,
        reward=reward,
        done=done,
    )
    return BatchState(env_states=s4, episode_counter=counter2), out


# Module-level jits keyed on the (hashable) env config so compilations are
# shared across Simulator instances of the same env — the analog of the
# reference's MADRONA_MWGPU_KERNEL_CACHE (src/hanabi_env/README.org:46-56).
_jit_reset = jax.jit(batched_reset, static_argnums=(0, 1, 2))
_jit_step = jax.jit(batched_step, static_argnums=(0,), donate_argnums=(1,))


class Simulator:
    """Owns the jitted step/reset for one env config — the Manager analog.

    ``step`` donates the previous batch state so XLA updates it in place
    (the zero-copy analog of the reference's exported in-place tensors).
    """

    def __init__(self, env, num_envs: int, sharding=None, start_episode: int = 0):
        self.env = env
        self.num_envs = num_envs
        self.sharding = sharding
        self._start_episode = start_episode

        self.bstate, self.last_out = _jit_reset(env, num_envs, start_episode)
        if sharding is not None:
            self.bstate = jax.device_put(self.bstate, sharding)

    def step(self, actions: Array) -> StepOutput:
        """actions: int32 [N, P] (world-major, matching our canonical layout)."""
        self.bstate, self.last_out = _jit_step(self.env, self.bstate, actions)
        return self.last_out

    def reset(self) -> StepOutput:
        self.bstate, self.last_out = _jit_reset(self.env, self.num_envs, self._start_episode)
        return self.last_out
