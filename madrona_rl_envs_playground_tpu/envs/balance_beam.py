"""Balance Beam batch simulator (TPU-native).

Capability parity with the reference's 2-player cooperative toy
(``src/balance_beam_env/sim.cpp``): 5 spaces, moves {-2,-1,+1,+2}, episodes of
3 timesteps.  Reward 1 if colocated else -|Δ|·0.2; falling off the beam ends
the episode with reward -5·(time+1)·0.2 (``sim.cpp:83-155``).  Observations are
a per-agent rolling history ``[own ×3, partner ×3, time]`` with positions
offset by +2 (``sim.cpp:106-118``); reset draws both start positions as
``int(5·rand())`` from the episode stream (``sim.cpp:47-73``).
"""

from __future__ import annotations

import chex
import jax.numpy as jnp

from ..core import rng
from ..core.base import EnvBase

Array = jnp.ndarray

NUM_SPACES = 5
TIME = 3
BUFFER = 2
SCALE = jnp.float32(0.2)
MOVES = jnp.array([-2, -1, 1, 2], jnp.int32)
NUM_MOVES = 4


@chex.dataclass(frozen=True)
class State:
    loc: Array   # [2] int32
    obs: Array   # [2, 7] int32 — rolling history + time (exported verbatim)
    time: Array  # [] int32
    rng_v: Array


class Env(EnvBase):
    # step() emits state_obs==obs and all-ones mask/active (see EnvBase)
    state_is_obs = True
    masked = False

    num_agents = 2
    obs_size = 2 * TIME + 1
    state_size = 2 * TIME + 1
    num_actions = NUM_MOVES
    reward_dtype = jnp.float32
    obs_dtype = jnp.int32

    def init_core(self, episode_idx: Array) -> State:
        v = rng.seed(episode_idx)
        v, l0 = rng.randint(v, NUM_SPACES)
        v, l1 = rng.randint(v, NUM_SPACES)
        loc = jnp.stack([l0, l1])
        t = jnp.int32(TIME - 1)
        obs = jnp.zeros((2, 2 * TIME + 1), jnp.int32)
        obs = obs.at[:, 2 * TIME].set(t)
        obs = obs.at[jnp.array([0, 1]), 0].set(loc + BUFFER)
        obs = obs.at[jnp.array([0, 1]), TIME].set(loc[::-1] + BUFFER)
        return State(loc=loc, obs=obs, time=t, rng_v=v)

    def transition(self, state: State, actions: Array):
        loc = state.loc + MOVES[actions]
        t = state.time - 1

        # Rolling history update (sim.cpp:106-118): shift both 3-slots down,
        # then write current own / partner positions and the new time.
        o = state.obs
        hist = jnp.concatenate(
            [
                (loc + BUFFER)[:, None],        # x[0] = own
                o[:, 0:2],                      # x[1:3] = old own history
                (loc[::-1] + BUFFER)[:, None],  # x[3] = partner
                o[:, 3:5],                      # x[4:6] = old partner history
                jnp.broadcast_to(t, (2,))[:, None],
            ],
            axis=1,
        )

        diff = loc[0] - loc[1]
        reward_val = jnp.where(
            diff == 0, jnp.float32(1.0), -jnp.abs(diff).astype(jnp.float32) * SCALE
        )
        off_beam = jnp.any((loc < 0) | (loc >= NUM_SPACES))
        reward_val = jnp.where(
            off_beam,
            -jnp.float32(NUM_SPACES) * (t + 1).astype(jnp.float32) * SCALE,
            reward_val,
        )
        done = off_beam | (t == 0)
        reward = jnp.broadcast_to(reward_val, (2,))
        return State(loc=loc, obs=hist, time=t, rng_v=state.rng_v), reward, done

    def encode(self, state: State, just_reset: Array):
        mask = jnp.ones((2, NUM_MOVES), jnp.bool_)
        active = jnp.ones((2,), jnp.bool_)
        return state, state.obs, state.obs, mask, active
