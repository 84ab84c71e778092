"""Vector multi-agent API tests (reference contract:
pantheonrl_extension/vectorenv.py:26-255, vectorobservation.py:19-32)."""

import jax.numpy as jnp
import numpy as np
import pytest

from madrona_rl_envs_playground_tpu.api import (
    PlayerException,
    RandomVectorAgent,
    TpuVecEnv,
    VectorObservation,
)
from madrona_rl_envs_playground_tpu.envs import balance_beam, overcooked2


pytestmark = pytest.mark.quick

def test_vectorobservation_state_defaults_to_obs():
    obs = jnp.ones((4, 3))
    v = VectorObservation(active=jnp.ones((4,), jnp.bool_), obs=obs)
    assert v.state is obs
    assert v.action_mask is None


def test_tpu_vecenv_step_loop_balance():
    env = balance_beam.Env()
    venv = TpuVecEnv(env, num_envs=8)
    partner = RandomVectorAgent(env.num_actions, seed=1)
    ego_sampler = RandomVectorAgent(env.num_actions, seed=2)
    venv.add_partner_agent(partner)

    obs = venv.reset()
    assert obs.obs.shape == (8, env.obs_size)
    total = 0.0
    for _ in range(7):  # crosses the 3-step episode boundary
        act = ego_sampler.get_action(obs)
        obs, rew, done, _ = venv.step(act)
        assert rew.shape == (8,)
        assert done.shape == (8,)
        total += float(rew.sum())
    assert np.isfinite(total)


def test_tpu_vecenv_multiplayer_seats():
    env = overcooked2.make("simple")
    venv = TpuVecEnv(env, num_envs=4)
    venv.add_partner_agent(RandomVectorAgent(env.num_actions, seed=3))
    obs = venv.reset()
    # both seats exposed through n_step with per-seat rewards
    seats, rews, done, _ = venv.n_step(jnp.zeros((2, 4), jnp.int32))
    assert len(seats) == 2
    assert rews.shape == (2, 4)
    assert seats[0].obs.shape == (4, env.obs_size)
    assert seats[0].obs.dtype == jnp.int8


def test_partner_management_errors():
    env = balance_beam.Env()
    venv = TpuVecEnv(env, num_envs=2)
    with pytest.raises(PlayerException):
        venv.add_partner_agent(RandomVectorAgent(env.num_actions), player_num=0)
    venv.add_partner_agent(RandomVectorAgent(env.num_actions, seed=4))
    venv.add_partner_agent(RandomVectorAgent(env.num_actions, seed=5))
    venv.reset()
    first = venv.partnerids[0]
    venv.reset()
    assert venv.partnerids[0] == (first + 1) % 2  # round-robin resample
