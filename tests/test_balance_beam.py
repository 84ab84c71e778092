"""Balance Beam differential validation (reference harness:
``scripts/balance_example.py`` + ``envs/balance_beam_env.py:156-217``)."""

import pytest
import jax.numpy as jnp
import numpy as np

from madrona_rl_envs_playground_tpu.core import Simulator
from madrona_rl_envs_playground_tpu.envs.balance_beam import Env
from madrona_rl_envs_playground_tpu.oracles import balance_beam as oracle

pytestmark = pytest.mark.quick

N = 128


def test_initial_obs_structure():
    sim = Simulator(Env(), N)
    obs = np.asarray(sim.last_out.obs)  # [N, 2, 7]
    assert obs.shape == (N, 2, 7)
    locs = obs[:, :, 0] - 2
    assert np.all((locs >= 0) & (locs < 5))
    # time slot
    assert np.all(obs[:, :, 6] == 2)
    # own/partner cross-consistency
    assert np.array_equal(obs[:, 0, 0], obs[:, 1, 3])
    assert np.array_equal(obs[:, 1, 0], obs[:, 0, 3])
    # history zeroed
    assert np.all(obs[:, :, 1:3] == 0) and np.all(obs[:, :, 4:6] == 0)


def test_random_rollout_matches_oracle():
    sim = Simulator(Env(), N)
    rs = np.random.RandomState(1)
    prev = np.asarray(sim.last_out.obs).transpose(1, 0, 2)  # [2, N, 7]
    for t in range(50):
        actions = rs.randint(0, 4, size=(N, 2)).astype(np.int32)
        out = sim.step(jnp.asarray(actions))
        nxt = np.asarray(out.obs).transpose(1, 0, 2)
        done = np.asarray(out.done)
        rew = np.asarray(out.reward).T  # [2, N]
        bad = oracle.validate_step(prev, actions.T, done, nxt, rew)
        assert bad == [], f"step {t}: mismatches at {bad}"
        # done worlds export the fresh episode's initial obs
        if done.any():
            d = done.nonzero()[0]
            assert np.all(nxt[:, d, 6] == 2)
            assert np.all(nxt[:, d, 1:3] == 0)
        prev = nxt


def test_episode_always_ends_within_time():
    sim = Simulator(Env(), N)
    # STAY is not a move; every action moves, episodes last at most 3 steps.
    for _ in range(3):
        out = sim.step(jnp.full((N, 2), 1, jnp.int32))
    # After 3 steps every world must have reset at least once
    assert int(sim.bstate.episode_counter) > N
