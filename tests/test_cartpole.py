"""Cartpole differential validation against the numpy oracle, plus auto-reset
and episode-stream semantics (reference harness: ``scripts/cartpole_example.py``)."""

import pytest
import jax.numpy as jnp
import numpy as np

from madrona_rl_envs_playground_tpu.core import Simulator, rng
from madrona_rl_envs_playground_tpu.envs.cartpole import Env
from madrona_rl_envs_playground_tpu.oracles import cartpole as oracle

N = 64


def make_sim():
    return Simulator(Env(), N)


pytestmark = pytest.mark.quick


def test_initial_state_distribution():
    sim = make_sim()
    obs = np.asarray(sim.last_out.obs)[:, 0, :]
    assert obs.shape == (N, 4)
    assert np.all(obs >= -0.05) and np.all(obs < 0.05)
    # world w is seeded from episode index w: world 0 must match the stream.
    v = rng.seed(jnp.uint32(0))
    expect = []
    for _ in range(4):
        v, r = rng.uniform(v)
        expect.append(-0.05 + float(r) * (np.float32(0.05) - np.float32(-0.05)))
    np.testing.assert_allclose(obs[0], expect, rtol=1e-6)


def test_random_rollout_matches_oracle():
    sim = make_sim()
    rs = np.random.RandomState(0)
    state = np.asarray(sim.last_out.obs)[:, 0, :]
    for t in range(200):
        actions = rs.randint(0, 2, size=(N, 1)).astype(np.int32)
        out = sim.step(jnp.asarray(actions))
        nxt = np.asarray(out.obs)[:, 0, :]
        done = np.asarray(out.done)
        rew = np.asarray(out.reward)[:, 0]
        assert np.all(rew == 1.0)
        bad = oracle.validate_step(state, actions[:, 0], done, nxt)
        assert bad == [], f"step {t}: mismatches at {bad}"
        # done worlds must already hold the fresh episode's state
        if done.any():
            assert np.all(np.abs(nxt[done]) < 0.05)
        state = nxt


def test_episode_counter_advances_in_world_order():
    sim = make_sim()
    # Drive with constant action 1 until some worlds reset.
    total_resets = 0
    for _ in range(30):
        out = sim.step(jnp.ones((N, 1), jnp.int32))
        total_resets += int(np.asarray(out.done).sum())
    assert total_resets > 0
    assert int(sim.bstate.episode_counter) == N + total_resets
