"""Oracle baseline backends under Sync/AsyncVectorEnv (the reference's
``--use-baseline`` harness) and their agreement with the TPU simulators."""

import numpy as np
import jax.numpy as jnp
import pytest

from madrona_rl_envs_playground_tpu.api import AsyncVectorEnv, SyncVectorEnv
from madrona_rl_envs_playground_tpu.envs.layouts import get_base_layout_params
from madrona_rl_envs_playground_tpu.oracles.adapters import (
    BalanceOracleEnv,
    CartpoleOracleEnv,
    HanabiOracleEnv,
    OvercookedOracleEnv,
)


def test_sync_cartpole_rollout():
    venv = SyncVectorEnv([lambda i=i: CartpoleOracleEnv(seed=i) for i in range(4)])
    obs = venv.n_reset()
    assert obs[0].obs.shape == (4, 4)
    for _ in range(30):
        acts = jnp.zeros((1, 4), jnp.int32)
        obs, rews, dones, _ = venv.n_step(acts)
        assert rews.shape == (1, 4)


def test_sync_overcooked_matches_tpu_sim():
    from madrona_rl_envs_playground_tpu.core import Simulator
    from madrona_rl_envs_playground_tpu.envs import overcooked2

    params = get_base_layout_params("simple", 30, variant="v2")
    env = overcooked2.make("simple", horizon=30)
    N = 4
    venv = SyncVectorEnv(
        [lambda: OvercookedOracleEnv("v2", params) for _ in range(N)]
    )
    sim = Simulator(env, N)
    obs = venv.n_reset()
    rs = np.random.RandomState(0)
    for t in range(40):
        a = rs.randint(0, 6, size=(N, 2)).astype(np.int32)
        out = sim.step(jnp.asarray(a))
        obs, rews, dones, _ = venv.n_step(jnp.asarray(a.T))
        np.testing.assert_array_equal(np.asarray(dones), np.asarray(out.done))
        np.testing.assert_array_equal(
            np.asarray(rews).T, np.asarray(out.reward), err_msg=f"t={t}"
        )
        # obs agreement: sim flattens (x, y, c); oracle rows are (w*h*c) in
        # (x, y, c) order after its own reshape
        sim_obs = np.asarray(out.obs)
        base_obs = np.stack([np.asarray(o.obs) for o in obs])  # [P, N, size]
        np.testing.assert_array_equal(
            np.transpose(base_obs, (1, 0, 2)).astype(np.int8), sim_obs,
            err_msg=f"t={t}",
        )


def test_sync_hanabi_turn_based_active():
    venv = SyncVectorEnv([lambda: HanabiOracleEnv(colors=2, ranks=3, players=2,
                                                  max_information_tokens=3,
                                                  max_life_tokens=2)
                          for _ in range(3)])
    obs = venv.n_reset()
    assert bool(jnp.all(obs[0].active)) and not bool(jnp.any(obs[1].active))
    # play a legal action for the active seat in each env
    masks = np.asarray(obs[0].action_mask)
    acts = np.zeros((2, 3), np.int32)
    for i in range(3):
        acts[0, i] = int(np.nonzero(masks[i])[0][0])
    obs, rews, dones, _ = venv.n_step(jnp.asarray(acts))
    assert not bool(jnp.any(obs[0].active)) and bool(jnp.all(obs[1].active))


def test_async_balance_rollout():
    venv = AsyncVectorEnv([lambda i=i: BalanceOracleEnv(seed=i) for i in range(3)])
    try:
        obs = venv.n_reset()
        assert obs[0].obs.shape == (3, 7)
        total = 0.0
        for _ in range(7):
            acts = jnp.ones((2, 3), jnp.int32)
            obs, rews, dones, _ = venv.n_step(acts)
            total += float(rews.sum())
        assert np.isfinite(total)
    finally:
        venv.close()
