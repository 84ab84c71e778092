"""SB3-shaped gym interop smoke tests (reference ``BalanceGym``
``envs/balance_beam_env.py:46-79`` and the cartpole gym ``VectorEnv``
wrappers ``envs/cartpole_env.py:27-128``)."""

import numpy as np

from madrona_rl_envs_playground_tpu.api.gym_interop import (
    BalanceVecGym,
    CartpoleVecGym,
)

N = 8


def test_cartpole_vec_gym_contract():
    env = CartpoleVecGym(N)
    obs = env.reset()
    assert obs.shape == (N, 4) and obs.dtype == np.float32
    assert env.single_action_space.n == 2
    rs = np.random.RandomState(0)
    saw_done = False
    for _ in range(250):
        acts = rs.randint(0, 2, size=N)
        obs, rew, done, infos = env.step(acts)
        assert obs.shape == (N, 4)
        assert rew.shape == (N,) and done.shape == (N,)
        assert len(infos) == N
        # every obs (incl. the post-done auto-reset obs) is inside the space
        assert np.all(np.abs(obs[:, 0]) <= env.single_observation_space.high[0])
        saw_done = saw_done or bool(done.any())
    assert saw_done, "random cartpole must terminate within 250 steps"


def test_balance_vec_gym_contract():
    env = BalanceVecGym(N, seed=3)
    obs = env.reset()
    assert obs.shape == (N, 7) and obs.dtype == np.float32
    assert env.single_action_space.n == 4
    rs = np.random.RandomState(1)
    dones = 0
    for _ in range(12):
        obs, rew, done, infos = env.step(rs.randint(0, 4, size=N))
        assert obs.shape == (N, 7) and rew.shape == (N,)
        dones += int(done.sum())
    assert dones > 0, "balance episodes are 3 steps; 12 steps must see dones"


def test_balance_vec_gym_custom_partner():
    calls = []

    def partner(obs):
        calls.append(obs.shape)
        return np.zeros(N, dtype=np.int64)

    env = BalanceVecGym(N, partner_fn=partner)
    env.reset()
    env.step(np.zeros(N, dtype=np.int64))
    assert calls == [(N, 7)]
