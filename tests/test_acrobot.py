"""Acrobot validation against an independent numpy RK4 oracle."""

import math

import numpy as np
import jax.numpy as jnp

from madrona_rl_envs_playground_tpu.core import Simulator
from madrona_rl_envs_playground_tpu.envs.acrobot import Env

N = 32


def oracle_step(state, action):
    g, pi = 9.8, math.pi
    torque = [-1.0, 0.0, 1.0][action]

    def deriv(y):
        t1, t2, w1, w2, a = y
        d1 = 1 * 0.25 + 1 * (1 + 0.25 + 2 * 1 * 0.5 * math.cos(t2)) + 2.0
        d2 = 1 * (0.25 + 1 * 0.5 * math.cos(t2)) + 1.0
        phi2 = 1 * 0.5 * g * math.cos(t1 + t2 - pi / 2)
        phi1 = (
            -1 * 0.5 * w2**2 * math.sin(t2)
            - 2 * 0.5 * w2 * w1 * math.sin(t2)
            + (0.5 + 1.0) * g * math.cos(t1 - pi / 2)
            + phi2
        )
        dd2 = (a + d2 / d1 * phi1 - 0.5 * w1**2 * math.sin(t2) - phi2) / (
            0.25 + 1 - d2**2 / d1
        )
        dd1 = -(d2 * dd2 + phi1) / d1
        return np.array([w1, w2, dd1, dd2, 0.0])

    y = np.array([*state, torque])
    dt = 0.2
    k1 = deriv(y)
    k2 = deriv(y + dt / 2 * k1)
    k3 = deriv(y + dt / 2 * k2)
    k4 = deriv(y + dt * k3)
    out = y + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

    def wrap(x):
        while x > pi:
            x -= 2 * pi
        while x < -pi:
            x += 2 * pi
        return x

    t1, t2 = wrap(out[0]), wrap(out[1])
    w1 = min(max(out[2], -4 * pi), 4 * pi)
    w2 = min(max(out[3], -9 * pi), 9 * pi)
    done = -math.cos(t1) - math.cos(t2 + t1) > 1.0
    return np.array([t1, t2, w1, w2]), done


def test_rollout_matches_oracle():
    sim = Simulator(Env(), N)
    rs = np.random.RandomState(0)
    state = np.asarray(sim.last_out.obs)[:, 0, :]
    assert np.all(np.abs(state) <= 0.1)
    for t in range(100):
        actions = rs.randint(0, 3, size=(N, 1)).astype(np.int32)
        out = sim.step(jnp.asarray(actions))
        nxt = np.asarray(out.obs)[:, 0, :]
        done = np.asarray(out.done)
        assert np.all(np.asarray(out.reward) == -1.0)
        for i in range(N):
            true_next, true_done = oracle_step(state[i].astype(np.float64), int(actions[i, 0]))
            # 500-step truncation can't trigger within 100 steps
            assert true_done == bool(done[i]), f"t={t} i={i}"
            if not done[i]:
                np.testing.assert_allclose(nxt[i], true_next, atol=2e-4, err_msg=f"t={t} i={i}")
        state = nxt
