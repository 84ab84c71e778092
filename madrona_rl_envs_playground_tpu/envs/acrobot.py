"""Acrobot batch simulator (TPU-native).

Capability parity with the reference's Madrona Acrobot
(``src/acrobat_env/sim.cpp``): gym Acrobot-v1 dynamics via one RK4 step of
``ds_dt`` (``sim.cpp:68-145``), torque ∈ {-1, 0, +1}, angle wrap to [-π, π),
velocity bounds 4π / 9π, reward -1 per step, termination when
``-cos(θ1) - cos(θ2+θ1) > 1`` or after 500 steps (``sim.cpp:189-206``), reset
draws all four state variables uniformly in [-0.1, 0.1) from the episode
stream.  The reference stores episode length in the EpisodeManager *shared
across worlds* (``init.hpp:7-10`` — a quirk); here it is per-world, which is
the intended per-episode truncation semantics.
"""

from __future__ import annotations

import math

import chex
import jax.numpy as jnp

from ..core import rng
from ..core.base import EnvBase

Array = jnp.ndarray

_DT = jnp.float32(0.2)
_PI = math.pi
_MAX_VEL_1 = jnp.float32(4 * _PI)
_MAX_VEL_2 = jnp.float32(9 * _PI)
_LO = jnp.float32(-0.1)
_RANGE = jnp.float32(0.1) - jnp.float32(-0.1)
_TORQUE = jnp.array([-1.0, 0.0, 1.0], jnp.float32)
_G = jnp.float32(9.8)


@chex.dataclass(frozen=True)
class State:
    theta1: Array
    theta2: Array
    omega1: Array
    omega2: Array
    steps: Array  # [] int32 episode length
    rng_v: Array


def _ds_dt(s, torque):
    """Acrobot dynamics ("from the book"), float32 throughout."""
    theta1, theta2, dtheta1, dtheta2 = s
    # m1=m2=l1=1, lc1=lc2=0.5, I1=I2=1
    c2 = jnp.cos(theta2)
    d1 = 0.25 + (1.0 + 0.25 + c2) + 2.0
    d2 = (0.25 + 0.5 * c2) + 1.0
    phi2 = 0.5 * _G * jnp.cos(theta1 + theta2 - _PI / 2.0)
    phi1 = (
        -0.5 * dtheta2 * dtheta2 * jnp.sin(theta2)
        - 2.0 * 0.5 * dtheta2 * dtheta1 * jnp.sin(theta2)
        + (0.5 + 1.0) * _G * jnp.cos(theta1 - _PI / 2.0)
        + phi2
    )
    ddtheta2 = (
        torque + d2 / d1 * phi1 - 0.5 * dtheta1 * dtheta1 * jnp.sin(theta2) - phi2
    ) / (0.25 + 1.0 - d2 * d2 / d1)
    ddtheta1 = -(d2 * ddtheta2 + phi1) / d1
    return (dtheta1, dtheta2, ddtheta1, ddtheta2)


def _rk4_step(s, torque, dt):
    def axpy(y, k, c):
        return tuple(yi + c * ki for yi, ki in zip(y, k))

    k1 = _ds_dt(s, torque)
    k2 = _ds_dt(axpy(s, k1, dt / 2.0), torque)
    k3 = _ds_dt(axpy(s, k2, dt / 2.0), torque)
    k4 = _ds_dt(axpy(s, k3, dt), torque)
    return tuple(
        y + dt / 6.0 * (a + 2.0 * b + 2.0 * c + d)
        for y, a, b, c, d in zip(s, k1, k2, k3, k4)
    )


def _wrap(x, lo, hi):
    return jnp.remainder(x - lo, hi - lo) + lo


class Env(EnvBase):
    # step() emits state_obs==obs and all-ones mask/active (see EnvBase)
    state_is_obs = True
    masked = False

    num_agents = 1
    obs_size = 4
    state_size = 4
    num_actions = 3
    reward_dtype = jnp.float32
    obs_dtype = jnp.float32

    def init_core(self, episode_idx: Array) -> State:
        v = rng.seed(episode_idx)
        vals = []
        for _ in range(4):
            v, r = rng.uniform(v)
            vals.append(_LO + r * _RANGE)
        return State(
            theta1=vals[0], theta2=vals[1], omega1=vals[2], omega2=vals[3],
            steps=jnp.int32(0), rng_v=v,
        )

    def transition(self, state: State, actions: Array):
        torque = _TORQUE[actions[0]]
        s = (state.theta1, state.theta2, state.omega1, state.omega2)
        t1, t2, w1, w2 = _rk4_step(s, torque, _DT)
        t1 = _wrap(t1, jnp.float32(-_PI), jnp.float32(_PI))
        t2 = _wrap(t2, jnp.float32(-_PI), jnp.float32(_PI))
        w1 = jnp.clip(w1, -_MAX_VEL_1, _MAX_VEL_1)
        w2 = jnp.clip(w2, -_MAX_VEL_2, _MAX_VEL_2)
        steps = state.steps + 1
        done = (-jnp.cos(t1) - jnp.cos(t2 + t1) > 1.0) | (steps > 500)
        reward = jnp.full((1,), -1.0, jnp.float32)
        return (
            State(theta1=t1, theta2=t2, omega1=w1, omega2=w2, steps=steps, rng_v=state.rng_v),
            reward,
            done,
        )

    def encode(self, state: State, just_reset: Array):
        obs = jnp.stack([state.theta1, state.theta2, state.omega1, state.omega2])[None, :]
        return state, obs, obs, jnp.ones((1, 3), jnp.bool_), jnp.ones((1,), jnp.bool_)
