"""Cartpole batch simulator (TPU-native).

Capability parity with the reference's Madrona cartpole
(``src/cartpole_env/sim.cpp``): classic gym dynamics with Euler integration
(force ±10, tau 0.02), termination at |x| > 2.4 or |theta| > 12°, reward 1
every step, episode reset re-draws all four state variables uniformly in
[-0.05, 0.05) from the TEA+LCG episode stream (``sim.cpp:47-66``), and the
reset happens inside the step (``sim.cpp:86-96``) so a done step already
exports the new episode's state.
"""

from __future__ import annotations

import chex
import jax.numpy as jnp

from ..core import rng
from ..core.base import EnvBase

Array = jnp.ndarray

_GRAVITY = jnp.float32(9.8)
_MASSPOLE = jnp.float32(0.1)
_TOTAL_MASS = jnp.float32(1.1)
_LENGTH = jnp.float32(0.5)
_POLEMASS_LENGTH = jnp.float32(0.05)
_FORCE_MAG = jnp.float32(10.0)
_TAU = jnp.float32(0.02)
_FOUR_THIRDS = jnp.float32(4.0 / 3.0)
X_THRESHOLD = 2.4
THETA_THRESHOLD = 12 * 2 * 3.141592653589793238463 / 360

_LO = jnp.float32(-0.05)
_RANGE = jnp.float32(0.05) - jnp.float32(-0.05)


@chex.dataclass(frozen=True)
class State:
    x: Array
    x_dot: Array
    theta: Array
    theta_dot: Array
    rng_v: Array  # uint32 LCG word of the live episode


class Env(EnvBase):
    # step() emits state_obs==obs and all-ones mask/active (see EnvBase)
    state_is_obs = True
    masked = False

    num_agents = 1
    obs_size = 4
    state_size = 4
    num_actions = 2
    reward_dtype = jnp.float32
    obs_dtype = jnp.float32

    def init_core(self, episode_idx: Array) -> State:
        v = rng.seed(episode_idx)
        v, r0 = rng.uniform(v)
        v, r1 = rng.uniform(v)
        v, r2 = rng.uniform(v)
        v, r3 = rng.uniform(v)
        return State(
            x=_LO + r0 * _RANGE,
            x_dot=_LO + r1 * _RANGE,
            theta=_LO + r2 * _RANGE,
            theta_dot=_LO + r3 * _RANGE,
            rng_v=v,
        )

    def transition(self, state: State, actions: Array):
        force = jnp.where(actions[0] == 1, _FORCE_MAG, -_FORCE_MAG)
        costheta = jnp.cos(state.theta)
        sintheta = jnp.sin(state.theta)

        temp = (
            force + _POLEMASS_LENGTH * state.theta_dot * state.theta_dot * sintheta
        ) / _TOTAL_MASS
        thetaacc = (_GRAVITY * sintheta - costheta * temp) / (
            _LENGTH * (_FOUR_THIRDS - _MASSPOLE * costheta * costheta / _TOTAL_MASS)
        )
        xacc = temp - _POLEMASS_LENGTH * thetaacc * costheta / _TOTAL_MASS

        x = state.x + _TAU * state.x_dot
        x_dot = state.x_dot + _TAU * xacc
        theta = state.theta + _TAU * state.theta_dot
        theta_dot = state.theta_dot + _TAU * thetaacc

        done = (
            (x < -X_THRESHOLD)
            | (x > X_THRESHOLD)
            | (theta < -THETA_THRESHOLD)
            | (theta > THETA_THRESHOLD)
        )
        reward = jnp.ones((1,), jnp.float32)
        new_state = State(x=x, x_dot=x_dot, theta=theta, theta_dot=theta_dot, rng_v=state.rng_v)
        return new_state, reward, done

    def encode(self, state: State, just_reset: Array):
        obs = jnp.stack([state.x, state.x_dot, state.theta, state.theta_dot])[None, :]
        mask = jnp.ones((1, 2), jnp.bool_)
        active = jnp.ones((1,), jnp.bool_)
        return state, obs, obs, mask, active
