"""Gym-interop vectorized wrappers (SB3-shaped VecEnv contract).

The reference exposes two single-policy gym surfaces alongside its
multi-agent API:

* gym ``VectorEnv`` cartpole wrappers (``envs/cartpole_env.py:27-128``):
  ``reset() -> obs [N, 4]``, ``step(actions [N]) -> (obs, rew, done, infos)``
  with ``Box`` observation / ``Discrete(2)`` action spaces and in-step
  auto-reset;
* ``BalanceGym`` (``envs/balance_beam_env.py:46-79``): a single-agent view
  over the 2-player balance-beam env with a ``RandomVectorAgent`` partner,
  ``MultiDiscrete`` obs / ``Discrete(4)`` action.

These are the TPU-native equivalents: thin host adapters over the jitted
``Simulator`` whose 4-tuple ``step``/``reset`` contract matches SB3's VecEnv
(and the reference's old-gym ``VectorEnv``).  Spaces come from ``gymnasium``
when available, else this package's metadata spaces.  Auto-reset is fused
in-step (the post-done observation is the next episode's first observation),
exactly like the reference sims.
"""

from __future__ import annotations

import numpy as np

try:  # gymnasium is the baked-in gym implementation in this environment
    from gymnasium import spaces as _spaces
except ImportError:  # pragma: no cover - metadata fallback
    from . import spaces as _spaces

from ..core.batch import Simulator
from ..envs import balance_beam, cartpole

__all__ = ["CartpoleVecGym", "BalanceVecGym"]


class _VecGymBase:
    """SB3 VecEnv-shaped base: reset() -> obs; step(a) -> (obs, r, d, infos)."""

    def __init__(self, num_envs: int):
        self.num_envs = num_envs

    @property
    def infos(self):
        # fresh, DISTINCT dicts every step: SB3-style consumers write
        # per-env keys (e.g. infos[i]["terminal_observation"]); a shared
        # dict ([{}] * n) or reused list would alias those writes across
        # envs and across steps
        return [{} for _ in range(self.num_envs)]

    def close(self, **kwargs):
        pass

    def seed(self, seed=None):  # parity no-op: episode streams are counter-keyed
        return [seed] * self.num_envs


class CartpoleVecGym(_VecGymBase):
    """``CartpoleMadronaNumpy/Torch`` analog (``envs/cartpole_env.py:27-128``)."""

    def __init__(self, num_envs: int, start_episode: int = 0):
        super().__init__(num_envs)
        high = np.array(
            [
                cartpole.X_THRESHOLD * 2,
                np.finfo(np.float32).max,
                cartpole.THETA_THRESHOLD * 2,
                np.finfo(np.float32).max,
            ],
            dtype=np.float32,
        )
        self.single_observation_space = _spaces.Box(-high, high, dtype=np.float32)
        self.single_action_space = _spaces.Discrete(2)
        self.observation_space = self.single_observation_space
        self.action_space = self.single_action_space
        self.sim = Simulator(cartpole.Env(), num_envs, start_episode=start_episode)

    def reset(self):
        return np.asarray(self.sim.last_out.obs).reshape(self.num_envs, -1)

    def step(self, actions):
        actions = np.asarray(actions, dtype=np.int32).reshape(self.num_envs, 1)
        out = self.sim.step(actions)
        return (
            np.asarray(out.obs).reshape(self.num_envs, -1),
            np.asarray(out.reward).reshape(self.num_envs),
            np.asarray(out.done).reshape(self.num_envs),
            self.infos,
        )


class BalanceVecGym(_VecGymBase):
    """``BalanceGym`` analog: ego seat 0, partner seat driven by a provided
    policy (default: uniform-random, the reference's ``RandomVectorAgent``)."""

    def __init__(self, num_envs: int, partner_fn=None, seed: int = 0,
                 start_episode: int = 0):
        super().__init__(num_envs)
        nvec = (
            [balance_beam.NUM_SPACES + 2 * balance_beam.BUFFER]
            * 2 * balance_beam.TIME
            + [balance_beam.TIME]
        )
        self.single_observation_space = _spaces.MultiDiscrete(nvec)
        self.single_action_space = _spaces.Discrete(balance_beam.NUM_MOVES)
        self.observation_space = self.single_observation_space
        self.action_space = self.single_action_space
        self._rng = np.random.RandomState(seed)
        self._partner_fn = partner_fn or (
            lambda obs: self._rng.randint(
                0, balance_beam.NUM_MOVES, size=self.num_envs
            )
        )
        self.sim = Simulator(balance_beam.Env(), num_envs,
                             start_episode=start_episode)

    def _ego_obs(self, out):
        # seat-major obs [N, 2, 7]; ego is seat 0 (BalanceGym returns
        # obs.obs.float(): the ego VectorObservation)
        return np.asarray(out.obs)[:, 0].astype(np.float32)

    def reset(self):
        return self._ego_obs(self.sim.last_out)

    def step(self, actions):
        partner = np.asarray(
            self._partner_fn(self._ego_obs(self.sim.last_out)), dtype=np.int32
        )
        joint = np.stack(
            [np.asarray(actions, dtype=np.int32).reshape(-1), partner], axis=1
        )
        out = self.sim.step(joint)
        return (
            self._ego_obs(out),
            np.asarray(out.reward)[:, 0],
            np.asarray(out.done).reshape(self.num_envs),
            self.infos,
        )
