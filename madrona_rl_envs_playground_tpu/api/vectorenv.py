"""Vectorized multi-agent environment API (PantheonRL-style, on-device).

Contract parity with the reference's ``VectorMultiAgentEnv``
(``pantheonrl_extension/vectorenv.py:26-255``): ego/partner seat
decomposition, per-seat partner lists with round-robin/random resampling,
``step(ego_action)`` that gathers partner actions, advances all worlds, and
routes rewards back to partner agents; abstract ``n_step``/``n_reset``.

``TpuVecEnv`` replaces the reference's ``MadronaEnv`` adapter
(``vectorenv.py:262-346``): because the simulator is our own jitted step
function we control tensor layout, so the agentID/worldID scatter dance the
reference needs on the GPU ECS path (``vectorenv.py:284-294``) disappears —
per-seat views are plain axis-1 slices of the batched ``StepOutput``.

``SyncVectorEnv`` (``vectorenv.py:348-425`` analog) drives N host-side oracle
envs in a Python loop with auto-reset — retained as the differential parity
harness, not a performance path.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..core.batch import Simulator
from .agents import VectorAgent
from .spaces import Box, Discrete, MultiBinary
from .vectorobservation import VectorObservation

Array = jnp.ndarray


class PlayerException(Exception):
    """Raised when players in the environment are incorrectly set."""


class VectorMultiAgentEnv(ABC):
    def __init__(
        self,
        num_envs: int,
        ego_ind: int = 0,
        n_players: int = 2,
        resample_policy: str = "default",
        partners: Optional[List[List[VectorAgent]]] = None,
    ):
        self.num_envs = num_envs
        self.ego_ind = ego_ind
        self.n_players = n_players

        if partners is not None:
            if len(partners) != n_players - 1:
                raise PlayerException(
                    "The number of partners needs to equal the number of non-ego players"
                )
            for plist in partners:
                if not isinstance(plist, list) or not plist:
                    raise PlayerException("Sublist for each partner must be nonempty list")
        self.partners = partners or [[] for _ in range(n_players - 1)]
        self.partnerids = [0] * (n_players - 1)
        self._obs: Tuple[Optional[VectorObservation], ...] = tuple()
        self.set_resample_policy(resample_policy)

    # -- partner management (reference vectorenv.py:110-144) ---------------
    def _get_partner_num(self, player_num: int) -> int:
        if player_num == self.ego_ind:
            raise PlayerException("Ego agent is not set by the environment")
        if player_num > self.ego_ind:
            return player_num - 1
        return player_num

    def add_partner_agent(self, agent: VectorAgent, player_num: int = 1) -> None:
        self.partners[self._get_partner_num(player_num)].append(agent)

    def set_partnerid(self, agent_id: int, player_num: int = 1) -> None:
        partner_num = self._get_partner_num(player_num)
        assert 0 <= agent_id < len(self.partners[partner_num])
        self.partnerids[partner_num] = agent_id

    def resample_random(self) -> None:
        self.partnerids = [np.random.randint(len(plist)) for plist in self.partners]

    def resample_round_robin(self) -> None:
        self.partnerids = [(self.partnerids[0] + 1) % len(self.partners[0])]

    def set_resample_policy(self, resample_policy: str) -> None:
        if resample_policy == "default":
            resample_policy = "robin" if self.n_players == 2 else "random"
        if resample_policy == "robin" and self.n_players != 2:
            raise PlayerException("Cannot do round robin resampling for >2 players")
        if resample_policy == "robin":
            self.resample_partner = self.resample_round_robin
        elif resample_policy == "random":
            self.resample_partner = self.resample_random
        else:
            raise PlayerException(f"Invalid resampling policy: {resample_policy}")

    # -- step/reset loop (reference vectorenv.py:146-213) ------------------
    def _get_actions(self, obs, ego_act) -> Array:
        actions = []
        for player in range(self.n_players):
            if player == self.ego_ind:
                actions.append(ego_act)
            else:
                p = self._get_partner_num(player)
                agent = self.partners[p][self.partnerids[p]]
                actions.append(agent.get_action(obs[player]))
        return jnp.stack(actions)

    def _update_players(self, rews: Array, done: Array) -> None:
        for i in range(self.n_players - 1):
            playernum = i + (0 if i < self.ego_ind else 1)
            self.partners[i][self.partnerids[i]].update(rews[playernum], done)

    def step(self, action: Array):
        """One timestep from the ego seat's perspective.

        Returns (ego_obs: VectorObservation, ego_rew [N], done [N], info).
        """
        acts = self._get_actions(self._obs, action)
        self._obs, rews, done, info = self.n_step(acts)
        self._update_players(rews, done)
        return self._obs[self.ego_ind], rews[self.ego_ind], done, info

    def reset(self) -> VectorObservation:
        self.resample_partner()
        self._obs = self.n_reset()
        return self._obs[self.ego_ind]

    @abstractmethod
    def n_step(self, actions: Array):
        """actions [P, N] -> (obs: tuple of per-seat VectorObservation,
        rewards [P, N], done [N], info)."""

    @abstractmethod
    def n_reset(self) -> Tuple[VectorObservation, ...]:
        ...

    def close(self, **kwargs):
        pass


def _seat_views(out, n_players: int) -> Tuple[VectorObservation, ...]:
    return tuple(
        VectorObservation(
            active=out.active[:, p],
            obs=out.obs[:, p],
            state=out.state_obs[:, p],
            action_mask=out.action_mask[:, p],
        )
        for p in range(n_players)
    )


class TpuVecEnv(VectorMultiAgentEnv):
    """On-device vector env over a core ``Simulator`` — the MadronaEnv analog.

    Seat views are slices, rewards come back [P, N] (the reference transposes
    its (N, P) buffers the same way, ``vectorenv.py:306-317``).
    """

    def __init__(
        self,
        env,
        num_envs: int,
        ego_ind: int = 0,
        resample_policy: str = "default",
        partners=None,
        sharding=None,
        start_episode: int = 0,
    ):
        super().__init__(
            num_envs,
            ego_ind=ego_ind,
            n_players=env.num_agents,
            resample_policy=resample_policy,
            partners=partners,
        )
        self.env = env
        self.sim = Simulator(env, num_envs, sharding=sharding, start_episode=start_episode)

        obs_dt = np.dtype(np.float32 if env.obs_dtype == jnp.float32 else np.int8)
        self.observation_space = (
            Box(-np.inf, np.inf, (env.obs_size,))
            if obs_dt == np.float32
            else MultiBinary((env.obs_size,))
        )
        self.share_observation_space = (
            Box(-np.inf, np.inf, (env.state_size,))
            if obs_dt == np.float32
            else MultiBinary((env.state_size,))
        )
        self.action_space = Discrete(env.num_actions)

    def n_step(self, actions: Array):
        out = self.sim.step(jnp.transpose(actions.astype(jnp.int32)))
        rews = jnp.transpose(out.reward)
        return _seat_views(out, self.n_players), rews, out.done, {}

    def n_reset(self) -> Tuple[VectorObservation, ...]:
        out = self.sim.reset()
        return _seat_views(out, self.n_players)


class SyncVectorEnv(VectorMultiAgentEnv):
    """Host-side oracle vectorizer: N python envs stepped in a loop.

    Each oracle env must expose
    ``n_reset() -> (obs_list, mask_list, active_list)`` and
    ``n_step(actions) -> (obs_list, mask_list, active_list, rewards, done)``
    with per-seat numpy rows, plus ``num_agents``/``obs_size``/``num_actions``
    metadata (see ``oracles/adapters.py``).  Auto-resets on done like the
    reference (``vectorenv.py:369-371``).
    """

    def __init__(self, env_fns, ego_ind: int = 0, resample_policy: str = "default"):
        self.envs = [fn() for fn in env_fns]
        proto = self.envs[0]
        super().__init__(
            len(self.envs),
            ego_ind=ego_ind,
            n_players=proto.num_agents,
            resample_policy=resample_policy,
        )
        self.env = proto

    def _pack(self, per_env):
        """per_env: list over envs of (obs_list, mask_list, active_list)."""
        P = self.n_players
        obs = np.stack([np.stack(o) for o, _, _ in per_env], axis=1)
        mask = np.stack([np.stack(m) for _, m, _ in per_env], axis=1)
        active = np.stack([np.stack(a) for _, _, a in per_env], axis=1)
        return tuple(
            VectorObservation(
                active=jnp.asarray(active[p]),
                obs=jnp.asarray(obs[p]),
                state=jnp.asarray(obs[p]),
                action_mask=jnp.asarray(mask[p]),
            )
            for p in range(P)
        )

    def n_reset(self):
        return self._pack([e.n_reset() for e in self.envs])

    def n_step(self, actions: Array):
        acts = np.asarray(actions)
        per_env, rews, dones = [], [], []
        for i, e in enumerate(self.envs):
            obs_l, mask_l, act_l, rew, done = e.n_step(acts[:, i])
            if done:
                obs_l, mask_l, act_l = e.n_reset()
            per_env.append((obs_l, mask_l, act_l))
            rews.append(rew)
            dones.append(done)
        rews_a = jnp.asarray(np.stack(rews, axis=1))
        return self._pack(per_env), rews_a, jnp.asarray(dones), {}
