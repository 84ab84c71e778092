"""Process-per-env oracle vectorizer.

Contract parity with the reference ``AsyncVectorEnv``
(``pantheonrl_extension/asyncvectorenv.py``): one OS process per oracle env,
communicating over ``mp.Pipe`` with cloudpickled env constructors — the
repo's only multi-process machinery, kept as the CPU baseline harness.
Workers speak the same per-env protocol as ``SyncVectorEnv``
(``n_reset``/``n_step`` with per-seat rows, auto-reset on done).
"""

from __future__ import annotations

import multiprocessing as mp
import pickle
from typing import Callable, List

import cloudpickle
import numpy as np
import jax.numpy as jnp

from .vectorenv import VectorMultiAgentEnv
from .vectorobservation import VectorObservation


class CloudpickleWrapper:
    """Serialize env constructors with cloudpickle (reference ``:15-29``)."""

    def __init__(self, fn: Callable):
        self.fn = fn

    def __getstate__(self):
        return cloudpickle.dumps(self.fn)

    def __setstate__(self, blob):
        self.fn = pickle.loads(blob)


def _worker(remote, parent_remote, fn_wrapper):
    parent_remote.close()
    env = fn_wrapper.fn()
    try:
        while True:
            cmd, data = remote.recv()
            if cmd == "step":
                obs, mask, act, rew, done = env.n_step(data)
                if done:
                    obs, mask, act = env.n_reset()
                remote.send((obs, mask, act, rew, done))
            elif cmd == "reset":
                remote.send(env.n_reset())
            elif cmd == "close":
                remote.close()
                break
    except (KeyboardInterrupt, EOFError):
        pass


class AsyncVectorEnv(VectorMultiAgentEnv):
    def __init__(self, env_fns: List[Callable], ego_ind: int = 0,
                 resample_policy: str = "default", context: str = "spawn"):
        proto = env_fns[0]()
        super().__init__(
            len(env_fns), ego_ind=ego_ind, n_players=proto.num_agents,
            resample_policy=resample_policy,
        )
        self.env = proto
        ctx = mp.get_context(context)
        self.remotes, self.work_remotes = zip(*[ctx.Pipe() for _ in env_fns])
        self.procs = []
        for wr, r, fn in zip(self.work_remotes, self.remotes, env_fns):
            p = ctx.Process(target=_worker, args=(wr, r, CloudpickleWrapper(fn)),
                            daemon=True)
            p.start()
            wr.close()
            self.procs.append(p)

    def _pack(self, per_env):
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
        for r in self.remotes:
            r.send(("reset", None))
        return self._pack([r.recv() for r in self.remotes])

    def n_step(self, actions):
        acts = np.asarray(actions)
        for i, r in enumerate(self.remotes):
            r.send(("step", acts[:, i]))
        results = [r.recv() for r in self.remotes]
        per_env = [(o, m, a) for o, m, a, _, _ in results]
        rews = jnp.asarray(np.stack([r for _, _, _, r, _ in results], axis=1))
        dones = jnp.asarray(np.asarray([d for *_, d in results]))
        return self._pack(per_env), rews, dones, {}

    def close(self, **kwargs):
        for r in self.remotes:
            try:
                r.send(("close", None))
            except (BrokenPipeError, OSError):
                pass
        for p in self.procs:
            p.join(timeout=2)
