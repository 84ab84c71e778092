"""Hanabi bitwise differential validation: the vectorized simulator must match
the sequential oracle exactly under the shared episode-counter discipline —
deck order, stale per-seat encodings, masks, rewards, termination.
(Reference harness: ``scripts/hanabi_example.py --validation``.)"""

import numpy as np
import jax.numpy as jnp
import pytest

from madrona_rl_envs_playground_tpu.core import Simulator
from madrona_rl_envs_playground_tpu.envs.hanabi import CONFIGS, Env
from madrona_rl_envs_playground_tpu.oracles.hanabi import Counter, HanabiOracle

N = 8


def check_all(out, oracles, t):
    obs = np.asarray(out.obs)
    state = np.asarray(out.state_obs)
    mask = np.asarray(out.action_mask)
    active = np.asarray(out.active)
    for i, o in enumerate(oracles):
        for a in range(o.P):
            ref_obs, ref_state = o.obs[a]
            np.testing.assert_array_equal(obs[i, a], ref_obs, err_msg=f"t={t} env={i} seat={a} obs")
            np.testing.assert_array_equal(state[i, a], ref_state, err_msg=f"t={t} env={i} seat={a} state")
            np.testing.assert_array_equal(mask[i, a], o.masks[a], err_msg=f"t={t} env={i} seat={a} mask")
            assert active[i, a] == (a == o.cur), f"t={t} env={i} seat={a} active"


def sample_action(mask_row, rs, allowed=None):
    legal = np.nonzero(mask_row)[0]
    if allowed is not None:
        filt = [u for u in legal if allowed(u)]
        legal = np.asarray(filt if filt else legal)
    return int(legal[rs.randint(len(legal))])


def run_differential(config_name, steps, seed, allowed=None):
    cfg = CONFIGS[config_name]
    env = Env(**cfg)
    sim = Simulator(env, N)
    counter = Counter()
    oracles = [HanabiOracle(counter, **cfg) for _ in range(N)]

    check_all(sim.last_out, oracles, -1)
    rs = np.random.RandomState(seed)
    out = sim.last_out
    for t in range(steps):
        mask = np.asarray(out.action_mask)
        active = np.asarray(out.active)
        actions = np.zeros((N, env.players), np.int32)
        chosen = []
        for i in range(N):
            seat = int(np.nonzero(active[i])[0][0])
            uid = sample_action(mask[i, seat], rs, allowed)
            actions[i, seat] = uid
            chosen.append(uid)
        out = sim.step(jnp.asarray(actions))
        rew = np.asarray(out.reward)
        done = np.asarray(out.done)
        for i, o in enumerate(oracles):
            ref_rew, ref_done = o.step(chosen[i])
            assert ref_done == bool(done[i]), f"t={t} env={i} done"
            assert np.all(rew[i] == np.float32(ref_rew)), f"t={t} env={i} rew"
        # resets consume counter values in world order, like the simulator
        for i, o in enumerate(oracles):
            if done[i]:
                o.reset()
        check_all(out, oracles, t)


@pytest.mark.quick
@pytest.mark.parametrize("config_name", ["full", "small", "very_small"])
def test_uniform_legal_rollout(config_name):
    run_differential(config_name, steps=80, seed=0)


def test_empty_deck_endgame():
    # never play: deck drains through discards, exercising the hand-shrink
    # shift path and the turns_to_play countdown.
    env_h = Env(**CONFIGS["full"]).hand
    run_differential(
        "full", steps=140, seed=2, allowed=lambda u: not (env_h <= u < 2 * env_h)
    )


def test_three_player_differential():
    """3-player game (reference bindings accept `players`; its NUM_MOVES cap
    covers only 2p — here the move space is sized per config)."""
    cfg = dict(colors=2, ranks=5, players=3, max_information_tokens=3,
               max_life_tokens=2)
    env = Env(**cfg)
    sim = Simulator(env, 4)
    counter = Counter()
    oracles = [HanabiOracle(counter, **cfg) for _ in range(4)]
    check_all(sim.last_out, oracles, -1)
    rs = np.random.RandomState(5)
    out = sim.last_out
    for t in range(60):
        mask = np.asarray(out.action_mask)
        active = np.asarray(out.active)
        actions = np.zeros((4, env.players), np.int32)
        chosen = []
        for i in range(4):
            seat = int(np.nonzero(active[i])[0][0])
            uid = sample_action(mask[i, seat], rs)
            actions[i, seat] = uid
            chosen.append(uid)
        out = sim.step(jnp.asarray(actions))
        done = np.asarray(out.done)
        rew = np.asarray(out.reward)
        for i, o in enumerate(oracles):
            ref_rew, ref_done = o.step(chosen[i])
            assert ref_done == bool(done[i]), f"t={t} env={i}"
            assert np.all(rew[i] == np.float32(ref_rew)), f"t={t} env={i}"
        for i, o in enumerate(oracles):
            if done[i]:
                o.reset()
        check_all(out, oracles, t)
