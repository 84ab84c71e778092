"""Hanabi state-decoder invariants over live simulator rollouts
(reference analog: envs/hanabi_env.py:157-298 HanabiState checks)."""

import numpy as np
import jax.numpy as jnp

from madrona_rl_envs_playground_tpu.core import Simulator
from madrona_rl_envs_playground_tpu.envs.hanabi import CONFIGS, Env
from madrona_rl_envs_playground_tpu.oracles.hanabi_decoder import (
    decode_state,
    validate_invariants,
)


def test_invariants_hold_over_rollout():
    env = Env(**CONFIGS["full"])
    N = 6
    sim = Simulator(env, N)
    rs = np.random.RandomState(0)
    out = sim.last_out
    for t in range(50):
        state = np.asarray(out.state_obs)
        active = np.asarray(out.active)
        mask = np.asarray(out.action_mask)
        for i in range(N):
            seat = int(np.nonzero(active[i])[0][0])
            dec = decode_state(env, state[i, seat])
            validate_invariants(env, dec)
            # fresh-episode structure right after reset steps
            if t == 0:
                assert dec.deck_size == env.max_deck_bits
                assert dec.info_tokens == env.max_info
                assert dec.life_tokens == env.max_life
                assert all(f == 0 for f in dec.fireworks)
        actions = np.zeros((N, env.players), np.int32)
        for i in range(N):
            seat = int(np.nonzero(active[i])[0][0])
            legal = np.nonzero(mask[i, seat])[0]
            actions[i, seat] = int(legal[rs.randint(len(legal))])
        out = sim.step(jnp.asarray(actions))


def test_decoder_catches_corruption():
    env = Env(**CONFIGS["small"])
    sim = Simulator(env, 1)
    state = np.asarray(sim.last_out.state_obs)[0, 0].copy()
    dec = decode_state(env, state)
    validate_invariants(env, dec)
    # flip a bit inside the first partner-hand one-hot block: either the
    # one-hot assertion or card conservation must trip
    bad = state.copy()
    blk = bad[: env.bits_per_card]
    idx = int(np.argmax(blk == 0))
    bad[idx] = 1
    try:
        d2 = decode_state(env, bad)
        validate_invariants(env, d2)
    except AssertionError:
        return
    raise AssertionError("corrupted encoding passed the invariant checker")
