"""Three-way Hanabi differential: vectorized jnp simulator vs the
sequential C++-derived oracle vs the INDEPENDENT HLE-semantics rules
oracle (``oracles/hanabi_rules.py``) — the Hanabi analog of
``tests/test_reference_mdp.py``.  The rules oracle shares nothing with the
simulator but the recorded hidden draws (deal machinery is covered by the
bitwise TEA+LCG audit), so a misreading of the C++ rules or encoding that
the co-derived sequential oracle would mirror cannot pass here."""

import numpy as np
import jax.numpy as jnp
import pytest

from madrona_rl_envs_playground_tpu.core import Simulator
from madrona_rl_envs_playground_tpu.envs.hanabi import CONFIGS, Env
from madrona_rl_envs_playground_tpu.oracles.hanabi import Counter
from madrona_rl_envs_playground_tpu.oracles.hanabi_rules import (
    RecordingOracle,
    RulesHanabi,
    draw_cursor as make_source,
)

N = 4


def pick(mask_row, rs):
    legal = np.nonzero(mask_row)[0]
    return int(legal[rs.randint(len(legal))])


@pytest.mark.parametrize("config,steps", [("small", 90), ("full", 45)])
def test_three_way_bitwise(config, steps):
    cfg = CONFIGS[config]
    env = Env(**cfg)
    sim = Simulator(env, N)
    counter = Counter()
    oracles = [RecordingOracle(counter, **cfg) for _ in range(N)]
    sources = [make_source(o.drawn, env.ranks) for o in oracles]
    rules = [RulesHanabi(s, cxx_quirks=True, **cfg)
             for s, o in zip(sources, oracles)]

    def check_seat(out, i, seat, t):
        obs, state = rules[i].encode(seat)
        np.testing.assert_array_equal(
            np.asarray(out.obs)[i, seat], obs, err_msg=f"t={t} env={i} obs")
        np.testing.assert_array_equal(
            np.asarray(out.state_obs)[i, seat], state,
            err_msg=f"t={t} env={i} state")
        np.testing.assert_array_equal(
            np.asarray(out.action_mask)[i, seat], rules[i].legal_mask(seat),
            err_msg=f"t={t} env={i} mask")

    out = sim.last_out
    for i in range(N):
        assert sources[i].consumed() == len(oracles[i].drawn)
        for seat in range(env.players):
            check_seat(out, i, seat, -1)
        assert rules[i].to_move == int(np.argmax(np.asarray(out.active)[i]))

    rs = np.random.RandomState(7)
    resets = 0
    for t in range(steps):
        mask = np.asarray(out.action_mask)
        active = np.asarray(out.active)
        actions = np.zeros((N, env.players), np.int32)
        chosen = []
        for i in range(N):
            seat = int(np.argmax(active[i]))
            uid = pick(mask[i, seat], rs)
            actions[i, seat] = uid
            chosen.append(uid)
        out = sim.step(jnp.asarray(actions))
        done = np.asarray(out.done)
        rew = np.asarray(out.reward)
        # oracle first (records this step's draws), then the rules game
        for i in range(N):
            o_rew, o_done = oracles[i].step(chosen[i])
            r_rew, r_done = rules[i].step(chosen[i])
            assert r_rew == o_rew == float(rew[i, 0]), f"t={t} env={i} reward"
            assert r_done == o_done == bool(done[i]), f"t={t} env={i} done"
        for i in range(N):
            if done[i]:
                oracles[i].reset()
                rules[i].new_game()
                resets += 1
        for i in range(N):
            assert sources[i].consumed() == len(oracles[i].drawn), (
                f"t={t} env={i}: draw accounting diverged")
            if done[i]:
                for seat in range(env.players):
                    check_seat(out, i, seat, t)
            else:
                check_seat(out, i, rules[i].to_move, t)
            assert rules[i].to_move == int(np.argmax(np.asarray(out.active)[i]))
    if config == "small":
        assert resets > 0  # deck-exhaustion / shrink paths exercised


def test_clean_semantics_vs_quirks():
    """Clean HLE mode on the same hidden draws: identical rules outcomes,
    true cards always plausible, and every bit difference confined to the
    knowledge plausibility section (pre-exhaustion masks identical)."""
    cfg = CONFIGS["small"]
    env = Env(**cfg)
    counter = Counter()
    oracle = RecordingOracle(counter, **cfg)
    q = oracle.drawn
    quirky = RulesHanabi(make_source(q, env.ranks), cxx_quirks=True, **cfg)
    clean = RulesHanabi(make_source(q, env.ranks), cxx_quirks=False, **cfg)
    know_lo = env.obs_size - env.sz_know

    rs = np.random.RandomState(13)
    for t in range(120):
        seat = quirky.to_move
        mask_q = quirky.legal_mask(seat)
        mask_c = clean.legal_mask(seat)
        hands_full = all(n == env.hand for n in quirky.live)
        if hands_full:
            np.testing.assert_array_equal(mask_q, mask_c, err_msg=f"t={t}")
        else:
            # clean legality must imply quirky legality (stale scan only
            # ever ADDS reveal targets)
            assert not np.any(mask_c & ~mask_q), f"t={t}"
        obs_q, _ = quirky.encode(seat)
        obs_c, _ = clean.encode(seat)
        diff = np.nonzero(obs_q != obs_c)[0]
        assert np.all((diff >= know_lo) & (diff < env.obs_size)), (
            f"t={t}: clean/quirky difference outside the knowledge section")
        for p in range(env.players):
            for pos in range(clean.live[p]):
                slot = clean.hands[p][pos]
                assert slot.card in slot.plausible, (
                    f"t={t}: true card pruned from plausible set")
        uid = pick(mask_q, rs)
        oracle.step(uid)
        r_q = quirky.step(uid)
        r_c = clean.step(uid)
        assert r_q == r_c, f"t={t}: rules outcome differs between modes"
        assert quirky.fireworks == clean.fireworks
        if r_q[1]:
            oracle.reset()
            quirky.new_game()
            clean.new_game()
