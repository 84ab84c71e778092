"""Full semantic validation of Hanabi transitions — the analog of the
reference's ``validate_step`` orchestration (``envs/hanabi_env.py:478-657``):
abstract-step simulation, action-mask validation, and cross-step state
equivalence over LIVE rollouts of both the jnp path and the Pallas
megakernel, plus corrupted-transition mutation tests proving the checker
catches rule violations a bit-diff against a co-derived oracle cannot see
(wrong token refund, mis-scored play, phantom card, wrong mask bit)."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_rl_envs_playground_tpu.core import Simulator
from madrona_rl_envs_playground_tpu.envs import hanabi
from madrona_rl_envs_playground_tpu.oracles import hanabi_decoder as hv

INTERP = jax.default_backend() != "tpu"


def legal_actions(rs, mask_np, active_np):
    N, P, A = mask_np.shape
    out = np.zeros((N, P), np.int32)
    for i in range(N):
        seat = int(np.argmax(active_np[i]))
        legal = np.nonzero(mask_np[i, seat])[0]
        out[i, seat] = int(legal[rs.randint(len(legal))])
    return out


def rollout_and_validate(config, steps, n=6, seed=0):
    env = hanabi.Env(**hanabi.CONFIGS[config])
    sim = Simulator(env, n)
    rs = np.random.RandomState(seed)
    prev = sim.last_out
    dones = 0
    for _ in range(steps):
        actions = legal_actions(
            rs, np.asarray(prev.action_mask), np.asarray(prev.active))
        nxt = sim.step(jnp.asarray(actions))
        hv.validate_step(env, prev, actions, nxt, np.asarray(nxt.done))
        dones += int(np.asarray(nxt.done).sum())
        prev = nxt
    return dones


@pytest.mark.parametrize("config,steps", [("small", 80), ("full", 40)])
def test_semantic_validator_over_jnp_rollout(config, steps):
    dones = rollout_and_validate(config, steps)
    if config == "small":
        # small games end quickly: the post-done fresh-episode branch must
        # actually have been exercised
        assert dones > 0


def test_semantic_validator_over_megakernel_rollout():
    """Same validation, but every tensor comes from the megakernel's own
    exported buffers (obs/own/mask in [P, bits, N] layout), not the jnp
    path."""
    from madrona_rl_envs_playground_tpu.ops.hanabi_megakernel import (
        fused_step, init_packed, unpack_state)

    env = hanabi.Env(**hanabi.CONFIGS["small"])
    N = 8
    d, counter = init_packed(env, N)
    step = jax.jit(
        lambda d_, c_, a_: fused_step(env, d_, c_, a_, block=8,
                                      interpret=INTERP))
    seats = np.arange(env.players)

    def to_out(d_, rew, done):
        st = unpack_state(env, d_)
        cur = np.asarray(st.cur_player)
        obs = np.asarray(jnp.transpose(d_["obs"], (2, 0, 1)))
        own = np.asarray(jnp.transpose(d_["own"], (2, 0, 1)))
        return types.SimpleNamespace(
            obs=obs,
            state_obs=np.concatenate([obs, own], axis=-1),
            action_mask=np.asarray(jnp.transpose(d_["mask"], (2, 0, 1))),
            active=cur[:, None] == seats[None, :],
            reward=np.broadcast_to(
                np.asarray(rew)[:, None], (N, env.players)),
            done=np.asarray(done) if done is not None else None,
        )

    prev = to_out(d, jnp.zeros(N, jnp.int32), None)
    rs = np.random.RandomState(3)
    dones = 0
    for _ in range(60):
        actions = legal_actions(rs, prev.action_mask, prev.active)
        d, rew, done, counter = step(d, counter, jnp.asarray(actions).T)
        nxt = to_out(d, rew, done)
        hv.validate_step(env, prev, actions, nxt, nxt.done)
        dones += int(np.asarray(done).sum())
        prev = nxt
    assert dones > 0


# ---------------------------------------------------------------------------
# corrupted-transition mutations: each passes decode+invariants but must
# trip the semantic layers
# ---------------------------------------------------------------------------


def _one_transition(env, n=4, seed=1, want_discard=False, steps=40):
    """Roll until a usable transition; returns (prev, actions, nxt, i, cur)."""
    sim = Simulator(env, n)
    rs = np.random.RandomState(seed)
    prev = sim.last_out
    H = env.hand
    for _ in range(steps):
        active = np.asarray(prev.active)
        mask = np.asarray(prev.action_mask)
        actions = legal_actions(rs, mask, active)
        nxt = sim.step(jnp.asarray(actions))
        done = np.asarray(nxt.done)
        for i in range(n):
            if done[i]:
                continue
            cur = int(np.argmax(active[i]))
            a = int(actions[i, cur])
            if want_discard and not (a < H):
                continue
            return prev, actions, nxt, i, cur
        prev = nxt
    raise RuntimeError("no usable transition found")


def _np_out(out):
    return types.SimpleNamespace(
        obs=np.asarray(out.obs).copy(),
        state_obs=np.asarray(out.state_obs).copy(),
        action_mask=np.asarray(out.action_mask).copy(),
        active=np.asarray(out.active).copy(),
        reward=np.asarray(out.reward).copy(),
        done=np.asarray(out.done).copy(),
    )


def _decodes_clean(env, state_vec):
    dec = hv.decode_state(env, state_vec)
    hv.validate_invariants(env, dec)
    return dec


def test_catches_wrong_token_refund():
    """A discard whose info-token refund is dropped: the corrupted next
    state still decodes and satisfies every representation invariant, but
    the semantic layers must flag it — either the rederived action mask
    (token count gates discard/reveal legality) or cross-step token
    equivalence, whichever fires first."""
    env = hanabi.Env(**hanabi.CONFIGS["small"])
    prev, actions, nxt, i, cur = _one_transition(env, want_discard=True)
    nxt = _np_out(nxt)
    newcur = int(np.argmax(nxt.active[i]))
    off_info = ((env.players - 1) * env.hand * env.bits_per_card
                + env.players + env.max_deck_bits
                + env.colors * env.ranks)
    sv = nxt.state_obs[i, newcur]
    ntok = int(sv[off_info:off_info + env.max_info].sum())
    assert ntok >= 1  # the discard just refunded one
    # clear the highest set thermometer bit in BOTH state and obs views
    for vec in (nxt.state_obs[i, newcur], nxt.obs[i, newcur]):
        vec[off_info + ntok - 1] = 0
    _decodes_clean(env, nxt.state_obs[i, newcur])  # decoder alone is blind
    with pytest.raises(AssertionError,
                       match="info tokens|mask"):
        hv.validate_step(env, prev, actions, nxt, nxt.done)


def test_catches_stolen_life_token():
    """A life token vanishing without a misplay: life tokens gate nothing
    in the action mask and nothing in card conservation, so ONLY the
    cross-step equivalence layer can catch this one."""
    env = hanabi.Env(**hanabi.CONFIGS["full"])
    prev, actions, nxt, i, cur = _one_transition(env, seed=5)
    nxt = _np_out(nxt)
    newcur = int(np.argmax(nxt.active[i]))
    off_life = ((env.players - 1) * env.hand * env.bits_per_card
                + env.players + env.max_deck_bits
                + env.colors * env.ranks + env.max_info)
    sv = nxt.state_obs[i, newcur]
    nlife = int(sv[off_life:off_life + env.max_life].sum())
    if nlife < 2:
        pytest.skip("env died this transition")
    for vec in (nxt.state_obs[i, newcur], nxt.obs[i, newcur]):
        vec[off_life + nlife - 1] = 0
    _decodes_clean(env, nxt.state_obs[i, newcur])
    with pytest.raises(AssertionError, match="life tokens"):
        hv.validate_step(env, prev, actions, nxt, nxt.done)


def test_catches_misscored_play():
    """Reward off by one: tensors are untouched (no decoder can see it),
    the rules-level reward prediction must trip."""
    env = hanabi.Env(**hanabi.CONFIGS["small"])
    prev, actions, nxt, i, cur = _one_transition(env, seed=2)
    nxt = _np_out(nxt)
    nxt.reward[i] += 1
    with pytest.raises(AssertionError, match="reward"):
        hv.validate_step(env, prev, actions, nxt, nxt.done)


def test_catches_phantom_card_swap():
    """A card in the NON-actor's hand silently swapped for a different
    (still multiplicity-legal) card: one-hot and card-conservation
    invariants pass, the action mask is untouched (play/discard legality
    depends only on slot liveness, reveals scan the actor's hand), so only
    multiset hand equivalence can catch it."""
    env = hanabi.Env(**hanabi.CONFIGS["full"])
    prev, actions, nxt, i, cur = _one_transition(env, seed=3)
    nxt = _np_out(nxt)
    newcur = int(np.argmax(nxt.active[i]))  # the non-actor this step
    sv = nxt.state_obs[i, newcur]
    dec = _decodes_clean(env, sv)

    # count every placed copy to find a multiplicity-legal replacement id
    counts = [0] * (env.colors * env.ranks)
    for hand in dec.partner_hands + [dec.own_hand]:
        for c in hand:
            counts[c] += 1
    for cid, m in enumerate(dec.discards):
        counts[cid] += m
    for c, fw in enumerate(dec.fireworks):
        for r in range(fw):
            counts[c * env.ranks + r] += 1

    # swap slot 0 of newcur's OWN hand (the non-actor: no draw this step,
    # so the multiset rules allow zero unexplained appearances)
    old_card = dec.own_hand[0]
    new_card = next(
        c for c in range(env.colors * env.ranks)
        if c != old_card and counts[c] < env.cr_num[c % env.ranks])
    off_own = env.obs_size  # own-hand suffix, slot 0
    assert sv[off_own + old_card] == 1
    sv[off_own + old_card] = 0
    sv[off_own + new_card] = 1
    _decodes_clean(env, sv)  # invariants are blind
    with pytest.raises(AssertionError, match="vanished|appeared"):
        hv.validate_step(env, prev, actions, nxt, nxt.done)


def test_catches_illegal_mask_bit():
    """A discard bit asserted legal while info tokens are full (fresh
    episode): representation invariants cannot see mask bugs, the
    rederived mask must."""
    env = hanabi.Env(**hanabi.CONFIGS["small"])
    sim = Simulator(env, 2)
    prev = _np_out(sim.last_out)
    cur = int(np.argmax(prev.active[0]))
    assert not prev.action_mask[0, cur, 0]  # discard illegal at full tokens
    prev.action_mask[0, cur, 0] = True
    actions = np.zeros((2, env.players), np.int32)
    for i in range(2):
        seat = int(np.argmax(prev.active[i]))
        legal = np.nonzero(np.asarray(sim.last_out.action_mask)[i, seat])[0]
        actions[i, seat] = int(legal[0])
    nxt = sim.step(jnp.asarray(actions))
    with pytest.raises(AssertionError, match="discard mask"):
        hv.validate_step(env, prev, actions, _np_out(nxt),
                         np.asarray(nxt.done))
