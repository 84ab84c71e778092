"""Bit-exactness of the fused Hanabi megakernel vs the jnp path: full state
(deck, hands, knowledge, tokens, last-move), stale-seat obs/own/mask
buffers, reward, done, and the episode counter, across resets (games in the
very_small config end within ~20-40 turns under mask-legal random play)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_rl_envs_playground_tpu.core.batch import batched_reset, batched_step
from madrona_rl_envs_playground_tpu.envs import hanabi
from madrona_rl_envs_playground_tpu.ops.hanabi_megakernel import (
    fused_step,
    init_packed,
    pack_state,
    unpack_state,
)

INTERP = jax.default_backend() != "tpu"
N = 8


def legal_actions(rs, mask_np):
    """Uniform random legal action per (env, seat) from the bool mask."""
    Nn, P, A = mask_np.shape
    out = np.zeros((Nn, P), np.int32)
    for i in range(Nn):
        for p in range(P):
            legal = np.nonzero(mask_np[i, p])[0]
            out[i, p] = rs.choice(legal) if len(legal) else 0
    return out


@pytest.mark.parametrize("config", ["very_small", "small"])
def test_hanabi_kernel_matches_jnp(config):
    env = hanabi.Env(**hanabi.CONFIGS[config])
    bstate, out = batched_reset(env, N)
    d = pack_state(env, bstate.env_states)
    counter = jnp.int32(N)

    d0, c0 = init_packed(env, N)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        d, d0,
    )

    step_jnp = jax.jit(batched_step, static_argnums=(0,))
    step_pal = jax.jit(
        lambda d_, c_, a_: fused_step(env, d_, c_, a_, block=8, interpret=INTERP)
    )
    rs = np.random.RandomState(11)
    resets = 0
    steps = 60 if config == "very_small" else 40
    for t in range(steps):
        actions = jnp.asarray(
            legal_actions(rs, np.asarray(out.action_mask)), jnp.int32
        )
        bstate, out = step_jnp(env, bstate, actions)
        d, rew, done, counter = step_pal(d, counter, actions.T)
        resets += int(np.asarray(done).sum())
        np.testing.assert_array_equal(
            np.asarray(done), np.asarray(out.done), err_msg=f"t={t} done"
        )
        np.testing.assert_array_equal(
            np.asarray(rew).astype(np.float32),
            np.asarray(out.reward)[:, 0], err_msg=f"t={t} reward",
        )
        assert int(counter) == int(bstate.episode_counter), f"t={t} counter"
        got = unpack_state(env, d)
        ref = bstate.env_states
        for f in ref.__dataclass_fields__:
            np.testing.assert_array_equal(
                np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)),
                err_msg=f"t={t} state.{f}",
            )
        # the step outputs come from the buffers; check against StepOutput too
        np.testing.assert_array_equal(
            np.asarray(jnp.transpose(d["obs"], (2, 0, 1))),
            np.asarray(out.obs), err_msg=f"t={t} obs",
        )
        np.testing.assert_array_equal(
            np.asarray(jnp.transpose(d["mask"], (2, 0, 1)) != 0),
            np.asarray(out.action_mask), err_msg=f"t={t} mask",
        )
    if config == "very_small":
        assert resets > 0, "games must end within the test horizon"


def _persistent_replay(env, bstate, w, T, n):
    """jnp replay of the persistent kernel's schedule: same action stream
    (action_from_mask on the active seat's mask), returns (bstate, w,
    done_count, checksum) with the kernel's consumption discipline
    (sum of both seats' stale-blended obs+own+mask buffers + P*reward +
    done, accumulated per step)."""
    from madrona_rl_envs_playground_tpu.ops.hanabi_megakernel import (
        action_from_mask,
    )

    P = env.players
    step_jnp = jax.jit(batched_step, static_argnums=(0,))
    draw = jax.jit(action_from_mask)
    dref = np.zeros(n, np.int64)
    cref = np.zeros(n, np.int64)
    for t in range(T):
        st = bstate.env_states
        cur = np.asarray(st.cur_player)
        act_mask = np.asarray(st.mask_buf)[np.arange(n), cur]  # [n, A]
        w, uid = draw(w, jnp.asarray(act_mask))
        actions = jnp.broadcast_to(
            jnp.asarray(uid)[:, None], (n, P)).astype(jnp.int32)
        bstate, out = step_jnp(env, bstate, actions)
        st = bstate.env_states
        cref += np.asarray(st.obs_buf, np.int64).reshape(n, -1).sum(axis=1)
        cref += np.asarray(st.own_buf, np.int64).reshape(n, -1).sum(axis=1)
        cref += np.asarray(st.mask_buf, np.int64).reshape(n, -1).sum(axis=1)
        cref += np.asarray(out.reward, np.int64).sum(axis=1)
        cref += np.asarray(out.done, np.int64)
        dref += np.asarray(out.done, np.int64)
    return bstate, w, dref, cref


# state fields that the persistent kernel keeps exact (obs/own/mask stay a
# launch-time snapshot by design — see fused_rollout docstring)
_EXACT_FIELDS = (
    "deck", "deck_size", "discard_counts", "fireworks", "info_tokens",
    "life_tokens", "cur_player", "turns_to_play", "score", "lm_move",
    "lm_player", "lm_target", "lm_card_index", "lm_scored", "lm_info_token",
    "lm_color", "lm_rank", "lm_reveal_bits", "hand_cards", "hand_plausible",
    "hand_size", "known_color", "known_rank", "rng_v",
)


@pytest.mark.parametrize("config", ["very_small", "small"])
def test_hanabi_persistent_rollout_matches_jnp(config):
    """Single-block persistent rollout (block == N, so block-sequential
    episode allocation == the jnp path's whole-batch world order): final
    state, action rng, counter, per-env done count, and the in-VMEM
    consumption checksum must match a jnp replay of the identical action
    stream."""
    from madrona_rl_envs_playground_tpu.ops.hanabi_megakernel import (
        fused_rollout,
        init_action_rng,
        init_packed,
    )

    env = hanabi.Env(**hanabi.CONFIGS[config])
    n = N if INTERP else 256
    T = 90 if config == "very_small" else 60
    d, counter = init_packed(env, n)
    w0 = init_action_rng(n)

    roll = jax.jit(lambda d_, c_, w_: fused_rollout(
        env, d_, c_, w_, T, block=n, interpret=INTERP))
    d2, cnt2, w2, dcnt, chk = roll(d, counter, w0)

    bstate, _ = batched_reset(env, n)
    bstate, w, dref, cref = _persistent_replay(env, bstate, w0[0], T, n)

    np.testing.assert_array_equal(np.asarray(w2[0]), np.asarray(w))
    np.testing.assert_array_equal(np.asarray(dcnt, np.int64), dref)
    np.testing.assert_array_equal(np.asarray(chk, np.int64), cref)
    assert int(cnt2) == int(bstate.episode_counter)
    if config == "very_small":
        assert dref.sum() > 0, "games must end within the test horizon"

    got = unpack_state(env, d2)
    ref = bstate.env_states
    for f in _EXACT_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)),
            err_msg=f"state.{f}",
        )


def test_hanabi_persistent_multiblock_schedule():
    """Multi-block grids allocate episode indices block-sequentially (each
    block finishes its whole T-step loop before the next starts, SMEM
    carrying the counter): replaying the jnp path block by block with the
    threaded counter reproduces the kernel exactly."""
    from madrona_rl_envs_playground_tpu.ops.hanabi_megakernel import (
        fused_rollout,
        init_action_rng,
        init_packed,
    )

    env = hanabi.Env(**hanabi.CONFIGS["very_small"])
    n, block = (8, 4) if INTERP else (256, 128)
    T = 90
    d, counter = init_packed(env, n)
    w0 = init_action_rng(n)

    roll = jax.jit(lambda d_, c_, w_: fused_rollout(
        env, d_, c_, w_, T, block=block, interpret=INTERP))
    d2, cnt2, w2, dcnt, chk = roll(d, counter, w0)
    got = unpack_state(env, d2)

    bstate0, _ = batched_reset(env, n)
    running = n  # counter after init (episode w dealt to world w)
    sl_results = []
    for b in range(n // block):
        sl = slice(b * block, (b + 1) * block)
        from madrona_rl_envs_playground_tpu.core.types import BatchState

        bs_b = BatchState(
            env_states=jax.tree_util.tree_map(
                lambda x: x[sl], bstate0.env_states),
            episode_counter=jnp.uint32(running),
        )
        bs_b, w_b, dref, cref = _persistent_replay(
            env, bs_b, w0[0, sl], T, block)
        running = int(bs_b.episode_counter)
        sl_results.append((bs_b, w_b, dref, cref))

        np.testing.assert_array_equal(np.asarray(w2[0, sl]), np.asarray(w_b))
        np.testing.assert_array_equal(np.asarray(dcnt, np.int64)[sl], dref)
        np.testing.assert_array_equal(np.asarray(chk, np.int64)[sl], cref)
        ref = bs_b.env_states
        for f in _EXACT_FIELDS:
            np.testing.assert_array_equal(
                np.asarray(getattr(got, f))[sl], np.asarray(getattr(ref, f)),
                err_msg=f"block {b} state.{f}",
            )
    assert int(cnt2) == running
