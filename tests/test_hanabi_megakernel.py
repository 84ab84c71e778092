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
