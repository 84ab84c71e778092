"""Bit-exactness of the fused Balance Beam megakernel vs the jnp path:
state, rolling-history obs, reward, done, episode counter, and the TEA+LCG
reset draws.  Balance episodes last at most 3 steps (often 1 under random
actions: falling off ends immediately), so a 40-step run crosses many
world-order counter allocations."""

import jax
import jax.numpy as jnp
import numpy as np

from madrona_rl_envs_playground_tpu.core.batch import batched_reset, batched_step
from madrona_rl_envs_playground_tpu.envs import balance_beam
from madrona_rl_envs_playground_tpu.ops.balance_pallas import (
    fused_step,
    init_packed,
    pack_state,
    unpack_state,
)

INTERP = jax.default_backend() != "tpu"


def test_balance_kernel_matches_jnp():
    env = balance_beam.Env()
    N = 64
    bstate, out = batched_reset(env, N)
    packed = pack_state(bstate.env_states)
    counter = jnp.int32(N)

    init = init_packed(N)
    for got, want in zip(init[:-1], packed):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert int(init[-1]) == N

    step_jnp = jax.jit(batched_step, static_argnums=(0,))
    step_pal = jax.jit(
        lambda l, o, t, r, c, a: fused_step(l, o, t, r, c, a, block=16,
                                            interpret=INTERP)
    )
    loc, obs, time, rng_i = packed
    rs = np.random.RandomState(2)
    saw_done = 0
    for t in range(40):
        actions = jnp.asarray(rs.randint(0, 4, size=(N, 2)), jnp.int32)
        bstate, out = step_jnp(env, bstate, actions)
        loc, obs, time, rng_i, rew, done, counter = step_pal(
            loc, obs, time, rng_i, counter, actions.T
        )
        saw_done += int(np.asarray(done).sum())
        np.testing.assert_array_equal(
            np.asarray(done), np.asarray(out.done), err_msg=f"t={t} done"
        )
        np.testing.assert_array_equal(
            np.asarray(rew), np.asarray(out.reward)[:, 0], err_msg=f"t={t} rew"
        )
        assert int(counter) == int(bstate.episode_counter), f"t={t} counter"
        ref = bstate.env_states
        got = unpack_state(loc, obs, time, rng_i)
        for f in ("loc", "obs", "time", "rng_v"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)),
                err_msg=f"t={t} state.{f}",
            )
        np.testing.assert_array_equal(
            np.asarray(obs).T.reshape(N, 2, 7), np.asarray(out.obs),
            err_msg=f"t={t} obs",
        )
    assert saw_done > N, "random balance play must reset many times in 40 steps"
