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
    # Mosaic requires the lane block to be %128 (or == N); interpret mode
    # has no such constraint, so CPU keeps the small multi-block shape
    N, BLOCK = (64, 16) if INTERP else (256, 128)
    bstate, out = batched_reset(env, N)
    packed = pack_state(bstate.env_states)
    counter = jnp.int32(N)

    init = init_packed(N)
    for got, want in zip(init[:-1], packed):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert int(init[-1]) == N

    step_jnp = jax.jit(batched_step, static_argnums=(0,))
    step_pal = jax.jit(
        lambda l, o, t, r, c, a: fused_step(l, o, t, r, c, a, block=BLOCK,
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


def test_balance_persistent_rollout_matches_jnp():
    """The T-steps-in-one-launch kernel at 4 blocks: the jnp reference
    replays the kernel's block-sequential schedule (block b runs all T
    steps, carrying the episode counter, before block b+1) with the SAME
    in-kernel per-seat LCG action stream."""
    from madrona_rl_envs_playground_tpu.core.types import BatchState
    from madrona_rl_envs_playground_tpu.ops.balance_pallas import (
        action_lcg_next,
        fused_rollout,
        init_action_rng,
    )

    env = balance_beam.Env()
    # TPU sizes make (BLOCK//8) lane-aligned so the sublane-PACKED kernel
    # is the one validated on hardware (interpret packs at any block)
    N, T = (64, 50) if INTERP else (2048, 50)
    BLOCK = 16 if INTERP else 1024
    blocks = N // BLOCK
    bstate0, _ = batched_reset(env, N)
    loc, obs, time, rng_i = pack_state(bstate0.env_states)
    w0 = init_action_rng(N, seed=0)

    roll = jax.jit(lambda l, o, t, r, c, w: fused_rollout(
        l, o, t, r, c, w, T, block=BLOCK, interpret=INTERP))
    loc2, obs2, t2, rng2, arng2, counter, dcnt, chk = roll(
        loc, obs, time, rng_i, jnp.int32(N), w0)

    step_jnp = jax.jit(batched_step, static_argnums=(0,))
    base = jnp.uint32(N)
    finals, final_w = [], []
    dref = np.zeros(N, np.int64)
    cref = np.zeros(N, np.float64)
    for b in range(blocks):
        sl = slice(b * BLOCK, (b + 1) * BLOCK)
        bs = BatchState(
            env_states=jax.tree_util.tree_map(
                lambda x: x[sl], bstate0.env_states),
            episode_counter=base,
        )
        w = w0[:, sl]
        for t in range(T):
            w, a = action_lcg_next(w)
            bs, out = step_jnp(env, bs, a.T)
            # obs sum (both seats) + reward (per-env stream, seat 0's value
            # == the kernel's single reward row) + done
            cref[sl] += np.asarray(out.obs, np.float64).reshape(
                BLOCK, -1).sum(axis=1)
            cref[sl] += np.asarray(out.reward, np.float64)[:, 0]
            cref[sl] += np.asarray(out.done, np.float64)
            dref[sl] += np.asarray(out.done)
        base = bs.episode_counter
        finals.append(bs.env_states)
        final_w.append(np.asarray(w))

    ref = jax.tree_util.tree_map(
        lambda *xs: np.concatenate([np.asarray(x) for x in xs]), *finals)
    assert int(counter) == int(base)
    np.testing.assert_array_equal(np.asarray(dcnt), dref)
    got = unpack_state(loc2, obs2, t2, rng2)
    for f in ("loc", "obs", "time", "rng_v"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)),
            err_msg=f"state.{f}",
        )
    np.testing.assert_array_equal(
        np.asarray(arng2), np.concatenate(final_w, axis=1))
    np.testing.assert_allclose(np.asarray(chk), cref, rtol=1e-5, atol=1e-3)


def test_packed_rollout_equals_rows_rollout():
    """Sublane-packed persistent kernel vs the legacy rows kernel on the
    same inputs: every output bit-identical (same allocation order)."""
    import numpy as np
    from madrona_rl_envs_playground_tpu.core.batch import batched_reset
    from madrona_rl_envs_playground_tpu.envs import balance_beam
    from madrona_rl_envs_playground_tpu.ops.balance_pallas import (
        fused_rollout, init_action_rng, pack_state)

    bstate0, _ = batched_reset(balance_beam.Env(), 128)
    loc, obs, time, rng_i = pack_state(bstate0.env_states)
    c0 = bstate0.episode_counter.astype("int32")
    w0 = init_action_rng(128)
    a = fused_rollout(loc, obs, time, rng_i, c0, w0, 40, block=32,
                      interpret=True, packed=True)
    b = fused_rollout(loc, obs, time, rng_i, c0, w0, 40, block=32,
                      interpret=True, packed=False)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
