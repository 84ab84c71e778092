"""Bit-exactness of the fused Acrobot megakernel vs the jnp path: RK4 state,
steps/truncation, done, episode counter, and the TEA+LCG reset draws.
Random-torque acrobot episodes run to the 500-step truncation, so the steps
counters are pre-staggered near the limit to force many world-order
allocations inside the test horizon."""

import jax
import jax.numpy as jnp
import numpy as np

from madrona_rl_envs_playground_tpu.core.batch import batched_reset, batched_step
from madrona_rl_envs_playground_tpu.envs import acrobot
from madrona_rl_envs_playground_tpu.ops.acrobot_pallas import (
    fused_step,
    init_packed,
    pack_state,
    unpack_state,
)

INTERP = jax.default_backend() != "tpu"


def assert_match(got, want, err_msg=""):
    """Exact for ints (LCG draws, steps, counters) and in interpret mode;
    on real TPU the Mosaic kernel schedules the RK4's FMAs/transcendentals
    differently from XLA (~1 ULP per step), and the double-pendulum dynamics
    are chaotic, so the drift reaches ~2e-4 relative within 50 steps
    (measured 1.95e-4 @ t=16) — a real dynamics bug would diverge at O(1)."""
    got, want = np.asarray(got), np.asarray(want)
    if INTERP or got.dtype.kind in "iub":
        np.testing.assert_array_equal(got, want, err_msg=err_msg)
    else:
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5,
                                    err_msg=err_msg)


def test_acrobot_kernel_matches_jnp():
    env = acrobot.Env()
    # Mosaic requires the lane block to be %128 (or == N); interpret mode
    # has no such constraint, so CPU keeps the small multi-block shape
    N, BLOCK = (64, 16) if INTERP else (256, 128)
    bstate, out = batched_reset(env, N)
    # stagger steps near the 500 truncation so resets happen densely
    staggered = bstate.env_states.replace(
        steps=(470 + jnp.arange(N, dtype=jnp.int32) % 40)
    )
    bstate = bstate.replace(env_states=staggered)
    grid, steps, rng_i = pack_state(staggered)
    counter = jnp.int32(N)

    init = init_packed(N)
    for got, want in zip(init[:2], pack_state(batched_reset(env, N)[0].env_states)[:2]):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert int(init[-1]) == N

    step_jnp = jax.jit(batched_step, static_argnums=(0,))
    step_pal = jax.jit(
        lambda g, s, r, c, a: fused_step(g, s, r, c, a, block=BLOCK,
                                         interpret=INTERP)
    )
    rs = np.random.RandomState(4)
    saw_done = 0
    for t in range(50):
        actions = jnp.asarray(rs.randint(0, 3, size=(N, 1)), jnp.int32)
        bstate, out = step_jnp(env, bstate, actions)
        grid, steps, rng_i, done, counter = step_pal(
            grid, steps, rng_i, counter, actions.T
        )
        saw_done += int(np.asarray(done).sum())
        np.testing.assert_array_equal(
            np.asarray(done), np.asarray(out.done), err_msg=f"t={t} done"
        )
        assert int(counter) == int(bstate.episode_counter), f"t={t} counter"
        ref = bstate.env_states
        got = unpack_state(grid, steps, rng_i)
        for f in ("theta1", "theta2", "omega1", "omega2", "steps", "rng_v"):
            assert_match(getattr(got, f), getattr(ref, f),
                         err_msg=f"t={t} state.{f}")
        assert_match(np.asarray(grid).T[:, None, :], out.obs,
                     err_msg=f"t={t} obs")
    assert saw_done >= N, "staggered truncations must reset every world"


def test_acrobot_persistent_rollout_matches_jnp():
    """T-steps-in-one-launch kernel at 4 blocks: jnp reference replays the
    block-sequential schedule with the identical in-kernel LCG torque
    stream; steps pre-staggered near the 500-step truncation so episode
    allocations happen densely."""
    from madrona_rl_envs_playground_tpu.core.types import BatchState
    from madrona_rl_envs_playground_tpu.ops.acrobot_pallas import (
        action_lcg_next,
        fused_rollout,
        init_action_rng,
    )

    env = acrobot.Env()
    # Mosaic requires the lane block to be %128 (or == N); interpret mode
    # has no such constraint, so CPU keeps the small multi-block shape
    N, BLOCK = (64, 16) if INTERP else (512, 128)
    T = 50
    bstate0, _ = batched_reset(env, N)
    staggered = bstate0.env_states.replace(
        steps=(470 + jnp.arange(N, dtype=jnp.int32) % 40)
    )
    grid0, steps0, rng0 = pack_state(staggered)
    w0 = init_action_rng(N, seed=0)

    roll = jax.jit(lambda g, s, r, c, w: fused_rollout(
        g, s, r, c, w, T, block=BLOCK, interpret=INTERP))
    grid, steps, rng_i, arng, counter, dcnt, chk = roll(
        grid0, steps0, rng0, jnp.int32(N), w0)

    step_jnp = jax.jit(batched_step, static_argnums=(0,))
    base = jnp.uint32(N)
    finals, final_w = [], []
    dref = np.zeros(N, np.int64)
    cref = np.zeros(N, np.float64)
    for b in range(N // BLOCK):
        sl = slice(b * BLOCK, (b + 1) * BLOCK)
        bs = BatchState(
            env_states=jax.tree_util.tree_map(lambda x: x[sl], staggered),
            episode_counter=base,
        )
        w = w0[:, sl]
        for t in range(T):
            w, a = action_lcg_next(w)
            bs, out = step_jnp(env, bs, a.T)
            st = bs.env_states
            cref[sl] += (
                np.asarray(st.theta1, np.float64)
                + np.asarray(st.theta2, np.float64)
                + np.asarray(st.omega1, np.float64)
                + np.asarray(st.omega2, np.float64)
                + np.asarray(out.done, np.float64)
            )
            dref[sl] += np.asarray(out.done)
        base = bs.episode_counter
        finals.append(bs.env_states)
        final_w.append(np.asarray(w))

    ref = jax.tree_util.tree_map(
        lambda *xs: np.concatenate([np.asarray(x) for x in xs]), *finals)
    assert int(counter) == int(base)
    np.testing.assert_array_equal(np.asarray(dcnt), dref)
    got = unpack_state(grid, steps, rng_i)
    for f in ("theta1", "theta2", "omega1", "omega2", "steps", "rng_v"):
        assert_match(getattr(got, f), getattr(ref, f), err_msg=f"state.{f}")
    np.testing.assert_array_equal(
        np.asarray(arng), np.concatenate(final_w, axis=1))
    np.testing.assert_allclose(np.asarray(chk), cref, rtol=1e-4, atol=1e-2)
