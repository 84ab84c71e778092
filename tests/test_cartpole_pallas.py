"""Bit-exactness of the fused cartpole megakernel vs the jnp path: state,
done, episode counter, and the TEA+LCG reset draws, across many resets
(cartpole episodes under random actions last ~10-50 steps, so a 60-step run
exercises hundreds of world-order counter allocations)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_rl_envs_playground_tpu.core.batch import batched_reset, batched_step
from madrona_rl_envs_playground_tpu.envs import cartpole
from madrona_rl_envs_playground_tpu.ops.cartpole_pallas import (
    action_lcg_next,
    fused_rollout,
    fused_step,
    init_action_rng,
    init_packed,
    pack_state,
    unpack_state,
)

INTERP = jax.default_backend() != "tpu"


def assert_match(got, want, err_msg=""):
    """Exact for ints (LCG draws, counters) and in interpret mode; on real
    TPU the Mosaic kernel schedules the Euler update's FMAs/transcendentals
    differently from XLA, so float fields drift by ~1 ULP per step — compare
    those at a tight tolerance instead."""
    got, want = np.asarray(got), np.asarray(want)
    if INTERP or got.dtype.kind in "iub":
        np.testing.assert_array_equal(got, want, err_msg=err_msg)
    else:
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                    err_msg=err_msg)


def test_cartpole_kernel_matches_jnp():
    env = cartpole.Env()
    # Mosaic requires the lane block to be %128 (or == N); interpret mode has
    # no such constraint, so CPU keeps the small multi-block shape cheap.
    N, BLOCK = (64, 16) if INTERP else (256, 128)
    bstate, out = batched_reset(env, N)
    grid, rng_i = pack_state(bstate.env_states)
    counter = jnp.int32(N)

    g0, r0, c0 = init_packed(N)
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(grid))
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(rng_i))
    assert int(c0) == N

    step_jnp = jax.jit(batched_step, static_argnums=(0,))
    step_pal = jax.jit(
        lambda g, r, c, a: fused_step(g, r, c, a, block=BLOCK, interpret=INTERP)
    )
    rs = np.random.RandomState(0)
    saw_done = 0
    for t in range(60):
        actions = jnp.asarray(rs.randint(0, 2, size=(N, 1)), jnp.int32)
        bstate, out = step_jnp(env, bstate, actions)
        grid, rng_i, done, counter = step_pal(grid, rng_i, counter, actions.T)
        saw_done += int(np.asarray(done).sum())
        np.testing.assert_array_equal(
            np.asarray(done), np.asarray(out.done), err_msg=f"t={t} done"
        )
        assert int(counter) == int(bstate.episode_counter), f"t={t} counter"
        ref = bstate.env_states
        got = unpack_state(grid, rng_i)
        for f in ("x", "x_dot", "theta", "theta_dot", "rng_v"):
            assert_match(getattr(got, f), getattr(ref, f),
                         err_msg=f"t={t} state.{f}")
        # obs is the state rows
        assert_match(np.asarray(grid).T[:, None, :], out.obs,
                     err_msg=f"t={t} obs")
    assert saw_done > N, "random cartpole must reset many times in 60 steps"


@pytest.mark.parametrize("blocks", [1, 4])
def test_cartpole_persistent_rollout_matches_jnp(blocks):
    """The T-steps-in-one-launch kernel: final state, rng, episode counter,
    per-env done counts, and checksums must match a jnp ``batched_step``
    reference that replays the kernel's block-sequential schedule (block b
    runs all T steps — carrying the episode counter — before block b+1)
    with the SAME in-kernel LCG action stream."""
    from madrona_rl_envs_playground_tpu.core.types import BatchState

    env = cartpole.Env()
    # TPU: N=4096 makes BLOCK lane-aligned at both block counts AND large
    # enough ((block//8) % 128 == 0) that the sublane-PACKED kernel is the
    # one under test on hardware (interpret mode packs at any block)
    N, T = (64, 70) if INTERP else (4096, 70)
    BLOCK = N // blocks
    bstate0, _ = batched_reset(env, N)
    grid0, rng0, c0 = init_packed(N)
    arng0 = init_action_rng(N, seed=0)

    roll = jax.jit(lambda g, r, w, c: fused_rollout(g, r, w, c, T,
                                                    block=BLOCK,
                                                    interpret=INTERP))
    grid, rng_i, arng, counter, dcnt, chk = roll(grid0, rng0, arng0, c0)

    # jnp reference: per block, T steps with the counter carried across
    # blocks, actions from the identical LCG stream
    step_jnp = jax.jit(batched_step, static_argnums=(0,))
    base = jnp.uint32(N)
    final_states, final_w = [], []
    dref = np.zeros(N, np.int64)
    cref = np.zeros(N, np.float64)
    sl = lambda x, b: x[b * BLOCK:(b + 1) * BLOCK]
    for b in range(blocks):
        bs = BatchState(
            env_states=jax.tree_util.tree_map(
                lambda x: sl(x, b), bstate0.env_states),
            episode_counter=base,
        )
        w = arng0[:, b * BLOCK:(b + 1) * BLOCK]
        for t in range(T):
            w, a = action_lcg_next(w)
            bs, out = step_jnp(env, bs, a.T)
            dref[b * BLOCK:(b + 1) * BLOCK] += np.asarray(out.done)
            cref[b * BLOCK:(b + 1) * BLOCK] += np.asarray(
                bs.env_states.x, np.float64)
        base = bs.episode_counter
        final_states.append(bs.env_states)
        final_w.append(w)

    ref = jax.tree_util.tree_map(
        lambda *xs: np.concatenate([np.asarray(x) for x in xs]),
        *final_states)
    assert int(counter) == int(base)
    np.testing.assert_array_equal(np.asarray(dcnt), dref)
    got = unpack_state(grid, rng_i)
    for f in ("x", "x_dot", "theta", "theta_dot", "rng_v"):
        assert_match(getattr(got, f), getattr(ref, f), err_msg=f"state.{f}")
    np.testing.assert_array_equal(
        np.asarray(arng), np.concatenate([np.asarray(w) for w in final_w],
                                         axis=1))
    # chk is an f32 in-kernel accumulation; the reference accumulates in f64
    # (per-env sums of signed x sit near zero, so give an absolute floor)
    np.testing.assert_allclose(np.asarray(chk), cref, rtol=1e-4, atol=1e-2)


def test_packed_rollout_equals_rows_rollout():
    """The sublane-packed persistent kernel must produce outputs
    bit-identical to the legacy rows-form kernel on the same inputs
    (same world->episode allocation order by construction)."""
    import numpy as np
    from madrona_rl_envs_playground_tpu.ops.cartpole_pallas import (
        fused_rollout, init_action_rng, init_packed)

    N, T, BLOCK = 128, 40, 32
    g0, r0, c0 = init_packed(N)
    w0 = init_action_rng(N)
    a = fused_rollout(g0, r0, w0, c0, T, block=BLOCK, interpret=True,
                      packed=True)
    b = fused_rollout(g0, r0, w0, c0, T, block=BLOCK, interpret=True,
                      packed=False)
    for x, y, name in zip(a, b, ("st", "rng", "arng", "cnt", "dcnt", "chk")):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=name)
