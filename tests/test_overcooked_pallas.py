"""Bit-exactness of the fused Pallas Overcooked megakernel vs the jnp path.

Runs in interpreter mode on CPU (the same kernel compiles on real TPU; the
Mosaic-lowering constraints it honors are documented in
``ops/overcooked_pallas.py``).  Every step for ``steps`` random steps across
horizon auto-resets must match the jnp ``batched_step`` bit for bit: obs
(after the layout mapping ``to_env_major``), reward, done, and the full
unpacked state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_rl_envs_playground_tpu.core.batch import batched_reset, batched_step
from madrona_rl_envs_playground_tpu.envs import overcooked, overcooked2
from madrona_rl_envs_playground_tpu.ops.overcooked_pallas import (
    fused_step,
    init_packed,
    pack_state,
    to_env_major,
    unpack_state,
)

N = 8
INTERP = jax.default_backend() != "tpu"


def run_equivalence(variant, layout, horizon, steps, seed, num_players=None,
                    block=8):
    env = (overcooked if variant == "v1" else overcooked2).make(
        layout, horizon=horizon, num_players=num_players
    )
    bstate, out = batched_reset(env, N)
    ts = pack_state(env, bstate.env_states)

    # init_packed must equal pack(init_core)
    ts0 = init_packed(env, N)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        ts, ts0,
    )

    step_jnp = jax.jit(batched_step, static_argnums=(0,))
    step_pal = jax.jit(
        lambda ts_, a_: fused_step(env, ts_, a_, block=block, interpret=INTERP)
    )
    rs = np.random.RandomState(seed)
    P = env.num_players
    for t in range(steps):
        actions = jnp.asarray(rs.randint(0, 6, size=(N, P)), jnp.int32)
        bstate, out = step_jnp(env, bstate, actions)
        ts, obs_t, rew_t, done = step_pal(ts, actions.T)
        np.testing.assert_array_equal(
            np.asarray(to_env_major(env, obs_t)), np.asarray(out.obs),
            err_msg=f"t={t} obs",
        )
        np.testing.assert_array_equal(
            np.asarray(rew_t).T, np.asarray(out.reward), err_msg=f"t={t} reward"
        )
        np.testing.assert_array_equal(
            np.asarray(done), np.asarray(out.done), err_msg=f"t={t} done"
        )
        ref_state = bstate.env_states
        got_state = unpack_state(env, ts)
        for f in ref_state.__dataclass_fields__:
            np.testing.assert_array_equal(
                np.asarray(getattr(got_state, f)),
                np.asarray(getattr(ref_state, f)),
                err_msg=f"t={t} state.{f}",
            )


def test_pallas_v2():
    run_equivalence("v2", "simple", horizon=8, steps=18, seed=3)


def test_pallas_v1():
    run_equivalence("v1", "cramped_room", horizon=8, steps=18, seed=5)


def test_pallas_v1_multiplayer():
    """4-player path (interpret mode is slow; broader layout coverage runs
    compiled on TPU via bench/examples)."""
    run_equivalence("v1", "multiplayer_schelling", horizon=6, steps=10, seed=7)


@pytest.mark.parametrize("variant,layout", [("v1", "cramped_room"),
                                            ("v2", "simple")])
def test_persistent_rollout_matches_jnp(variant, layout):
    """The T-steps-in-one-launch kernel (multi-block): final state, action
    rng, per-env done count, and the in-VMEM obs/reward/done checksum must
    match a jnp ``batched_step`` loop fed the SAME in-kernel LCG action
    stream."""
    from madrona_rl_envs_playground_tpu.ops.overcooked_pallas import (
        action_lcg_next,
        fused_rollout,
        init_action_rng,
    )

    env = (overcooked if variant == "v1" else overcooked2).make(
        layout, horizon=30
    )
    P = env.num_players
    T = 70
    # TPU: Mosaic needs the lane block %128 (or == n); interpret mode keeps
    # the cheap 8-env/4-lane multi-block shape
    n, block = (N, 4) if INTERP else (256, 128)
    bstate, out = batched_reset(env, n)
    ts = init_packed(env, n)
    w0 = init_action_rng(n, P, seed=0)

    roll = jax.jit(lambda ts_, w_: fused_rollout(env, ts_, w_, T, block=block,
                                                 interpret=INTERP))
    ts2, w2, dcnt, chk = roll(ts, w0)

    # jnp reference driven by the identical action stream
    step_jnp = jax.jit(batched_step, static_argnums=(0,))
    w = w0
    dref = np.zeros(n, np.int64)
    cref = np.zeros(n, np.int64)
    for t in range(T):
        w, a = action_lcg_next(w, env.num_actions)
        bstate, out = step_jnp(env, bstate, a.T)
        obs = np.asarray(out.obs, np.int64)          # [n, P, S*C]
        cref += obs.reshape(n, -1).sum(axis=1)
        cref += np.asarray(out.reward, np.int64).sum(axis=1)
        cref += np.asarray(out.done, np.int64)
        dref += np.asarray(out.done, np.int64)

    np.testing.assert_array_equal(np.asarray(w2), np.asarray(w))
    np.testing.assert_array_equal(np.asarray(dcnt), dref)
    np.testing.assert_array_equal(np.asarray(chk), cref)
    ref = bstate.env_states
    got = unpack_state(env, ts2)
    for f in ("obj_name", "obj_onions", "obj_tomatoes", "obj_tick", "pos",
              "orient", "held_name", "held_onions", "held_tomatoes",
              "held_tick", "timestep"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)),
            err_msg=f"state.{f}",
        )
