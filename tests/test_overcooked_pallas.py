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
