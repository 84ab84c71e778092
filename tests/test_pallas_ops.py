"""Pallas kernels vs their jnp reference formulations.

TPU-only: pallas interpret mode on CPU is orders of magnitude too slow for
even tiny batches, so these tests run only where the compiled kernel does
(the default backend in this image is the tunneled TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="compiled-pallas test; CPU interpret mode is impractically slow "
    "for this kernel (the fused overcooked megakernel has its own interpret "
    "suite in test_overcooked_pallas.py)",
)


def test_hanabi_legal_moves_kernel_matches_env():
    from madrona_rl_envs_playground_tpu.core.batch import Simulator
    from madrona_rl_envs_playground_tpu.envs.hanabi import CONFIGS, Env
    from madrona_rl_envs_playground_tpu.ops.hanabi_pallas import legal_moves_pallas

    env = Env(**CONFIGS["full"])
    N = 128
    sim = Simulator(env, N)
    key = jax.random.PRNGKey(0)
    out = sim.last_out
    for step in range(2):
        s = sim.bstate.env_states
        got = legal_moves_pallas(env, s.hand_cards, s.hand_size, s.info_tokens, block=128)
        # the env's mask_buf holds stale masks for inactive seats; recompute
        # every seat's live mask with the jnp path for the comparison
        want = jax.vmap(
            lambda st: jax.vmap(lambda a: env._mask_seat(st, a))(
                jnp.arange(env.players)
            )
        )(s)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want), err_msg=f"step {step}"
        )
        key, sub = jax.random.split(key)
        logits = jnp.where(out.action_mask, 0.0, -1e9)
        acts = jax.random.categorical(sub, logits, axis=-1).astype(jnp.int32)
        out = sim.step(acts)
