"""Native C++ oracle: agreement with the python oracle and the TPU sim."""

import numpy as np
import jax.numpy as jnp
import pytest

from madrona_rl_envs_playground_tpu.envs.layouts import get_base_layout_params
from madrona_rl_envs_playground_tpu.oracles.native import NativeOvercookedOracle
from madrona_rl_envs_playground_tpu.oracles.overcooked import OvercookedOracle


@pytest.mark.parametrize("variant,layout", [("v2", "simple"), ("v1", "cramped_room")])
def test_native_matches_python_oracle(variant, layout):
    params = get_base_layout_params(layout, 37, variant=variant)
    B = 6
    nat = NativeOvercookedOracle(variant, params, batch=B)
    pys = [OvercookedOracle(variant, params) for _ in range(B)]

    obs0 = nat.reset()
    for i, o in enumerate(pys):
        ref = o.reset()  # [P, W, H, C]
        np.testing.assert_array_equal(
            obs0[i], ref.reshape(ref.shape[0], -1), err_msg=f"init env {i}"
        )

    rs = np.random.RandomState(3)
    P = nat.P
    for t in range(90):
        acts = rs.randint(0, 6, size=(B, P)).astype(np.int32)
        obs, rew, done = nat.step(acts)
        for i, o in enumerate(pys):
            ref_obs, ref_rew, ref_done = o.step(acts[i])
            assert ref_done == bool(done[i]), f"t={t} env={i}"
            assert ref_rew == int(rew[i]), f"t={t} env={i}"
            if ref_done:
                ref_obs = o.reset()
            np.testing.assert_array_equal(
                obs[i], ref_obs.reshape(P, -1), err_msg=f"t={t} env={i}"
            )


def test_native_matches_tpu_sim():
    from madrona_rl_envs_playground_tpu.core import Simulator
    from madrona_rl_envs_playground_tpu.envs import overcooked2

    params = get_base_layout_params("simple", 25, variant="v2")
    env = overcooked2.make("simple", horizon=25)
    B = 32
    nat = NativeOvercookedOracle("v2", params, batch=B)
    sim = Simulator(env, B)

    np.testing.assert_array_equal(nat.reset(), np.asarray(sim.last_out.obs))
    rs = np.random.RandomState(11)
    for t in range(60):
        acts = rs.randint(0, 6, size=(B, 2)).astype(np.int32)
        out = sim.step(jnp.asarray(acts))
        obs, rew, done = nat.step(acts)
        np.testing.assert_array_equal(done, np.asarray(out.done), err_msg=f"t={t}")
        np.testing.assert_array_equal(
            rew[:, None].repeat(2, 1), np.asarray(out.reward), err_msg=f"t={t}"
        )
        np.testing.assert_array_equal(obs, np.asarray(out.obs), err_msg=f"t={t}")
