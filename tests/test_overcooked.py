"""Differential validation of both Overcooked variants against the sequential
numpy oracle, mirroring the reference harness
(``scripts/overcooked_example.py --validation --asserts``)."""

import numpy as np
import jax.numpy as jnp
import pytest

from madrona_rl_envs_playground_tpu.core import Simulator
from madrona_rl_envs_playground_tpu.envs import overcooked, overcooked2
from madrona_rl_envs_playground_tpu.envs.layouts import get_base_layout_params
from madrona_rl_envs_playground_tpu.oracles.overcooked import OvercookedOracle

N = 16


def run_differential(variant, layout, horizon, steps, seed, num_players=None,
                     oracle_cls=OvercookedOracle, n_envs=N):
    N_ = n_envs
    if variant == "v1":
        env = overcooked.make(layout, horizon=horizon, num_players=num_players)
    else:
        env = overcooked2.make(layout, horizon=horizon, num_players=num_players)
    params = get_base_layout_params(
        layout, horizon, max_num_players=num_players, variant=variant
    )
    sim = Simulator(env, N_)
    oracles = [oracle_cls(variant, params) for _ in range(N_)]

    P = env.num_players
    W, H, C = env.width, env.height, env.num_channels

    # initial obs must match the oracle's fresh encoding
    obs0 = np.asarray(sim.last_out.obs).reshape(N_, P, W, H, C)
    for i in range(N_):
        ref = oracles[i].reset()
        np.testing.assert_array_equal(obs0[i], ref, err_msg=f"init obs env {i}")

    rs = np.random.RandomState(seed)
    for t in range(steps):
        actions = rs.randint(0, 6, size=(N_, P)).astype(np.int32)
        out = sim.step(jnp.asarray(actions))
        obs = np.asarray(out.obs).reshape(N_, P, W, H, C)
        rew = np.asarray(out.reward)
        done = np.asarray(out.done)
        for i in range(N_):
            ref_obs, ref_rew, ref_done = oracles[i].step(actions[i])
            assert ref_done == bool(done[i]), f"t={t} env={i} done"
            assert np.all(rew[i] == ref_rew), f"t={t} env={i} rew {rew[i]} != {ref_rew}"
            if ref_done:
                ref_obs = oracles[i].reset()
            np.testing.assert_array_equal(obs[i], ref_obs, err_msg=f"t={t} env={i}")


@pytest.mark.quick
@pytest.mark.parametrize("layout", ["simple", "random1", "scenario1_s"])
def test_overcooked2_layouts(layout):
    run_differential("v2", layout, horizon=50, steps=120, seed=7)


def test_overcooked2_multiplayer_schelling():
    run_differential("v2", "multiplayer_schelling", horizon=40, steps=60, seed=11)


@pytest.mark.quick
@pytest.mark.parametrize("layout", ["cramped_room", "coordination_ring", "asymmetric_advantages_tomato"])
def test_overcooked_v1_layouts(layout):
    run_differential("v1", layout, horizon=50, steps=120, seed=3)


def test_overcooked_v1_many_players():
    run_differential("v1", "many_player_layout", horizon=30, steps=40, seed=5, num_players=8)


def test_overcooked_v1_p16():
    """Many-player envelope: P=16 on the 15x17 grid — the natural-size
    gather/scatter branch (reference benches many_player_layout to 30
    players, src/overcooked_env/README.org:115-121)."""
    run_differential("v1", "many_player_layout", horizon=25, steps=30, seed=13,
                     num_players=16, n_envs=4)


def test_overcooked_v1_p30():
    """P=30, matching the reference's largest published many-player bench."""
    run_differential("v1", "many_player_layout", horizon=20, steps=24, seed=17,
                     num_players=30, n_envs=2)


def test_scatter_fallback_path(monkeypatch):
    """Grids above _SELECT_MAX_CELLS take the gather/scatter branch; force it
    on a small layout and diff against the oracle."""
    from madrona_rl_envs_playground_tpu.envs import overcooked_base

    monkeypatch.setattr(overcooked_base, "_SELECT_MAX_CELLS", 0)
    run_differential("v2", "simple", horizon=23, steps=50, seed=9)
    run_differential("v1", "cramped_room", horizon=23, steps=50, seed=9)


def test_overcooked_v1_four_players():
    run_differential("v1", "many_player_layout", horizon=25, steps=35, seed=13,
                     num_players=4)
