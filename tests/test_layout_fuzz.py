"""Random-layout fuzz differential: generated Overcooked grids (both rule
variants) must match the sequential oracle exactly — terrain placement,
start positions, recipe tables and horizon all drawn from seeded RNG.  The
fixed-layout suites prove the classic boards; this proves the ENGINE is
layout-shape-agnostic (parser -> padded static shapes -> transition ->
encode) rather than tuned to them."""

import numpy as np
import jax.numpy as jnp
import pytest

from madrona_rl_envs_playground_tpu.core import Simulator
from madrona_rl_envs_playground_tpu.envs.overcooked_base import OvercookedEnv
from madrona_rl_envs_playground_tpu.oracles.overcooked import OvercookedOracle

N = 6


def random_layout(rs, variant):
    """A random valid bordered kitchen: X border, floor interior with
    scattered counters, one or more of each source/pot/serving on the
    border, players on distinct floor cells."""
    from madrona_rl_envs_playground_tpu.envs.overcooked_base import (
        _VARIANT_TERRAIN, T_AIR, T_COUNTER, T_ONION_SRC, T_POT)

    t_tomato, t_dish, t_serve = _VARIANT_TERRAIN[variant]
    H = int(rs.randint(5, 9))
    W = int(rs.randint(5, 9))
    terr = np.full((H, W), T_COUNTER, np.int32)
    terr[1:-1, 1:-1] = T_AIR
    # sprinkle interior counters (never fully blocking: keep it sparse)
    for _ in range(rs.randint(0, 3)):
        terr[rs.randint(1, H - 1), rs.randint(1, W - 1)] = T_COUNTER
    # functional tiles on the border (non-corner)
    border = ([(0, x) for x in range(1, W - 1)]
              + [(H - 1, x) for x in range(1, W - 1)]
              + [(y, 0) for y in range(1, H - 1)]
              + [(y, W - 1) for y in range(1, H - 1)])
    rs.shuffle(border)
    specials = [T_POT, T_ONION_SRC, t_tomato, t_dish, t_serve]
    for k, t in enumerate(specials):
        y, x = border[k]
        terr[y, x] = t
    # players on distinct interior floor cells
    P = 2 if variant == "v2" else int(rs.randint(2, 4))
    floor = [(y, x) for y in range(1, H - 1) for x in range(1, W - 1)
             if terr[y, x] == T_AIR]
    assert len(floor) >= P
    idx = rs.choice(len(floor), size=P, replace=False)
    ys, xs = zip(*[floor[i] for i in idx])

    times = [int(rs.randint(1, 30)) for _ in range(16)]
    values = [int(rs.randint(0, 50)) for _ in range(16)]
    horizon = int(rs.randint(8, 25))
    return dict(
        variant=variant,
        terrain=terr.reshape(-1).tolist(),
        height=H, width=W, num_players=P,
        start_player_x=list(xs), start_player_y=list(ys),
        placement_in_pot_rew=int(rs.randint(0, 5)),
        dish_pickup_rew=int(rs.randint(0, 5)),
        soup_pickup_rew=int(rs.randint(0, 6)),
        recipe_values=values, recipe_times=times, horizon=horizon,
    )


@pytest.mark.parametrize("variant,seed", [
    ("v1", 0), ("v1", 1), ("v1", 2), ("v2", 0), ("v2", 1), ("v2", 2),
])
def test_random_layout_differential(variant, seed):
    rs = np.random.RandomState(1000 + seed)
    params = random_layout(rs, variant)
    env = OvercookedEnv(**params)
    sim = Simulator(env, N)
    oracles = [OvercookedOracle(variant, params) for _ in range(N)]
    P, W, H, C = env.num_players, env.width, env.height, env.num_channels

    obs0 = np.asarray(sim.last_out.obs).reshape(N, P, W, H, C)
    for i in range(N):
        np.testing.assert_array_equal(obs0[i], oracles[i].reset(),
                                      err_msg=f"init env {i}")
    steps = 3 * params["horizon"]  # cross at least two auto-resets
    for t in range(steps):
        actions = rs.randint(0, 6, size=(N, P)).astype(np.int32)
        out = sim.step(jnp.asarray(actions))
        obs = np.asarray(out.obs).reshape(N, P, W, H, C)
        rew = np.asarray(out.reward)
        done = np.asarray(out.done)
        for i in range(N):
            ref_obs, ref_rew, ref_done = oracles[i].step(actions[i])
            assert ref_done == bool(done[i]), f"t={t} env={i} done"
            assert np.all(rew[i] == ref_rew), f"t={t} env={i} reward"
            if ref_done:  # sim auto-resets in-step; mirror it
                ref_obs = oracles[i].reset()
            np.testing.assert_array_equal(obs[i], ref_obs,
                                          err_msg=f"t={t} env={i} obs")
