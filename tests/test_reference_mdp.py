"""Validation independence for Overcooked: diff the JAX sims against a port
of the REFERENCE AUTHOR'S own pure-python MDPs
(``/root/reference/envs/overcooked_reimplement.py`` and
``overcooked2_reimplement.py``), not just against this repo's C++-derived
oracle.  Three-way agreement (JAX sim == reference MDP == repo oracle)
means a shared misreading of ``sim.cpp`` cannot pass silently.
"""

import numpy as np
import pytest

from madrona_rl_envs_playground_tpu.envs.layouts import get_base_layout_params
from madrona_rl_envs_playground_tpu.oracles.overcooked import OvercookedOracle
from madrona_rl_envs_playground_tpu.oracles.reference_mdp import (
    ReferenceOvercooked,
)

from .test_overcooked import run_differential


# ---- JAX sim vs reference-authored MDP semantics -----------------------

@pytest.mark.parametrize("layout", ["simple", "random1", "scenario1_s"])
def test_sim_vs_reference_mdp_v2(layout):
    run_differential("v2", layout, horizon=50, steps=110, seed=21,
                     oracle_cls=ReferenceOvercooked, n_envs=8)


@pytest.mark.parametrize(
    "layout", ["cramped_room", "coordination_ring", "asymmetric_advantages_tomato"]
)
def test_sim_vs_reference_mdp_v1(layout):
    run_differential("v1", layout, horizon=50, steps=110, seed=22,
                     oracle_cls=ReferenceOvercooked, n_envs=8)


def test_sim_vs_reference_mdp_v1_multiplayer():
    run_differential("v1", "multiplayer_schelling", horizon=40, steps=60,
                     seed=23, oracle_cls=ReferenceOvercooked, n_envs=8)


# ---- repo oracle vs reference MDP (no JAX involved) --------------------

@pytest.mark.parametrize(
    "variant,layout,players",
    [
        ("v1", "cramped_room", None),
        ("v1", "asymmetric_advantages_tomato", None),
        ("v1", "many_player_layout", 4),
        ("v1", "many_player_layout", 16),
        ("v2", "simple", None),
        ("v2", "random1", None),
        ("v2", "scenario1_s", None),
    ],
)
def test_repo_oracle_agrees_with_reference_mdp(variant, layout, players):
    horizon = 60
    params = get_base_layout_params(
        layout, horizon, max_num_players=players, variant=variant
    )
    a = OvercookedOracle(variant, params)
    b = ReferenceOvercooked(variant, params)
    oa, ob = a.reset(), b.reset()
    np.testing.assert_array_equal(oa, ob, err_msg="initial obs")
    P = params["num_players"]
    rs = np.random.RandomState(variant == "v1" and 31 or 32)
    for t in range(150):
        acts = rs.randint(0, 6, size=P)
        oa, ra, da = a.step(acts)
        ob, rb, db = b.step(acts)
        assert ra == rb, f"t={t} reward {ra} != {rb}"
        assert da == db, f"t={t} done"
        np.testing.assert_array_equal(oa, ob, err_msg=f"t={t} obs")
        if da:
            oa, ob = a.reset(), b.reset()
            np.testing.assert_array_equal(oa, ob)
