"""Executable port of the reference's OWN pure-python Overcooked MDPs.

Validation-independence oracle: this module transcribes, decision for
decision, the reference author's ``envs/overcooked_reimplement.py`` (v1,
377 LoC) and ``envs/overcooked2_reimplement.py`` (v2, 399 LoC) — the exact
``DummyMDP`` implementations the reference itself uses as its
``SimplifiedOvercooked`` validation oracles.  Unlike
``oracles/overcooked.py`` (which this repo's author derived from reading
the C++ ``sim.cpp``), every rule here is taken from the reference python
files, so a misreading of the C++ cannot silently agree between the JAX sim
and its oracle: the three implementations are diffed pairwise in
``tests/test_reference_mdp.py``.

Structure is deliberately different from the reference (flat dict state, a
single variant-parameterized class, no ObjectState/PlayerState classes) —
the *semantics* are the port.  Per-method citations give the transcribed
source lines.

Key transcribed behaviors (citations into /root/reference):

* step order: interacts -> movement -> environment effects
  (``overcooked_reimplement.py:359-363`` ``get_state_transition``);
* interacts resolve sequentially in player-index order against the mutating
  state, with ``pot_states`` snapshotted once before any interact
  (``:281-332`` ``resolve_interacts``);
* the all-or-nothing collision rule: ANY merge/swap conflict freezes ALL
  players' position updates, orientations still update (``:334-344``);
* movement proposal: INTERACT keeps pos+orientation; directions update the
  orientation even when the target cell is blocked (``:371-377``);
* cooking tick increments only while ``is_cooking`` and is applied AFTER
  movement, so a soup started this step ticks to 1 immediately (``:351-357``);
* v2 differences (``overcooked2_reimplement.py``): terrain enum order
  (DISH_SOURCE=4, SERVING=5, TOMATO_SOURCE=6, ``:12-19``), 5P+10 obs
  channels (``:167``), no start-cooking interact — cooking auto-starts when
  the pot reaches MAX ingredients (``:328-349``), pot-soup encoded as
  (num_onions, cooking_tick) channels (``:193-197``), no urgency channel;
* per-player rewards summed and shared by the wrapper, done at
  ``timestep >= horizon`` (``overcooked_env.py:408-420``
  ``SimplifiedOvercooked.n_step``).
"""

from __future__ import annotations

import numpy as np

# Object names (overcooked_reimplement.py:4-10 — identical in both variants)
O_NONE, O_TOMATO, O_ONION, O_DISH, O_SOUP = 0, 1, 2, 3, 4
MAX_INGREDIENTS = 3

# Actions (``Action`` class, :34-42)
A_NORTH, A_SOUTH, A_EAST, A_WEST, A_STAY, A_INTERACT = 0, 1, 2, 3, 4, 5

# Terrain (v1 :12-18 / v2 :12-19)
T_AIR, T_POT, T_COUNTER = 0, 1, 2
_TERRAIN = {
    "v1": dict(onion=3, tomato=4, dish=5, serve=6, channels=16),
    "v2": dict(onion=3, dish=4, serve=5, tomato=6, channels=10),
}


def _soup(onions=0, tomatoes=0, tick=-1):
    """ObjectState(SOUP,...) analog (:45-56)."""
    return {"name": O_SOUP, "on": onions, "tom": tomatoes, "tick": tick}


def _obj(name):
    return {"name": name, "on": 0, "tom": 0, "tick": -1}


def _recipe(o):
    """(MAX+1)*onions + tomatoes (:55-56)."""
    return (MAX_INGREDIENTS + 1) * o["on"] + o["tom"]


class ReferenceMDP:
    """Variant-parameterized ``DummyMDP`` port.

    State is a dict: ``players`` (list of [pos, orient, prop_pos, prop_or,
    held-or-None]), ``objects`` (list of length size, dict-or-None),
    ``timestep``.
    """

    def __init__(self, variant: str, params: dict):
        assert variant in ("v1", "v2")
        t = _TERRAIN[variant]
        self.variant = variant
        self.terrain = list(params["terrain"])
        self.height, self.width = params["height"], params["width"]
        self.size = self.height * self.width
        self.num_players = params["num_players"]
        self.starts = [
            y * self.width + x
            for x, y in zip(params["start_player_x"], params["start_player_y"])
        ]
        self.rew_place = params["placement_in_pot_rew"]
        self.rew_dish = params["dish_pickup_rew"]
        self.rew_soup = params["soup_pickup_rew"]
        self.recipe_values = list(params["recipe_values"])
        self.recipe_times = list(params["recipe_times"])
        self.horizon = params["horizon"]
        self.t_onion, self.t_tomato = t["onion"], t["tomato"]
        self.t_dish, self.t_serve = t["dish"], t["serve"]
        self.channels = 5 * self.num_players + t["channels"]

    # -- predicates (:156-162 / :156-163) ------------------------------
    def _time(self, o):
        return self.recipe_times[_recipe(o)]

    def _is_cooking(self, o):
        return 0 <= o["tick"] < self._time(o)

    def _is_ready(self, o):
        return o["tick"] >= 0 and o["tick"] >= self._time(o)

    def _move(self, pos, direction):
        """move_in_direction (:21-31); STAY and INTERACT keep pos."""
        return pos + {
            A_NORTH: -self.width, A_SOUTH: self.width,
            A_EAST: 1, A_WEST: -1, A_STAY: 0,
        }[direction]

    def start_state(self):
        """get_standard_start_state (:365-369): orientation NORTH, no objects."""
        return {
            "players": [[p, A_NORTH, p, A_NORTH, None] for p in self.starts],
            "objects": [None] * self.size,
            "timestep": 0,
        }

    # -- interacts (:281-332 v1 / :301-354 v2) --------------------------
    def _pot_states(self, state):
        """get_pot_states (:252-261): counts pots whose soup is cooking OR
        below MAX ingredients (the reference keeps its own '# Bug in
        original code?' behavior)."""
        n = 0
        for pos in range(self.size):
            o = state["objects"][pos]
            if self.terrain[pos] == T_POT and o is not None:
                if o["tick"] >= 0 or o["on"] + o["tom"] < MAX_INGREDIENTS:
                    n += 1
        return n

    def _is_dish_pickup_useful(self, state, non_empty_pots):
        """(:241-250): 2-player only; no counter dish may exist; fewer held
        dishes than non-empty pots."""
        if self.num_players != 2:
            return False
        for pos in range(self.size):
            o = state["objects"][pos]
            if (o is not None and self.terrain[pos] == T_COUNTER
                    and o["name"] == O_DISH):
                return False
        held_dishes = sum(
            1 for pl in state["players"]
            if pl[4] is not None and pl[4]["name"] == O_DISH
        )
        return held_dishes < non_empty_pots

    def _soup_to_be_cooked(self, state, pos):
        """(:267-276): uncooked, unready, non-empty soup present."""
        o = state["objects"][pos]
        return (
            o is not None and o["name"] == O_SOUP
            and not self._is_cooking(o) and not self._is_ready(o)
            and o["on"] + o["tom"] > 0
        )

    def _interacts(self, state, joint_action):
        pot_states = self._pot_states(state)
        rewards = [0] * self.num_players
        objs = state["objects"]
        for idx, pl in enumerate(state["players"]):
            if joint_action[idx] != A_INTERACT:
                continue
            face = self._move(pl[0], pl[1])
            terr = self.terrain[face]
            held = pl[4]

            if terr == T_COUNTER:
                # place if holding onto an empty cell, else pick up (:293-299)
                if held is not None and objs[face] is None:
                    objs[face], pl[4] = held, None
                elif held is None and objs[face] is not None:
                    pl[4], objs[face] = objs[face], None
            elif terr == self.t_onion and held is None:
                pl[4] = _obj(O_ONION)
            elif terr == self.t_tomato and held is None:
                pl[4] = _obj(O_TOMATO)
            elif terr == self.t_dish and held is None:
                if self._is_dish_pickup_useful(state, pot_states):
                    rewards[idx] += self.rew_dish
                pl[4] = _obj(O_DISH)
            elif terr == T_POT and held is None:
                # v1 only: explicit start-cooking interact (:308-310);
                # commented out of the v2 file (overcooked2 :328-330)
                if self.variant == "v1" and self._soup_to_be_cooked(state, face):
                    objs[face]["tick"] = 0
            elif terr == T_POT and held is not None:
                if held["name"] == O_DISH and (
                    objs[face] is not None and self._is_ready(objs[face])
                ):
                    # dish + ready soup -> pick up soup (:312-316)
                    pl[4], objs[face] = objs[face], None
                    rewards[idx] += self.rew_soup
                elif held["name"] in (O_ONION, O_TOMATO):
                    if objs[face] is None:
                        objs[face] = _soup()
                    soup = objs[face]
                    if not (soup["tick"] >= 0
                            or soup["on"] + soup["tom"] == MAX_INGREDIENTS):
                        if held["name"] == O_ONION:
                            soup["on"] += 1
                        else:
                            soup["tom"] += 1
                        pl[4] = None
                        rewards[idx] += self.rew_place
                    if self.variant == "v2":
                        # auto-start cooking at MAX (overcooked2 :348-349),
                        # checked even when the placement above was refused
                        if (self._soup_to_be_cooked(state, face)
                                and soup["on"] + soup["tom"] == MAX_INGREDIENTS):
                            soup["tick"] = 0
            elif terr == self.t_serve and held is not None:
                if held["name"] == O_SOUP:
                    # deliver_soup (:263-265)
                    rewards[idx] += self.recipe_values[_recipe(held)]
                    pl[4] = None
        return rewards

    # -- movement (:334-349, :371-377) ----------------------------------
    def _movement(self, state, joint_action):
        for pl, a in zip(state["players"], joint_action):
            if a == A_INTERACT:
                pl[2], pl[3] = pl[0], pl[1]
            else:
                tgt = self._move(pl[0], a)
                pl[3] = pl[1] if a == A_STAY else a
                pl[2] = pl[0] if self.terrain[tgt] != T_AIR else tgt
        # _handle_collisions: first merge/swap conflict freezes everyone
        players = state["players"]
        for i in range(self.num_players):
            for j in range(i + 1, self.num_players):
                merge = players[i][2] == players[j][2]
                swap = (players[i][2] == players[j][0]
                        and players[i][0] == players[j][2])
                if merge or swap:
                    for pl in players:
                        pl[1] = pl[3]  # update_or only
                    return
        for pl in players:
            pl[0], pl[1] = pl[2], pl[3]  # update_pos_and_or

    def _environment_effects(self, state):
        """(:351-357): advance time, tick every cooking soup."""
        state["timestep"] += 1
        for o in state["objects"]:
            if o is not None and o["name"] == O_SOUP and self._is_cooking(o):
                o["tick"] += 1

    def transition(self, state, joint_action):
        """get_state_transition (:359-363). Mutates; returns per-player rewards."""
        rewards = self._interacts(state, joint_action)
        self._movement(state, joint_action)
        self._environment_effects(state)
        return rewards

    # -- lossless_state_encoding (v1 :172-239 / v2 :173-259) -------------
    def encode(self, state):
        shift = 5 * self.num_players
        base = np.zeros((self.size, self.channels))
        for pos in range(self.size):
            v = self.terrain[pos]
            if v > T_AIR:
                base[pos, v - 1 + shift] = 1

        for pos in range(self.size):
            o = state["objects"][pos]
            if o is None:
                continue
            if o["name"] == O_SOUP:
                if self.terrain[pos] == T_POT:
                    if self.variant == "v1":
                        if o["tick"] < 0:
                            base[pos, shift + 6] = o["on"]
                            base[pos, shift + 7] = o["tom"]
                        else:
                            base[pos, shift + 8] = o["on"]
                            base[pos, shift + 9] = o["tom"]
                            base[pos, shift + 10] = self._time(o) - o["tick"]
                            if self._is_ready(o):
                                base[pos, shift + 11] = 1
                    else:
                        base[pos, shift + 5] = o["on"]
                        base[pos, shift + 6] = 0 if o["tick"] < 0 else o["tick"]
                else:
                    if self.variant == "v1":
                        base[pos, shift + 8] = o["on"]
                        base[pos, shift + 9] = o["tom"]
                        base[pos, shift + 10] = 0
                        base[pos, shift + 11] = 1
                    else:
                        base[pos, shift + 7] = 1
            elif o["name"] == O_DISH:
                base[pos, shift + (12 if self.variant == "v1" else 8)] = 1
            elif o["name"] == O_ONION:
                base[pos, shift + (13 if self.variant == "v1" else 9)] = 1
            elif o["name"] == O_TOMATO and self.variant == "v1":
                base[pos, shift + 14] = 1

        if self.variant == "v1" and self.horizon - state["timestep"] < 40:
            base[:, shift + 15] = 1  # urgency (:204-205)

        views = []
        for primary in range(self.num_players):
            view = base.copy()
            other_i = 1
            for i, pl in enumerate(state["players"]):
                pos = pl[0]
                if i == primary:
                    view[pos, 0] = 1
                    view[pos, self.num_players + pl[1]] = 1
                else:
                    view[pos, other_i] = 1
                    view[pos, self.num_players + 4 * other_i + pl[1]] = 1
                    other_i += 1
                held = pl[4]
                if held is not None:
                    if held["name"] == O_SOUP:
                        if self.variant == "v1":
                            view[pos, shift + 8] = held["on"]
                            view[pos, shift + 9] = held["tom"]
                            view[pos, shift + 10] = 0
                            view[pos, shift + 11] = 1
                        else:
                            view[pos, shift + 7] = 1
                    elif held["name"] == O_DISH:
                        view[pos, shift + (12 if self.variant == "v1" else 8)] = 1
                    elif held["name"] == O_ONION:
                        view[pos, shift + (13 if self.variant == "v1" else 9)] = 1
                    elif held["name"] == O_TOMATO and self.variant == "v1":
                        view[pos, shift + 14] = 1
            views.append(view)
        return views


class ReferenceOvercooked:
    """``SimplifiedOvercooked`` analog (``overcooked_env.py:374-424``) with
    the same drop-in interface as ``OvercookedOracle``: ``reset() -> obs``
    [P, W, H, C] int32, ``step(actions) -> (obs, shared_reward, done)``."""

    def __init__(self, variant: str, params: dict):
        self.mdp = ReferenceMDP(variant, params)
        self.state = None

    def _obs(self):
        m = self.mdp
        views = self.mdp.encode(self.state)
        # get_obs (:402-406): [size, C] -> (H, W, C) -> transpose to (W, H, C)
        return np.stack([
            v.reshape(m.height, m.width, -1).transpose(1, 0, 2)
            for v in views
        ]).astype(np.int32)

    def reset(self):
        self.state = self.mdp.start_state()
        return self._obs()

    def step(self, actions):
        rewards = self.mdp.transition(self.state, [int(a) for a in actions])
        done = self.state["timestep"] >= self.mdp.horizon
        return self._obs(), sum(rewards), done
