"""Shared Overcooked grid-cooking core for both rule variants (TPU-native).

Capability parity with the reference's two Madrona Overcooked sims:

* variant "v1" — the modern multiplayer impl (``src/overcooked_env/sim.cpp``):
  terrain enum AIR,POT,COUNTER,ONION_SOURCE,TOMATO_SOURCE,DISH_SOURCE,SERVING,
  5P+16 obs channels, cooking started manually by an empty-handed pot interact.
* variant "v2" — "Simplecooked", the JS-compatible 2-player impl
  (``src/overcooked2_env/sim.cpp``): terrain enum with DISH_SOURCE before
  TOMATO_SOURCE, 5P+10 obs channels, cooking auto-starts at 3 ingredients.

Semantics source of truth is the reference's differential oracles
(``envs/overcooked_reimplement.py`` / ``envs/overcooked2_reimplement.py``),
which the C++ sims are validated against exactly.  The reference resolves
write conflicts with atomics + 4 serialized interaction rounds
(``src/overcooked_env/sim.cpp:204-358``); here interactions are resolved by a
``lax.fori_loop`` over players in id order — the same deterministic order the
oracle defines — with every world vectorized across the batch axis.  Movement
uses the all-or-nothing collision rule: any same-cell or swap conflict freezes
every player's position for the step (``overcooked_reimplement.py:334-344``).

Reward is the step's summed shaped+delivery reward broadcast to all agents
(reference exports one shared atomic ``calculated_reward``,
``src/overcooked_env/sim.hpp:102``).  Episodes reset in-step at the horizon.
"""

from __future__ import annotations

import chex
import numpy as np
import jax.numpy as jnp
from jax import lax

from ..core.base import EnvBase

Array = jnp.ndarray

# Object codes (both variants; reference envs/overcooked_reimplement.py:4-9)
O_NONE, O_TOMATO, O_ONION, O_DISH, O_SOUP = 0, 1, 2, 3, 4
# Actions (reference envs/overcooked_reimplement.py:34-42)
A_NORTH, A_SOUTH, A_EAST, A_WEST, A_STAY, A_INTERACT = 0, 1, 2, 3, 4, 5
NUM_ACTIONS = 6
MAX_INGREDIENTS = 3
NUM_RECIPES = 16

# Terrain codes: AIR/POT/COUNTER/ONION_SOURCE are shared; the rest differ.
T_AIR, T_POT, T_COUNTER, T_ONION_SRC = 0, 1, 2, 3
_VARIANT_TERRAIN = {
    # (tomato_source, dish_source, serving)
    "v1": (4, 5, 6),
    "v2": (6, 4, 5),
}


# Dynamic one-element get/set as arange-compare selects: per-world traced
# indices under vmap otherwise lower to XLA gather/scatter, which the TPU runs
# far slower than these pure-VPU masked ops.  Worth it only while the array is
# small (benchmark layouts have S <= ~100 cells); for huge grids
# (many_player_layout-scale) the quadratic compare cost loses, so env size
# gates the strategy (``_SELECT_MAX_CELLS``).
_SELECT_MAX_CELLS = 512


def _get1(arr, idx):
    k = jnp.arange(arr.shape[-1])
    return jnp.sum(jnp.where(k == idx, arr, jnp.zeros_like(arr)), axis=-1)


def _set1(arr, idx, val):
    k = jnp.arange(arr.shape[-1])
    return jnp.where(k == idx, jnp.asarray(val, arr.dtype), arr)


def _get1v(arr, idxs):
    # arr [S], idxs [P] -> [P]
    k = jnp.arange(arr.shape[-1])
    return jnp.sum(
        jnp.where(k[None, :] == idxs[:, None], arr[None, :], jnp.zeros_like(arr)[None, :]),
        axis=-1,
    )


@chex.dataclass(frozen=True)
class State:
    obj_name: Array       # [S] int32
    obj_onions: Array     # [S] int32
    obj_tomatoes: Array   # [S] int32
    obj_tick: Array       # [S] int32, -1 = not cooking
    pos: Array            # [P] int32 flat position (y*W + x)
    orient: Array         # [P] int32
    held_name: Array      # [P] int32
    held_onions: Array    # [P] int32
    held_tomatoes: Array  # [P] int32
    held_tick: Array      # [P] int32
    timestep: Array       # [] int32


class OvercookedEnv(EnvBase):
    # step() emits state_obs==obs and all-ones mask/active (see EnvBase)
    state_is_obs = True
    masked = False

    """One compiled executable per (variant, layout) config, like the reference."""

    reward_dtype = jnp.int32
    obs_dtype = jnp.int8

    def __init__(
        self,
        variant: str,
        terrain,
        height: int,
        width: int,
        num_players: int,
        start_player_x,
        start_player_y,
        placement_in_pot_rew: int,
        dish_pickup_rew: int,
        soup_pickup_rew: int,
        recipe_values,
        recipe_times,
        horizon: int,
        **_ignored,
    ):
        assert variant in ("v1", "v2")
        self.variant = variant
        self.terrain = tuple(int(t) for t in terrain)
        self.height = int(height)
        self.width = int(width)
        self.size = self.height * self.width
        self.num_players = int(num_players)
        self.num_agents = self.num_players
        self.start_pos = tuple(
            int(y) * self.width + int(x) for x, y in zip(start_player_x, start_player_y)
        )
        self.placement_in_pot_rew = int(placement_in_pot_rew)
        self.dish_pickup_rew = int(dish_pickup_rew)
        self.soup_pickup_rew = int(soup_pickup_rew)
        self.recipe_values = tuple(int(v) for v in recipe_values)
        self.recipe_times = tuple(int(v) for v in recipe_times)
        self.horizon = int(horizon)

        self.t_tomato_src, self.t_dish_src, self.t_serving = _VARIANT_TERRAIN[variant]
        self.num_obj_channels = 16 if variant == "v1" else 10
        self.num_channels = 5 * self.num_players + self.num_obj_channels
        self.obs_size = self.size * self.num_channels
        self.state_size = self.obs_size
        self.num_actions = NUM_ACTIONS

        # Static lookup tables embedded as jit constants.
        terr = np.asarray(self.terrain, np.int32)
        self._terr = terr
        # Terrain one-hot block (the oracle's base_observation): channel v-1
        # of the object-channel block for terrain v > AIR.
        base = np.zeros((self.size, self.num_obj_channels), np.int32)
        for pos in range(self.size):
            v = terr[pos]
            if v > T_AIR:
                base[pos, v - 1] += 1
        self._base_obs = base
        # Static (x, y)-major cell permutation: the reference observation
        # space is MultiBinary [W, H, C] (``envs/overcooked_env.py:92-106``)
        # while grid state lives (y, x)-major.  The select-path encoder
        # builds obs DIRECTLY in the final order via this permutation — one
        # [S]-gather of the state columns instead of a full-width transpose
        # copy of the [P, S, C] output.
        self._perm_xy = np.asarray(
            [y * self.width + x
             for x in range(self.width) for y in range(self.height)],
            np.int32,
        )
        self._base_obs_xy = base[self._perm_xy]
        # observer/player -> presence-channel map: self is channel 0, others
        # rank 1..P-1 in id order skipping self (oracle's other_i counter).
        P = self.num_players
        shift = 5 * P
        ch = np.zeros((P, P), np.int32)
        for i in range(P):
            for j in range(P):
                ch[i, j] = 0 if j == i else (j + 1 if j < i else j)
        self._ch_matrix = ch
        # Key-compare tables for the player-block encode: channel c of
        # observer i is ONE int16 equality test `key[i, c] == T[s, c]`,
        # where key fuses position (presence channels) or position*4+
        # orientation (orientation channels) of the statically-known player
        # jmap[i, c], and T bakes the (x, y)-major cell id (and direction
        # offset) per channel.  The per-observer channel permutation,
        # presence one-hots and orientation one-hots all collapse into this
        # single [P, S, 5P] broadcast compare — measured 2x the concat-of-
        # column-blocks form at many_player P=30 on the v5e.
        if self.size <= _SELECT_MAX_CELLS:
            # int16 key envelope: keys reach (size-1)*4 + 3; guarded so a
            # future _SELECT_MAX_CELLS bump past 8191 cells fails loudly
            # instead of silently wrapping the table
            assert self.size * 4 - 1 <= np.iinfo(np.int16).max
            inv = np.argsort(ch, axis=1)  # observer, rank -> player id
            jmap = np.zeros((P, shift), np.int32)
            is_ori = np.zeros(shift, bool)
            scale = np.ones(shift, np.int32)
            offd = np.zeros(shift, np.int32)
            for i in range(P):
                for r in range(P):
                    j = int(inv[i, r])
                    jmap[i, r] = j
                    for d in range(4):
                        jmap[i, P + 4 * r + d] = j
            for r in range(P):
                for d in range(4):
                    c = P + 4 * r + d
                    is_ori[c], scale[c], offd[c] = True, 4, d
            self._enc_jmap = jmap
            self._enc_is_ori = is_ori
            self._enc_T16 = (
                self._perm_xy[:, None] * scale[None, :] + offd[None, :]
            ).astype(np.int16)  # [S, 5P]

    def _config_key(self):
        return (
            self.variant,
            self.terrain,
            self.height,
            self.width,
            self.num_players,
            self.start_pos,
            self.placement_in_pot_rew,
            self.dish_pickup_rew,
            self.soup_pickup_rew,
            self.recipe_values,
            self.recipe_times,
            self.horizon,
        )

    # ------------------------------------------------------------------
    def init_core(self, episode_idx: Array) -> State:
        S, P = self.size, self.num_players
        del episode_idx  # deterministic start state; this env draws no randomness
        return State(
            obj_name=jnp.zeros((S,), jnp.int32),
            obj_onions=jnp.zeros((S,), jnp.int32),
            obj_tomatoes=jnp.zeros((S,), jnp.int32),
            obj_tick=jnp.full((S,), -1, jnp.int32),
            pos=jnp.asarray(self.start_pos, jnp.int32),
            orient=jnp.zeros((P,), jnp.int32),
            held_name=jnp.zeros((P,), jnp.int32),
            held_onions=jnp.zeros((P,), jnp.int32),
            held_tomatoes=jnp.zeros((P,), jnp.int32),
            held_tick=jnp.full((P,), -1, jnp.int32),
            timestep=jnp.int32(0),
        )

    def _move(self, pos: Array, direction: Array) -> Array:
        W, S = self.width, self.size
        delta = jnp.array([-W, W, 1, -1, 0, 0], jnp.int32)
        return jnp.remainder(pos + delta[direction], S)

    # ------------------------------------------------------------------
    def transition(self, state: State, actions: Array):
        S, P = self.size, self.num_players
        terr = jnp.asarray(self._terr)
        rtimes = jnp.asarray(self.recipe_times, jnp.int32)
        rvals = jnp.asarray(self.recipe_values, jnp.int32)
        v1 = self.variant == "v1"
        if S <= _SELECT_MAX_CELLS:
            cget, cset, cgetv = _get1, _set1, _get1v
        else:
            cget = lambda a, i: a[i]
            cset = lambda a, i, v: a.at[i].set(v)
            cgetv = lambda a, i: a[i]

        # Pot occupancy snapshot taken before any interaction resolves
        # (oracle: get_pot_states at resolve_interacts entry).
        pot_nonempty = (
            (terr == T_POT)
            & (state.obj_name != O_NONE)
            & (
                (state.obj_tick >= 0)
                | (state.obj_onions + state.obj_tomatoes < MAX_INGREDIENTS)
            )
        )
        n_pots_nonempty = jnp.sum(pot_nonempty.astype(jnp.int32))

        def interact_body(p, carry):
            (on, oo, ot, otk, hn, ho, ht, htk, reward) = carry
            a = actions[p]
            do = a == A_INTERACT
            ipos = self._move(state.pos[p], state.orient[p])
            t = cget(terr, ipos)
            # Snapshot held + cell fields BEFORE mutation.
            held, held_o, held_t, held_k = hn[p], ho[p], ht[p], htk[p]
            cn, co, ct, ctk = (
                cget(on, ipos), cget(oo, ipos), cget(ot, ipos), cget(otk, ipos)
            )

            place = do & (t == T_COUNTER) & (held != O_NONE) & (cn == O_NONE)
            take = do & (t == T_COUNTER) & (held == O_NONE) & (cn != O_NONE)
            onion_src = do & (t == T_ONION_SRC) & (held == O_NONE)
            tomato_src = do & (t == self.t_tomato_src) & (held == O_NONE)
            dish_src = do & (t == self.t_dish_src) & (held == O_NONE)

            if P == 2:
                n_held_dishes = jnp.sum((hn == O_DISH).astype(jnp.int32))
                dish_on_counter = jnp.any((terr == T_COUNTER) & (on == O_DISH))
                dish_useful = (~dish_on_counter) & (n_held_dishes < n_pots_nonempty)
            else:
                dish_useful = jnp.bool_(False)

            at_pot = do & (t == T_POT)
            cell_time = _get1(rtimes, 4 * co + ct)
            cell_is_soup = cn == O_SOUP
            cell_ready = cell_is_soup & (ctk >= 0) & (ctk >= cell_time)
            cell_cooking = cell_is_soup & (ctk >= 0) & (ctk < cell_time)

            soup_pick = at_pot & (held == O_DISH) & cell_ready
            ing = at_pot & ((held == O_ONION) | (held == O_TOMATO))
            # Implicit soup creation on an empty pot (the oracle adds
            # SOUP(0,0) before testing whether the ingredient fits).
            eff_on = jnp.where(cn == O_NONE, 0, co)
            eff_to = jnp.where(cn == O_NONE, 0, ct)
            eff_tk = jnp.where(cn == O_NONE, -1, ctk)
            can_add = ~((eff_tk >= 0) | (eff_on + eff_to == MAX_INGREDIENTS))
            add = ing & can_add
            new_on_cnt = eff_on + (add & (held == O_ONION)).astype(jnp.int32)
            new_to_cnt = eff_to + (add & (held == O_TOMATO)).astype(jnp.int32)

            if v1:
                # Manual cook start: empty hand, pot holds an idle nonempty soup.
                start_cook = (
                    at_pot
                    & (held == O_NONE)
                    & cell_is_soup
                    & ~cell_cooking
                    & ~cell_ready
                    & (co + ct > 0)
                )
            else:
                # Auto-start once the pot holds 3 ingredients and is idle
                # (the trailing soup_to_be_cooked check in the v2 oracle; it
                # also fires when poking a full idle pot with an ingredient).
                start_cook = (
                    ing
                    & (eff_tk == -1)
                    & (new_on_cnt + new_to_cnt == MAX_INGREDIENTS)
                )

            serve = do & (t == self.t_serving) & (held == O_SOUP)
            deliver_val = _get1(rvals, 4 * held_o + held_t)

            reward = (
                reward
                + add.astype(jnp.int32) * self.placement_in_pot_rew
                + soup_pick.astype(jnp.int32) * self.soup_pickup_rew
                + (dish_src & dish_useful).astype(jnp.int32) * self.dish_pickup_rew
                + serve.astype(jnp.int32) * deliver_val
            )

            # --- held-object update --------------------------------------
            drop = place | add | serve
            fresh = onion_src | tomato_src | dish_src
            fresh_name = jnp.where(
                onion_src, O_ONION, jnp.where(tomato_src, O_TOMATO, O_DISH)
            )
            pickup = take | soup_pick
            hn = hn.at[p].set(
                jnp.where(
                    drop,
                    O_NONE,
                    jnp.where(fresh, fresh_name, jnp.where(pickup, cn, held)),
                )
            )
            ho = ho.at[p].set(
                jnp.where(drop | fresh, 0, jnp.where(pickup, co, held_o))
            )
            ht = ht.at[p].set(
                jnp.where(drop | fresh, 0, jnp.where(pickup, ct, held_t))
            )
            htk = htk.at[p].set(
                jnp.where(drop | fresh, -1, jnp.where(pickup, ctk, held_k))
            )

            # --- grid-cell update at ipos ---------------------------------
            clear = pickup  # object leaves the cell
            on = cset(
                on, ipos,
                jnp.where(
                    clear, O_NONE, jnp.where(place, held, jnp.where(add, O_SOUP, cn))
                ),
            )
            oo = cset(
                oo, ipos,
                jnp.where(
                    clear, 0, jnp.where(place, held_o, jnp.where(add, new_on_cnt, co))
                ),
            )
            ot = cset(
                ot, ipos,
                jnp.where(
                    clear, 0, jnp.where(place, held_t, jnp.where(add, new_to_cnt, ct))
                ),
            )
            otk = cset(
                otk, ipos,
                jnp.where(
                    clear,
                    -1,
                    jnp.where(
                        start_cook,
                        0,
                        jnp.where(place, held_k, jnp.where(add, eff_tk, ctk)),
                    ),
                ),
            )
            return (on, oo, ot, otk, hn, ho, ht, htk, reward)

        carry = (
            state.obj_name,
            state.obj_onions,
            state.obj_tomatoes,
            state.obj_tick,
            state.held_name,
            state.held_onions,
            state.held_tomatoes,
            state.held_tick,
            jnp.int32(0),
        )
        (on, oo, ot, otk, hn, ho, ht, htk, reward_sum) = lax.fori_loop(
            0, P, interact_body, carry, unroll=(P <= 4)
        )

        # --- movement with all-or-nothing collision rule ------------------
        is_interact = actions == A_INTERACT
        is_dir = actions < A_STAY
        tgt = self._move(state.pos, actions)
        prop_or = jnp.where(is_dir, actions, state.orient)
        prop_pos = jnp.where(
            is_interact | (cgetv(terr, tgt) != T_AIR), state.pos, tgt
        )
        eye = jnp.eye(P, dtype=jnp.bool_)
        same = (prop_pos[:, None] == prop_pos[None, :]) & ~eye
        swap = (
            (prop_pos[:, None] == state.pos[None, :])
            & (state.pos[:, None] == prop_pos[None, :])
            & ~eye
        )
        conflict = jnp.any(same | swap)
        new_pos = jnp.where(conflict, state.pos, prop_pos)

        # --- environment effects ------------------------------------------
        timestep = state.timestep + 1
        cell_time = rtimes[4 * oo + ot]
        cooking = (on == O_SOUP) & (otk >= 0) & (otk < cell_time)
        otk = otk + cooking.astype(jnp.int32)

        done = timestep >= self.horizon
        reward = jnp.broadcast_to(reward_sum, (P,))

        new_state = State(
            obj_name=on,
            obj_onions=oo,
            obj_tomatoes=ot,
            obj_tick=otk,
            pos=new_pos,
            orient=prop_or,
            held_name=hn,
            held_onions=ho,
            held_tomatoes=ht,
            held_tick=htk,
            timestep=timestep,
        )
        return new_state, reward, done

    # ------------------------------------------------------------------
    def encode(self, state: State, just_reset: Array):
        """Lossless state encoding, [P, W*H*C] int8 flattened in (x, y, c)
        order to match the reference observation space (MultiBinary [W,H,C],
        ``envs/overcooked_env.py:92-106``)."""
        S, P, C = self.size, self.num_players, self.num_channels
        K = self.num_obj_channels
        shift = 5 * P
        rtimes = jnp.asarray(self.recipe_times, jnp.int32)

        select_path = S <= _SELECT_MAX_CELLS
        if select_path:
            # Build in (x, y)-major order directly (no output transpose):
            # gather the [S] state columns through the static permutation and
            # compare player positions against the permuted cell ids.
            xp = jnp.asarray(self._perm_xy)
            terr = jnp.asarray(self._terr[self._perm_xy])
            on = state.obj_name[xp]
            oo = state.obj_onions[xp]
            ot = state.obj_tomatoes[xp]
            otk = state.obj_tick[xp]
            base_obs = self._base_obs_xy
        else:
            terr = jnp.asarray(self._terr)
            on, oo, ot, otk = (
                state.obj_name,
                state.obj_onions,
                state.obj_tomatoes,
                state.obj_tick,
            )
            base_obs = self._base_obs
        pot = terr == T_POT
        soup = on == O_SOUP
        zeros = jnp.zeros((S,), jnp.int32)

        cols = [jnp.asarray(base_obs[:, k]) for k in range(K)]
        if self.variant == "v1":
            idle = soup & pot & (otk < 0)
            live = soup & pot & (otk >= 0)
            off = soup & ~pot
            t_of = rtimes[4 * oo + ot]
            cols[6] = cols[6] + jnp.where(idle, oo, 0)
            cols[7] = cols[7] + jnp.where(idle, ot, 0)
            cols[8] = cols[8] + jnp.where(live | off, oo, 0)
            cols[9] = cols[9] + jnp.where(live | off, ot, 0)
            cols[10] = cols[10] + jnp.where(live, t_of - otk, 0)
            cols[11] = cols[11] + jnp.where((live & (otk >= t_of)) | off, 1, 0)
            cols[12] = cols[12] + (on == O_DISH).astype(jnp.int32)
            cols[13] = cols[13] + (on == O_ONION).astype(jnp.int32)
            cols[14] = cols[14] + (on == O_TOMATO).astype(jnp.int32)
            urgent = (self.horizon - state.timestep) < 40
            cols[15] = cols[15] + jnp.where(urgent, jnp.ones((S,), jnp.int32), zeros)
        else:
            in_pot = soup & pot
            cols[5] = cols[5] + jnp.where(in_pot, oo, 0)
            cols[6] = cols[6] + jnp.where(in_pot, jnp.maximum(otk, 0), 0)
            cols[7] = cols[7] + (soup & ~pot).astype(jnp.int32)
            cols[8] = cols[8] + (on == O_DISH).astype(jnp.int32)
            cols[9] = cols[9] + (on == O_ONION).astype(jnp.int32)

        # Held-object writes land in the object block at each holder's cell.
        hn = state.held_name
        if self.variant == "v1":
            ch_slots = jnp.stack(
                [
                    jnp.where(hn == O_SOUP, 8, K),
                    jnp.where(hn == O_SOUP, 9, K),
                    jnp.where(hn == O_SOUP, 11, K),
                    jnp.where(
                        hn == O_DISH,
                        12,
                        jnp.where(
                            hn == O_ONION, 13, jnp.where(hn == O_TOMATO, 14, K)
                        ),
                    ),
                ],
                axis=1,
            )  # [P, 4]
            vals = jnp.stack(
                [
                    state.held_onions,
                    state.held_tomatoes,
                    jnp.ones((P,), jnp.int32),
                    jnp.ones((P,), jnp.int32),
                ],
                axis=1,
            )
        else:
            ch_slots = jnp.stack(
                [
                    jnp.where(
                        hn == O_SOUP,
                        7,
                        jnp.where(hn == O_DISH, 8, jnp.where(hn == O_ONION, 9, K)),
                    ),
                ],
                axis=1,
            )  # [P, 1]
            vals = jnp.ones((P, 1), jnp.int32)
        if select_path:
            # Scatter-free formulation (see _SELECT_MAX_CELLS note): positions
            # and channel slots become one-hot compares combined over the tiny
            # static dims.  Pure elementwise VPU work — no einsum/dot_general
            # (catastrophically padded per-env matmuls) and no per-channel
            # outer products over the full K width: held objects touch <= 4
            # channels and each player contributes exactly 5 player-block
            # channels, so the assembly is O(P^2 * 5 * S), not O(P^2 * K * S)
            # (at many_player P=30 the dense form was ~34M elem-ops per env
            # and lost 2.5x to the A40).  The player block — 5P of the 5P+K
            # channels, the bulk of the output — is built in int8 end to end:
            # at P=30 the int32 form moved ~4x the bytes of the obs itself
            # through HBM and sat ~7x under the roofline.
            J = ch_slots.shape[1]
            pos_oh8 = (state.pos[:, None] == xp[None, :]).astype(
                jnp.int8
            )  # [P, S] in (x, y)-major cell order
            # held-object channels: accumulate channel-wise over the few
            # channels a held object can touch, folded into the pre-stack
            # cols (a post-stack .at[:, c].add would copy the whole [S, K]
            # array per channel)
            relevant = (8, 9, 11, 12, 13, 14) if self.variant == "v1" else (7, 8, 9)
            for c in relevant:
                w = jnp.zeros((P,), jnp.int32)
                for j in range(J):
                    w = w + vals[:, j] * (ch_slots[:, j] == c).astype(jnp.int32)
                cols[c] = cols[c] + jnp.sum(pos_oh8 * w[:, None], axis=0)
            shared_k = jnp.stack(cols, axis=1).astype(jnp.int8)  # [S, K]

            # player block: the single key-compare (tables built in
            # __init__) — one int16 equality per output element, no
            # per-observer permutation cost
            jm = jnp.asarray(self._enc_jmap)
            jpos = state.pos[jm]                       # [P, 5P]
            jori = state.orient[jm]
            keys = jnp.where(
                jnp.asarray(self._enc_is_ori)[None, :],
                jpos * 4 + jori, jpos,
            ).astype(jnp.int16)
            player_part = (
                keys[:, None, :] == jnp.asarray(self._enc_T16)[None, :, :]
            ).astype(jnp.int8)  # [P, S, 5P]
            obs = jnp.concatenate(
                [player_part, jnp.broadcast_to(shared_k, (P, S, K))], axis=2
            ).reshape(P, S * C)  # already (x, y, c)-ordered
        else:
            held_k = jnp.zeros((S, K), jnp.int32).at[
                state.pos[:, None], ch_slots
            ].add(vals, mode="drop")
            shared_k = jnp.stack(cols, axis=1) + held_k  # [S, K]

            ii = jnp.asarray(np.repeat(np.arange(P), P))          # observer idx
            jj = jnp.asarray(np.tile(np.arange(P), P))            # player idx
            ch_pres = jnp.asarray(self._ch_matrix.reshape(-1))    # [P*P]
            rows = state.pos[jj]
            player_part = jnp.zeros((P, S, shift), jnp.int32)
            player_part = player_part.at[ii, rows, ch_pres].add(1)
            ch_or = P + 4 * ch_pres + state.orient[jj]
            player_part = player_part.at[ii, rows, ch_or].add(1)

            obs = jnp.concatenate(
                [player_part, jnp.broadcast_to(shared_k, (P, S, K))], axis=2
            )  # [P, S, C]
            # (y,x) position-major -> (x,y) to match the reference layout.
            obs = (
                obs.reshape(P, self.height, self.width, C)
                .transpose(0, 2, 1, 3)
                .reshape(P, self.width * self.height * C)
            )
        obs = obs.astype(jnp.int8)
        mask = jnp.ones((P, NUM_ACTIONS), jnp.bool_)
        active = jnp.ones((P,), jnp.bool_)
        return state, obs, obs, mask, active
