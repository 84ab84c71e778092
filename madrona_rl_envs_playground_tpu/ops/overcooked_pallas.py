"""Fused Overcooked step megakernel (Pallas TPU).

The BASELINE-named "Overcooked grid-transition" kernel: ONE Pallas kernel
computes interact resolution, movement/collision, pot ticking, horizon
auto-reset AND the lossless observation encoding, with every intermediate in
VMEM — the TPU analog of the reference's persistent megakernel
(``MWCudaExecutor``; transition ``src/overcooked_env/sim.cpp:363-438``,
encoder ``sim.cpp:68-167``).  The jnp path (``envs/overcooked_base.py``)
builds the same step from ~10 XLA fusions; each fusion boundary costs an HBM
round-trip of the batch state.  Here the state crosses HBM exactly twice.

**Lane-major layout** (the design that actually beats XLA here — a first
draft with envs on sublanes lost 5x to lane padding):

* The env batch rides the LANE axis: cell state is ``[S, N]``, player state
  ``[P, N]``, with N-blocks of ``block`` lanes per grid step.  S=10..100 and
  C=20..40 never touch the 128-lane tiling, so there is zero padding waste;
  per-cell/per-player structure unrolls at trace time into full python
  constants (terrain, recipe tables, channel maps are closed over as ints —
  Mosaic rejects captured array constants anyway).
* Observations are emitted as ``[P, C, S, N]`` int8 — each (player, channel)
  pair is ONE ``[S, block]`` vector expression and ONE full-lane store.  A
  world-minor export layout is reference-faithful: the Madrona manager also
  exports obs location-major with worlds on a middle axis
  (``src/overcooked_env/mgr.cpp:219-223``, shape {P*W*H, numWorlds, C}) and
  leaves env-major assembly to the consumer.
* No scatter / minor-axis stack / concat / gather (all rejected by the
  Mosaic lowering through the tunnel): every dynamic cell access is an
  unrolled compare-select over the static cell count.

``to_env_major(obs)`` converts to the jnp path's ``[N, P, S*C]`` layout;
``tests/test_overcooked_pallas.py`` proves bit-exactness against
``batched_step`` (interpret mode on CPU, compiled on real TPU).
"""

from __future__ import annotations

import functools

import chex
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..envs.overcooked_base import (
    A_INTERACT,
    A_STAY,
    MAX_INGREDIENTS,
    O_DISH,
    O_NONE,
    O_ONION,
    O_SOUP,
    O_TOMATO,
    T_AIR,
    T_COUNTER,
    T_ONION_SRC,
    T_POT,
    OvercookedEnv,
    State,
)

Array = jnp.ndarray


@chex.dataclass(frozen=True)
class TState:
    """Lane-major (env-on-lanes) state carried by the fused path.

    Storage dtype is **int8** for every cell/player field — object names
    (0..4), ingredient counts (0..3), cook ticks (-1..recipe time < 128,
    guarded by ``fused_supported``), flat positions (< size <= 100),
    orientations (0..3) all fit — which cuts the per-step kernel's HBM
    state traffic 4x (the per-step path is HBM-bound: the same transition
    with obs consumed in VMEM runs 2.2x faster).  Kernels upcast to i32 on
    load and cast back at the store; the timestep row stays i32 (horizon
    commonly 400)."""

    obj_name: Array       # [S, N] int8
    obj_onions: Array     # [S, N]
    obj_tomatoes: Array   # [S, N]
    obj_tick: Array       # [S, N]
    pos: Array            # [P, N] int8 flat y-major coords (same as jnp path)
    orient: Array         # [P, N]
    held_name: Array      # [P, N]
    held_onions: Array    # [P, N]
    held_tomatoes: Array  # [P, N]
    held_tick: Array      # [P, N]
    timestep: Array       # [1, N] int32


def _require_fused(env: OvercookedEnv):
    """The int8 TState narrows cook ticks / positions; a layout with
    recipe times >= 128 or size > 127 would silently wrap.  Every packing
    entry point enforces the same envelope ``fused_supported`` advertises
    (callers like bench.py / fused_collect check it first; direct callers
    get a loud error instead of corrupt state)."""
    if not fused_supported(env):
        raise ValueError(
            "overcooked fused kernels support layouts with <= 100 cells, "
            f"<= 4 players and recipe times < 128 (got size={env.size}, "
            f"players={env.num_players}, max recipe time "
            f"{max(env.recipe_times)}); use the jnp path"
        )


def pack_state(env: OvercookedEnv, vstate: State) -> TState:
    """vmap-ed State [N, ...] -> lane-major TState (transpose + narrow)."""
    _require_fused(env)
    t = lambda a: jnp.transpose(a).astype(jnp.int8)
    return TState(
        obj_name=t(vstate.obj_name), obj_onions=t(vstate.obj_onions),
        obj_tomatoes=t(vstate.obj_tomatoes), obj_tick=t(vstate.obj_tick),
        pos=t(vstate.pos), orient=t(vstate.orient),
        held_name=t(vstate.held_name), held_onions=t(vstate.held_onions),
        held_tomatoes=t(vstate.held_tomatoes), held_tick=t(vstate.held_tick),
        timestep=vstate.timestep[None, :],
    )


def unpack_state(env: OvercookedEnv, ts: TState) -> State:
    t = lambda a: jnp.transpose(a).astype(jnp.int32)
    return State(
        obj_name=t(ts.obj_name), obj_onions=t(ts.obj_onions),
        obj_tomatoes=t(ts.obj_tomatoes), obj_tick=t(ts.obj_tick),
        pos=t(ts.pos), orient=t(ts.orient),
        held_name=t(ts.held_name), held_onions=t(ts.held_onions),
        held_tomatoes=t(ts.held_tomatoes), held_tick=t(ts.held_tick),
        timestep=ts.timestep[0],
    )


def init_packed(env: OvercookedEnv, num_envs: int) -> TState:
    _require_fused(env)
    S, P = env.size, env.num_players
    z = lambda rows, fill=0: jnp.full((rows, num_envs), fill, jnp.int8)
    starts = jnp.asarray(env.start_pos, jnp.int8)
    return TState(
        obj_name=z(S), obj_onions=z(S), obj_tomatoes=z(S), obj_tick=z(S, -1),
        pos=jnp.broadcast_to(starts[:, None], (P, num_envs)),
        orient=z(P), held_name=z(P), held_onions=z(P),
        held_tomatoes=z(P), held_tick=z(P, -1),
        timestep=jnp.zeros((1, num_envs), jnp.int32),
    )


def to_env_major(env: OvercookedEnv, obs_t: Array) -> Array:
    """[P, C, S, N] int8 -> the jnp path's [N, P, W*H*C] int8 (x-major
    cells, channel-minor) for API/test parity."""
    P, C = env.num_players, env.num_channels
    H, W = env.height, env.width
    N = obs_t.shape[-1]
    # cells in the kernel are y-major (s = y*W + x); env-major obs wants
    # x-major cell order with channels minor
    o = jnp.transpose(obs_t, (3, 0, 2, 1))          # [N, P, S, C]
    o = o.reshape(N, P, H, W, C).transpose(0, 1, 3, 2, 4)
    return o.reshape(N, P, W * H * C)


def to_cols(env: OvercookedEnv, obs_t: Array) -> Array:
    """[P, C, S, N] -> feature-major columns [W*H*C, P*N]: feature order is
    the env-major flat order ((x, y, c)), column b = p*N + n.  The batch
    axis N never leaves the TPU lane dimension — only sublane-axis
    reshuffles, no lane transposes (the r5 traces measured the
    kernel->row-major relayout at ~320 us/step at 8k envs; this form
    feeds the transposed policy towers, ``models/cleanrl.apply_t``)."""
    P, C = env.num_players, env.num_channels
    H, W = env.height, env.width
    N = obs_t.shape[-1]
    o = obs_t.reshape(P, C, H, W, N).transpose(3, 2, 1, 0, 4)  # [W,H,C,P,N]
    return o.reshape(W * H * C, P * N)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def fused_supported(env: OvercookedEnv) -> bool:
    """The kernel unrolls cells x players at trace time; past ~100 cells or
    4 players the trace/compile cost outgrows the win and the jnp path's
    gather branch is the right tool (many_player_layout-scale grids).
    Recipe times must fit the int8 cook-tick storage (the obs encoder's
    int8 cook-time channels already assumed this)."""
    return (env.size <= 100 and env.num_players <= 4
            and max(env.recipe_times) < 128)


def _make_transition(env: OvercookedEnv, block: int):
    """Block-form step body shared by the per-step kernel and the persistent
    whole-rollout kernel: cell state lives as ``[S, B]`` sublane blocks —
    dynamic cell reads are one iota-compare + masked sublane reduce, writes
    one whole-block select — so every op keeps all 8 VPU sublanes busy (the
    earlier row-per-cell form left 7/8 idle and was compute-bound).  Player
    state stays as [1, B] rows (P is tiny and scalar-indexed).  Mosaic still
    sees no scatter/gather: everything is compare-select over a
    trace-time-generated iota.

    Returns ``(setup, transition, consts)``: ``setup()`` builds the
    loop-invariant [S, B] context (iota, terrain value block, terrain-class
    masks, static base-observation blocks) — persistent kernels call it once
    per launch, outside the step loop; ``transition(ctx, state, act)`` maps
    ``state = (on_b, oo_b, ot_b, otk_b, pos, ornt, hn, ho, ht, htk, ts)``
    ([S, B] blocks for cells, [1, B] row lists for players) and ``act``
    (list of P rows) to ``(state', reward, done, pos_oh, obj_ch)`` — the
    last two are the observation ingredients ([S, B] blocks / python 0)
    each kernel emits its own way (stores vs an in-VMEM checksum)."""
    B = block
    S, P = env.size, env.num_players
    W = env.width
    C = env.num_channels
    v1 = env.variant == "v1"
    terr = tuple(int(t) for t in env.terrain)            # python constants
    rtimes = tuple(int(v) for v in env.recipe_times)
    rvals = tuple(int(v) for v in env.recipe_values)
    t_tomato, t_dish, t_serve = env.t_tomato_src, env.t_dish_src, env.t_serving
    r_place, r_dish, r_soup = (
        env.placement_in_pot_rew, env.dish_pickup_rew, env.soup_pickup_rew
    )
    horizon = env.horizon
    ch_matrix = env._ch_matrix
    starts = tuple(int(p) for p in env.start_pos)
    pot_cells = tuple(s for s in range(S) if terr[s] == T_POT)
    counter_cells = tuple(s for s in range(S) if terr[s] == T_COUNTER)
    # cells that can hold an object (interact targets: counter or pot)
    obj_cells = tuple(s for s in range(S) if terr[s] in (T_COUNTER, T_POT))
    base_tbl = env._base_obs  # [S, K] numpy ints

    def setup():
        """Loop-invariant [S, B] context: trace-time iota, terrain-class
        masks, terrain-value block, static base-observation blocks."""
        ioS = jax.lax.broadcasted_iota(jnp.int32, (S, B), 0)

        def cellmask(cells):
            m = None
            for s in cells:
                e = ioS == s
                m = e if m is None else (m | e)
            return m if m is not None else (ioS < 0)

        terrb = jnp.zeros((S, B), jnp.int32)
        for v in sorted(set(terr) - {0}):
            terrb = terrb + v * cellmask(
                tuple(s for s in range(S) if terr[s] == v)
            ).astype(jnp.int32)
        baseb = {}
        for k in range(C - 5 * P):
            col = base_tbl[:, k]
            if col.any():
                bb = jnp.zeros((S, B), jnp.int32)
                for v in sorted(set(int(x) for x in col) - {0}):
                    bb = bb + v * cellmask(
                        tuple(s for s in range(S) if int(col[s]) == v)
                    ).astype(jnp.int32)
                baseb[k] = bb
        return dict(ioS=ioS, objm=cellmask(obj_cells),
                    potm=cellmask(pot_cells), ctrm=cellmask(counter_cells),
                    terrb=terrb, baseb=baseb)

    def transition(ctx, state, act):
        (on_b, oo_b, ot_b, otk_b, pos, ornt, hn_rows, ho_rows, ht_rows,
         htk_rows, ts) = [list(x) if isinstance(x, (list, tuple)) else x
                          for x in state]
        ioS, objm, potm, ctrm, terrb = (
            ctx["ioS"], ctx["objm"], ctx["potm"], ctx["ctrm"], ctx["terrb"])
        i32 = lambda b: b.astype(jnp.int32)
        zrow = jnp.zeros((1, B), jnp.int32)
        rsum = lambda x: jnp.sum(x, axis=0, keepdims=True)

        def tbl16(table, rid):
            out = zrow if rid.shape[0] == 1 else jnp.zeros((S, B), jnp.int32)
            for k in range(16):
                if table[k] != 0:
                    out = jnp.where(rid == k, table[k], out)
            return out

        def move(p, d):
            delta = (
                -W * i32(d == 0) + W * i32(d == 1) + i32(d == 2) - i32(d == 3)
            )
            return jnp.remainder(p + delta, S)

        # pot snapshot before interacts (oracle get_pot_states)
        n_pots = rsum(i32(
            potm & (on_b != O_NONE)
            & ((otk_b >= 0) | (oo_b + ot_b < MAX_INGREDIENTS))))

        reward = zrow
        for p in range(P):
            a = act[p]
            do = a == A_INTERACT
            ipos = move(pos[p], ornt[p])
            at_obj = (ioS == ipos) & objm  # [S, B], at most one hit
            ao = i32(at_obj)
            t = rsum(terrb * (ioS == ipos))
            held, held_o = hn_rows[p], ho_rows[p]
            held_t, held_k = ht_rows[p], htk_rows[p]
            cn, co = rsum(on_b * ao), rsum(oo_b * ao)
            ct = rsum(ot_b * ao)
            ctk = jnp.where(rsum(ao) > 0, rsum(otk_b * ao), -1)

            place = do & (t == T_COUNTER) & (held != O_NONE) & (cn == O_NONE)
            take = do & (t == T_COUNTER) & (held == O_NONE) & (cn != O_NONE)
            onion_src = do & (t == T_ONION_SRC) & (held == O_NONE)
            tomato_src = do & (t == t_tomato) & (held == O_NONE)
            dish_src = do & (t == t_dish) & (held == O_NONE)

            if P == 2:
                n_held_dishes = sum(i32(h == O_DISH) for h in hn_rows)
                dish_on_counter = rsum(i32(ctrm & (on_b == O_DISH))) > 0
                dish_useful = (~dish_on_counter) & (n_held_dishes < n_pots)
            else:
                dish_useful = jnp.zeros((1, B), jnp.bool_)

            at_pot = do & (t == T_POT)
            cell_time = tbl16(rtimes, 4 * co + ct)
            cell_is_soup = cn == O_SOUP
            cell_ready = cell_is_soup & (ctk >= 0) & (ctk >= cell_time)
            cell_cooking = cell_is_soup & (ctk >= 0) & (ctk < cell_time)

            soup_pick = at_pot & (held == O_DISH) & cell_ready
            ing = at_pot & ((held == O_ONION) | (held == O_TOMATO))
            eff_on = jnp.where(cn == O_NONE, 0, co)
            eff_to = jnp.where(cn == O_NONE, 0, ct)
            eff_tk = jnp.where(cn == O_NONE, -1, ctk)
            can_add = ~((eff_tk >= 0) | (eff_on + eff_to == MAX_INGREDIENTS))
            add = ing & can_add
            new_on_cnt = eff_on + i32(add & (held == O_ONION))
            new_to_cnt = eff_to + i32(add & (held == O_TOMATO))

            if v1:
                start_cook = (
                    at_pot & (held == O_NONE) & cell_is_soup
                    & ~cell_cooking & ~cell_ready & (co + ct > 0)
                )
            else:
                start_cook = (
                    ing & (eff_tk == -1)
                    & (new_on_cnt + new_to_cnt == MAX_INGREDIENTS)
                )

            serve = do & (t == t_serve) & (held == O_SOUP)
            deliver_val = tbl16(rvals, 4 * held_o + held_t)

            reward = (
                reward
                + i32(add) * r_place
                + i32(soup_pick) * r_soup
                + i32(dish_src & dish_useful) * r_dish
                + i32(serve) * deliver_val
            )

            drop = place | add | serve
            fresh = onion_src | tomato_src | dish_src
            fresh_name = jnp.where(
                onion_src, O_ONION, jnp.where(tomato_src, O_TOMATO, O_DISH)
            )
            pickup = take | soup_pick
            hn_rows[p] = jnp.where(
                drop, O_NONE,
                jnp.where(fresh, fresh_name, jnp.where(pickup, cn, held)))
            ho_rows[p] = jnp.where(drop | fresh, 0,
                                   jnp.where(pickup, co, held_o))
            ht_rows[p] = jnp.where(drop | fresh, 0,
                                   jnp.where(pickup, ct, held_t))
            htk_rows[p] = jnp.where(drop | fresh, -1,
                                    jnp.where(pickup, ctk, held_k))

            clear = pickup
            new_cn = jnp.where(clear, O_NONE, jnp.where(
                place, held, jnp.where(add, O_SOUP, cn)))
            new_co = jnp.where(clear, 0, jnp.where(
                place, held_o, jnp.where(add, new_on_cnt, co)))
            new_ct = jnp.where(clear, 0, jnp.where(
                place, held_t, jnp.where(add, new_to_cnt, ct)))
            new_ctk = jnp.where(clear, -1, jnp.where(
                start_cook, 0, jnp.where(place, held_k,
                                         jnp.where(add, eff_tk, ctk))))
            m = do & at_obj
            on_b = jnp.where(m, new_cn, on_b)
            oo_b = jnp.where(m, new_co, oo_b)
            ot_b = jnp.where(m, new_ct, ot_b)
            otk_b = jnp.where(m, new_ctk, otk_b)

        # --- movement (all-or-nothing collisions) ---------------------
        prop_pos, prop_or = [], []
        for p in range(P):
            a = act[p]
            is_interact = a == A_INTERACT
            is_dir = a < A_STAY
            tgt = move(pos[p], a)
            blocked = is_interact | (rsum(terrb * (ioS == tgt)) != T_AIR)
            prop_pos.append(jnp.where(blocked, pos[p], tgt))
            prop_or.append(jnp.where(is_dir, a, ornt[p]))
        conflict = jnp.zeros((1, B), jnp.bool_)
        for i in range(P):
            for j in range(i + 1, P):
                same = prop_pos[i] == prop_pos[j]
                swap = (prop_pos[i] == pos[j]) & (pos[i] == prop_pos[j])
                conflict = conflict | same | swap
        new_pos = [jnp.where(conflict, pos[p], prop_pos[p]) for p in range(P)]

        # --- environment effects -------------------------------------
        ts_new = ts + 1
        # the oracle ticks ANY cooking soup — pots and counters alike (a
        # picked-up cooking soup can be placed back on a counter with its
        # tick frozen; is_cooking checks the recipe time wherever it sits):
        # one whole-block tick over the pot|counter mask
        ctimeb = tbl16(rtimes, 4 * oo_b + ot_b)  # [S, B]
        cooking = ((potm | ctrm) & (on_b == O_SOUP) & (otk_b >= 0)
                   & (otk_b < ctimeb))
        otk_b = otk_b + i32(cooking)

        done = ts_new >= horizon

        # --- fused auto-reset ----------------------------------------
        # whole-block: non-obj cells always hold (O_NONE, 0, 0, -1), so
        # resetting them too writes identical values
        on_b = jnp.where(done, O_NONE, on_b)
        oo_b = jnp.where(done, 0, oo_b)
        ot_b = jnp.where(done, 0, ot_b)
        otk_b = jnp.where(done, -1, otk_b)
        for p in range(P):
            new_pos[p] = jnp.where(done, starts[p], new_pos[p])
            prop_or[p] = jnp.where(done, 0, prop_or[p])
            hn_rows[p] = jnp.where(done, O_NONE, hn_rows[p])
            ho_rows[p] = jnp.where(done, 0, ho_rows[p])
            ht_rows[p] = jnp.where(done, 0, ht_rows[p])
            htk_rows[p] = jnp.where(done, -1, htk_rows[p])
        ts_out = jnp.where(done, 0, ts_new)

        # --- encode ---------------------------------------------------
        # player-position one-hots as [S, B] blocks: ONE iota compare each
        # (players only ever stand on air cells, so no mask is needed —
        # the hit cell is always an air cell)
        pos_oh = [i32(ioS == new_pos[p]) for p in range(P)]

        # shared object channels: obj_ch[k] = [S, B] block or python 0;
        # on done worlds every gate below is False post-reset, and ctimeb
        # (built from post-interact ingredient counts, which pot ticking
        # does not change) equals the encode-time recipe-time lookup
        # wherever a soup gate is open
        K = C - 5 * P
        obj_ch = [0] * K
        soupb = on_b == O_SOUP

        if v1:
            idle = potm & soupb & (otk_b < 0)
            live = potm & soupb & (otk_b >= 0)
            off = ctrm & soupb
            obj_ch[6] = jnp.where(idle, oo_b, 0)
            obj_ch[7] = jnp.where(idle, ot_b, 0)
            obj_ch[8] = jnp.where(live | off, oo_b, 0)
            obj_ch[9] = jnp.where(live | off, ot_b, 0)
            obj_ch[10] = jnp.where(live, ctimeb - otk_b, 0)
            obj_ch[11] = i32((live & (otk_b >= ctimeb)) | off)
            obj_ch[12] = i32(ctrm & (on_b == O_DISH))
            obj_ch[13] = i32(ctrm & (on_b == O_ONION))
            obj_ch[14] = i32(ctrm & (on_b == O_TOMATO))
            urgent = i32((horizon - ts_out) < 40)
            obj_ch[15] = jnp.broadcast_to(urgent, (S, B))
        else:
            in_pot = potm & soupb
            obj_ch[5] = jnp.where(in_pot, oo_b, 0)
            obj_ch[6] = jnp.where(in_pot, jnp.maximum(otk_b, 0), 0)
            obj_ch[7] = i32(ctrm & soupb)
            obj_ch[8] = i32(ctrm & (on_b == O_DISH))
            obj_ch[9] = i32(ctrm & (on_b == O_ONION))

        # held-object contributions at holder cells
        def held_into(k, conds):
            add = None
            for p in range(P):
                v = pos_oh[p] * conds[p]  # [S, B] * [1, B]
                add = v if add is None else add + v
            prev = obj_ch[k]
            obj_ch[k] = add if isinstance(prev, int) else prev + add

        if v1:
            held_into(8, [ho_rows[p] * i32(hn_rows[p] == O_SOUP) for p in range(P)])
            held_into(9, [ht_rows[p] * i32(hn_rows[p] == O_SOUP) for p in range(P)])
            held_into(11, [i32(hn_rows[p] == O_SOUP) for p in range(P)])
            held_into(12, [i32(hn_rows[p] == O_DISH) for p in range(P)])
            held_into(13, [i32(hn_rows[p] == O_ONION) for p in range(P)])
            held_into(14, [i32(hn_rows[p] == O_TOMATO) for p in range(P)])
        else:
            held_into(7, [i32(hn_rows[p] == O_SOUP) for p in range(P)])
            held_into(8, [i32(hn_rows[p] == O_DISH) for p in range(P)])
            held_into(9, [i32(hn_rows[p] == O_ONION) for p in range(P)])

        state_out = (on_b, oo_b, ot_b, otk_b, new_pos, prop_or, hn_rows,
                     ho_rows, ht_rows, htk_rows, ts_out)
        return state_out, reward, i32(done), pos_oh, obj_ch

    # emission-side constants (the kernels map obs ingredients to channels);
    # base_total = the trace-time constant the static base blocks contribute
    # to an all-observer checksum (per env, per step)
    inv_ch = {}
    for i in range(P):
        for j in range(P):
            inv_ch[(i, int(ch_matrix[i, j]))] = j
    consts = dict(S=S, P=P, C=C, inv_ch=inv_ch,
                  base_total=P * int(base_tbl.sum()))
    return setup, transition, consts


def _obs_channel_blocks(consts, ctx, state, pos_oh, obj_ch):
    """Yield ``(i, c, blk, baseb)`` for every (observer, channel) pair —
    ``blk`` an [S, B] i32 block or python 0, ``baseb`` the channel's static
    base block ([S, B] i32, terrain one-hots) or None.  Object channels
    repeat per observer; callers that store may cache on ``c``."""
    P, C = consts["P"], consts["C"]
    inv_ch = consts["inv_ch"]
    prop_or = state[5]
    shift = 5 * P
    for i in range(P):
        for c in range(C):
            if c < P:
                yield i, c, pos_oh[inv_ch[(i, c)]], None
            elif c < shift:
                c1, o = divmod(c - P, 4)
                j = inv_ch[(i, c1)]
                fo = (prop_or[j] == o).astype(jnp.int32)
                yield i, c, pos_oh[j] * fo, None
            else:
                yield i, c, obj_ch[c - shift], ctx["baseb"].get(c - shift)


def _build_kernel(env: OvercookedEnv, block: int):
    """Per-step megakernel: one transition + full obs encode per launch."""
    B = block
    S, P = env.size, env.num_players
    setup, transition, consts = _make_transition(env, block)

    def emit8(blk, baseb):
        """[S, B] i32 block (or python 0) + optional base block -> int8."""
        if isinstance(blk, int):
            if baseb is None:
                return jnp.zeros((S, B), jnp.int8)
            return baseb.astype(jnp.int8)
        v = blk if baseb is None else blk + baseb
        return v.astype(jnp.int8)

    def kernel(on_ref, oo_ref, ot_ref, otk_ref,
               pos_ref, or_ref, hn_ref, ho_ref, ht_ref, htk_ref, ts_ref,
               act_ref,
               on_o, oo_o, ot_o, otk_o, pos_o, or_o, hn_o, ho_o, ht_o,
               htk_o, ts_o, obs_o, rew_o, done_o):
        ctx = setup()
        u32 = lambda x: x.astype(jnp.int32)  # state is stored int8
        state = (
            u32(on_ref[:]), u32(oo_ref[:]), u32(ot_ref[:]), u32(otk_ref[:]),
            [u32(pos_ref[p:p + 1]) for p in range(P)],
            [u32(or_ref[p:p + 1]) for p in range(P)],
            [u32(hn_ref[p:p + 1]) for p in range(P)],
            [u32(ho_ref[p:p + 1]) for p in range(P)],
            [u32(ht_ref[p:p + 1]) for p in range(P)],
            [u32(htk_ref[p:p + 1]) for p in range(P)],
            ts_ref[:],
        )
        act = [act_ref[p:p + 1] for p in range(P)]

        state, reward, done, pos_oh, obj_ch = transition(ctx, state, act)

        # cast each object channel once; reuse across observers
        cache = {}
        shift = 5 * P
        for i, c, blk, baseb in _obs_channel_blocks(consts, ctx, state,
                                                    pos_oh, obj_ch):
            if c >= shift:
                if c not in cache:
                    cache[c] = emit8(blk, baseb)
                obs_o[i, c] = cache[c]
            else:
                obs_o[i, c] = emit8(blk, baseb)

        (on_b, oo_b, ot_b, otk_b, new_pos, prop_or, hn_rows, ho_rows,
         ht_rows, htk_rows, ts_out) = state
        n8 = lambda x: x.astype(jnp.int8)
        cat8 = lambda rows_: jnp.concatenate(rows_, axis=0).astype(jnp.int8)
        on_o[:] = n8(on_b)
        oo_o[:] = n8(oo_b)
        ot_o[:] = n8(ot_b)
        otk_o[:] = n8(otk_b)
        pos_o[:] = cat8(new_pos)
        or_o[:] = cat8(prop_or)
        hn_o[:] = cat8(hn_rows)
        ho_o[:] = cat8(ho_rows)
        ht_o[:] = cat8(ht_rows)
        htk_o[:] = cat8(htk_rows)
        rew_o[:] = jnp.concatenate([reward] * P, axis=0)
        ts_o[:] = ts_out
        done_o[:] = done

    return kernel


@functools.lru_cache(maxsize=None)
def _compiled_step(env: OvercookedEnv, num_envs: int, block: int,
                   interpret: bool):
    S, P, C = env.size, env.num_players, env.num_channels
    assert num_envs % block == 0, (num_envs, block)
    grid = (num_envs // block,)
    kernel = _build_kernel(env, block)

    def rows(r):
        return pl.BlockSpec((r, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    obs_spec = pl.BlockSpec((P, C, S, block), lambda i: (0, 0, 0, i),
                            memory_space=pltpu.VMEM)
    in_specs = [rows(S)] * 4 + [rows(P)] * 6 + [rows(1), rows(P)]
    out_specs = (
        [rows(S)] * 4 + [rows(P)] * 6 + [rows(1)]
        + [obs_spec, rows(P), rows(1)]
    )
    sds = jax.ShapeDtypeStruct
    out_shapes = (
        [sds((S, num_envs), jnp.int8)] * 4
        + [sds((P, num_envs), jnp.int8)] * 6
        + [sds((1, num_envs), jnp.int32),
           sds((P, C, S, num_envs), jnp.int8),
           sds((P, num_envs), jnp.int32),
           sds((1, num_envs), jnp.int32)]
    )
    call = pl.pallas_call(
        kernel, grid=grid,
        out_shape=tuple(out_shapes),
        in_specs=in_specs, out_specs=tuple(out_specs),
        interpret=interpret,
    )

    def step(ts: TState, actions_t: Array):
        """actions_t: [P, N] int32."""
        (on, oo, ot, otk, pos, ornt, hn, ho, ht, htk, tstep, obs, rew,
         done) = call(
            ts.obj_name, ts.obj_onions, ts.obj_tomatoes, ts.obj_tick,
            ts.pos, ts.orient, ts.held_name, ts.held_onions,
            ts.held_tomatoes, ts.held_tick, ts.timestep, actions_t,
        )
        ts2 = TState(
            obj_name=on, obj_onions=oo, obj_tomatoes=ot, obj_tick=otk,
            pos=pos, orient=ornt, held_name=hn, held_onions=ho,
            held_tomatoes=ht, held_tick=htk, timestep=tstep,
        )
        return ts2, obs, rew, done[0] != 0

    return step


def fused_step(env: OvercookedEnv, ts: TState, actions_t: Array,
               block: int = 1024, interpret: bool = False):
    """One fused megakernel step in lane-major layout.

    ``actions_t``: [P, N] int32.  Returns ``(TState', obs [P, C, S, N] int8,
    reward [P, N] int32, done [N] bool)``.  ``to_env_major`` maps obs onto
    the jnp path's layout bit-for-bit.
    """
    _require_fused(env)
    N = ts.pos.shape[-1]
    block = min(block, N)
    return _compiled_step(env, N, block, interpret)(ts, actions_t)


# ---------------------------------------------------------------------------
# persistent-rollout kernel: T steps in ONE launch, state resident in VMEM
# ---------------------------------------------------------------------------
#
# Unlike cartpole, the Overcooked horizon reset is episode-index-free (fixed
# start positions, no RNG), so each grid block can loop T steps
# independently — multi-block parallelism is preserved with no cross-block
# episode rendezvous.  Per launch, HBM sees one read + one write of the
# state rows and NOTHING else: actions come from an in-kernel per-(env,
# player) LCG stream, and the observation encode — still computed in full
# every step — is consumed by an in-VMEM checksum instead of a [P, C, S, N]
# int8 store.  This measures the pure-simulation ceiling (the analog of the
# reference's persistent CUDA megakernel mode); training-shaped rollouts
# that materialize obs for a learner are the per-step kernel's job, and
# README's methodology column labels the two separately.
#
# The action draw replicates the reference oracle's ``int(n * rand24())``
# truncation: u24 = bits 8..31 of the LCG state, action = (u24 * n) >> 24.
# RNG primitives are shared with the other kernels (cartpole_pallas) so the
# constants and round count cannot drift per-module.


def _act_from(w: Array, num_actions: int) -> Array:
    from .cartpole_pallas import _i32  # noqa: F401  (shared constants home)

    u24 = jax.lax.shift_right_logical(w, 8) & jnp.int32(0x00FFFFFF)
    return jax.lax.shift_right_logical(u24 * num_actions, 24)


def action_lcg_next(w: Array, num_actions: int = 6):
    """Advance the in-kernel action stream one step (exposed so the
    differential test can drive the jnp path with the identical actions)."""
    from .cartpole_pallas import _lcg_next

    w2 = _lcg_next(w)
    return w2, _act_from(w2, num_actions)


def init_action_rng(num_envs: int, num_players: int, seed: int = 0) -> Array:
    """[P, N] per-(env, player) action-LCG seeds: the shared 8-round TEA
    over a tagged stream (xor tag keeps it disjoint from any episode-RNG
    stream)."""
    from .cartpole_pallas import _i32, _tea_seed

    idx = (jnp.arange(num_players * num_envs, dtype=jnp.int32)
           + jnp.int32(seed * num_players * num_envs))
    return _tea_seed(idx ^ _i32(0x0C00CED5)).reshape(num_players, num_envs)


def _build_rollout_kernel(env: OvercookedEnv, block: int, num_steps: int):
    from .cartpole_pallas import _lcg_next

    B = block
    S, P = env.size, env.num_players
    A = env.num_actions
    setup, transition, consts = _make_transition(env, block)

    def kernel(on_ref, oo_ref, ot_ref, otk_ref,
               pos_ref, or_ref, hn_ref, ho_ref, ht_ref, htk_ref, ts_ref,
               arng_ref,
               on_o, oo_o, ot_o, otk_o, pos_o, or_o, hn_o, ho_o, ht_o,
               htk_o, ts_o, arng_o, dcnt_o, chk_o):
        ctx = setup()  # loop-invariant [S, B] blocks, built once per launch
        u32 = lambda x: x.astype(jnp.int32)  # state is stored int8
        init = (
            u32(on_ref[:]), u32(oo_ref[:]), u32(ot_ref[:]), u32(otk_ref[:]),
            tuple(u32(pos_ref[p:p + 1]) for p in range(P)),
            tuple(u32(or_ref[p:p + 1]) for p in range(P)),
            tuple(u32(hn_ref[p:p + 1]) for p in range(P)),
            tuple(u32(ho_ref[p:p + 1]) for p in range(P)),
            tuple(u32(ht_ref[p:p + 1]) for p in range(P)),
            tuple(u32(htk_ref[p:p + 1]) for p in range(P)),
            ts_ref[:],
            tuple(arng_ref[p:p + 1] for p in range(P)),
            jnp.zeros((1, B), jnp.int32),   # done count
            jnp.zeros((1, B), jnp.int32),   # checksum
        )

        def body(_, carry):
            state = carry[:11]
            arng, dcnt, chk = carry[11], carry[12], carry[13]
            arng = [_lcg_next(w) for w in arng]
            act = [_act_from(w, A) for w in arng]
            state, reward, done, pos_oh, obj_ch = transition(ctx, state, act)
            # consume every output in-VMEM (bench checksum discipline):
            # the full obs encode, reward (x P seats), and done.  The static
            # base blocks contribute consts["base_total"] per env per step —
            # folded to one trace-time constant.
            for _i, _c, blk, _baseb in _obs_channel_blocks(
                    consts, ctx, state, pos_oh, obj_ch):
                if not isinstance(blk, int):
                    chk = chk + jnp.sum(blk, axis=0, keepdims=True)
            chk = chk + consts["base_total"] + reward * P + done
            dcnt = dcnt + done
            return tuple(
                tuple(x) if isinstance(x, list) else x for x in state
            ) + (tuple(arng), dcnt, chk)

        out = jax.lax.fori_loop(0, num_steps, body, init)
        state, arng, dcnt, chk = out[:11], out[11], out[12], out[13]
        (on_b, oo_b, ot_b, otk_b, new_pos, prop_or, hn_rows, ho_rows,
         ht_rows, htk_rows, ts_out) = state
        n8 = lambda x: x.astype(jnp.int8)
        cat = lambda rows_: jnp.concatenate(list(rows_), axis=0)
        cat8 = lambda rows_: cat(rows_).astype(jnp.int8)
        on_o[:] = n8(on_b)
        oo_o[:] = n8(oo_b)
        ot_o[:] = n8(ot_b)
        otk_o[:] = n8(otk_b)
        pos_o[:] = cat8(new_pos)
        or_o[:] = cat8(prop_or)
        hn_o[:] = cat8(hn_rows)
        ho_o[:] = cat8(ho_rows)
        ht_o[:] = cat8(ht_rows)
        htk_o[:] = cat8(htk_rows)
        ts_o[:] = ts_out
        arng_o[:] = cat(arng)
        dcnt_o[:] = dcnt
        chk_o[:] = chk

    return kernel


@functools.lru_cache(maxsize=None)
def _compiled_rollout(env: OvercookedEnv, num_envs: int, block: int,
                      num_steps: int, interpret: bool):
    S, P = env.size, env.num_players
    assert num_envs % block == 0, (num_envs, block)
    grid = (num_envs // block,)
    kernel = _build_rollout_kernel(env, block, num_steps)

    def rows(r):
        return pl.BlockSpec((r, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    in_specs = [rows(S)] * 4 + [rows(P)] * 6 + [rows(1), rows(P)]
    out_specs = tuple(
        [rows(S)] * 4 + [rows(P)] * 6 + [rows(1), rows(P), rows(1), rows(1)]
    )
    sds = jax.ShapeDtypeStruct
    out_shapes = tuple(
        [sds((S, num_envs), jnp.int8)] * 4
        + [sds((P, num_envs), jnp.int8)] * 6
        + [sds((1, num_envs), jnp.int32),
           sds((P, num_envs), jnp.int32),
           sds((1, num_envs), jnp.int32),
           sds((1, num_envs), jnp.int32)]
    )
    call = pl.pallas_call(
        kernel, grid=grid,
        out_shape=out_shapes,
        in_specs=in_specs, out_specs=out_specs,
        interpret=interpret,
    )

    def rollout(ts: TState, act_rng: Array):
        (on, oo, ot, otk, pos, ornt, hn, ho, ht, htk, tstep, arng, dcnt,
         chk) = call(
            ts.obj_name, ts.obj_onions, ts.obj_tomatoes, ts.obj_tick,
            ts.pos, ts.orient, ts.held_name, ts.held_onions,
            ts.held_tomatoes, ts.held_tick, ts.timestep, act_rng,
        )
        ts2 = TState(
            obj_name=on, obj_onions=oo, obj_tomatoes=ot, obj_tick=otk,
            pos=pos, orient=ornt, held_name=hn, held_onions=ho,
            held_tomatoes=ht, held_tick=htk, timestep=tstep,
        )
        return ts2, arng, dcnt[0], chk[0]

    return rollout


def fused_rollout(env: OvercookedEnv, ts: TState, act_rng: Array,
                  num_steps: int, block: int = 1024,
                  interpret: bool = False):
    """T fused steps in ONE kernel launch per env block.

    ``act_rng``: [P, N] int32 (``init_action_rng``).  Returns
    ``(TState', act_rng', done_count [N] i32, checksum [N] i32)`` where
    checksum = sum over steps of (obs.sum + P * reward + done) per env,
    accumulated in VMEM — every output of every step is consumed, with the
    full observation encode folded into per-env accumulators instead of an
    HBM store (the fused-consumer discipline; bench.py's module docstring
    contrasts it with the per-step paths' full HBM checksum reads).
    Requires ``fused_supported(env)``.
    """
    _require_fused(env)
    N = ts.pos.shape[-1]
    block = min(block, N)
    if N % block:
        raise ValueError(
            f"persistent rollout needs num_envs divisible by the env block "
            f"({N} % {block} != 0); use a power-of-two env count or pass a "
            f"block that divides it"
        )
    return _compiled_rollout(env, N, block, num_steps, interpret)(ts, act_rng)
