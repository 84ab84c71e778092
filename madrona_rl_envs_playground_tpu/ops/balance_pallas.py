"""Fused Balance Beam step megakernel (Pallas TPU).

One kernel computes the move, the rolling-history observation update, reward
(colocation / distance / fall-off), termination, world-order episode
allocation, and the bit-exact TEA+LCG reset draw — semantics source
``envs/balance_beam.py`` / reference ``src/balance_beam_env/sim.cpp:47-155``.

Lane-major layout as in ``cartpole_pallas``: env batch on lanes; state rows
``loc [2, N]``, ``obs [14, N]`` (seat-major: row p*7+k is seat p's obs slot
k), ``time [1, N]``, ``rng [1, N]`` i32.  Episode allocation across blocks
uses the same SMEM running counter + in-block log-step lane prefix sum.

Bit-exactness vs the jnp ``batched_step`` (state, obs, reward, done,
counter, across resets) is enforced by ``tests/test_balance_pallas.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..envs.balance_beam import BUFFER, NUM_SPACES, TIME, State
from .cartpole_pallas import _i32, _lcg_next, _tea_seed, _unif

Array = jnp.ndarray


def pack_state(vstate: State):
    """vmap-ed State -> (loc [2,N] i32, obs [14,N] i32, time [1,N] i32,
    rng [1,N] i32)."""
    t = lambda a: jnp.transpose(a)
    obs = vstate.obs.reshape(vstate.obs.shape[0], -1).T  # [14, N]
    return (
        t(vstate.loc),
        obs.astype(jnp.int32),
        vstate.time[None, :].astype(jnp.int32),
        lax.bitcast_convert_type(vstate.rng_v, jnp.int32)[None, :],
    )


def unpack_state(loc, obs, time, rng_i) -> State:
    N = loc.shape[-1]
    return State(
        loc=jnp.transpose(loc),
        obs=obs.T.reshape(N, 2, 2 * TIME + 1),
        time=time[0],
        rng_v=lax.bitcast_convert_type(rng_i[0], jnp.uint32),
    )


def _make_step(block: int):
    """Rows-form step on [1, block] tiles (see ``_make_step2``)."""
    return _make_step2(1, block)


def _make_step2(TR: int, L: int):
    """Shared step body on [TR, L] tiles: ``step(state, a0, a1, base_row)``
    with ``state = (l0, l1, t, rng, obs_rows[14])`` -> ``(state', rew, d32,
    base_row')``.  ``base_row`` is the running episode counter as a [1, 1]
    value (SMEM-backed in the per-step kernel, loop-carried in the
    persistent kernel).  World ``w`` sits at ``(w // L, w % L)`` so the
    world-order ranking (lane prefix + exclusive row offsets) allocates
    episode indices in EXACTLY the [1, TR*L] rows order — the sublane-
    packed persistent kernel (TR=8) is bit-identical to the rows form."""
    f32 = jnp.float32

    def step(state, a0, a1, base):
        l0p, l1p, t, rng, obs = state

        def mv(a):
            # MOVES = [-2, -1, 1, 2]
            return jnp.where(
                a == 0, -2, jnp.where(a == 1, -1, jnp.where(a == 2, 1, 2))
            ).astype(jnp.int32)

        l0 = l0p + mv(a0)
        l1 = l1p + mv(a1)
        t2 = t - 1

        # reward / termination (sim.cpp:83-155)
        diff = l0 - l1
        rew = jnp.where(diff == 0, f32(1.0),
                        -jnp.abs(diff).astype(f32) * f32(0.2))
        off = (
            (l0 < 0) | (l0 >= NUM_SPACES) | (l1 < 0) | (l1 >= NUM_SPACES)
        )
        rew = jnp.where(
            off, -f32(NUM_SPACES) * (t2 + 1).astype(f32) * f32(0.2), rew
        )
        done = off | (t2 == 0)
        d32 = done.astype(jnp.int32)

        # world-order rank within the block (see cartpole_pallas)
        lane = lax.broadcasted_iota(jnp.int32, (TR, L), 1)
        ps = d32
        k = 1
        while k < L:
            ps = ps + jnp.where(lane >= k, pltpu.roll(ps, shift=k, axis=1), 0)
            k *= 2
        row_tot = jnp.sum(d32, axis=1, keepdims=True)
        if TR > 1:
            row = lax.broadcasted_iota(jnp.int32, (TR, 1), 0)
            cum = row_tot
            k = 1
            while k < TR:
                cum = cum + jnp.where(row >= k,
                                      pltpu.roll(cum, shift=k, axis=0), 0)
                k *= 2
            ps = ps + (cum - row_tot)
        total = jnp.sum(row_tot, axis=0, keepdims=True)
        eps = base + (ps - d32)
        base2 = base + total[0:1, 0:1]

        # fresh episode: TEA seed + 2 randint(5) draws (sim.cpp:47-73)
        s = _tea_seed(eps)
        v1 = _lcg_next(s)
        v2 = _lcg_next(v1)
        f0 = (f32(NUM_SPACES) * _unif(v1)).astype(jnp.int32)
        f1 = (f32(NUM_SPACES) * _unif(v2)).astype(jnp.int32)
        tf = jnp.full_like(t2, TIME - 1)

        nl0 = jnp.where(done, f0, l0)
        nl1 = jnp.where(done, f1, l1)
        nt = jnp.where(done, tf, t2)
        nrng = jnp.where(done, v2, rng)

        # rolling-history obs (sim.cpp:106-118); fresh episodes zero the
        # history and write slot 0/3 + time
        zero = jnp.zeros_like(l0)
        nobs = list(obs)
        for p, own, other in ((0, nl0, nl1), (1, nl1, nl0)):
            r = p * (2 * TIME + 1)
            nobs[r] = own + BUFFER
            nobs[r + 1] = jnp.where(done, zero, obs[r])
            nobs[r + 2] = jnp.where(done, zero, obs[r + 1])
            nobs[r + 3] = other + BUFFER
            nobs[r + 4] = jnp.where(done, zero, obs[r + 3])
            nobs[r + 5] = jnp.where(done, zero, obs[r + 4])
            nobs[r + 6] = nt

        return (nl0, nl1, nt, nrng, nobs), rew, d32, base2

    return step


def _build_kernel(block: int):
    R = 2 * (2 * TIME + 1)
    step = _make_step(block)

    def kernel(cnt_ref, loc_ref, obs_ref, t_ref, rng_ref, act_ref,
               loc_o, obs_o, t_o, rng_o, rew_o, done_o, cnt_o, base_s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            base_s[0, 0] = cnt_ref[0, 0]

        state = (
            loc_ref[0:1], loc_ref[1:2], t_ref[:], rng_ref[:],
            [obs_ref[r:r + 1] for r in range(R)],
        )
        base = jnp.full((1, 1), base_s[0, 0], jnp.int32)
        (nl0, nl1, nt, nrng, nobs), rew, d32, base = step(
            state, act_ref[0:1], act_ref[1:2], base
        )
        base_s[0, 0] = base[0, 0]

        loc_o[0:1] = nl0
        loc_o[1:2] = nl1
        t_o[:] = nt
        rng_o[:] = nrng
        for r in range(R):
            obs_o[r:r + 1] = nobs[r]
        rew_o[:] = rew
        done_o[:] = d32

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            cnt_o[0, 0] = base_s[0, 0]

    return kernel


@functools.lru_cache(maxsize=None)
def _compiled_step(num_envs: int, block: int, interpret: bool):
    assert num_envs % block == 0
    grid = (num_envs // block,)
    kernel = _build_kernel(block)

    rows = lambda r: pl.BlockSpec((r, block), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    smem11 = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    sds = jax.ShapeDtypeStruct
    R = 2 * (2 * TIME + 1)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem11, rows(2), rows(R), rows(1), rows(1), rows(2)],
        out_specs=(rows(2), rows(R), rows(1), rows(1), rows(1), rows(1),
                   smem11),
        out_shape=(
            sds((2, num_envs), jnp.int32),
            sds((R, num_envs), jnp.int32),
            sds((1, num_envs), jnp.int32),
            sds((1, num_envs), jnp.int32),
            sds((1, num_envs), jnp.float32),
            sds((1, num_envs), jnp.int32),
            sds((1, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )

    def step(loc, obs, time, rng_i, counter, actions_t):
        """actions_t [2, N] i32.  Returns (loc', obs', time', rng', reward
        [N] f32, done [N] bool, counter')."""
        loc2, obs2, t2, rng2, rew, done, cnt = call(
            counter.reshape(1, 1).astype(jnp.int32),
            loc, obs, time, rng_i, actions_t,
        )
        return loc2, obs2, t2, rng2, rew[0], done[0] != 0, cnt[0, 0]

    return step


def fused_step(loc, obs, time, rng_i, counter, actions_t,
               block: int = 2048, interpret: bool = False):
    N = loc.shape[-1]
    block = min(block, N)
    return _compiled_step(N, block, interpret)(loc, obs, time, rng_i,
                                               counter, actions_t)


def init_packed(num_envs: int, start_episode: int = 0):
    from ..envs.balance_beam import Env

    env = Env()
    eps = jnp.arange(num_envs, dtype=jnp.uint32) + jnp.uint32(start_episode)
    st = jax.vmap(env.init_core)(eps)
    return pack_state(st) + (jnp.int32(start_episode + num_envs),)


# ---------------------------------------------------------------------------
# persistent-rollout kernel: T steps in ONE launch (multi-block SMEM carry)
# ---------------------------------------------------------------------------
#
# Same design as ``cartpole_pallas.fused_rollout``: each block runs its full
# T-step loop with state resident in VMEM, actions drawn from an in-kernel
# per-(env, seat) LCG (balance has 4 moves: action = (u24 * 4) >> 24, the
# oracle's int(n * rand24()) truncation), outputs consumed by per-env
# accumulator rows (sum of obs + reward + done).  Episode indices are
# allocated block-sequentially via the SMEM counter carry — deterministic,
# stronger than the reference GPU executor's fetch_add order; the test
# replays the same schedule in jnp.


def action_lcg_next(w: Array, num_actions: int = 4):
    """Advance the [2, N] per-seat action stream one step (exposed for the
    differential test's jnp reference loop)."""
    w2 = _lcg_next(w)
    u24 = lax.shift_right_logical(w2, 8) & jnp.int32(0x00FFFFFF)
    return w2, lax.shift_right_logical(u24 * num_actions, 24)


def init_action_rng(num_envs: int, seed: int = 0) -> Array:
    """[2, N] per-(env, seat) action-LCG seeds (stream tag keeps them
    disjoint from the episode-RNG streams)."""
    idx = (jnp.arange(2 * num_envs, dtype=jnp.int32)
           + jnp.int32(seed * 2 * num_envs))
    return _tea_seed(idx ^ _i32(0xBA1A9CE5)).reshape(2, num_envs)


def _build_rollout_kernel(block: int, num_steps: int):
    B = block
    R = 2 * (2 * TIME + 1)
    step = _make_step(block)

    def kernel(cnt_ref, loc_ref, obs_ref, t_ref, rng_ref, arng_ref,
               loc_o, obs_o, t_o, rng_o, arng_o, dcnt_o, cnt_o, chk_o,
               base_s):
        gi = pl.program_id(0)

        @pl.when(gi == 0)
        def _():
            base_s[0, 0] = cnt_ref[0, 0]

        init = (
            loc_ref[0:1], loc_ref[1:2], t_ref[:], rng_ref[:],
            tuple(obs_ref[r:r + 1] for r in range(R)),
            arng_ref[0:1], arng_ref[1:2],
            jnp.full((1, 1), base_s[0, 0], jnp.int32),
            jnp.zeros((1, B), jnp.int32),     # done count
            jnp.zeros((1, B), jnp.float32),   # checksum
        )

        def body(_, carry):
            l0, l1, t, rng, obs, w0, w1, base, dcnt, chk = carry
            w0 = _lcg_next(w0)
            w1 = _lcg_next(w1)
            u = lambda w: lax.shift_right_logical(
                (lax.shift_right_logical(w, 8) & jnp.int32(0x00FFFFFF)) * 4,
                24)
            (l0, l1, t, rng, nobs), rew, d32, base = step(
                (l0, l1, t, rng, list(obs)), u(w0), u(w1), base
            )
            obs_sum = jnp.zeros((1, B), jnp.int32)
            for r in range(R):
                obs_sum = obs_sum + nobs[r]
            chk = chk + obs_sum.astype(jnp.float32) + rew + d32
            dcnt = dcnt + d32
            return (l0, l1, t, rng, tuple(nobs), w0, w1, base, dcnt, chk)

        out = lax.fori_loop(0, num_steps, body, init)
        l0, l1, t, rng, obs, w0, w1, base, dcnt, chk = out
        loc_o[0:1] = l0
        loc_o[1:2] = l1
        t_o[:] = t
        rng_o[:] = rng
        for r in range(R):
            obs_o[r:r + 1] = obs[r]
        arng_o[0:1] = w0
        arng_o[1:2] = w1
        dcnt_o[:] = dcnt
        chk_o[:] = chk
        base_s[0, 0] = base[0, 0]

        @pl.when(gi == pl.num_programs(0) - 1)
        def _():
            cnt_o[0, 0] = base_s[0, 0]

    return kernel


PERSISTENT_MAX_BLOCK = 16_384


def _build_rollout_kernel_packed(block: int, num_steps: int):
    """Sublane-packed persistent rollout (see cartpole_pallas): worlds as
    [8, block/8] tiles, full VPU sublane utilization, identical episode
    allocation order to the rows form."""
    L = block // 8
    R = 2 * (2 * TIME + 1)
    step = _make_step2(8, L)

    def kernel(cnt_ref, loc_ref, obs_ref, t_ref, rng_ref, arng_ref,
               loc_o, obs_o, t_o, rng_o, arng_o, dcnt_o, cnt_o, chk_o,
               base_s):
        gi = pl.program_id(0)

        @pl.when(gi == 0)
        def _():
            base_s[0, 0] = cnt_ref[0, 0]

        init = (
            loc_ref[0, 0], loc_ref[1, 0], t_ref[0], rng_ref[0],
            tuple(obs_ref[r, 0] for r in range(R)),
            arng_ref[0, 0], arng_ref[1, 0],
            jnp.full((1, 1), base_s[0, 0], jnp.int32),
            jnp.zeros((8, L), jnp.int32),     # done count
            jnp.zeros((8, L), jnp.float32),   # checksum
        )

        def body(_, carry):
            l0, l1, t, rng, obs, w0, w1, base, dcnt, chk = carry
            w0 = _lcg_next(w0)
            w1 = _lcg_next(w1)
            u = lambda w: lax.shift_right_logical(
                (lax.shift_right_logical(w, 8) & jnp.int32(0x00FFFFFF)) * 4,
                24)
            (l0, l1, t, rng, nobs), rew, d32, base = step(
                (l0, l1, t, rng, list(obs)), u(w0), u(w1), base
            )
            obs_sum = jnp.zeros((8, L), jnp.int32)
            for r in range(R):
                obs_sum = obs_sum + nobs[r]
            chk = chk + obs_sum.astype(jnp.float32) + rew + d32
            dcnt = dcnt + d32
            return (l0, l1, t, rng, tuple(nobs), w0, w1, base, dcnt, chk)

        out = lax.fori_loop(0, num_steps, body, init)
        l0, l1, t, rng, obs, w0, w1, base, dcnt, chk = out
        loc_o[0, 0], loc_o[1, 0] = l0, l1
        t_o[0] = t
        rng_o[0] = rng
        for r in range(R):
            obs_o[r, 0] = obs[r]
        arng_o[0, 0], arng_o[1, 0] = w0, w1
        dcnt_o[0] = dcnt
        chk_o[0] = chk
        base_s[0, 0] = base[0, 0]

        @pl.when(gi == pl.num_programs(0) - 1)
        def _():
            cnt_o[0, 0] = base_s[0, 0]

    return kernel


@functools.lru_cache(maxsize=None)
def _compiled_rollout_packed(num_envs: int, block: int, num_steps: int,
                             interpret: bool):
    assert num_envs % block == 0 and block % 8 == 0, (num_envs, block)
    NB, L = num_envs // block, block // 8
    R = 2 * (2 * TIME + 1)
    kernel = _build_rollout_kernel_packed(block, num_steps)
    pk4 = lambda r: pl.BlockSpec((r, 1, 8, L), lambda i: (0, i, 0, 0),
                                 memory_space=pltpu.VMEM)
    pk3 = pl.BlockSpec((1, 8, L), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    smem11 = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    sds = jax.ShapeDtypeStruct
    call = pl.pallas_call(
        kernel, grid=(NB,),
        in_specs=[smem11, pk4(2), pk4(R), pk3, pk3, pk4(2)],
        out_specs=(pk4(2), pk4(R), pk3, pk3, pk4(2), pk3, smem11, pk3),
        out_shape=(
            sds((2, NB, 8, L), jnp.int32),
            sds((R, NB, 8, L), jnp.int32),
            sds((NB, 8, L), jnp.int32),
            sds((NB, 8, L), jnp.int32),
            sds((2, NB, 8, L), jnp.int32),
            sds((NB, 8, L), jnp.int32),
            sds((1, 1), jnp.int32),
            sds((NB, 8, L), jnp.float32),
        ),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )

    def rollout(loc, obs, time, rng_i, counter, act_rng):
        pk = lambda a: a.reshape(a.shape[0], NB, 8, L)
        loc2, obs2, t2, rng2, arng2, dcnt, cnt, chk = call(
            counter.reshape(1, 1).astype(jnp.int32),
            pk(loc), pk(obs), pk(time)[0], pk(rng_i)[0], pk(act_rng),
        )
        un = lambda a: a.reshape(a.shape[0], num_envs)
        un1 = lambda a: a.reshape(1, num_envs)
        return (un(loc2), un(obs2), un1(t2), un1(rng2), un(arng2),
                cnt[0, 0], un1(dcnt)[0], un1(chk)[0])

    return rollout


@functools.lru_cache(maxsize=None)
def _compiled_rollout(num_envs: int, block: int, num_steps: int,
                      interpret: bool):
    assert num_envs % block == 0, (num_envs, block)
    grid = (num_envs // block,)
    kernel = _build_rollout_kernel(block, num_steps)
    rows = lambda r: pl.BlockSpec((r, block), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    smem11 = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    sds = jax.ShapeDtypeStruct
    R = 2 * (2 * TIME + 1)
    call = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[smem11, rows(2), rows(R), rows(1), rows(1), rows(2)],
        out_specs=(rows(2), rows(R), rows(1), rows(1), rows(2), rows(1),
                   smem11, rows(1)),
        out_shape=(
            sds((2, num_envs), jnp.int32),
            sds((R, num_envs), jnp.int32),
            sds((1, num_envs), jnp.int32),
            sds((1, num_envs), jnp.int32),
            sds((2, num_envs), jnp.int32),
            sds((1, num_envs), jnp.int32),
            sds((1, 1), jnp.int32),
            sds((1, num_envs), jnp.float32),
        ),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )

    def rollout(loc, obs, time, rng_i, counter, act_rng):
        loc2, obs2, t2, rng2, arng2, dcnt, cnt, chk = call(
            counter.reshape(1, 1).astype(jnp.int32),
            loc, obs, time, rng_i, act_rng,
        )
        return loc2, obs2, t2, rng2, arng2, cnt[0, 0], dcnt[0], chk[0]

    return rollout


def fused_rollout(loc, obs, time, rng_i, counter, act_rng, num_steps: int,
                  block: int = PERSISTENT_MAX_BLOCK,
                  interpret: bool = False, packed=None):
    """T fused balance steps in ONE launch (multi-block grid).

    Returns ``(loc', obs', time', rng', act_rng', counter', done_count [N],
    checksum [N])``; episode indices allocate block-sequentially.
    ``packed=None`` auto-selects the sublane-packed kernel where the block
    shape allows (bit-identical results, ~4x at 1M envs)."""
    N = loc.shape[-1]
    block = min(block, N, PERSISTENT_MAX_BLOCK)
    if N % block:
        raise ValueError(
            f"persistent rollout needs num_envs divisible by the env block "
            f"({N} % {block} != 0); use a power-of-two env count or pass a "
            f"block that divides it"
        )
    if packed is None:
        packed = block % 8 == 0 and (interpret or (block // 8) % 128 == 0)
    if packed:
        return _compiled_rollout_packed(N, block, num_steps, interpret)(
            loc, obs, time, rng_i, counter, act_rng
        )
    return _compiled_rollout(N, block, num_steps, interpret)(
        loc, obs, time, rng_i, counter, act_rng
    )
