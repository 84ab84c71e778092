"""Fused Cartpole step megakernel (Pallas TPU).

One kernel per env block: Euler physics, termination, world-order episode
allocation, the bit-exact TEA+LCG episode reset draw, and the state export
(the observation IS the four state rows, so the kernel's state output is
the zero-copy obs — exactly the Madrona manager's exported-column model,
``src/cartpole_env/mgr.cpp:195-199``).  Semantics source:
``envs/cartpole.py`` / ``src/cartpole_env/sim.cpp:9-96`` and
``core/rng.py`` / ``src/cartpole_env/rng.hpp:7-36``.

Lane-major layout as in ``overcooked_pallas``: state is ``[4, N]`` f32 rows
(x, x_dot, theta, theta_dot) + ``[1, N]`` i32 LCG words; the env batch rides
the lanes.  Two TPU-specific mechanisms:

* **World-order episode counter across blocks** — the jnp path's
  ``cumsum(done)`` spans the whole batch (the deterministic analog of the
  reference's global ``fetch_add``).  The grid is sequential on TPU, so an
  SMEM scratch carries the running counter block to block; within a block a
  log2(B) shift-add prefix sum over lanes (``pltpu.roll``) assigns ranks.
* **Integer-only RNG** — the TEA hash + LCG run in int32 with
  ``lax.shift_right_logical`` (bit-identical to the uint32 reference
  stream mod 2^32); the 24-bit mask keeps the float conversion exact.

Bit-exactness vs the jnp ``batched_step`` (state, obs, done, episode
counter, across resets) is enforced by ``tests/test_cartpole_pallas.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..envs.cartpole import THETA_THRESHOLD, X_THRESHOLD, Env, State

Array = jnp.ndarray

_LCG_A = 1664525
_LCG_C = 1013904223
_TEA_DELTA = 0x9E3779B9
_K0, _K1, _K2, _K3 = 0xA341316C, 0xC8013EA4, 0xAD90777D, 0x7E95761E
_MASK24 = 0x00FFFFFF
_INV_2_24 = 1.0 / float(0x01000000)

def _i32(x: int):
    """uint32 constant as its two's-complement int32 value."""
    return jnp.int32(x - (1 << 32) if x >= (1 << 31) else x)


def _tea_seed(idx):
    """8-round TEA hash (int32 bit-parity with core.rng.seed)."""
    srl = lax.shift_right_logical
    v0 = idx
    v1 = jnp.zeros_like(idx)
    s0 = jnp.zeros_like(idx)
    for _ in range(8):
        s0 = s0 + _i32(_TEA_DELTA)
        v0 = v0 + (((v1 << 4) + _i32(_K0)) ^ (v1 + s0) ^ (srl(v1, 5) + _i32(_K1)))
        v1 = v1 + (((v0 << 4) + _i32(_K2)) ^ (v0 + s0) ^ (srl(v0, 5) + _i32(_K3)))
    return v0


def _lcg_next(v):
    return _i32(_LCG_A) * v + _i32(_LCG_C)


def _unif(v):
    """[0,1) from the low 24 bits of the (already advanced) word."""
    return (v & _i32(_MASK24)).astype(jnp.float32) * jnp.float32(_INV_2_24)


def pack_state(vstate: State):
    """vmap-ed State [N] rows -> (grid [4, N] f32, rng [1, N] i32)."""
    grid = jnp.stack([vstate.x, vstate.x_dot, vstate.theta, vstate.theta_dot])
    rng_i = lax.bitcast_convert_type(vstate.rng_v, jnp.int32)[None, :]
    return grid, rng_i


def unpack_state(grid: Array, rng_i: Array) -> State:
    return State(
        x=grid[0], x_dot=grid[1], theta=grid[2], theta_dot=grid[3],
        rng_v=lax.bitcast_convert_type(rng_i[0], jnp.uint32),
    )


def _build_kernel(block: int):
    B = block
    f32 = jnp.float32
    step = _make_step(block)

    def kernel(cnt_ref, st_ref, rng_ref, act_ref,
               st_o, rng_o, done_o, cnt_o, base_s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            base_s[0, 0] = cnt_ref[0, 0]

        state = (st_ref[0:1], st_ref[1:2], st_ref[2:3], st_ref[3:4],
                 rng_ref[:])
        base = jnp.full((1, 1), base_s[0, 0], jnp.int32)
        (x, xd, th, thd, v), d32, base = step(state, act_ref[:], base)
        base_s[0, 0] = base[0, 0]

        st_o[0:1], st_o[1:2], st_o[2:3], st_o[3:4] = x, xd, th, thd
        rng_o[:] = v
        done_o[:] = d32

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            cnt_o[0, 0] = base_s[0, 0]

    return kernel


def _make_step(block: int):
    """Rows-form step on [1, block] tiles (see ``_make_step2``)."""
    return _make_step2(1, block)


def _make_step2(R: int, L: int):
    """Shared step body on [R, L] tiles: state = (x, x_dot, theta,
    theta_dot, rng), base a [1, 1] running episode counter.  Returns
    (state', d32, base').

    World ``w`` of the tile sits at ``(w // L, w % L)`` (row-major), so
    the world-order episode ranking decomposes into a within-row lane
    prefix sum plus exclusive row offsets — allocation order is IDENTICAL
    to the [1, R*L] rows form.  The packed persistent kernel uses R=8 so
    every elementwise op (and the dominant prefix-sum chain) runs with all
    VPU sublanes busy instead of 1/8."""
    f32 = jnp.float32

    def step(state, a, base):
        x, xd, th, thd, v = state

        force = jnp.where(a == 1, f32(10.0), f32(-10.0))
        costh = jnp.cos(th)
        sinth = jnp.sin(th)
        temp = (force + f32(0.05) * thd * thd * sinth) / f32(1.1)
        thacc = (f32(9.8) * sinth - costh * temp) / (
            f32(0.5) * (f32(4.0 / 3.0) - f32(0.1) * costh * costh / f32(1.1))
        )
        xacc = temp - f32(0.05) * thacc * costh / f32(1.1)
        x2 = x + f32(0.02) * xd
        xd2 = xd + f32(0.02) * xacc
        th2 = th + f32(0.02) * thd
        thd2 = thd + f32(0.02) * thacc

        done = (
            (x2 < f32(-X_THRESHOLD)) | (x2 > f32(X_THRESHOLD))
            | (th2 < f32(-THETA_THRESHOLD)) | (th2 > f32(THETA_THRESHOLD))
        )
        d32 = done.astype(jnp.int32)

        # world-order rank within the block: log-step lane prefix sum
        lane = lax.broadcasted_iota(jnp.int32, (R, L), 1)
        ps = d32
        k = 1
        while k < L:
            ps = ps + jnp.where(lane >= k, pltpu.roll(ps, shift=k, axis=1), 0)
            k *= 2
        row_tot = jnp.sum(d32, axis=1, keepdims=True)  # [R, 1]
        if R > 1:
            # exclusive offsets of the preceding rows (same log trick on
            # the sublane axis; R is tiny so this is 3 steps at R=8)
            row = lax.broadcasted_iota(jnp.int32, (R, 1), 0)
            cum = row_tot
            k = 1
            while k < R:
                cum = cum + jnp.where(row >= k,
                                      pltpu.roll(cum, shift=k, axis=0), 0)
                k *= 2
            ps = ps + (cum - row_tot)
        total = jnp.sum(row_tot, axis=0, keepdims=True)  # [1,1]
        eps = base + (ps - d32)  # [R,L] episode index per resetting env
        base2 = base + total[0:1, 0:1]

        # fresh episode: TEA seed + 4 LCG draws (sim.cpp:47-66)
        s = _tea_seed(eps)
        lo, rng_w = f32(-0.05), f32(0.1)
        v1 = _lcg_next(s)
        v2 = _lcg_next(v1)
        v3 = _lcg_next(v2)
        v4 = _lcg_next(v3)

        nstate = (
            jnp.where(done, lo + _unif(v1) * rng_w, x2),
            jnp.where(done, lo + _unif(v2) * rng_w, xd2),
            jnp.where(done, lo + _unif(v3) * rng_w, th2),
            jnp.where(done, lo + _unif(v4) * rng_w, thd2),
            jnp.where(done, v4, v),
        )
        return nstate, d32, base2

    return step


@functools.lru_cache(maxsize=None)
def _compiled_step(num_envs: int, block: int, interpret: bool):
    assert num_envs % block == 0
    grid = (num_envs // block,)
    kernel = _build_kernel(block)

    rows = lambda r: pl.BlockSpec((r, block), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    smem11 = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    sds = jax.ShapeDtypeStruct
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem11, rows(4), rows(1), rows(1)],
        out_specs=(rows(4), rows(1), rows(1), smem11),
        out_shape=(
            sds((4, num_envs), jnp.float32),
            sds((1, num_envs), jnp.int32),
            sds((1, num_envs), jnp.int32),
            sds((1, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )

    def step(grid_st, rng_i, counter, actions_t):
        """grid_st [4,N] f32; rng_i [1,N] i32; counter scalar i32;
        actions_t [1,N] i32."""
        st, rng2, done, cnt = call(
            counter.reshape(1, 1).astype(jnp.int32), grid_st, rng_i, actions_t
        )
        return st, rng2, done[0] != 0, cnt[0, 0]

    return step


def fused_step(grid_st: Array, rng_i: Array, counter, actions_t: Array,
               block: int = 2048, interpret: bool = False):
    """One fused cartpole step.  Returns (state' [4,N], rng' [1,N],
    done [N] bool, counter').  state' doubles as the obs export (obs ==
    the four state rows); reward is the constant 1.0 per live step."""
    N = grid_st.shape[-1]
    block = min(block, N)
    return _compiled_step(N, block, interpret)(grid_st, rng_i, counter, actions_t)


def init_packed(num_envs: int, start_episode: int = 0):
    """Fresh batch in kernel layout + the post-init episode counter."""
    env = Env()
    eps = jnp.arange(num_envs, dtype=jnp.uint32) + jnp.uint32(start_episode)
    st = jax.vmap(env.init_core)(eps)
    grid, rng_i = pack_state(st)
    return grid, rng_i, jnp.int32(start_episode + num_envs)


# ---------------------------------------------------------------------------
# persistent-rollout kernel: T steps in ONE launch, state resident in VMEM
# ---------------------------------------------------------------------------
#
# The per-step megakernel above is HBM-bound end to end: every step reads and
# writes the full 24 B/env state plus a threefry action vector — ~9% of the
# v5e HBM roofline at 1M envs, and launch/scan fixed cost dominates at 65k
# (ROADMAP r2).  This kernel is the TPU analog of Madrona's *persistent*
# megakernel idea taken one step further than the reference can: the whole
# T-step rollout runs inside one kernel, so the state never leaves VMEM and
# HBM sees exactly one read + one write of 24 B/env for the entire rollout.
# Actions are drawn in-kernel from a dedicated per-env LCG stream (the
# reference's isolated bench also generates uniform random actions inside the
# timed region, `scripts/cartpole_isolated_example.py`; only the generator
# differs — documented in README's methodology column).
#
# Episode-counter order: within a block, world order per step is a lane-
# order prefix sum.  Across blocks the TPU grid is sequential, so an SMEM
# scratch carries the running counter from block to block — block b runs its
# whole T-step loop before block b+1 starts, giving a *block-sequential*
# deterministic allocation: every episode still gets a unique world-
# deterministic index, but interleaved differently than the jnp path's
# per-step whole-batch cumsum.  (The reference's own GPU executor allocates
# in nondeterministic fetch_add order, so this is a stronger guarantee than
# the baseline's, not a weaker one.)  Bit-exactness is proven against a jnp
# `batched_step` reference that replays the same block-sequential schedule
# and the same LCG action stream (tests/test_cartpole_pallas.py).


def _build_rollout_kernel(block: int, num_steps: int):
    B = block
    srl = lax.shift_right_logical
    step = _make_step(block)

    def kernel(cnt_ref, st_ref, rng_ref, arng_ref,
               st_o, rng_o, arng_o, done_cnt_o, cnt_o, chk_o, base_s):
        gi = pl.program_id(0)

        @pl.when(gi == 0)
        def _():
            base_s[0, 0] = cnt_ref[0, 0]

        def body(_, carry):
            x, xd, th, thd, v, w, base, dcnt, chk = carry

            # in-kernel uniform action: advance the action LCG, take the top
            # bit of the 24-bit uniform field (p=0.5 each, like randint(0,2))
            w2 = _lcg_next(w)
            a = srl(w2, 23) & 1

            (x3, xd3, th3, thd3, v5), d32, base = step(
                (x, xd, th, thd, v), a, base
            )

            # per-step output consumption (bench checksum discipline): the
            # exported obs IS the state, so fold x + done into per-env
            # accumulator rows
            dcnt = dcnt + d32
            chk = chk + x3
            return (x3, xd3, th3, thd3, v5, w2, base, dcnt, chk)

        init = (
            st_ref[0:1], st_ref[1:2], st_ref[2:3], st_ref[3:4],
            rng_ref[:], arng_ref[:],
            jnp.full((1, 1), base_s[0, 0], jnp.int32),
            jnp.zeros((1, B), jnp.int32),
            jnp.zeros((1, B), jnp.float32),
        )
        x, xd, th, thd, v, w, base, dcnt, chk = lax.fori_loop(
            0, num_steps, body, init
        )
        st_o[0:1], st_o[1:2], st_o[2:3], st_o[3:4] = x, xd, th, thd
        rng_o[:] = v
        arng_o[:] = w
        done_cnt_o[:] = dcnt
        chk_o[:] = chk
        base_s[0, 0] = base[0, 0]

        @pl.when(gi == pl.num_programs(0) - 1)
        def _():
            cnt_o[0, 0] = base_s[0, 0]

    return kernel


def _build_rollout_kernel_packed(block: int, num_steps: int):
    """Sublane-packed persistent rollout: each block's worlds live as
    [8, block/8] tiles (world w at (w // L, w % L)), so every step op —
    including the prefix-sum chain that dominates the rows form — runs at
    full VPU sublane utilization.  Episode allocation order is IDENTICAL
    to the rows form (row-major == world order), so the same jnp replay
    reference validates both."""
    L = block // 8
    srl = lax.shift_right_logical
    step = _make_step2(8, L)

    def kernel(cnt_ref, st_ref, rng_ref, arng_ref,
               st_o, rng_o, arng_o, done_cnt_o, cnt_o, chk_o, base_s):
        gi = pl.program_id(0)

        @pl.when(gi == 0)
        def _():
            base_s[0, 0] = cnt_ref[0, 0]

        def body(_, carry):
            x, xd, th, thd, v, w, base, dcnt, chk = carry
            w2 = _lcg_next(w)
            a = srl(w2, 23) & 1
            (x3, xd3, th3, thd3, v5), d32, base = step(
                (x, xd, th, thd, v), a, base
            )
            dcnt = dcnt + d32
            chk = chk + x3
            return (x3, xd3, th3, thd3, v5, w2, base, dcnt, chk)

        init = (
            st_ref[0, 0], st_ref[1, 0], st_ref[2, 0], st_ref[3, 0],
            rng_ref[0], arng_ref[0],
            jnp.full((1, 1), base_s[0, 0], jnp.int32),
            jnp.zeros((8, L), jnp.int32),
            jnp.zeros((8, L), jnp.float32),
        )
        x, xd, th, thd, v, w, base, dcnt, chk = lax.fori_loop(
            0, num_steps, body, init
        )
        st_o[0, 0], st_o[1, 0], st_o[2, 0], st_o[3, 0] = x, xd, th, thd
        rng_o[0] = v
        arng_o[0] = w
        done_cnt_o[0] = dcnt
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
    grid = (NB,)
    kernel = _build_rollout_kernel_packed(block, num_steps)
    st4 = pl.BlockSpec((4, 1, 8, L), lambda i: (0, i, 0, 0),
                       memory_space=pltpu.VMEM)
    t3 = pl.BlockSpec((1, 8, L), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    smem11 = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    sds = jax.ShapeDtypeStruct
    call = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[smem11, st4, t3, t3],
        out_specs=(st4, t3, t3, t3, smem11, t3),
        out_shape=(
            sds((4, NB, 8, L), jnp.float32),
            sds((NB, 8, L), jnp.int32),
            sds((NB, 8, L), jnp.int32),
            sds((NB, 8, L), jnp.int32),
            sds((1, 1), jnp.int32),
            sds((NB, 8, L), jnp.float32),
        ),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )

    def rollout(grid_st, rng_i, act_rng, counter):
        # free reshapes: worlds of block b land at [b, w//L, w%L] row-major
        pk = lambda a: a.reshape(a.shape[0], NB, 8, L)
        st, rng2, arng2, dcnt, cnt, chk = call(
            counter.reshape(1, 1).astype(jnp.int32),
            pk(grid_st), pk(rng_i)[0], pk(act_rng)[0]
        )
        unp = lambda a: a.reshape(1, num_envs)
        return (st.reshape(4, num_envs), unp(rng2), unp(arng2), cnt[0, 0],
                unp(dcnt)[0], unp(chk)[0])

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
    call = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[smem11, rows(4), rows(1), rows(1)],
        out_specs=(rows(4), rows(1), rows(1), rows(1), smem11, rows(1)),
        out_shape=(
            sds((4, num_envs), jnp.float32),
            sds((1, num_envs), jnp.int32),
            sds((1, num_envs), jnp.int32),
            sds((1, num_envs), jnp.int32),
            sds((1, 1), jnp.int32),
            sds((1, num_envs), jnp.float32),
        ),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )

    def rollout(grid_st, rng_i, act_rng, counter):
        st, rng2, arng2, dcnt, cnt, chk = call(
            counter.reshape(1, 1).astype(jnp.int32), grid_st, rng_i, act_rng
        )
        return st, rng2, arng2, cnt[0, 0], dcnt[0], chk[0]

    return rollout


# per-block VMEM: the six state rows + loop temporaries; measured on the
# v5e a 131072-lane block needs a 22.9 MB scoped stack vs the 16 MB/core
# limit, and 65536 only compiles when it IS the whole batch (grid=1): with
# more than one grid step Mosaic double-buffers the in/out blocks and
# 65536 overflows by ~0.5 MB (measured @1M envs).  Blocks loop T steps
# sequentially (grid order), so prefer the largest block that fits.
PERSISTENT_MAX_BLOCK = 32_768


def fused_rollout(grid_st: Array, rng_i: Array, act_rng: Array, counter,
                  num_steps: int, block: int = PERSISTENT_MAX_BLOCK,
                  interpret: bool = False, packed=None):
    """T fused cartpole steps in ONE kernel launch (multi-block grid).

    Returns (state' [4,N], rng' [1,N], act_rng' [1,N], counter',
    done_count [N], checksum [N]).  Episode indices are allocated block-
    sequentially (see the module note above).

    ``packed=None`` auto-selects the sublane-packed kernel ([8, block/8]
    world tiles, full VPU sublane utilization — measured 3x the rows form
    at 1M envs) whenever the block shape allows; allocation order and
    results are bit-identical either way.
    """
    N = grid_st.shape[-1]
    block = min(block, N, PERSISTENT_MAX_BLOCK)
    if N % block:
        raise ValueError(
            f"persistent rollout needs num_envs divisible by the env block "
            f"({N} % {block} != 0); use a power-of-two env count or pass a "
            f"block that divides it (Mosaic also requires block % 128 == 0 "
            f"or block == num_envs on real TPU)"
        )
    if packed is None:
        packed = block % 8 == 0 and (interpret or (block // 8) % 128 == 0)
    if packed:
        return _compiled_rollout_packed(N, block, num_steps, interpret)(
            grid_st, rng_i, act_rng, counter
        )
    return _compiled_rollout(N, block, num_steps, interpret)(
        grid_st, rng_i, act_rng, counter
    )


def action_lcg_next(w: Array):
    """The in-kernel action stream, exposed for differential tests:
    w' = lcg(w); action = bit 23 of w' (top of the 24-bit uniform field)."""
    w2 = _lcg_next(w)
    return w2, (lax.shift_right_logical(w2, 23) & 1).astype(jnp.int32)


def init_action_rng(num_envs: int, seed: int = 0):
    """Per-env action-LCG seeds: TEA over a stream distinct from the episode
    stream (xor tag keeps it disjoint from any episode index)."""
    idx = jnp.arange(num_envs, dtype=jnp.int32) + jnp.int32(seed * num_envs)
    return _tea_seed(idx ^ _i32(0x5A17B0B5))[None, :]
