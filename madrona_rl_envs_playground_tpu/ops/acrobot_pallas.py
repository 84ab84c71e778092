"""Fused Acrobot step megakernel (Pallas TPU).

One kernel: the RK4 integration of the acrobot dynamics, angle wrap /
velocity clamp, termination (height or 500-step truncation), world-order
episode allocation, and the bit-exact TEA+LCG reset draws — semantics
source ``envs/acrobot.py`` / reference ``src/acrobat_env/sim.cpp:68-206``.
Completes fused-kernel coverage of the classic-control pair (cartpole +
acrobot).

Lane-major rows as in ``cartpole_pallas``: state ``[4, N]`` f32
(theta1, theta2, omega1, omega2), ``steps [1, N]`` i32, ``rng [1, N]`` i32,
with the SMEM running counter + in-block lane prefix sum for episode
indices.  Obs export == the four state rows (zero-copy, like cartpole).

Bit-exactness vs the jnp ``batched_step`` is enforced by
``tests/test_acrobot_pallas.py``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..envs.acrobot import State
from .cartpole_pallas import _i32, _lcg_next, _tea_seed, _unif

Array = jnp.ndarray

_PI = math.pi


def pack_state(vstate: State):
    grid = jnp.stack([vstate.theta1, vstate.theta2, vstate.omega1,
                      vstate.omega2])
    steps = vstate.steps[None, :].astype(jnp.int32)
    rng_i = lax.bitcast_convert_type(vstate.rng_v, jnp.int32)[None, :]
    return grid, steps, rng_i


def unpack_state(grid: Array, steps: Array, rng_i: Array) -> State:
    return State(
        theta1=grid[0], theta2=grid[1], omega1=grid[2], omega2=grid[3],
        steps=steps[0],
        rng_v=lax.bitcast_convert_type(rng_i[0], jnp.uint32),
    )


def _make_step(block: int):
    B = block
    f32 = jnp.float32

    def ds_dt(t1, t2, w1, w2, torque):
        # m1=m2=l1=1, lc1=lc2=0.5, I1=I2=1 ("from the book"), f32 order
        # matching envs/acrobot._ds_dt exactly
        c2 = jnp.cos(t2)
        d1 = f32(0.25) + (f32(1.0) + f32(0.25) + c2) + f32(2.0)
        d2 = (f32(0.25) + f32(0.5) * c2) + f32(1.0)
        phi2 = f32(0.5) * f32(9.8) * jnp.cos(t1 + t2 - f32(_PI / 2.0))
        phi1 = (
            -f32(0.5) * w2 * w2 * jnp.sin(t2)
            - f32(2.0) * f32(0.5) * w2 * w1 * jnp.sin(t2)
            + (f32(0.5) + f32(1.0)) * f32(9.8) * jnp.cos(t1 - f32(_PI / 2.0))
            + phi2
        )
        a2 = (
            torque + d2 / d1 * phi1 - f32(0.5) * w1 * w1 * jnp.sin(t2) - phi2
        ) / (f32(0.25) + f32(1.0) - d2 * d2 / d1)
        a1 = -(d2 * a2 + phi1) / d1
        return (w1, w2, a1, a2)

    def step(state, a, base):
        """Shared rows-form step (per-step kernel + persistent rollout):
        state = (t1, t2, w1, w2, steps, rng), base a [1, 1] running episode
        counter.  Returns (state', d32, base')."""
        t1p, t2p, w1p, w2p, steps_p, rng = state
        s = (t1p, t2p, w1p, w2p)
        torque = jnp.where(a == 0, f32(-1.0), jnp.where(a == 1, f32(0.0),
                                                        f32(1.0)))
        dt = f32(0.2)

        def axpy(y, k, c):
            return tuple(yi + c * ki for yi, ki in zip(y, k))

        k1 = ds_dt(*s, torque)
        k2 = ds_dt(*axpy(s, k1, dt / 2.0), torque)
        k3 = ds_dt(*axpy(s, k2, dt / 2.0), torque)
        k4 = ds_dt(*axpy(s, k3, dt), torque)
        t1, t2, w1, w2 = tuple(
            y + dt / f32(6.0) * (p + f32(2.0) * q + f32(2.0) * r + t)
            for y, p, q, r, t in zip(s, k1, k2, k3, k4)
        )

        wrap = lambda x: jnp.remainder(x + f32(_PI), f32(2.0 * _PI)) - f32(_PI)
        t1, t2 = wrap(t1), wrap(t2)
        w1 = jnp.clip(w1, f32(-4.0 * _PI), f32(4.0 * _PI))
        w2 = jnp.clip(w2, f32(-9.0 * _PI), f32(9.0 * _PI))
        steps = steps_p + 1
        done = (-jnp.cos(t1) - jnp.cos(t2 + t1) > f32(1.0)) | (steps > 500)
        d32 = done.astype(jnp.int32)

        # world-order rank within the block (see cartpole_pallas)
        lane = lax.broadcasted_iota(jnp.int32, (1, B), 1)
        ps = d32
        k = 1
        while k < B:
            ps = ps + jnp.where(lane >= k, pltpu.roll(ps, shift=k, axis=1), 0)
            k *= 2
        total = jnp.sum(d32, axis=1, keepdims=True)
        eps = base + (ps - d32)
        base2 = base + total[0:1, 0:1]

        # fresh episode: TEA seed + 4 uniform draws in [-0.1, 0.1)
        sd = _tea_seed(eps)
        v1 = _lcg_next(sd)
        v2 = _lcg_next(v1)
        v3 = _lcg_next(v2)
        v4 = _lcg_next(v3)
        lo, rg = f32(-0.1), f32(0.2)
        f = [lo + _unif(v) * rg for v in (v1, v2, v3, v4)]

        nstate = (
            jnp.where(done, f[0], t1),
            jnp.where(done, f[1], t2),
            jnp.where(done, f[2], w1),
            jnp.where(done, f[3], w2),
            jnp.where(done, 0, steps),
            jnp.where(done, v4, rng),
        )
        return nstate, d32, base2

    return step


def _build_kernel(block: int):
    step = _make_step(block)

    def kernel(cnt_ref, st_ref, steps_ref, rng_ref, act_ref,
               st_o, steps_o, rng_o, done_o, cnt_o, base_s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            base_s[0, 0] = cnt_ref[0, 0]

        state = (st_ref[0:1], st_ref[1:2], st_ref[2:3], st_ref[3:4],
                 steps_ref[:], rng_ref[:])
        base = jnp.full((1, 1), base_s[0, 0], jnp.int32)
        (t1, t2, w1, w2, steps, rng), d32, base = step(state, act_ref[:],
                                                       base)
        base_s[0, 0] = base[0, 0]

        st_o[0:1], st_o[1:2], st_o[2:3], st_o[3:4] = t1, t2, w1, w2
        steps_o[:] = steps
        rng_o[:] = rng
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
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem11, rows(4), rows(1), rows(1), rows(1)],
        out_specs=(rows(4), rows(1), rows(1), rows(1), smem11),
        out_shape=(
            sds((4, num_envs), jnp.float32),
            sds((1, num_envs), jnp.int32),
            sds((1, num_envs), jnp.int32),
            sds((1, num_envs), jnp.int32),
            sds((1, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )

    def step(grid_st, steps, rng_i, counter, actions_t):
        st, sp, rng2, done, cnt = call(
            counter.reshape(1, 1).astype(jnp.int32), grid_st, steps, rng_i,
            actions_t,
        )
        return st, sp, rng2, done[0] != 0, cnt[0, 0]

    return step


def fused_step(grid_st, steps, rng_i, counter, actions_t,
               block: int = 2048, interpret: bool = False):
    """One fused acrobot step.  actions_t [1, N] i32 in {0,1,2}.  Returns
    (state' [4,N], steps' [1,N], rng' [1,N], done [N] bool, counter').
    state' doubles as the obs export; reward is the constant -1 per step."""
    N = grid_st.shape[-1]
    block = min(block, N)
    return _compiled_step(N, block, interpret)(grid_st, steps, rng_i,
                                               counter, actions_t)


def init_packed(num_envs: int, start_episode: int = 0):
    from ..envs.acrobot import Env

    eps = jnp.arange(num_envs, dtype=jnp.uint32) + jnp.uint32(start_episode)
    st = jax.vmap(Env().init_core)(eps)
    return pack_state(st) + (jnp.int32(start_episode + num_envs),)


# ---------------------------------------------------------------------------
# persistent-rollout kernel: T steps in ONE launch (multi-block SMEM carry)
# ---------------------------------------------------------------------------
# Same design as cartpole/balance: in-kernel per-env action LCG (3 torques:
# action = (u24 * 3) >> 24), per-env obs(=state)+done accumulator rows,
# block-sequential episode allocation via the SMEM counter carry.


def action_lcg_next(w: Array, num_actions: int = 3):
    w2 = _lcg_next(w)
    u24 = lax.shift_right_logical(w2, 8) & jnp.int32(0x00FFFFFF)
    return w2, lax.shift_right_logical(u24 * num_actions, 24)


def init_action_rng(num_envs: int, seed: int = 0) -> Array:
    idx = jnp.arange(num_envs, dtype=jnp.int32) + jnp.int32(seed * num_envs)
    return _tea_seed(idx ^ _i32(0x0AC20B07))[None, :]


def _build_rollout_kernel(block: int, num_steps: int):
    B = block
    step = _make_step(block)

    def kernel(cnt_ref, st_ref, steps_ref, rng_ref, arng_ref,
               st_o, steps_o, rng_o, arng_o, dcnt_o, cnt_o, chk_o, base_s):
        gi = pl.program_id(0)

        @pl.when(gi == 0)
        def _():
            base_s[0, 0] = cnt_ref[0, 0]

        init = (
            st_ref[0:1], st_ref[1:2], st_ref[2:3], st_ref[3:4],
            steps_ref[:], rng_ref[:], arng_ref[:],
            jnp.full((1, 1), base_s[0, 0], jnp.int32),
            jnp.zeros((1, B), jnp.int32),
            jnp.zeros((1, B), jnp.float32),
        )

        def body(_, carry):
            t1, t2, w1, w2, steps, rng, w, base, dcnt, chk = carry
            w = _lcg_next(w)
            u24 = lax.shift_right_logical(w, 8) & jnp.int32(0x00FFFFFF)
            a = lax.shift_right_logical(u24 * 3, 24)
            (t1, t2, w1, w2, steps, rng), d32, base = step(
                (t1, t2, w1, w2, steps, rng), a, base
            )
            chk = chk + t1 + t2 + w1 + w2 + d32.astype(jnp.float32)
            dcnt = dcnt + d32
            return (t1, t2, w1, w2, steps, rng, w, base, dcnt, chk)

        out = lax.fori_loop(0, num_steps, body, init)
        t1, t2, w1, w2, steps, rng, w, base, dcnt, chk = out
        st_o[0:1], st_o[1:2], st_o[2:3], st_o[3:4] = t1, t2, w1, w2
        steps_o[:] = steps
        rng_o[:] = rng
        arng_o[:] = w
        dcnt_o[:] = dcnt
        chk_o[:] = chk
        base_s[0, 0] = base[0, 0]

        @pl.when(gi == pl.num_programs(0) - 1)
        def _():
            cnt_o[0, 0] = base_s[0, 0]

    return kernel


PERSISTENT_MAX_BLOCK = 32_768


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
        in_specs=[smem11, rows(4), rows(1), rows(1), rows(1)],
        out_specs=(rows(4), rows(1), rows(1), rows(1), rows(1), smem11,
                   rows(1)),
        out_shape=(
            sds((4, num_envs), jnp.float32),
            sds((1, num_envs), jnp.int32),
            sds((1, num_envs), jnp.int32),
            sds((1, num_envs), jnp.int32),
            sds((1, num_envs), jnp.int32),
            sds((1, 1), jnp.int32),
            sds((1, num_envs), jnp.float32),
        ),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )

    def rollout(grid_st, steps, rng_i, counter, act_rng):
        st, sp, rng2, arng2, dcnt, cnt, chk = call(
            counter.reshape(1, 1).astype(jnp.int32), grid_st, steps, rng_i,
            act_rng,
        )
        return st, sp, rng2, arng2, cnt[0, 0], dcnt[0], chk[0]

    return rollout


def fused_rollout(grid_st, steps, rng_i, counter, act_rng, num_steps: int,
                  block: int = PERSISTENT_MAX_BLOCK,
                  interpret: bool = False):
    """T fused acrobot steps in ONE launch (multi-block grid); episode
    indices allocate block-sequentially.  Returns (state', steps', rng',
    act_rng', counter', done_count [N], checksum [N])."""
    N = grid_st.shape[-1]
    block = min(block, N, PERSISTENT_MAX_BLOCK)
    if N % block:
        raise ValueError(
            f"persistent rollout needs num_envs divisible by the env block "
            f"({N} % {block} != 0); use a power-of-two env count or pass a "
            f"block that divides it"
        )
    return _compiled_rollout(N, block, num_steps, interpret)(
        grid_st, steps, rng_i, counter, act_rng
    )
