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


def _build_kernel(block: int):
    B = block
    f32 = jnp.float32

    def kernel(cnt_ref, loc_ref, obs_ref, t_ref, rng_ref, act_ref,
               loc_o, obs_o, t_o, rng_o, rew_o, done_o, cnt_o, base_s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            base_s[0, 0] = cnt_ref[0, 0]

        a0, a1 = act_ref[0:1], act_ref[1:2]

        def mv(a):
            # MOVES = [-2, -1, 1, 2]
            return jnp.where(
                a == 0, -2, jnp.where(a == 1, -1, jnp.where(a == 2, 1, 2))
            ).astype(jnp.int32)

        l0 = loc_ref[0:1] + mv(a0)
        l1 = loc_ref[1:2] + mv(a1)
        t2 = t_ref[:] - 1

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
        lane = lax.broadcasted_iota(jnp.int32, (1, B), 1)
        ps = d32
        k = 1
        while k < B:
            ps = ps + jnp.where(lane >= k, pltpu.roll(ps, shift=k, axis=1), 0)
            k *= 2
        total = jnp.sum(d32, axis=1, keepdims=True)
        base = base_s[0, 0]
        eps = base + (ps - d32)
        base_s[0, 0] = base + total[0, 0]

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
        loc_o[0:1] = nl0
        loc_o[1:2] = nl1
        t_o[:] = nt
        rng_o[:] = jnp.where(done, v2, rng_ref[:])

        # rolling-history obs (sim.cpp:106-118); fresh episodes zero the
        # history and write slot 0/3 + time
        zero = jnp.zeros_like(l0)
        for p, own, other in ((0, nl0, nl1), (1, nl1, nl0)):
            r = p * (2 * TIME + 1)
            obs_o[r:r + 1] = own + BUFFER
            obs_o[r + 1:r + 2] = jnp.where(done, zero, obs_ref[r:r + 1])
            obs_o[r + 2:r + 3] = jnp.where(done, zero, obs_ref[r + 1:r + 2])
            obs_o[r + 3:r + 4] = other + BUFFER
            obs_o[r + 4:r + 5] = jnp.where(done, zero, obs_ref[r + 3:r + 4])
            obs_o[r + 5:r + 6] = jnp.where(done, zero, obs_ref[r + 4:r + 5])
            obs_o[r + 6:r + 7] = nt

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
