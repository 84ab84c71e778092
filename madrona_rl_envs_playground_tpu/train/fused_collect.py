"""Megakernel-backed rollout collection for the training stacks.

The fused Pallas megakernels (``ops/overcooked_pallas.py``,
``ops/hanabi_megakernel.py``) were rollout-only: ``bench.py`` drives them,
but training collected experience through the jnp ``batched_step``.  This
module is the seam that lets ``SelfPlayPPO`` (and anything else that steps
``(BatchState, StepOutput)``) run its rollout scan on the megakernels
instead: the whole env transition + encode executes as ONE Pallas kernel per
step with every intermediate in VMEM, exactly like the reference trains
directly against the ``MWCudaExecutor`` step (``pantheonrl_extension/
vectorenv.py`` rollout over the Madrona manager step, reference
``src/overcooked_env/mgr.cpp``).

Each backend implements three pure functions usable inside a jit:

* ``pack(bstate) -> carry``     vmap-major BatchState -> lane-major kernel state
* ``step(carry, actions [N, P]) -> (carry', StepOutput)``  with the StepOutput
  bit-identical to ``batched_step``'s (proved by ``tests/test_fused_collect.py``)
* ``unpack(carry) -> bstate``   back to the vmap-major BatchState

Pack/unpack are transposes that run ONCE per train_step (not per env step),
so the training state pytree, checkpoint format, and eval path stay
unchanged; only the T-step scan body switches to the kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.batch import BatchState
from ..core.types import StepOutput

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class FusedCollect:
    """A megakernel-backed drop-in for ``batched_step`` inside a rollout scan."""

    pack: Callable[[BatchState], Any]
    step: Callable[[Any, Array], Tuple[Any, StepOutput]]
    unpack: Callable[[Any], BatchState]
    # Optional lane-resident step: step_cols(carry, actions [P, N] int32)
    # -> (carry', cols) where cols is a dict with the batch on the TPU lane
    # axis (column b = p*N + n) in the feature order the transposed policy
    # towers (models/cleanrl.apply_t) consume:
    #   obs    [F, P*N]   always
    #   state  [F', P*N]  only when state_obs differs from obs (hanabi)
    #   mask   [A, P*N] bool / active [P*N] bool  only for masked envs
    #   reward [P*N] f32, done [N] bool            always
    # SelfPlayPPO's cols rollout carries these end-to-end with zero lane
    # transposes per step.
    step_cols: Any = None


def make_fused_collect(env, num_envs: int, *, block: int = 1024,
                       interpret: Optional[bool] = None,
                       mesh=None) -> Optional[FusedCollect]:
    """Return the env's fused collector, or None when no kernel applies.

    ``interpret`` defaults to True off-TPU so the same code path is testable
    (and bit-diffable against ``batched_step``) on CPU.

    With a ``mesh``, the kernel call is wrapped in ``jax.shard_map`` over the
    env axis (``pallas_call`` does not SPMD-partition under pjit on its own).
    Only Overcooked supports this: its resets are episode-index-free, so
    per-device kernels stay bit-identical to the global run.  The other envs
    allocate episode indices in world order ACROSS the batch inside the
    kernel (SMEM running counter), which per-device kernels cannot reproduce
    without knowing later devices' reset counts — they return None here and
    mesh runs use the XLA-sharded jnp path instead.
    """
    from ..ops import pick_block

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kind = type(env).__module__.rsplit(".", 1)[-1]
    # batch sizes the kernels cannot partition (no divisor that is %128 on
    # real TPU) fall back to the jnp path instead of tripping a builder
    # assert — this is the auto-enable path, it must never hard-fail
    per_shard = num_envs if mesh is None else num_envs // max(mesh.size, 1)
    block = pick_block(per_shard, min(block, per_shard),
                       on_tpu=jax.default_backend() == "tpu")
    if block is None:
        return None
    if mesh is not None:
        if kind != "overcooked_base":
            return None
        if num_envs % mesh.size:
            return None
        return _overcooked_collect(env, num_envs, block, interpret, mesh)
    if kind == "overcooked_base":
        return _overcooked_collect(env, num_envs, block, interpret)
    if kind == "hanabi":
        return _hanabi_collect(env, num_envs, block, interpret)
    if kind == "balance_beam":
        return _balance_collect(env, num_envs, block, interpret)
    if kind == "acrobot":
        return _acrobot_collect(env, num_envs, block, interpret)
    if kind == "cartpole":
        return _cartpole_collect(env, num_envs, block, interpret)
    return None


# ---------------------------------------------------------------------------
# Overcooked
# ---------------------------------------------------------------------------

def _overcooked_collect(env, num_envs, block, interpret, mesh=None):
    from ..ops import overcooked_pallas as ok

    if not ok.fused_supported(env):
        return None
    P, A = env.num_players, env.num_actions

    if mesh is None:
        kernel_step = lambda ts, at: ok.fused_step(env, ts, at, block=block,
                                                   interpret=interpret)
    else:
        from jax.sharding import PartitionSpec as PS

        from ..parallel.mesh import ENV_AXIS

        lanes = PS(None, ENV_AXIS)              # [rows, N] leaves
        kernel_step = jax.shard_map(
            lambda ts, at: ok.fused_step(env, ts, at,
                                         block=min(block,
                                                   num_envs // mesh.size),
                                         interpret=interpret),
            mesh=mesh,
            in_specs=(lanes, lanes),            # prefix-broadcast over TState
            out_specs=(lanes, PS(None, None, None, ENV_AXIS), lanes,
                       PS(ENV_AXIS)),
            check_vma=False,
        )

    def pack(bstate: BatchState):
        return (ok.pack_state(env, bstate.env_states), bstate.episode_counter)

    def step(carry, actions: Array):
        ts, counter = carry
        ts2, obs_k, rew, done = kernel_step(
            ts, jnp.transpose(actions).astype(jnp.int32)
        )
        obs = ok.to_env_major(env, obs_k)                     # [N, P, F] int8
        out = StepOutput(
            obs=obs,
            state_obs=obs,
            action_mask=jnp.ones((num_envs, P, A), jnp.bool_),
            active=jnp.ones((num_envs, P), jnp.bool_),
            reward=jnp.transpose(rew).astype(env.reward_dtype),
            done=done,
        )
        # Overcooked resets are episode-index independent; the counter only
        # tracks world-order episode allocation (reference fetch_add order).
        counter = counter + jnp.sum(done).astype(counter.dtype)
        return (ts2, counter), out

    def unpack(carry):
        ts, counter = carry
        return BatchState(env_states=ok.unpack_state(env, ts),
                          episode_counter=counter)

    step_cols = None
    if mesh is None:
        def step_cols(carry, actions_pn: Array):
            ts, counter = carry
            ts2, obs_k, rew, done = kernel_step(ts, actions_pn)
            counter = counter + jnp.sum(done).astype(counter.dtype)
            cols = dict(
                obs=ok.to_cols(env, obs_k),
                reward=rew.astype(jnp.float32).reshape(-1),
                done=done,
            )
            return (ts2, counter), cols

    return FusedCollect(pack=pack, step=step, unpack=unpack,
                        step_cols=step_cols)


# ---------------------------------------------------------------------------
# Acrobot
# ---------------------------------------------------------------------------

def _acrobot_collect(env, num_envs, block, interpret):
    from ..ops import acrobot_pallas as ap

    def pack(bstate: BatchState):
        return ap.pack_state(bstate.env_states) + (
            bstate.episode_counter.astype(jnp.int32),)

    def step(carry, actions: Array):
        grid, steps, rng_i, counter = carry
        grid, steps, rng_i, done, counter = ap.fused_step(
            grid, steps, rng_i, counter,
            jnp.transpose(actions).astype(jnp.int32),
            block=block, interpret=interpret,
        )
        obs = jnp.transpose(grid)[:, None, :]           # [N, 1, 4]
        out = StepOutput(
            obs=obs,
            state_obs=obs,
            action_mask=jnp.ones((num_envs, 1, 3), jnp.bool_),
            active=jnp.ones((num_envs, 1), jnp.bool_),
            reward=jnp.full((num_envs, 1), -1.0, jnp.float32),
            done=done,
        )
        return (grid, steps, rng_i, counter), out

    def unpack(carry):
        grid, steps, rng_i, counter = carry
        return BatchState(env_states=ap.unpack_state(grid, steps, rng_i),
                          episode_counter=counter.astype(jnp.uint32))

    def step_cols(carry, actions_pn: Array):
        # P=1: the kernel's [4, N] grid IS the cols layout
        grid, steps, rng_i, counter = carry
        grid, steps, rng_i, done, counter = ap.fused_step(
            grid, steps, rng_i, counter, actions_pn.astype(jnp.int32),
            block=block, interpret=interpret,
        )
        cols = dict(obs=grid, reward=jnp.full((num_envs,), -1.0, jnp.float32),
                    done=done)
        return (grid, steps, rng_i, counter), cols

    return FusedCollect(pack=pack, step=step, unpack=unpack,
                        step_cols=step_cols)


# ---------------------------------------------------------------------------
# Balance Beam
# ---------------------------------------------------------------------------

def _cartpole_collect(env, num_envs, block, interpret):
    from ..ops import cartpole_pallas as cp

    def pack(bstate: BatchState):
        grid, rng_i = cp.pack_state(bstate.env_states)
        return grid, rng_i, bstate.episode_counter.astype(jnp.int32)

    def step(carry, actions: Array):
        grid, rng_i, counter = carry
        grid, rng_i, done, counter = cp.fused_step(
            grid, rng_i, counter, jnp.transpose(actions).astype(jnp.int32),
            block=block, interpret=interpret,
        )
        obs = jnp.transpose(grid)[:, None, :]          # [4,N] -> [N,1,4]
        out = StepOutput(
            obs=obs,
            state_obs=obs,
            action_mask=jnp.ones((num_envs, 1, env.num_actions), jnp.bool_),
            active=jnp.ones((num_envs, 1), jnp.bool_),
            reward=jnp.ones((num_envs, 1), jnp.float32),
            done=done,
        )
        return (grid, rng_i, counter), out

    def unpack(carry):
        grid, rng_i, counter = carry
        return BatchState(env_states=cp.unpack_state(grid, rng_i),
                          episode_counter=counter.astype(jnp.uint32))

    def step_cols(carry, actions_pn: Array):
        # P=1: the kernel's [4, N] grid IS the cols layout
        grid, rng_i, counter = carry
        grid, rng_i, done, counter = cp.fused_step(
            grid, rng_i, counter, actions_pn.astype(jnp.int32),
            block=block, interpret=interpret,
        )
        cols = dict(obs=grid, reward=jnp.ones((num_envs,), jnp.float32),
                    done=done)
        return (grid, rng_i, counter), cols

    return FusedCollect(pack=pack, step=step, unpack=unpack,
                        step_cols=step_cols)


def _balance_collect(env, num_envs, block, interpret):
    from ..ops import balance_pallas as bp

    A = env.num_actions

    def pack(bstate: BatchState):
        return bp.pack_state(bstate.env_states) + (
            bstate.episode_counter.astype(jnp.int32),)

    def step(carry, actions: Array):
        loc, obs, time, rng_i, counter = carry
        loc, obs, time, rng_i, rew, done, counter = bp.fused_step(
            loc, obs, time, rng_i, counter,
            jnp.transpose(actions).astype(jnp.int32),
            block=block, interpret=interpret,
        )
        obs_nm = jnp.transpose(obs).reshape(num_envs, 2, -1)
        out = StepOutput(
            obs=obs_nm,
            state_obs=obs_nm,
            action_mask=jnp.ones((num_envs, 2, A), jnp.bool_),
            active=jnp.ones((num_envs, 2), jnp.bool_),
            reward=jnp.broadcast_to(rew[:, None], (num_envs, 2)),
            done=done,
        )
        return (loc, obs, time, rng_i, counter), out

    def unpack(carry):
        loc, obs, time, rng_i, counter = carry
        return BatchState(env_states=bp.unpack_state(loc, obs, time, rng_i),
                          episode_counter=counter.astype(jnp.uint32))

    def step_cols(carry, actions_pn: Array):
        # kernel obs rows are (p, f)-major [2F, N]: a (p, f) axis swap
        # gives [F, 2N] columns with b = p*N + n; lanes untouched
        loc, obs, time, rng_i, counter = carry
        loc, obs, time, rng_i, rew, done, counter = bp.fused_step(
            loc, obs, time, rng_i, counter, actions_pn.astype(jnp.int32),
            block=block, interpret=interpret,
        )
        F = obs.shape[0] // 2
        cols = dict(
            obs=obs.reshape(2, F, num_envs).transpose(1, 0, 2)
            .reshape(F, 2 * num_envs),
            reward=jnp.broadcast_to(
                rew[None, :].astype(jnp.float32),
                (2, num_envs)).reshape(2 * num_envs),
            done=done,
        )
        return (loc, obs, time, rng_i, counter), cols

    return FusedCollect(pack=pack, step=step, unpack=unpack,
                        step_cols=step_cols)


# ---------------------------------------------------------------------------
# Hanabi
# ---------------------------------------------------------------------------

def _hanabi_collect(env, num_envs, block, interpret):
    from ..ops import hanabi_megakernel as hk

    if not hk.fused_supported(env):
        return None
    P = env.players
    from ..ops import pick_block

    # the hanabi kernel's VMEM envelope caps the block at 512; re-validate
    # divisibility after the clamp (caller validated the pre-clamp block)
    block = pick_block(num_envs, min(block, 512),
                       on_tpu=jax.default_backend() == "tpu")
    if block is None:
        return None

    def pack(bstate: BatchState):
        return (hk.pack_state(env, bstate.env_states),
                bstate.episode_counter.astype(jnp.int32))

    def step(carry, actions: Array):
        d, counter = carry
        d2, rew, done, counter2 = hk.fused_step(
            env, d, counter, jnp.transpose(actions).astype(jnp.int32),
            block=block, interpret=interpret,
        )
        nmaj = lambda a: jnp.transpose(a, (2, 0, 1))          # [P,B,N]->[N,P,B]
        obs = nmaj(d2["obs"])
        out = StepOutput(
            obs=obs,
            state_obs=jnp.concatenate([obs, nmaj(d2["own"])], axis=-1),
            action_mask=nmaj(d2["mask"]) != 0,
            active=d2["scal"][hk._CUR][:, None] == jnp.arange(P)[None, :],
            reward=jnp.broadcast_to(
                rew[:, None], (num_envs, P)).astype(env.reward_dtype),
            done=done,
        )
        return (d2, counter2), out

    def unpack(carry):
        d, counter = carry
        return BatchState(env_states=hk.unpack_state(env, d),
                          episode_counter=counter.astype(jnp.uint32))

    def step_cols(carry, actions_pn: Array):
        """Lane-resident hanabi step: obs/state/mask leave the kernel's
        [P, bits, N] layout via a (P, bits) axis swap only — the env batch
        never crosses the lane axis."""
        d, counter = carry
        d2, rew, done, counter2 = hk.fused_step(
            env, d, counter, actions_pn.astype(jnp.int32),
            block=block, interpret=interpret,
        )
        N = d2["scal"].shape[-1]
        tocols = lambda a: jnp.transpose(a, (1, 0, 2)).reshape(
            a.shape[1], P * N)                                # [bits, P*N]
        obs_c = tocols(d2["obs"])
        cols = dict(
            obs=obs_c,
            state=jnp.concatenate([obs_c, tocols(d2["own"])], axis=0),
            mask=tocols(d2["mask"]) != 0,
            active=(d2["scal"][hk._CUR][None, :]
                    == jnp.arange(P)[:, None]).reshape(P * N),
            reward=jnp.broadcast_to(
                rew[None, :].astype(jnp.float32), (P, N)).reshape(P * N),
            done=done,
        )
        return (d2, counter2), cols

    return FusedCollect(pack=pack, step=step, unpack=unpack,
                        step_cols=step_cols)
