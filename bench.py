"""Headline benchmark: env-steps/s for the batch simulators on one chip.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

Methodology mirrors the reference's isolated example scripts
(``scripts/*_isolated_example.py``: warmup then timed random-action stepping,
reporting step*worlds/sec), re-expressed TPU-natively: the whole rollout is a
single ``lax.scan`` under ``jit`` so XLA pipelines the step function without
host round-trips.  Turn-based envs (Hanabi) sample uniformly over the legal
moves of the active seat in-graph.

**Consumption discipline.**  The reference's isolated scripts ``copy_`` every
exported tensor — observations, agent states, action masks, rewards, dones —
device-to-device INSIDE the timed loop (e.g.
``scripts/overcooked_isolated_example.py:60-64``), i.e. they pay a full HBM
read+write of the obs every step.  Here every per-step path (jnp and kernel
alike) consumes every output through a full checksum — a full HBM read of
obs/mask/reward/done per step, strictly less consumer traffic than the
reference's read+write copy, never more work for the simulator.  The
``persistent`` whole-rollout kernels instead consume the full observation
encode with in-VMEM accumulators (the obs never round-trips HBM at all);
that is a different — fused-consumer — discipline, reported as its own
column in README and labeled on the JSON line via the backend choice.
Timing covers all repeats under one final sync (robust to async dispatch).

``vs_baseline`` compares against the reference's **best** Madrona GPU number
across all of its published batch sizes (``BASELINE.md``) — the A40 at its
own peak scale, so the ratio never flatters us by picking a weak reference
row: Overcooked cramped_room 14.1M steps/s (@100k envs,
``src/overcooked_env/README.org:105``), Overcooked2 19.1M (@10k), Hanabi
15.7M (@100k), Cartpole 1.37B (@1M), Balance 399M (@1M).
"""

from __future__ import annotations

import argparse
import json
import os
import time

# Persistent compilation cache on the axon tunnel ONLY (remote compiles run
# 2-10 min there; same policy and rationale as tests/conftest.py — a plain
# local backend gets no cache).
if os.environ.get("JAX_PLATFORMS", "") == "axon":
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache/jax"),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax
import jax.numpy as jnp
from jax import lax

from madrona_rl_envs_playground_tpu.core.batch import Simulator, batched_step

# the reference's best A40 number over all its published batch sizes
# (BASELINE.md: overcooked @100k, overcooked2 @10k, hanabi @100k,
# cartpole @1M, balance @1M)
REFERENCE_GPU = {
    "overcooked": 14_100_000.0,
    "overcooked2": 19_100_000.0,
    "hanabi": 15_700_000.0,
    "cartpole": 1_370_000_000.0,
    "balance": 399_000_000.0,
}


def make_env(name: str, layout: str, num_players):
    from madrona_rl_envs_playground_tpu.envs import (
        balance_beam,
        cartpole,
        hanabi,
        overcooked,
        overcooked2,
    )

    if name == "overcooked":
        return overcooked.make(layout or "cramped_room", num_players=num_players)
    if name == "overcooked2":
        return overcooked2.make(layout or "simple", num_players=num_players)
    if name == "hanabi":
        return hanabi.Env(**hanabi.CONFIGS[layout or "full"])
    if name == "cartpole":
        return cartpole.Env()
    if name == "balance":
        return balance_beam.Env()
    raise ValueError(name)


def rollout_fn(env, num_envs: int, num_steps: int, masked: bool):
    """Fused T-step rollout.  The previous StepOutput rides the scan carry
    only for mask-sampled (turn-based) envs — for the rest, carrying the obs
    would force an extra HBM round-trip per step that no consumer needs."""

    def body(carry, _):
        if masked:
            bstate, out_prev, key = carry
        else:
            bstate, key = carry
        key, sub = jax.random.split(key)
        if masked:
            logits = jnp.where(out_prev.action_mask, 0.0, -jnp.inf)
            actions = jax.random.categorical(sub, logits, axis=-1).astype(jnp.int32)
        else:
            actions = jax.random.randint(
                sub, (num_envs, env.num_agents), 0, env.num_actions, dtype=jnp.int32
            )
        bstate, out = batched_step(env, bstate, actions)
        chk = (
            out.reward.astype(jnp.int32).sum()
            + out.obs.astype(jnp.int32).sum()
            + out.action_mask.astype(jnp.int32).sum()
            + out.done.astype(jnp.int32).sum()
        )
        return ((bstate, out, key) if masked else (bstate, key)), chk

    def run(bstate, out, key):
        if masked:
            (bstate, out, _), chks = lax.scan(
                body, (bstate, out, key), None, length=num_steps
            )
        else:
            (bstate, _), chks = lax.scan(body, (bstate, key), None, length=num_steps)
        return bstate, out, chks.sum()

    return jax.jit(run)


def pallas_rollout_fn(env, num_envs: int, num_steps: int, block: int):
    """Fused-megakernel T-step rollout (ops/overcooked_pallas): the whole
    step incl. obs encode is ONE kernel, the full [P, C, S, N] int8 obs
    buffer materialized to HBM each step exactly like the reference's
    exported tensors.  Consumption: full checksum of obs + reward + done —
    a complete HBM read of every output per step, matching (at less traffic
    than) the reference isolated bench's per-step ``copy_`` of the same
    tensors (``scripts/overcooked_isolated_example.py:60-64`` pays
    read+write)."""
    from madrona_rl_envs_playground_tpu.ops.overcooked_pallas import fused_step

    P = env.num_agents
    interp = jax.default_backend() != "tpu"

    def body(carry, _):
        ts, key = carry
        key, sub = jax.random.split(key)
        actions = jax.random.randint(
            sub, (P, num_envs), 0, env.num_actions, dtype=jnp.int32
        )
        ts, obs, rew, done = fused_step(env, ts, actions, block=block,
                                        interpret=interp)
        chk = (obs.astype(jnp.int32).sum()
               + rew.astype(jnp.int32).sum()
               + done.astype(jnp.int32).sum())
        return (ts, key), chk

    def run(ts, _out, key):
        (ts, _), chks = lax.scan(body, (ts, key), None, length=num_steps)
        return ts, None, chks.sum()

    return jax.jit(run)


def overcooked_persistent_rollout_fn(env, num_envs: int, num_steps: int,
                                     block: int):
    """Whole-rollout-in-one-kernel Overcooked (ops/overcooked_pallas
    ``fused_rollout``): T steps per launch per env block, state resident in
    VMEM, actions drawn in-kernel from a per-(env, player) LCG, and the
    full obs encode consumed each step by an in-VMEM checksum instead of
    an HBM store (README's methodology table labels this column).  Multi-
    block: overcooked's horizon reset is episode-index-free."""
    from madrona_rl_envs_playground_tpu.ops.overcooked_pallas import (
        fused_rollout,
    )

    interp = jax.default_backend() != "tpu"

    def run(carry, _out, key):
        ts, arng = carry
        ts, arng, dcnt, chk = fused_rollout(
            env, ts, arng, num_steps, block=block, interpret=interp
        )
        return (ts, arng), None, (chk.sum() + dcnt.sum()).astype(jnp.float32)

    return jax.jit(run)


def cartpole_pallas_rollout_fn(num_envs: int, num_steps: int, block: int):
    """Fused cartpole megakernel rollout (ops/cartpole_pallas): the state
    rows ARE the obs export, reward is the constant 1/step; the checksum
    consumes the full state (all four obs rows) + done, matching the
    reference isolated bench's per-step ``copy_`` of the exported tensors
    (``scripts/cartpole_isolated_example.py:51-55`` pays read+write)."""
    from madrona_rl_envs_playground_tpu.ops.cartpole_pallas import fused_step

    interp = jax.default_backend() != "tpu"

    def body(carry, _):
        grid, rng_i, cnt, key = carry
        key, sub = jax.random.split(key)
        acts = jax.random.randint(sub, (1, num_envs), 0, 2, jnp.int32)
        grid, rng_i, done, cnt = fused_step(grid, rng_i, cnt, acts, block=block,
                                            interpret=interp)
        chk = grid.sum() + done.sum()
        return (grid, rng_i, cnt, key), chk

    def run(carry, _out, key):
        (grid, rng_i, cnt, _), chks = lax.scan(
            body, carry + (key,), None, length=num_steps
        )
        return (grid, rng_i, cnt), None, chks[-1] + cnt.astype(jnp.float32)

    return jax.jit(run)


def cartpole_persistent_rollout_fn(num_envs: int, num_steps: int,
                                   block: int):
    """Whole-rollout-in-one-kernel cartpole (ops/cartpole_pallas
    ``fused_rollout``): T steps per launch, state resident in VMEM, actions
    drawn in-kernel from a per-env LCG (the uniform random-action discipline
    of the reference's isolated bench, generated on-device — README's
    methodology table labels this column).  The kernel emits the done count
    and an obs checksum, consumed like the per-step paths' checksums."""
    from madrona_rl_envs_playground_tpu.ops.cartpole_pallas import fused_rollout

    interp = jax.default_backend() != "tpu"

    def run(carry, _out, key):
        grid, rng_i, arng, cnt = carry
        grid, rng_i, arng, cnt, dcnt, chk = fused_rollout(
            grid, rng_i, arng, cnt, num_steps, block=block, interpret=interp
        )
        return (grid, rng_i, arng, cnt), None, (
            chk.sum() + dcnt.astype(jnp.float32).sum()
        )

    return jax.jit(run)


def balance_persistent_rollout_fn(num_envs: int, num_steps: int,
                                  block: int):
    """Whole-rollout-in-one-kernel Balance Beam (ops/balance_pallas
    ``fused_rollout``): T steps per launch per block, in-kernel per-seat
    action LCG, obs/reward/done consumed via in-VMEM per-env accumulators
    (README methodology column)."""
    from madrona_rl_envs_playground_tpu.ops.balance_pallas import (
        fused_rollout,
    )

    interp = jax.default_backend() != "tpu"

    def run(carry, _out, key):
        loc, obs, time, rng_i, cnt, arng = carry
        loc, obs, time, rng_i, arng, cnt, dcnt, chk = fused_rollout(
            loc, obs, time, rng_i, cnt, arng, num_steps, block=block,
            interpret=interp
        )
        return (loc, obs, time, rng_i, cnt, arng), None, (
            chk.sum() + dcnt.astype(jnp.float32).sum()
        )

    return jax.jit(run)


def balance_pallas_rollout_fn(num_envs: int, num_steps: int, block: int):
    """Fused Balance Beam megakernel rollout (ops/balance_pallas): move +
    history obs + reward + reset in one kernel; checksum consumes obs +
    reward + done like the jnp path."""
    from madrona_rl_envs_playground_tpu.ops.balance_pallas import fused_step

    interp = jax.default_backend() != "tpu"

    def body(carry, _):
        loc, obs, time, rng_i, cnt, key = carry
        key, sub = jax.random.split(key)
        acts = jax.random.randint(sub, (2, num_envs), 0, 4, jnp.int32)
        loc, obs, time, rng_i, rew, done, cnt = fused_step(
            loc, obs, time, rng_i, cnt, acts, block=block, interpret=interp
        )
        chk = obs.sum() + rew.sum().astype(jnp.int32) + done.sum()
        return (loc, obs, time, rng_i, cnt, key), chk

    def run(carry, _out, key):
        (loc, obs, time, rng_i, cnt, _), chks = lax.scan(
            body, carry + (key,), None, length=num_steps
        )
        return (loc, obs, time, rng_i, cnt), None, chks.sum()

    return jax.jit(run)


def hanabi_persistent_rollout_fn(env, num_envs: int, num_steps: int,
                                 block: int):
    """Whole-rollout-in-one-kernel Hanabi (ops/hanabi_megakernel
    ``fused_rollout``): T steps per launch per env block, game state
    resident in VMEM, actions drawn in-kernel from a per-env LCG uniform
    over the ACTIVE seat's legal moves, and the full obs/own/mask encodes
    consumed every step by per-seat in-VMEM sum accumulators carrying the
    exact stale-blended buffer sums (fused-consumer discipline — README's
    methodology column)."""
    from madrona_rl_envs_playground_tpu.ops.hanabi_megakernel import (
        fused_rollout,
    )

    interp = jax.default_backend() != "tpu"

    def run(carry, _out, key):
        d, cnt, w = carry
        d, cnt, w, dcnt, chk = fused_rollout(
            env, d, cnt, w, num_steps, block=block, interpret=interp
        )
        return (d, cnt, w), None, (chk.sum() + dcnt.sum()).astype(jnp.float32)

    return jax.jit(run)


def hanabi_pallas_rollout_fn(env, num_envs: int, num_steps: int, block: int):
    """Fused-megakernel hanabi rollout: mask-legal uniform sampling from the
    kernel-produced mask buffers (the mask is a full-width consumer every
    step) plus a full checksum of obs + own-hand + reward + done — every
    exported buffer is read back per step, matching (at less traffic than)
    the reference isolated bench's per-step ``copy_`` of observations /
    agent states / masks / rewards / dones
    (``scripts/hanabi_isolated_example.py:67-73`` pays read+write)."""
    from madrona_rl_envs_playground_tpu.ops.hanabi_megakernel import fused_step

    interp = jax.default_backend() != "tpu"

    def body(carry, _):
        d, cnt, key = carry
        key, sub = jax.random.split(key)
        # mask [P, A, N] int8 -> per-seat legal sample (jnp path samples all
        # seats each step the same way)
        logits = jnp.where(jnp.transpose(d["mask"], (2, 0, 1)) != 0, 0.0, -jnp.inf)
        actions = jax.random.categorical(sub, logits, axis=-1).astype(jnp.int32)
        d, rew, done, cnt = fused_step(env, d, cnt, actions.T, block=block,
                                       interpret=interp)
        chk = (d["obs"].astype(jnp.int32).sum()
               + d["own"].astype(jnp.int32).sum()
               + rew.sum() + done.sum())
        return (d, cnt, key), chk

    def run(carry, _out, key):
        (d, cnt, _), chks = lax.scan(body, carry + (key,), None, length=num_steps)
        return (d, cnt), None, chks.sum()

    return jax.jit(run)


def _persistent_ok(env, name: str, num_envs: int) -> bool:
    """Whether a persistent whole-rollout kernel exists and can partition
    this batch (used by ``--backend best`` to pick the fastest discipline
    without ever raising)."""
    from madrona_rl_envs_playground_tpu.ops import pick_block

    if name in ("overcooked", "overcooked2"):
        from madrona_rl_envs_playground_tpu.ops.overcooked_pallas import (
            fused_supported,
        )

        return fused_supported(env) and pick_block(num_envs, 1024) is not None
    if name == "cartpole":
        from madrona_rl_envs_playground_tpu.ops.cartpole_pallas import (
            PERSISTENT_MAX_BLOCK,
        )

        # round 4: the sublane-packed persistent kernel ([8, block/8] world
        # tiles) un-retired multi-block persistence — 8.1B steps/s @1M vs
        # the rows form's 1.69B and the per-step kernel's 2.29B
        return pick_block(num_envs, PERSISTENT_MAX_BLOCK) is not None
    if name == "balance":
        from madrona_rl_envs_playground_tpu.ops.balance_pallas import (
            PERSISTENT_MAX_BLOCK,
        )

        return pick_block(num_envs, PERSISTENT_MAX_BLOCK) is not None
    if name == "hanabi":
        from madrona_rl_envs_playground_tpu.ops.hanabi_megakernel import (
            PERSISTENT_MAX_BLOCK,
            fused_supported,
        )

        return (fused_supported(env)
                and pick_block(num_envs, PERSISTENT_MAX_BLOCK) is not None)
    return False


def build_rollout(env, name: str, num_envs: int, num_steps: int,
                  backend: str = "auto", block: int = 1024):
    """(initial_state, initial_out, jitted_run) with backend selection:
    the fused megakernels where supported (default-on on TPU, measured
    faster), the jnp path elsewhere.

    Explicit ``--backend pallas/persistent`` NEVER silently falls through
    to a different implementation — the backend label on the JSON line
    must match the kernel that actually ran — and kernel env-blocks are
    validated up front (``ops.pick_block``): auto mode falls back to jnp
    for batch sizes the kernels cannot partition, explicit modes exit
    with guidance instead of tripping an assert inside a kernel builder.
    """
    from madrona_rl_envs_playground_tpu.ops import pick_block

    on_tpu = jax.default_backend() == "tpu"
    from_best = backend == "best"
    if from_best:
        # the fastest *supported* discipline for this env/batch: the
        # persistent whole-rollout kernel where one exists (fused-consumer
        # column), else the per-step kernel via auto.  Never raises — falls
        # through exactly like auto when a kernel cannot partition the batch
        # (including a user --block the kernels cannot honor).
        backend = "auto"
        if (on_tpu and _persistent_ok(env, name, num_envs)
                and pick_block(num_envs, block, on_tpu=True) is not None):
            backend = "persistent"
    explicit = not from_best and backend in ("pallas", "persistent")

    def need_block(desired, what):
        b = pick_block(num_envs, desired, on_tpu=on_tpu)
        if b is None and explicit:
            raise SystemExit(
                f"--backend {backend}: {what} has no valid kernel env-block "
                f"for num_envs={num_envs} (needs a divisor, and a multiple "
                f"of 128 lanes on TPU unless it equals num_envs); use a "
                f"power-of-two env count or --backend jnp"
            )
        return b  # None => auto falls back to the jnp path

    def unsupported(msg):
        if explicit:
            raise SystemExit(f"--backend {backend}: {msg}; use --backend "
                             f"auto/jnp")
        return None

    if backend == "persistent" and name == "hanabi":
        from madrona_rl_envs_playground_tpu.ops.hanabi_megakernel import (
            PERSISTENT_MAX_BLOCK,
            fused_supported,
            init_action_rng,
            init_packed,
        )

        if not fused_supported(env):
            raise SystemExit(
                "--backend persistent: the hanabi kernels cover 2-player "
                "configs only; use --backend jnp"
            )
        b = need_block(min(block, PERSISTENT_MAX_BLOCK),
                       "hanabi persistent rollout")
        if b is not None:  # None only via --backend best: fall through
            d, cnt = init_packed(env, num_envs)
            carry = (d, cnt, init_action_rng(num_envs))
            return carry, None, hanabi_persistent_rollout_fn(
                env, num_envs, num_steps, b
            )
        backend = "auto"
    if name == "hanabi" and backend != "jnp":
        from madrona_rl_envs_playground_tpu.ops.hanabi_megakernel import (
            fused_supported,
            init_packed,
        )

        if not fused_supported(env):
            unsupported("the hanabi megakernel covers 2-player configs "
                        "only (the reference's NUM_MOVES=20 envelope)")
        elif backend == "pallas" or on_tpu:
            b = need_block(min(block, num_envs), "hanabi megakernel")
            if b is not None:
                carry = init_packed(env, num_envs)
                return carry, None, hanabi_pallas_rollout_fn(
                    env, num_envs, num_steps, b
                )
    if name == "balance" and backend == "persistent":
        from madrona_rl_envs_playground_tpu.ops.balance_pallas import (
            PERSISTENT_MAX_BLOCK,
            init_action_rng,
            init_packed,
        )

        b = need_block(PERSISTENT_MAX_BLOCK, "balance persistent rollout")
        if b is not None:
            loc, obs, time, rng_i, cnt = init_packed(num_envs)
            carry = (loc, obs, time, rng_i, cnt, init_action_rng(num_envs))
            return carry, None, balance_persistent_rollout_fn(num_envs,
                                                              num_steps, b)
        backend = "auto"
    if name == "balance" and backend != "jnp" and (
        backend == "pallas" or on_tpu
    ):
        b = need_block(min(max(block, 8192), num_envs), "balance megakernel")
        if b is not None:
            from madrona_rl_envs_playground_tpu.ops.balance_pallas import (
                init_packed,
            )

            carry = init_packed(num_envs)
            return carry, None, balance_pallas_rollout_fn(
                num_envs, num_steps, b
            )
    if name == "cartpole" and backend == "persistent":
        from madrona_rl_envs_playground_tpu.ops.cartpole_pallas import (
            PERSISTENT_MAX_BLOCK,
            init_action_rng,
            init_packed,
        )

        b = need_block(PERSISTENT_MAX_BLOCK, "cartpole persistent rollout")
        if b is not None:
            g0, r0, c0 = init_packed(num_envs)
            carry = (g0, r0, init_action_rng(num_envs), c0)
            return carry, None, cartpole_persistent_rollout_fn(num_envs,
                                                               num_steps, b)
        backend = "auto"
    if name == "cartpole" and backend != "jnp" and (
        backend == "pallas" or on_tpu
    ):
        b = need_block(min(max(block, 8192), num_envs), "cartpole megakernel")
        if b is not None:
            from madrona_rl_envs_playground_tpu.ops.cartpole_pallas import (
                init_packed,
            )

            carry = init_packed(num_envs)
            return carry, None, cartpole_pallas_rollout_fn(
                num_envs, num_steps, b
            )
    if name in ("overcooked", "overcooked2") and backend == "persistent":
        from madrona_rl_envs_playground_tpu.ops.overcooked_pallas import (
            fused_supported,
            init_action_rng,
            init_packed,
        )

        if not fused_supported(env):
            raise SystemExit(
                "--backend persistent requires a fused-kernel-supported "
                "layout (<=100 cells, <=4 players)"
            )
        b = need_block(min(block, num_envs), "overcooked persistent rollout")
        if b is not None:
            carry = (init_packed(env, num_envs),
                     init_action_rng(num_envs, env.num_agents))
            return carry, None, overcooked_persistent_rollout_fn(
                env, num_envs, num_steps, b
            )
        backend = "auto"
    if name in ("overcooked", "overcooked2") and backend != "jnp":
        from madrona_rl_envs_playground_tpu.ops.overcooked_pallas import (
            fused_supported,
            init_packed,
        )

        if not fused_supported(env):
            unsupported("the overcooked megakernel covers <=100-cell, "
                        "<=4-player layouts (many_player-scale grids use "
                        "the jnp gather path)")
        elif backend == "pallas" or on_tpu:
            b = need_block(min(block, num_envs), "overcooked megakernel")
            if b is not None:
                bstate = init_packed(env, num_envs)
                return bstate, None, pallas_rollout_fn(
                    env, num_envs, num_steps, b
                )
    sim = Simulator(env, num_envs)
    return sim.bstate, sim.last_out, rollout_fn(
        env, num_envs, num_steps, masked=(name == "hanabi")
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="overcooked",
                   choices=list(REFERENCE_GPU))
    p.add_argument("--layout", default=None,
                   help="layout (overcooked*) or config name (hanabi)")
    p.add_argument("--num-players", type=int, default=None)
    # default = the overcooked persistent kernel's measured peak scale
    # (542M steps/s @524k on the v5e; see README's table for the full sweep)
    p.add_argument("--num-envs", type=int, default=524288)
    p.add_argument("--num-steps", type=int, default=1000)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--backend", default="best",
                   choices=["best", "auto", "jnp", "pallas", "persistent"],
                   help="step implementation; best (default) = persistent "
                   "kernel where one exists on TPU, else auto; auto = "
                   "per-step pallas megakernel on TPU, jnp elsewhere; "
                   "persistent = whole rollout in one kernel launch, "
                   "in-kernel action LCG, obs consumed via in-VMEM checksum")
    p.add_argument("--block", type=int, default=1024,
                   help="pallas megakernel env-block (lanes per grid step)")
    p.add_argument("--profile", default=None,
                   help="write a jax.profiler trace to this directory")
    args = p.parse_args()

    env = make_env(args.env, args.layout, args.num_players)
    key = jax.random.PRNGKey(0)
    bstate, out, run = build_rollout(
        env, args.env, args.num_envs, args.num_steps,
        backend=args.backend, block=args.block,
    )
    bstate, out, s = run(bstate, out, key)  # warmup/compile
    float(s)

    if args.profile:
        jax.profiler.start_trace(args.profile)

    # Per-repeat timing with a device->host VALUE fetch as the barrier: through
    # the remote-tunnel runtime, block_until_ready on a small output has been
    # observed to return before the executable actually finishes, so only a
    # data dependency (reading the result) is a trustworthy sync.  Median of
    # repeats rejects stragglers from tunnel RPC jitter.
    times = []
    for r in range(args.repeats):
        t0 = time.perf_counter()
        bstate, out, s = run(bstate, out, jax.random.fold_in(key, r))
        float(s)
        times.append(time.perf_counter() - t0)

    if args.profile:
        jax.profiler.stop_trace()

    times.sort()
    dt = times[len(times) // 2]
    sps = args.num_steps * args.num_envs / dt
    tag = args.layout or {"overcooked": "cramped_room", "overcooked2": "simple",
                          "hanabi": "full"}.get(args.env, "")
    metric = f"{args.env}{'_' + tag if tag else ''}_steps_per_s"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(sps, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(sps / REFERENCE_GPU[args.env], 4),
            }
        )
    )


if __name__ == "__main__":
    main()
