"""Shared benchmark/validation loop for the per-env example CLIs.

Mirrors the reference methodology (``scripts/cartpole_example.py:11-91``):
warmup 5 steps, timed random-action loop, report step*worlds/sec, optional
differential validation with an error-rate summary and ``--asserts``.
Adds an ``--isolated`` fused mode (whole rollout in one ``lax.scan`` jit) —
the TPU-native analog of the reference's ``*_isolated_example.py`` scripts.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from madrona_rl_envs_playground_tpu.core.batch import Simulator, batched_step  # noqa: E402


def base_parser(**defaults) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=defaults.get("num_envs", 32))
    p.add_argument("--num-steps", type=int, default=defaults.get("num_steps", 1000))
    p.add_argument("--validation", action="store_true")
    p.add_argument("--asserts", action="store_true")
    p.add_argument("--isolated", action="store_true",
                   help="fused lax.scan rollout (isolated sim throughput)")
    p.add_argument("--use-baseline", action="store_true",
                   help="python oracle envs under SyncVectorEnv")
    p.add_argument("--use-async", action="store_true",
                   help="python oracle envs under AsyncVectorEnv (process/env)")
    p.add_argument("--seed", type=int, default=0)
    return p


def run_baseline_loop(env_fns, num_steps: int, seed: int, use_async: bool = False):
    """Timed random-action loop over the python oracle envs (the reference's
    --use-baseline backend)."""
    import time

    from madrona_rl_envs_playground_tpu.api import AsyncVectorEnv, SyncVectorEnv

    venv = (AsyncVectorEnv if use_async else SyncVectorEnv)(env_fns)
    num_envs = venv.num_envs
    P = venv.n_players
    A = venv.env.num_actions
    rs = np.random.RandomState(seed)
    obs = venv.n_reset()
    t0 = time.perf_counter()
    for _ in range(num_steps):
        acts = jnp.asarray(rs.randint(0, A, size=(P, num_envs)).astype(np.int32))
        obs, rews, dones, _ = venv.n_step(acts)
    dt = time.perf_counter() - t0
    venv.close()
    print(f"{num_steps * num_envs / dt:,.0f} step*worlds/sec (baseline)")


def run_timed_loop(env, num_envs: int, num_steps: int, seed: int,
                   validate_fn=None, asserts: bool = False):
    """Per-step host-driven loop (matches the reference's timing bracket)."""
    sim = Simulator(env, num_envs)
    rs = np.random.RandomState(seed)
    errors = 0
    checks = 0

    # warmup (reference warms 5 steps before timing, validating them too:
    # scripts/overcooked_example.py:88-95)
    for t in range(-5, 0):
        a = rs.randint(0, env.num_actions, size=(num_envs, env.num_agents)).astype(np.int32)
        out = sim.step(jnp.asarray(a))
        if validate_fn is not None:
            bad = validate_fn(t, a, out)
            if bad and asserts:
                raise AssertionError(f"validation failed at warmup step {t}: {bad}")
    jax.block_until_ready(sim.last_out.obs)

    t0 = time.perf_counter()
    for t in range(num_steps):
        a = rs.randint(0, env.num_actions, size=(num_envs, env.num_agents)).astype(np.int32)
        out = sim.step(jnp.asarray(a))
        if validate_fn is not None:
            bad = validate_fn(t, a, out)
            checks += 1
            if bad:
                errors += 1
                if asserts:
                    raise AssertionError(f"validation failed at step {t}: {bad}")
    jax.block_until_ready(sim.last_out.obs)
    dt = time.perf_counter() - t0

    sps = num_steps * num_envs / dt
    print(f"{sps:,.0f} step*worlds/sec ({num_steps} steps x {num_envs} worlds in {dt:.3f}s)")
    if validate_fn is not None:
        print(f"Error rate: {errors / max(checks, 1)}")
    return sps


def run_isolated(env, num_envs: int, num_steps: int, seed: int, repeats: int = 3):
    """Fused rollout: one executable for the whole step loop."""
    sim = Simulator(env, num_envs)

    def body(carry, _):
        bstate, key = carry
        key, sub = jax.random.split(key)
        actions = jax.random.randint(
            sub, (num_envs, env.num_agents), 0, env.num_actions, dtype=jnp.int32
        )
        bstate, out = batched_step(env, bstate, actions)
        chk = (
            out.reward.astype(jnp.int32).sum()
            + out.obs.astype(jnp.int32).sum()
            + out.done.astype(jnp.int32).sum()
        )
        return (bstate, key), chk

    @jax.jit
    def run(bstate, key):
        (bstate, _), chks = lax.scan(body, (bstate, key), None, length=num_steps)
        return bstate, chks.sum()

    key = jax.random.PRNGKey(seed)
    bstate, s = run(sim.bstate, key)
    s.block_until_ready()

    t0 = time.perf_counter()
    outs = []
    for r in range(repeats):
        bstate, s = run(bstate, jax.random.fold_in(key, r))
        outs.append(s)
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    sps = repeats * num_steps * num_envs / dt
    print(f"{sps:,.0f} step*worlds/sec (isolated, {repeats}x{num_steps} steps x {num_envs} worlds)")
    return sps
