"""Headline benchmark: Overcooked env-steps/s on one chip.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

Methodology mirrors the reference's isolated example scripts
(``scripts/overcooked_isolated_example.py``: warmup then timed random-action
stepping, reporting step*worlds/sec), re-expressed TPU-natively: the whole
rollout is a single ``lax.scan`` under ``jit`` so XLA pipelines the step
function without host round-trips.  ``vs_baseline`` compares against the
reference's Madrona GPU number for the same env/batch class (Overcooked
cramped_room, 10k envs on an A40: 13.7M steps/s,
``src/overcooked_env/README.org:105``).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
from jax import lax

from madrona_rl_envs_playground_tpu.core.batch import Simulator, batched_step
from madrona_rl_envs_playground_tpu.envs import overcooked

REFERENCE_GPU_STEPS_PER_S = 13_700_000.0  # src/overcooked_env/README.org:105


def rollout_fn(env, num_steps: int):
    """One jitted T-step random-action rollout (the sim-only hot loop)."""

    def body(carry, _):
        bstate, key = carry
        key, sub = jax.random.split(key)
        actions = jax.random.randint(
            sub, (bstate.env_states.pos.shape[0], env.num_agents), 0, env.num_actions,
            dtype=jnp.int32,
        )
        bstate, out = batched_step(env, bstate, actions)
        # Consume every output so XLA cannot dead-code-eliminate the obs
        # encoder (the reference's exported tensors are always materialized).
        chk = (
            out.reward.astype(jnp.int32).sum()
            + out.obs.astype(jnp.int32).sum()
            + out.action_mask.astype(jnp.int32).sum()
            + out.done.astype(jnp.int32).sum()
        )
        return (bstate, key), chk

    def run(bstate, key):
        (bstate, _), chks = lax.scan(body, (bstate, key), None, length=num_steps)
        return bstate, chks.sum()

    return jax.jit(run, static_argnames=(), donate_argnums=(0,))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layout", default="cramped_room")
    p.add_argument("--num-envs", type=int, default=8192)
    p.add_argument("--num-steps", type=int, default=1000)
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    env = overcooked.make(args.layout)
    sim = Simulator(env, args.num_envs)
    run = rollout_fn(env, args.num_steps)

    key = jax.random.PRNGKey(0)
    bstate = sim.bstate
    # Warmup: compile + one timed-region dry run.
    bstate, s = run(bstate, key)
    s.block_until_ready()

    # Single timed region over all repeats: each run consumes the donated
    # state of the previous, so execution is forcibly sequential and one
    # final sync covers everything (robust to async dispatch/RPC timing).
    t0 = time.perf_counter()
    checks = []
    for r in range(args.repeats):
        bstate, s = run(bstate, jax.random.fold_in(key, r))
        checks.append(s)
    for s in checks:
        s.block_until_ready()
    dt = time.perf_counter() - t0
    best = args.repeats * args.num_steps * args.num_envs / dt

    print(
        json.dumps(
            {
                "metric": f"overcooked_{args.layout}_steps_per_s",
                "value": round(best, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(best / REFERENCE_GPU_STEPS_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
