"""Ablation bisect of the SelfPlayPPO rollout scan cost (r5 profiling aid).

The phase profiler (profile_train_step.py) showed the published-config
rollout at ~1.3 ms per scan step when the sim-only per-step kernel does the
env transition in ~10 us.  This script times stripped variants of the scan
body to attribute the difference: env-only, env+policy, env+policy+store,
jnp vs pallas collect, and policy-only.
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from madrona_rl_envs_playground_tpu.core.batch import batched_step
from madrona_rl_envs_playground_tpu.envs import overcooked as overcooked1
from madrona_rl_envs_playground_tpu.models.common import dist_log_prob, dist_sample
from madrona_rl_envs_playground_tpu.train.fused_collect import make_fused_collect
from madrona_rl_envs_playground_tpu.train.selfplay import SelfPlayConfig, SelfPlayPPO


def timeit(fn, *args, repeats=5):
    res = fn(*args)
    jax.device_get(min(jax.tree_util.tree_leaves(res),
                       key=lambda l: getattr(l, "size", 1)))
    t0 = time.perf_counter()
    for _ in range(repeats):
        res = fn(*args)
    jax.device_get(min(jax.tree_util.tree_leaves(res),
                       key=lambda l: getattr(l, "size", 1)))
    return (time.perf_counter() - t0) / repeats


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=8192)
    p.add_argument("--num-steps", type=int, default=64)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--bf16", action="store_true", default=True)
    args = p.parse_args()

    env = overcooked1.make("cramped_room")
    N, P, T = args.num_envs, env.num_agents, args.num_steps
    cfg = SelfPlayConfig(num_steps=T, hidden=args.hidden,
                         num_layers=args.layers, use_bf16=args.bf16)
    ppo = SelfPlayPPO(env, N, cfg, seed=0)
    state = ppo.state
    fused = ppo._fused
    params = state["params"]
    out0 = state["out"]
    key0 = state["key"]

    results = {}

    # 1. env-only scan, pallas collect, random int actions, consume done sum
    def env_only_pallas(bstate, key):
        c0 = fused.pack(bstate)

        def body(carry, _):
            c, key = carry
            key, k = jax.random.split(key)
            a = jax.random.randint(k, (N, P), 0, env.num_actions, jnp.int32)
            c2, out = fused.step(c, a)
            return (c2, key), out.done.sum()

        (c, _), chk = jax.lax.scan(body, (c0, key), None, length=T)
        return chk.sum()

    results["env_only_pallas"] = timeit(jax.jit(env_only_pallas),
                                        state["bstate"], key0)

    # 2. env-only, jnp path
    def env_only_jnp(bstate, key):
        def body(carry, _):
            b, key = carry
            key, k = jax.random.split(key)
            a = jax.random.randint(k, (N, P), 0, env.num_actions, jnp.int32)
            b2, out = batched_step(env, b, a)
            return (b2, key), out.done.sum()

        (b, _), chk = jax.lax.scan(body, (bstate, key), None, length=T)
        return chk.sum()

    results["env_only_jnp"] = timeit(jax.jit(env_only_jnp),
                                     state["bstate"], key0)

    # 3. policy-only scan (static obs, no env)
    obs_flat = out0.obs.reshape(N * P, -1)
    mask_flat = out0.action_mask.reshape(N * P, -1)

    def policy_only(params, key):
        def body(key, _):
            key, k = jax.random.split(key)
            logits, value = ppo.net.apply(params, obs_flat, obs_flat,
                                          mask_flat)
            a = dist_sample(k, logits)
            lp = dist_log_prob(logits, a)
            return key, (a.sum(), lp.sum(), value.sum())

        _, (s1, s2, s3) = jax.lax.scan(body, key, None, length=T)
        return s1.sum() + s2.sum() + s3.sum()

    results["policy_only"] = timeit(jax.jit(policy_only), params, key0)

    # 4. env + policy, no trajectory store
    def env_policy(bstate, params, key):
        c0 = fused.pack(bstate)

        def body(carry, _):
            c, out, key = carry
            key, k = jax.random.split(key)
            a, lp, v = ppo._policy(params, k, out)
            c2, out2 = fused.step(c, a)
            return (c2, out2, key), (lp.sum() + v.sum())

        (c, out, _), chk = jax.lax.scan(body, (c0, out0, key), None, length=T)
        return chk.sum()

    results["env_policy_nostore"] = timeit(jax.jit(env_policy),
                                           state["bstate"], params, key0)

    # 5. the real rollout (env + policy + store)
    results["full_rollout"] = timeit(jax.jit(ppo._rollout), state)

    # 6. env + store obs only (no policy): isolates the stacking writes
    def env_store(bstate, key):
        c0 = fused.pack(bstate)

        def body(carry, _):
            c, key = carry
            key, k = jax.random.split(key)
            a = jax.random.randint(k, (N, P), 0, env.num_actions, jnp.int32)
            c2, out = fused.step(c, a)
            return (c2, key), {"obs": out.obs.reshape(N * P, -1),
                               "rew": out.reward.reshape(N * P)}

        (c, _), tr = jax.lax.scan(body, (c0, key), None, length=T)
        return tr["obs"][-1].astype(jnp.int32).sum() + tr["rew"].sum()

    results["env_store_obs"] = timeit(jax.jit(env_store),
                                      state["bstate"], key0)

    print(f"config: N={N} T={T} hidden={args.hidden} layers={args.layers} "
          f"bf16={args.bf16}")
    for k, v in results.items():
        print(f"{k:22s} {v*1e3:8.2f} ms total  {v*1e6/T:8.1f} us/step")


if __name__ == "__main__":
    main()
