"""Weak-scaling efficiency of the fused rollout across mesh sizes.

On real hardware this measures multi-chip scaling (BASELINE target: >=85%
efficiency 1 host -> N hosts); on a dev box run it against the virtual CPU
mesh to validate the sharded code path:

    PYTHONPATH=. JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/scaling_bench.py --envs-per-device 512
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="overcooked")
    p.add_argument("--layout", default=None)
    p.add_argument("--envs-per-device", type=int, default=2048)
    p.add_argument("--num-steps", type=int, default=200)
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    from bench import make_env, rollout_fn
    from madrona_rl_envs_playground_tpu.core.batch import batched_reset
    from madrona_rl_envs_playground_tpu.parallel.mesh import make_mesh, shard_batch_pytree

    env = make_env(args.env, args.layout, None)
    ndev_all = len(jax.devices())
    sizes = []
    d = 1
    while d <= ndev_all:
        sizes.append(d)
        d *= 2

    base_rate = None
    for nd in sizes:
        mesh = make_mesh(nd)
        N = args.envs_per_device * nd
        bstate, out = batched_reset(env, N)
        bstate = shard_batch_pytree(bstate, mesh)
        out = shard_batch_pytree(out, mesh)
        run = rollout_fn(env, N, args.num_steps, masked=args.env == "hanabi")
        key = jax.device_put(jax.random.PRNGKey(0),
                             jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
        bstate, out, s = run(bstate, out, key)
        s.block_until_ready()
        t0 = time.perf_counter()
        checks = []
        for r in range(args.repeats):
            bstate, out, s = run(bstate, out, jax.random.fold_in(key, r))
            checks.append(s)
        for s in checks:
            s.block_until_ready()
        dt = time.perf_counter() - t0
        rate = args.repeats * args.num_steps * N / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * nd)
        print(f"devices={nd:3d} envs={N:7d} {rate:15,.0f} steps/s  efficiency={eff:.1%}")


if __name__ == "__main__":
    main()
