"""All-env benchmark in ONE process (single device claim).

The tunneled TPU occasionally hangs on a fresh process's device grant, so
serial per-env `bench.py` invocations are unreliable; this driver runs every
env's fused rollout inside one process and prints one JSON line per env.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402

from bench import REFERENCE_GPU, build_rollout, make_env  # noqa: E402


CONFIGS = [
    ("overcooked", None, 8192, 1000),
    ("overcooked2", None, 8192, 1000),
    ("hanabi", None, 8192, 500),
    ("cartpole", None, 65536, 1000),
    ("balance", None, 32768, 1000),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--backend", default="auto", choices=["auto", "jnp", "pallas"])
    args = p.parse_args()

    for name, layout, num_envs, num_steps in CONFIGS:
        env = make_env(name, layout, None)
        key = jax.random.PRNGKey(0)
        bstate, out, run = build_rollout(env, name, num_envs, num_steps,
                                         backend=args.backend)
        bstate, out, s = run(bstate, out, key)
        float(s)  # value fetch = trustworthy barrier through the tunnel
        times = []
        for r in range(args.repeats):
            t0 = time.perf_counter()
            bstate, out, s = run(bstate, out, jax.random.fold_in(key, r))
            float(s)
            times.append(time.perf_counter() - t0)
        times.sort()
        sps = num_steps * num_envs / times[len(times) // 2]
        print(
            json.dumps(
                {
                    "metric": f"{name}_steps_per_s",
                    "value": round(sps, 1),
                    "unit": "env-steps/s",
                    "num_envs": num_envs,
                    "vs_baseline": round(sps / REFERENCE_GPU[name], 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
