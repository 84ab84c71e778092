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


# (env, layout, num_envs, num_steps, backend) — the README table sweep.
# "persistent" rows = whole-rollout-in-kernel with in-kernel action LCG
# (README's methodology note); "auto" = per-step megakernel on TPU.
CONFIGS = [
    ("overcooked", None, 8192, 1000, "auto"),
    ("overcooked", None, 8192, 1000, "persistent"),
    ("overcooked", None, 131072, 1000, "auto"),
    ("overcooked", None, 131072, 1000, "persistent"),
    ("overcooked", None, 524288, 1000, "persistent"),
    ("overcooked2", None, 8192, 1000, "auto"),
    ("overcooked2", None, 8192, 1000, "persistent"),
    ("overcooked2", None, 131072, 1000, "auto"),
    ("overcooked2", None, 131072, 1000, "persistent"),
    ("hanabi", None, 8192, 500, "auto"),
    ("hanabi", None, 8192, 1000, "persistent"),
    ("hanabi", None, 131072, 500, "auto"),
    ("hanabi", None, 131072, 1000, "persistent"),
    ("hanabi", None, 524288, 1000, "persistent"),
    # many-player rows (reference src/overcooked_env/README.org:115-121;
    # A40: P=2 1.24M, P=8 289k, P=30 73.1k at 1000 envs) — jnp path, the
    # kernels cover <=4-player layouts
    ("overcooked", "many_player_layout", 1024, 200, "jnp", 2),
    ("overcooked", "many_player_layout", 1024, 200, "jnp", 8),
    ("overcooked", "many_player_layout", 1024, 200, "jnp", 30),
    ("cartpole", None, 8192, 1000, "persistent"),
    ("cartpole", None, 65536, 1000, "auto"),
    ("cartpole", None, 1048576, 1000, "auto"),
    ("balance", None, 32768, 1000, "auto"),
    ("balance", None, 32768, 1000, "persistent"),
    ("balance", None, 1048576, 1000, "auto"),
    ("balance", None, 1048576, 1000, "persistent"),
    ("cartpole", None, 1048576, 1000, "persistent"),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--backend", default=None,
                   choices=["auto", "jnp", "pallas", "persistent"],
                   help="override every row's backend")
    p.add_argument("--env", default=None, help="only rows for this env")
    args = p.parse_args()

    for row in CONFIGS:
        name, layout, num_envs, num_steps, row_backend = row[:5]
        players = row[5] if len(row) > 5 else None
        if args.env and name != args.env:
            continue
        backend = args.backend or row_backend
        try:
            env = make_env(name, layout, players)
            key = jax.random.PRNGKey(0)
            bstate, out, run = build_rollout(env, name, num_envs, num_steps,
                                             backend=backend)
            bstate, out, s = run(bstate, out, key)
            float(s)  # value fetch = trustworthy barrier through the tunnel
            times = []
            for r in range(args.repeats):
                t0 = time.perf_counter()
                bstate, out, s = run(bstate, out, jax.random.fold_in(key, r))
                float(s)
                times.append(time.perf_counter() - t0)
        except Exception as e:  # keep the sweep alive past one OOM/compile
            print(json.dumps({"metric": f"{name}_steps_per_s",
                              "num_envs": num_envs, "backend": backend,
                              "error": str(e)[:200]}), flush=True)
            continue
        times.sort()
        sps = num_steps * num_envs / times[len(times) // 2]
        # many-player rows compare against their own A40 numbers
        # (src/overcooked_env/README.org:115-121), not the cramped_room one
        a40 = {2: 1_240_000.0, 8: 289_000.0, 30: 73_100.0}.get(
            players, REFERENCE_GPU[name]) if players else REFERENCE_GPU[name]
        rec = {
            "metric": f"{name}_steps_per_s",
            "value": round(sps, 1),
            "unit": "env-steps/s",
            "num_envs": num_envs,
            "backend": backend,
            "vs_baseline": round(sps / a40, 4),
        }
        if layout:
            rec["layout"] = layout
        if players:
            rec["players"] = players
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
