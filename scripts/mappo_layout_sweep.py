"""MAPPO self-play learning sweep across the classic Overcooked layouts.

The reference publishes a converged score only for ``simple`` (the Colab:
234 deterministic / 230.7 stochastic, seed 1, ~2 min on a T4 —
``overcooked_compiled_colab.ipynb``); its test matrix for the v2 env names
``{simple, random1, scenario1_s}`` (``src/overcooked2_env/README.org``).
This sweep trains the same Colab configuration (800 envs, episode 200,
hidden 64, lr 1e-2, ppo_epoch 7, 8M env-steps) on every classic layout —
the overcooked_ai five (simple=cramped_room, random1=coordination_ring,
random0=forced_coordination, random3=counter_circuit,
unident_s=asymmetric_advantages) plus scenario1_s — in ONE process (the
tunneled TPU grants the device to a single process; sequential CLI chains
hang, see docs/WALKTHROUGH.md).

Writes ``docs/runs/mappo_layout_sweep.json`` + a markdown table.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

LAYOUTS = ["simple", "random1", "random0", "random3", "unident_s",
           "scenario1_s"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layouts", nargs="*", default=LAYOUTS)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--num-env-steps", type=float, default=8e6)
    p.add_argument("--out", default=None,
                   help="output JSON (default docs/runs/mappo_layout_sweep.json)")
    args = p.parse_args()

    from madrona_rl_envs_playground_tpu.envs import overcooked2
    from madrona_rl_envs_playground_tpu.train.mappo import (
        MAPPOConfig, MAPPORunner,
    )

    results = {}
    for layout in args.layouts:
        cfg = MAPPOConfig(
            n_rollout_threads=800, episode_length=200, hidden_size=64,
            layer_N=1, lr=1e-2, critic_lr=1e-2, ppo_epoch=7,
            num_env_steps=args.num_env_steps, seed=args.seed,
        )
        env = overcooked2.make(layout, horizon=cfg.episode_length)
        runner = MAPPORunner(cfg, env)
        t0 = time.time()
        runner.run()
        wall = time.time() - t0
        det = runner.evaluate(episodes=1, deterministic=True)
        sto = runner.evaluate(episodes=3, deterministic=False)
        results[layout] = {
            "deterministic": round(float(det), 2),
            "stochastic_avg3": round(float(sto), 2),
            "train_wall_s": round(wall, 1),
            "env_steps": int(args.num_env_steps),
            "seed": args.seed,
        }
        print(f"[{layout}] det={det:.1f} stoch={sto:.1f} wall={wall:.0f}s",
              flush=True)

    out = args.out or os.path.join(
        os.path.dirname(__file__), "..", "docs", "runs",
        "mappo_layout_sweep.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
