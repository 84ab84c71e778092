"""Deterministic evaluation of a saved MAPPO policy
(reference: train/tester.py)."""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", required=True)
    p.add_argument("--env_name", default="overcooked")
    p.add_argument("--over_layout", default="simple")
    p.add_argument("--episode_length", type=int, default=200)
    p.add_argument("--n_rollout_threads", type=int, default=32)
    p.add_argument("--hidden_size", type=int, default=64)
    p.add_argument("--layer_N", type=int, default=1)
    p.add_argument("--episodes", type=int, default=1)
    p.add_argument("--stochastic", action="store_true")
    args = p.parse_args()

    from serve_policy import make_serve_env

    from madrona_rl_envs_playground_tpu.train.mappo import MAPPOConfig, MAPPORunner

    cfg = MAPPOConfig(
        episode_length=args.episode_length,
        n_rollout_threads=args.n_rollout_threads,
        hidden_size=args.hidden_size,
        layer_N=args.layer_N,
    )
    env = make_serve_env(args)

    runner = MAPPORunner(cfg, env)
    runner.restore(args.model_dir)
    score = runner.evaluate(episodes=args.episodes, deterministic=not args.stochastic)
    print(f"average episode score: {score:.3f}")


if __name__ == "__main__":
    main()
