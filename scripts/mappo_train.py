"""MAPPO self-play training CLI (reference: train/trainer.py).

Reproduces the Colab configuration on Overcooked2 ``simple``:
800 envs, episode 200, hidden 64 x 1 layer, lr 1e-2, ppo_epoch 7
(``overcooked_compiled_colab.ipynb`` args cell).
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from madrona_rl_envs_playground_tpu.train.mappo import (  # noqa: E402
    MAPPORunner,
    config_from_args,
    get_config,
)


def main():
    parser = get_config()
    parser.set_defaults(
        n_rollout_threads=800,
        episode_length=200,
        hidden_size=64,
        layer_N=1,
        lr=1e-2,
        critic_lr=1e-2,
        ppo_epoch=7,
        num_env_steps=8e6,
    )
    args = parser.parse_args()
    cfg = config_from_args(args)

    from madrona_rl_envs_playground_tpu.envs import balance_beam, overcooked, overcooked2

    if args.env_name == "overcooked":
        env = overcooked2.make(args.over_layout, horizon=cfg.episode_length)
    elif args.env_name == "overcooked-new":
        env = overcooked.make(args.over_layout, horizon=cfg.episode_length)
    elif args.env_name == "balance":
        env = balance_beam.Env()
    else:
        raise ValueError(args.env_name)

    runner = MAPPORunner(cfg, env, run_dir=args.run_dir)
    if args.model_dir:
        runner.restore(args.model_dir)
    runner.run()
    score = runner.evaluate(episodes=1, deterministic=True)
    print(f"deterministic eval score: {score:.3f}")


if __name__ == "__main__":
    main()
