"""CleanRL PPO on Cartpole (reference: scripts/cartpole_train_torch.py)."""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=32)
    p.add_argument("--total-timesteps", type=int, default=200_000)
    p.add_argument("--num-steps", type=int, default=128)
    p.add_argument("--lr", type=float, default=2.5e-4)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--run-dir", default=None)
    p.add_argument("--use-baseline", action="store_true",
                   help="python oracle envs under SyncVectorEnv "
                        "(reference: scripts/cartpole_train_numpy.py)")
    args = p.parse_args()

    from madrona_rl_envs_playground_tpu.api import SyncVectorEnv, TpuVecEnv
    from madrona_rl_envs_playground_tpu.envs import cartpole
    from madrona_rl_envs_playground_tpu.train import CleanPPOAgent

    if args.use_baseline:
        from madrona_rl_envs_playground_tpu.api.spaces import Box, Discrete
        from madrona_rl_envs_playground_tpu.oracles.adapters import CartpoleOracleEnv

        venv = SyncVectorEnv(
            [lambda i=i: CartpoleOracleEnv(seed=args.seed + i)
             for i in range(args.num_envs)]
        )
        venv.observation_space = Box(-float("inf"), float("inf"), (4,))
        venv.share_observation_space = venv.observation_space
        venv.action_space = Discrete(2)
    else:
        env = cartpole.Env()
        venv = TpuVecEnv(env, num_envs=args.num_envs)
    num_updates = args.total_timesteps // (args.num_steps * args.num_envs)
    agent = CleanPPOAgent(
        venv, "cartpole", num_updates=num_updates, num_steps=args.num_steps,
        lr=args.lr, seed=args.seed, run_dir=args.run_dir, verbose=args.run_dir is not None,
    )
    obs = venv.reset()
    for _ in range(num_updates * args.num_steps):
        act = agent.get_action(obs)
        obs, rew, done, _ = venv.step(act)
        agent.update(rew, done)
        if agent._last_metrics is not None and agent.step == 1:
            m = agent._last_metrics
            print(
                f"update {agent.updates - 1}/{num_updates} "
                f"return={float(m['mean_return']):.2f} "
                f"pg={float(m['pg_loss']):.4f} ent={float(m['entropy']):.3f}"
            )


if __name__ == "__main__":
    main()
