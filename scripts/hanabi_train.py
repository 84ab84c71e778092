"""Hanabi CleanRL PPO training (reference: scripts/hanabi_train.py,
with the fixed-budget variants folded in: ``--total-timesteps`` is the
``hanabi_train_experience`` fixed-experience mode, ``--max-seconds`` the
``hanabi_train_timed`` fixed-wall-clock mode).

Decentralized mode (default): two independent ``CleanPPOAgent``s — ego and
partner — each learning from its own turn-based trajectory with active-mask
GAE.  ``--single`` switches to fused centralized self-play (one policy for
both seats; the reference's ``hanabi_train_single``/``hanabi_agent.py`` path).
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="full", choices=["full", "small", "very_small"])
    p.add_argument("--num-envs", type=int, default=128)
    p.add_argument("--total-timesteps", type=int, default=500_000)
    p.add_argument("--num-steps", type=int, default=128)
    p.add_argument("--lr", type=float, default=2.5e-4)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--single", action="store_true", help="centralized self-play")
    p.add_argument("--max-seconds", type=float, default=None,
                   help="stop after this much wall-clock (hanabi_train_timed)")
    p.add_argument("--run-dir", default=None)
    args = p.parse_args()

    from madrona_rl_envs_playground_tpu.envs import hanabi

    env = hanabi.Env(**hanabi.CONFIGS[args.config])
    num_updates = max(args.total_timesteps // (args.num_steps * args.num_envs), 1)

    if args.single:
        from madrona_rl_envs_playground_tpu.train import SelfPlayConfig, SelfPlayPPO

        cfg = SelfPlayConfig(num_steps=args.num_steps, lr=args.lr)
        trainer = SelfPlayPPO(env, num_envs=args.num_envs, cfg=cfg, seed=args.seed)
        trainer.run(num_updates, log_every=max(num_updates // 20, 1))
        return

    from madrona_rl_envs_playground_tpu.api import TpuVecEnv
    from madrona_rl_envs_playground_tpu.train import CleanPPOAgent

    venv = TpuVecEnv(env, num_envs=args.num_envs)
    partner = CleanPPOAgent(
        venv, "hanabi-partner", num_updates=num_updates, num_steps=args.num_steps,
        lr=args.lr, seed=args.seed + 1, verbose=False,
    )
    venv.add_partner_agent(partner)
    ego = CleanPPOAgent(
        venv, "hanabi-ego", num_updates=num_updates, num_steps=args.num_steps,
        lr=args.lr, seed=args.seed, run_dir=args.run_dir,
        verbose=args.run_dir is not None,
    )
    import time

    obs = venv.reset()
    t0 = time.time()
    for _ in range(num_updates * args.num_steps):
        if args.max_seconds is not None and time.time() - t0 > args.max_seconds:
            break
        act = ego.get_action(obs)
        obs, rew, done, _ = venv.step(act)
        ego.update(rew, done)
        if ego._last_metrics is not None and ego.step == 1:
            m = ego._last_metrics
            print(
                f"update {ego.updates - 1}/{num_updates} "
                f"return={float(m['mean_return']):.2f} ent={float(m['entropy']):.3f}"
            )


if __name__ == "__main__":
    main()
