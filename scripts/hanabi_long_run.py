"""Long-horizon Hanabi self-play training with a logged learning curve.

The round-1 evidence for Hanabi learning was a 60-update smoke; this driver
is the multi-hour credibility artifact the reference implies with its own
training scripts (reference ``scripts/hanabi_train.py:113-160`` and the
``hanabi_train_experience``/``hanabi_train_timed`` budget variants): fused
centralized self-play (``SelfPlayPPO``) on the full 2-player config, with

* a JSONL learning curve (update, env-steps, wall-clock, train metrics,
  periodic deterministic eval score) written to ``--run-dir``,
* periodic checkpointing + ``--resume`` so the run can be interrupted
  (the TPU is single-tenant here) and continued,
* deterministic greedy self-play eval measuring the mean completed-episode
  score (Hanabi reward is the score delta, so an episode's summed seat-0
  reward IS its final score).

Run (TPU):
    python scripts/hanabi_long_run.py --run-dir docs/runs/hanabi_long \
        --num-envs 1024 --max-seconds 10800
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def build_eval(trainer, env, num_envs: int, num_steps: int):
    import jax
    import jax.numpy as jnp

    from madrona_rl_envs_playground_tpu.core.batch import (
        batched_reset,
        batched_step,
    )
    from madrona_rl_envs_playground_tpu.models.cleanrl import CleanRLNetwork

    N, P = num_envs, env.num_agents

    def eval_fn(params):
        bstate, out = batched_reset(env, N, start_episode=50_000_000)

        def step_fn(carry, _):
            bstate, out, acc, total, cnt = carry
            obs = out.obs.reshape(N * P, -1).astype(jnp.float32)
            st = out.state_obs.reshape(N * P, -1).astype(jnp.float32)
            mask = out.action_mask.reshape(N * P, -1)
            logits, _ = trainer.net.apply(params, obs, st, mask)
            action = jnp.argmax(logits, axis=-1).astype(jnp.int32).reshape(N, P)
            bstate2, out2 = batched_step(env, bstate, action)
            # Hanabi reward = score delta, delivered on the acting seat's
            # step; seat streams share the team score, so seat 0's summed
            # reward over an episode is the episode score.
            acc = acc + out2.reward[:, 0].astype(jnp.float32)
            done = out2.done
            total = total + jnp.where(done, acc, 0.0).sum()
            cnt = cnt + done.sum()
            acc = jnp.where(done, 0.0, acc)
            return (bstate2, out2, acc, total, cnt), None

        (bstate, out, acc, total, cnt), _ = jax.lax.scan(
            step_fn,
            (bstate, out, jnp.zeros((N,)), jnp.float32(0.0), jnp.int32(0)),
            None,
            length=num_steps,
        )
        return total / jnp.maximum(cnt, 1).astype(jnp.float32), cnt

    return jax.jit(eval_fn)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="full",
                   choices=["full", "small", "very_small"])
    p.add_argument("--num-envs", type=int, default=1024)
    p.add_argument("--num-steps", type=int, default=128)
    p.add_argument("--lr", type=float, default=2.5e-4)
    p.add_argument("--hidden", type=int, default=512)
    p.add_argument("--layers", type=int, default=3)
    p.add_argument("--minibatches", type=int, default=4)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--updates", type=int, default=1_000_000)
    p.add_argument("--max-seconds", type=float, default=None)
    p.add_argument("--run-dir", default="docs/runs/hanabi_long")
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--eval-every", type=int, default=100)
    p.add_argument("--save-every", type=int, default=100)
    p.add_argument("--eval-envs", type=int, default=256)
    p.add_argument("--eval-steps", type=int, default=256)
    p.add_argument("--resume", action="store_true")
    args = p.parse_args()

    from madrona_rl_envs_playground_tpu.envs import hanabi
    from madrona_rl_envs_playground_tpu.train import SelfPlayConfig, SelfPlayPPO

    env = hanabi.Env(**hanabi.CONFIGS[args.config])
    cfg = SelfPlayConfig(
        num_steps=args.num_steps, lr=args.lr, hidden=args.hidden,
        num_layers=args.layers, num_minibatches=args.minibatches,
    )
    trainer = SelfPlayPPO(env, num_envs=args.num_envs, cfg=cfg, seed=args.seed)
    eval_fn = build_eval(trainer, env, args.eval_envs, args.eval_steps)

    os.makedirs(args.run_dir, exist_ok=True)
    ckpt = os.path.join(args.run_dir, "checkpoint.pkl")
    curve = os.path.join(args.run_dir, "metrics.jsonl")

    start_update, elapsed0 = 0, 0.0
    if args.resume and os.path.exists(ckpt):
        trainer.load(ckpt)
        if os.path.exists(curve):
            with open(curve) as f:
                for line in f:
                    rec = json.loads(line)
                    start_update = max(start_update, rec.get("update", 0))
                    elapsed0 = max(elapsed0, rec.get("wall_s", 0.0))
        print(f"resumed from update {start_update} ({elapsed0:.0f}s elapsed)")

    steps_per_update = args.num_envs * args.num_steps
    t0 = time.time()
    f = open(curve, "a")
    try:
        for u in range(start_update, args.updates):
            trainer.state, metrics = trainer.train_step(trainer.state)
            now = time.time()
            if args.max_seconds is not None and now - t0 > args.max_seconds:
                break
            if (u + 1) % args.log_every == 0 or u == start_update:
                rec = {
                    "update": u + 1,
                    "env_steps": (u + 1) * steps_per_update,
                    "wall_s": elapsed0 + (now - t0),
                    **{k: float(v) for k, v in metrics.items()},
                }
                if (u + 1) % args.eval_every == 0 or u == start_update:
                    score, n_eps = eval_fn(trainer.state["params"])
                    rec["eval_score"] = float(score)
                    rec["eval_episodes"] = int(n_eps)
                f.write(json.dumps(rec) + "\n")
                f.flush()
                print(
                    f"update {rec['update']} steps={rec['env_steps']:,} "
                    f"wall={rec['wall_s']:.0f}s "
                    f"rew={rec['mean_step_reward']:.4f} "
                    f"ent={rec['entropy']:.3f}"
                    + (f" eval_score={rec['eval_score']:.3f}" if "eval_score" in rec else "")
                )
            if (u + 1) % args.save_every == 0:
                trainer.save(ckpt)
    finally:
        trainer.save(ckpt)
        score, n_eps = eval_fn(trainer.state["params"])
        final = {
            "final": True,
            "eval_score": float(score),
            "eval_episodes": int(n_eps),
            "wall_s": elapsed0 + (time.time() - t0),
        }
        f.write(json.dumps(final) + "\n")
        f.close()
        print("final deterministic eval:", final)


if __name__ == "__main__":
    main()
