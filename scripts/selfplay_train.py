"""Fused self-play PPO on any env — the TPU-native fast path
(reference analogs: scripts/balance_train_single.py, hanabi_train.py
single-policy mode, the MAPPO Colab run)."""

import argparse
import sys
import time

import jax

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def make_env(name, layout, horizon, num_players):
    from madrona_rl_envs_playground_tpu.envs import (
        balance_beam,
        cartpole,
        hanabi,
        overcooked,
        overcooked2,
    )

    if name == "cartpole":
        return cartpole.Env()
    if name == "balance":
        return balance_beam.Env()
    if name == "hanabi":
        return hanabi.Env(**hanabi.CONFIGS[layout or "full"])
    if name == "overcooked":
        return overcooked.make(layout or "cramped_room", horizon=horizon,
                               num_players=num_players)
    if name == "overcooked2":
        return overcooked2.make(layout or "simple", horizon=horizon,
                                num_players=num_players)
    raise ValueError(name)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="overcooked2")
    p.add_argument("--layout", default=None)
    p.add_argument("--horizon", type=int, default=400)
    p.add_argument("--num-players", type=int, default=None)
    p.add_argument("--num-envs", type=int, default=800)
    p.add_argument("--num-steps", type=int, default=128)
    p.add_argument("--updates", type=int, default=50)
    p.add_argument("--lr", type=float, default=2.5e-4)
    p.add_argument("--hidden", type=int, default=512)
    p.add_argument("--layers", type=int, default=3)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--num-minibatches", type=int, default=1)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 network compute (f32 params/losses)")
    p.add_argument("--ent-coef", type=float, default=0.01)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--log-every", type=int, default=1)
    p.add_argument("--rollout-backend", default="auto",
                   choices=["auto", "pallas", "jnp"],
                   help="rollout collection: fused megakernel (default-on "
                        "on TPU where the env has one) or the jnp scan")
    p.add_argument("--value-loss", default="clipped_mse",
                   choices=["clipped_mse", "smooth_l1"],
                   help="clipped_mse = decentralized driver "
                        "(vectoragent.py); smooth_l1 = centralized driver's "
                        "huber loss with its x128 whole-loss scale "
                        "(centralized_agent.py:381-384)")
    args = p.parse_args()

    from madrona_rl_envs_playground_tpu.parallel import launch
    from madrona_rl_envs_playground_tpu.train import SelfPlayConfig, SelfPlayPPO

    # multi-host (pod slice): a no-op unless the JAX_COORDINATOR_ADDRESS /
    # JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars (or pod metadata) are set
    # — docs/multihost_projection.md runbook
    distributed = launch.initialize()
    mesh = None
    if distributed or len(jax.devices()) > 1:
        from madrona_rl_envs_playground_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        if args.num_envs % mesh.size:
            raise SystemExit(
                f"--num-envs {args.num_envs} must be divisible by the mesh "
                f"size {mesh.size}")

    env = make_env(args.env, args.layout, args.horizon, args.num_players)
    cfg = SelfPlayConfig(
        num_steps=args.num_steps, lr=args.lr, hidden=args.hidden,
        num_layers=args.layers, update_epochs=args.epochs, ent_coef=args.ent_coef,
        num_minibatches=args.num_minibatches, use_bf16=args.bf16,
        rollout_backend=args.rollout_backend, value_loss=args.value_loss,
    )
    trainer = SelfPlayPPO(env, num_envs=args.num_envs, cfg=cfg, seed=args.seed,
                          mesh=mesh)
    # one untimed update first: the remote-TPU compile of the fused
    # train_step is ~20-90s and would otherwise dominate the steps/s figure
    # sync barrier = a device->host VALUE fetch: through the remote tunnel,
    # block_until_ready can return before the executable finishes; reading a
    # scalar that depends on the whole update chain is the only trustworthy
    # fence (updates are sequentially dependent, so one leaf syncs them all)
    sync = lambda m: float(jax.tree_util.tree_leaves(m)[0])
    sync(trainer.run(1, log_every=0))
    t0 = time.time()
    sync(trainer.run(args.updates, log_every=args.log_every))
    dt = time.time() - t0
    steps = args.updates * args.num_steps * args.num_envs
    print(f"total: {steps:,} env-steps in {dt:.1f}s -> {steps / dt:,.0f} steps/s "
          f"(steady-state; 1 warmup update excluded)")


if __name__ == "__main__":
    main()
