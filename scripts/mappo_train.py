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

    # multi-host / multi-chip: same wiring as selfplay_train (no-op on one
    # device; docs/multihost_projection.md runbook)
    import jax

    from madrona_rl_envs_playground_tpu.parallel import launch

    distributed = launch.initialize()
    mesh = None
    if distributed or len(jax.devices()) > 1:
        from madrona_rl_envs_playground_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        if cfg.n_rollout_threads % mesh.size:
            raise SystemExit(
                f"--n_rollout_threads {cfg.n_rollout_threads} must be "
                f"divisible by the mesh size {mesh.size}")

    runner = MAPPORunner(cfg, env, run_dir=args.run_dir, mesh=mesh)
    if args.model_dir:
        runner.restore(args.model_dir)
    runner.run()
    score = runner.evaluate(episodes=1, deterministic=True)
    print(f"deterministic eval score: {score:.3f}")

    if cfg.use_render:
        render_policy(runner, env, cfg, args.run_dir or "runs/mappo")


def render_policy(runner, env, cfg, run_dir):
    """The reference's --use_render/--render_episodes gif pipeline,
    re-expressed: export a self-contained browser replay driven by the
    trained actor (overcooked family), or a trajectory JSON elsewhere."""
    import json
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    outdir = os.path.join(run_dir, "render")
    pstate = runner.trainer.state.policy
    mc = cfg.model_config()

    def policy(obs, mask):
        B = obs.shape[0] * obs.shape[1]
        flat = jnp.asarray(obs).reshape(B, -1).astype(jnp.float32)
        avail = jnp.asarray(mask).reshape(B, -1)
        rnn = jnp.zeros((B, mc.recurrent_N, mc.hidden_size))
        logits, _ = runner.policy.actor.apply(
            pstate.actor_params, flat, rnn, jnp.ones((B,)), avail)
        return np.asarray(jnp.argmax(logits, -1)).reshape(obs.shape[:2])

    if hasattr(env, "terrain"):  # overcooked family -> canvas replay pages
        from madrona_rl_envs_playground_tpu.utils.demo_export import export_demo

        export_demo(outdir, env, actor_params=pstate.actor_params,
                    model_cfg=mc,
                    num_traj_steps=cfg.render_episodes * env.horizon,
                    policy=policy, seed=cfg.seed)
        print(f"render: wrote {outdir}/play.html and replay.html")
    else:
        from madrona_rl_envs_playground_tpu.utils.demo_export import record_rollout

        traj = record_rollout(
            env, cfg.render_episodes * cfg.episode_length, policy=policy,
            seed=cfg.seed)
        os.makedirs(outdir, exist_ok=True)
        with open(os.path.join(outdir, "trajectory.json"), "w") as f:
            json.dump(traj, f)
        print(f"render: wrote {outdir}/trajectory.json")


if __name__ == "__main__":
    main()
