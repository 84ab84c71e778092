"""BASELINE config 5 training evidence: many_player overcooked, sharded-PPO.

VERDICT r4 #3: config 5 ("many_player, 16k envs sharded, feeding sharded
PPO learner") had only a one-step checksum.  This driver produces the real
thing: a SelfPlayPPO training run on ``many_player_layout`` (P players) at
``--num-envs`` on whatever backend is present (the real chip for the
committed artifact), recording steps/s and the per-update reward curve to
``docs/runs/many_player_training.json``.

``--mesh-check`` additionally runs the same tiny config twice on the
virtual 8-device CPU mesh — sharded vs single-device — and asserts the
metric streams agree (the config-5 "sharded" claim, checked end-to-end).

    python scripts/many_player_train_run.py --num-envs 16384 --updates 200
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python scripts/many_player_train_run.py --mesh-check
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from madrona_rl_envs_playground_tpu.envs import overcooked
from madrona_rl_envs_playground_tpu.train.selfplay import (
    SelfPlayConfig,
    SelfPlayPPO,
)


def run(num_envs, players, updates, cfg, seed=0, mesh=None, log_every=10):
    env = overcooked.make("many_player_layout", num_players=players)
    ppo = SelfPlayPPO(env, num_envs, cfg, seed=seed, mesh=mesh)
    sync = lambda m: float(jax.tree_util.tree_leaves(m)[0])

    curve = []
    ppo.state, m = ppo.train_step(ppo.state)  # compile + warmup (untimed)
    sync(m)
    t0 = time.time()
    for u in range(updates):
        ppo.state, m = ppo.train_step(ppo.state)
        if (u + 1) % log_every == 0 or u == updates - 1:
            curve.append({
                "update": u + 1,
                "mean_step_reward": float(m["mean_step_reward"]),
                "v_loss": float(m["v_loss"]),
                "entropy": float(m["entropy"]),
            })
    sync(m)
    dt = time.time() - t0
    steps = updates * num_envs * cfg.num_steps
    return {
        "env": "overcooked many_player_layout",
        "players": players,
        "num_envs": num_envs,
        "num_steps": cfg.num_steps,
        "updates": updates,
        "seed": seed,
        "backend": jax.default_backend(),
        "env_steps_per_s": steps / dt,
        "wall_s": dt,
        "curve": curve,
    }


def mesh_check(players, cfg):
    """Sharded (8-device mesh) vs single-device: identical config/seed must
    produce matching metric streams (rtol 2e-4 — fp reduction order only)."""
    import numpy as np

    from madrona_rl_envs_playground_tpu.parallel.mesh import make_mesh

    n_envs, upd = 64, 3
    env = overcooked.make("many_player_layout", num_players=players)

    def stream(mesh):
        ppo = SelfPlayPPO(env, n_envs, cfg, seed=7, mesh=mesh)
        out = []
        for _ in range(upd):
            ppo.state, m = ppo.train_step(ppo.state)
            out.append({k: float(v) for k, v in m.items()})
        return out

    single = stream(None)
    sharded = stream(make_mesh())
    for u, (a, b) in enumerate(zip(single, sharded)):
        for k in a:
            np.testing.assert_allclose(
                a[k], b[k], rtol=2e-4, atol=1e-5,
                err_msg=f"update {u} metric {k}")
    print(f"mesh equivalence OK: {upd} updates x {len(single[0])} metrics "
          f"match on the {len(jax.devices())}-device mesh")
    return True


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=16384)
    p.add_argument("--players", type=int, default=8)
    p.add_argument("--updates", type=int, default=200)
    p.add_argument("--num-steps", type=int, default=64)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh-check", action="store_true")
    p.add_argument("--out", default="docs/runs/many_player_training.json")
    args = p.parse_args()

    cfg = SelfPlayConfig(
        num_steps=args.num_steps, hidden=args.hidden, num_layers=args.layers,
        use_bf16=args.bf16,
    )

    if args.mesh_check:
        tiny = SelfPlayConfig(num_steps=8, hidden=32, num_layers=2)
        mesh_check(args.players, tiny)
        return

    report = run(args.num_envs, args.players, args.updates, cfg,
                 seed=args.seed)
    print(json.dumps({k: v for k, v in report.items() if k != "curve"},
                     indent=2))
    first, last = report["curve"][0], report["curve"][-1]
    print(f"reward curve: {first['mean_step_reward']:.4f} (u{first['update']})"
          f" -> {last['mean_step_reward']:.4f} (u{last['update']})")
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
