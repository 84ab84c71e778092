"""Record a golden trace from the REFERENCE engines (run on a CUDA host).

This script cannot run in the TPU environment (no Madrona/CUDA toolchain) —
copy it into a checkout of the reference repo (willwng/madrona_rl_envs,
``scripts/`` directory) on any host where the reference builds, then:

    python scripts/record_reference_trace.py --env overcooked \
        --layout cramped_room --num-envs 32 --num-steps 200 \
        --out cramped_room_32x200.npz
    # ship the npz back and close the loop:
    python scripts/diff_reference_trace.py cramped_room_32x200.npz

It drives the reference exactly like ``scripts/overcooked_example.py:73-95``
(n_reset, then n_step with player-major action tensors) and stacks the
VectorObservation fields into the dump format documented in
``madrona_rl_envs_playground_tpu/utils/golden_trace.py``.

Action stream: ``np.random.RandomState(seed)`` over
``randint(0, A, size=(num_envs, num_players))`` per step — the same stream
``utils/golden_trace.record_trace`` uses, so a recorded reference trace and
our synthetic fixture for the same (env, N, T, seed) are action-aligned.
"""

import argparse
import json

import numpy as np


def build_env(args):
    import torch  # noqa: F401  (reference wrappers return torch tensors)

    if args.env == "overcooked":
        from envs.overcooked_env import OvercookedMadrona

        return OvercookedMadrona(args.layout, args.num_envs, 0, False,
                                 args.use_cpu, True,
                                 num_players=args.num_players)
    if args.env == "overcooked2":
        from envs.overcooked2_env import OvercookedMadrona

        return OvercookedMadrona(args.layout, args.num_envs, 0, False,
                                 args.use_cpu, True)
    if args.env == "hanabi":
        from envs.hanabi_env import HanabiMadrona, config_choice

        cfg = config_choice[args.layout or "full"]
        return HanabiMadrona(args.num_envs, 0, False, args.use_cpu, True,
                             **cfg)
    if args.env == "balance":
        from envs.balance_beam_env import BalanceMadrona

        return BalanceMadrona(args.num_envs, 0, False, args.use_cpu, True)
    if args.env == "cartpole":
        from envs.cartpole_env import CartpoleMadrona

        return CartpoleMadrona(args.num_envs, 0, False, args.use_cpu, True)
    raise SystemExit(f"unknown env {args.env}")


def to_numpy(x):
    return x.cpu().numpy() if hasattr(x, "cpu") else np.asarray(x)


def stack_obs(obs_list):
    """[P x VectorObservation] -> dict of [N, P, ...] arrays."""
    return {
        "obs": np.stack([to_numpy(o.obs) for o in obs_list], axis=1),
        "active": np.stack(
            [to_numpy(o.active).reshape(-1) for o in obs_list], axis=1),
        "action_mask": np.stack(
            [to_numpy(o.action_mask) for o in obs_list], axis=1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="overcooked")
    p.add_argument("--layout", default="cramped_room")
    p.add_argument("--num-envs", type=int, default=32)
    p.add_argument("--num-steps", type=int, default=200)
    p.add_argument("--num-players", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--use-cpu", action="store_true",
                   help="reference CPU backend instead of CUDA")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import torch

    env = build_env(args)
    P = env.n_players
    A = env.action_space.n
    rs = np.random.RandomState(args.seed)

    state = env.n_reset()
    first = stack_obs(state)
    obs0 = first["obs"]

    acts, obss, rews, dones, masks, actives = [], [], [], [], [], []
    for _ in range(args.num_steps):
        a = rs.randint(0, A, size=(args.num_envs, P)).astype(np.int32)
        # reference actions are player-major [P, N, 1]
        at = torch.as_tensor(a.T[:, :, None]).to(device=env.device)
        next_state, reward, next_done, _ = env.n_step(at)
        s = stack_obs(next_state)
        acts.append(a)
        obss.append(s["obs"])
        masks.append(s["action_mask"])
        actives.append(s["active"])
        # reward comes back player-major [P, N]; store world-major [N, P]
        rews.append(to_numpy(reward).reshape(P, args.num_envs).T
                    .astype(np.float32))
        dones.append(to_numpy(next_done).reshape(-1).astype(bool))

    meta = {
        "env": args.env,
        "layout": args.layout,
        "num_envs": args.num_envs,
        "num_steps": args.num_steps,
        "num_players": args.num_players,
        "seed": args.seed,
        "source": "reference-" + ("cpu" if args.use_cpu else "cuda"),
    }
    np.savez_compressed(
        args.out,
        meta=json.dumps(meta),
        obs0=obs0,
        actions=np.stack(acts),
        obs=np.stack(obss),
        rewards=np.stack(rews),
        dones=np.stack(dones),
        action_mask=np.stack(masks),
        active=np.stack(actives),
    )
    print(f"wrote {args.out}: T={args.num_steps} N={args.num_envs} P={P}")


if __name__ == "__main__":
    main()
