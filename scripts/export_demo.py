"""Export the self-contained Overcooked browser demo (play.html +
replay.html), optionally wiring a trained MAPPO actor into the AI seats.

    python export_demo.py --layout cramped_room --out demo_out
    python export_demo.py --env overcooked2 --layout simple \
        --checkpoint runs/mappo/checkpoint.pkl --out demo_out

Completes the reference's ``overcooked_demo/`` capability (AI/human seats,
trajectory replay) without its Flask server or the upstream's missing JS
blobs — see utils/demo_export.py.  With a checkpoint, the recorded replay
trajectory is the greedy actor's own play (via the numpy twin of policy.js,
so the replay matches what the browser AI seat does).
"""

import argparse
import pickle
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="overcooked",
                   choices=["overcooked", "overcooked2"])
    p.add_argument("--layout", default="cramped_room")
    p.add_argument("--horizon", type=int, default=400)
    p.add_argument("--out", default="demo_out")
    p.add_argument("--vector-steps", type=int, default=120)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--hidden-size", type=int, default=64)
    p.add_argument("--layer-N", type=int, default=1)
    p.add_argument("--use-tanh", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from madrona_rl_envs_playground_tpu.envs import overcooked, overcooked2
    from madrona_rl_envs_playground_tpu.utils.demo_export import export_demo

    env = (overcooked if args.env == "overcooked" else overcooked2).make(
        args.layout, horizon=args.horizon)

    actor_params = model_cfg = policy = None
    if args.checkpoint:
        from madrona_rl_envs_playground_tpu.models.mappo_nets import ModelConfig
        from madrona_rl_envs_playground_tpu.utils.browser_export import (
            mappo_actor_to_ops,
            run_ops,
        )

        with open(args.checkpoint, "rb") as f:
            blob = pickle.load(f)
        actor_params = (blob["actor_params"] if "actor_params" in blob
                        else blob)
        model_cfg = ModelConfig(hidden_size=args.hidden_size,
                                layer_N=args.layer_N,
                                use_relu=not args.use_tanh)
        ops = mappo_actor_to_ops(actor_params, model_cfg, env.num_actions)

        def policy(obs, mask):
            n, pl, f = obs.shape
            x = np.asarray(obs, np.float32).reshape(n * pl, f)
            probs = np.stack([run_ops(ops, row) for row in x])
            return np.argmax(probs, axis=-1).reshape(n, pl).astype(np.int32)

    manifest = export_demo(args.out, env, actor_params=actor_params,
                           model_cfg=model_cfg, policy=policy,
                           num_vector_steps=args.vector_steps, seed=args.seed,
                           meta={"env": args.env, "layout": args.layout})
    print(manifest)


if __name__ == "__main__":
    main()
