"""Export a trained MAPPO actor to the browser bundle.

The ``torch_to_tfjs.py`` CLI analog (reference ``train/torch_to_tfjs.py``):
loads a ``mappo_train.py`` run checkpoint and writes
model.json / policy.js / testvector.json / demo.html — open demo.html in a
browser for an in-page PASS/FAIL self-check, or consume policy.js +
model.json from any JS demo front-end.

    python scripts/export_browser.py --checkpoint runs/mappo/checkpoint.pkl \
        --env overcooked2 --layout simple --out exported_actor/
"""

import argparse
import pickle
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def make_env(name, layout, num_players):
    from madrona_rl_envs_playground_tpu.envs import (
        balance_beam,
        hanabi,
        overcooked,
        overcooked2,
    )

    if name == "balance":
        return balance_beam.Env()
    if name == "hanabi":
        return hanabi.Env(**hanabi.CONFIGS["full"])
    if name == "overcooked":
        return overcooked.make(layout or "cramped_room", num_players=num_players)
    return overcooked2.make(layout or "simple", num_players=num_players)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--env", default="overcooked2",
                   choices=["balance", "hanabi", "overcooked", "overcooked2"])
    p.add_argument("--layout", default=None)
    p.add_argument("--num-players", type=int, default=None)
    p.add_argument("--hidden-size", type=int, default=64)
    p.add_argument("--layer-N", type=int, default=1)
    p.add_argument("--use-tanh", action="store_true")
    p.add_argument("--out", default="exported_actor")
    args = p.parse_args()

    from madrona_rl_envs_playground_tpu.core.batch import batched_reset
    from madrona_rl_envs_playground_tpu.models.mappo_nets import ModelConfig
    from madrona_rl_envs_playground_tpu.utils.browser_export import (
        export_browser_bundle,
    )

    env = make_env(args.env, args.layout, args.num_players)
    with open(args.checkpoint, "rb") as f:
        blob = pickle.load(f)
    actor_params = blob["actor_params"] if "actor_params" in blob else blob
    mc = ModelConfig(
        hidden_size=args.hidden_size, layer_N=args.layer_N,
        use_relu=not args.use_tanh,
    )

    # test vector: a real fresh-episode observation + mask for seat 0
    _, out = batched_reset(env, 1)
    obs = np.asarray(out.obs)[0, 0].astype(np.float32).reshape(-1)
    mask = np.asarray(out.action_mask)[0, 0].astype(bool).reshape(-1)

    export_browser_bundle(
        args.out, actor_params, mc, env.num_actions, obs, mask,
        meta={"env": args.env, "layout": args.layout,
              "obs_size": int(env.obs_size), "num_actions": int(env.num_actions)},
    )
    print(f"wrote {args.out}/model.json policy.js testvector.json demo.html")


if __name__ == "__main__":
    main()
