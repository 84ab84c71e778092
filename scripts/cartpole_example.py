"""Cartpole benchmark/validation CLI (reference: scripts/cartpole_example.py)."""

import numpy as np

from _common import base_parser, run_isolated, run_timed_loop


def main():
    args = base_parser(num_envs=32, num_steps=1000).parse_args()
    from madrona_rl_envs_playground_tpu.envs import cartpole
    from madrona_rl_envs_playground_tpu.oracles import cartpole as oracle

    env = cartpole.Env()
    if args.isolated:
        run_isolated(env, args.num_envs, args.num_steps, args.seed)
        return

    validate = None
    if args.validation:
        prev = {"obs": None}

        def validate(t, actions, out):
            obs = np.asarray(out.obs)[:, 0]
            done = np.asarray(out.done)
            bad = []
            if prev["obs"] is not None:
                bad = oracle.validate_step(prev["obs"], actions[:, 0], done, obs)
            # re-sync on auto-reset (new episode state is not predictable
            # from the previous obs)
            prev["obs"] = obs
            return bad

    run_timed_loop(env, args.num_envs, args.num_steps, args.seed, validate, args.asserts)


if __name__ == "__main__":
    main()
