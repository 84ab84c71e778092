"""Balance Beam benchmark/validation CLI (reference: scripts/balance_example.py)."""

import numpy as np

from _common import base_parser, run_isolated, run_timed_loop


def main():
    args = base_parser(num_envs=32, num_steps=1000).parse_args()
    from madrona_rl_envs_playground_tpu.envs import balance_beam
    from madrona_rl_envs_playground_tpu.oracles import balance_beam as oracle

    env = balance_beam.Env()
    if args.isolated:
        run_isolated(env, args.num_envs, args.num_steps, args.seed)
        return

    validate = None
    if args.validation:
        prev = {"obs": None}

        def validate(t, actions, out):
            obs = np.asarray(out.obs).transpose(1, 0, 2)  # [2, N, 7]
            done = np.asarray(out.done)
            rew = np.asarray(out.reward).T
            bad = []
            if prev["obs"] is not None:
                bad = oracle.validate_step(prev["obs"], actions.T, done, obs, rew)
            prev["obs"] = obs
            return bad

    run_timed_loop(env, args.num_envs, args.num_steps, args.seed, validate, args.asserts)


if __name__ == "__main__":
    main()
