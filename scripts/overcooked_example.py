"""Overcooked (modern multiplayer) benchmark/validation CLI
(reference: scripts/overcooked_example.py)."""

import numpy as np

from _common import base_parser, run_isolated, run_timed_loop


def overcooked_main(variant: str):
    p = base_parser(num_envs=32, num_steps=1000)
    p.add_argument("--layout", default="cramped_room" if variant == "v1" else "simple")
    p.add_argument("--horizon", type=int, default=400)
    p.add_argument("--num-players", type=int, default=None)
    p.add_argument("--native-validation", action="store_true",
                   help="validate against the C++ batched oracle (scales to "
                        "thousands of envs)")
    p.add_argument("--use-native", action="store_true",
                   help="run the C++ batched simulator as the backend "
                        "(alternate-backend perf comparison, the analog of "
                        "the reference's --use-taichi)")
    args = p.parse_args()

    from madrona_rl_envs_playground_tpu.envs import overcooked, overcooked2
    from madrona_rl_envs_playground_tpu.envs.layouts import get_base_layout_params
    from madrona_rl_envs_playground_tpu.oracles.overcooked import OvercookedOracle

    maker = overcooked.make if variant == "v1" else overcooked2.make
    env = maker(args.layout, horizon=args.horizon, num_players=args.num_players)
    if args.use_baseline or args.use_async:
        from _common import run_baseline_loop
        from madrona_rl_envs_playground_tpu.oracles.adapters import OvercookedOracleEnv

        params = get_base_layout_params(
            args.layout, args.horizon, max_num_players=args.num_players, variant=variant
        )
        run_baseline_loop(
            [lambda: OvercookedOracleEnv(variant, params) for _ in range(args.num_envs)],
            args.num_steps, args.seed, use_async=args.use_async,
        )
        return
    if args.use_native:
        import time

        from madrona_rl_envs_playground_tpu.oracles.native import (
            NativeOvercookedOracle,
        )

        params = get_base_layout_params(
            args.layout, args.horizon, max_num_players=args.num_players,
            variant=variant,
        )
        nat = NativeOvercookedOracle(variant, params, batch=args.num_envs)
        nat.reset()
        rs = np.random.RandomState(args.seed)
        acts = rs.randint(0, 6, size=(args.num_steps, args.num_envs,
                                      env.num_players)).astype(np.int32)
        nat.step(acts[0])  # warm
        t0 = time.perf_counter()
        for t in range(args.num_steps):
            nat.step(acts[t])
        dt = time.perf_counter() - t0
        print(f"{args.num_steps * args.num_envs / dt:,.0f} step*worlds/sec "
              f"(native C++ backend)")
        return
    if args.isolated:
        run_isolated(env, args.num_envs, args.num_steps, args.seed)
        return

    validate = None
    if args.validation and args.native_validation:
        # C++ batched oracle: whole-batch integer comparison per step, fast
        # enough to validate thousands of envs (oracles/native.py).
        from madrona_rl_envs_playground_tpu.oracles.native import (
            NativeOvercookedOracle,
        )

        params = get_base_layout_params(
            args.layout, args.horizon, max_num_players=args.num_players, variant=variant
        )
        nat = NativeOvercookedOracle(variant, params, batch=args.num_envs)
        nat.reset()

        def validate(t, actions, out):
            ref_obs, ref_rew, ref_done = nat.step(actions)
            obs = np.asarray(out.obs)
            rew = np.asarray(out.reward)
            done = np.asarray(out.done)
            bad = np.nonzero(
                (ref_done != done)
                | np.any(ref_rew[:, None] != rew, axis=1)
                | np.any(ref_obs != obs, axis=(1, 2))
            )[0]
            return bad.tolist()

        run_timed_loop(env, args.num_envs, args.num_steps, args.seed, validate,
                       args.asserts)
        return

    if args.validation:
        params = get_base_layout_params(
            args.layout, args.horizon, max_num_players=args.num_players, variant=variant
        )
        oracles = [OvercookedOracle(variant, params) for _ in range(args.num_envs)]
        for o in oracles:
            o.reset()
        W, H, C = env.width, env.height, env.num_channels

        def validate(t, actions, out):
            obs = np.asarray(out.obs).reshape(args.num_envs, env.num_players, W, H, C)
            rew = np.asarray(out.reward)
            done = np.asarray(out.done)
            bad = []
            for i, o in enumerate(oracles):
                ref_obs, ref_rew, ref_done = o.step(actions[i])
                if ref_done:
                    ref_obs = o.reset()
                if (
                    ref_done != bool(done[i])
                    or not np.all(rew[i] == ref_rew)
                    or not np.array_equal(obs[i], ref_obs)
                ):
                    bad.append(i)
            return bad

    run_timed_loop(env, args.num_envs, args.num_steps, args.seed, validate, args.asserts)


if __name__ == "__main__":
    overcooked_main("v1")
