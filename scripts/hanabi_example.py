"""Hanabi benchmark/validation CLI (reference: scripts/hanabi_example.py)."""

import numpy as np
import jax.numpy as jnp

from _common import base_parser, run_isolated, run_timed_loop


def main():
    p = base_parser(num_envs=32, num_steps=1000)
    p.add_argument("--config", default="full", choices=["full", "small", "very_small"])
    p.add_argument("--semantic", action="store_true",
                   help="per-step semantic validation from the exported "
                        "tensors alone (abstract step + mask rederivation + "
                        "cross-step equivalence — the analog of the "
                        "reference's HanabiState validate_step)")
    args = p.parse_args()

    from madrona_rl_envs_playground_tpu.envs.hanabi import CONFIGS, Env
    from madrona_rl_envs_playground_tpu.oracles.hanabi import Counter, HanabiOracle  # noqa: F401
    from madrona_rl_envs_playground_tpu.oracles.hanabi_rules import RulesHanabi

    cfg = CONFIGS[args.config]
    env = Env(**cfg)
    if args.isolated:
        # random legal actions sampled in-graph keep turn-based stepping valid
        run_isolated_hanabi(env, args.num_envs, args.num_steps, args.seed)
        return

    validate = None
    if args.validation:
        # three-way: sequential C++-derived oracle (also the hidden-draw
        # recorder) + the independent HLE-semantics rules oracle
        from madrona_rl_envs_playground_tpu.oracles.hanabi_rules import (
            RecordingOracle, draw_cursor)

        counter = Counter()
        oracles = [RecordingOracle(counter, **cfg) for _ in range(args.num_envs)]
        rules = [RulesHanabi(draw_cursor(o.drawn, env.ranks),
                             cxx_quirks=True, **cfg)
                 for o in oracles]

        def validate(t, actions, out):
            rew = np.asarray(out.reward)
            done = np.asarray(out.done)
            bad = []
            for i, (o, g) in enumerate(zip(oracles, rules)):
                seat = o.cur
                ref_rew, ref_done = o.step(int(actions[i, seat]))
                g_rew, g_done = g.step(int(actions[i, seat]))
                ok = (ref_done == g_done == bool(done[i])
                      and np.all(rew[i] == np.float32(ref_rew))
                      and g_rew == ref_rew)
                if ok and not done[i]:
                    g_obs, g_state = g.encode(g.to_move)
                    ok = (np.array_equal(np.asarray(out.obs)[i, g.to_move], g_obs)
                          and np.array_equal(
                              np.asarray(out.state_obs)[i, g.to_move], g_state)
                          and np.array_equal(
                              np.asarray(out.action_mask)[i, g.to_move],
                              g.legal_mask(g.to_move)))
                if not ok:
                    bad.append(i)
            for o, g, d in zip(oracles, rules, done):
                if d:
                    o.reset()
                    g.new_game()
            return bad

    semantic = None
    if args.semantic:
        from madrona_rl_envs_playground_tpu.oracles import hanabi_decoder as hv

        def semantic(prev_out, actions, out):
            hv.validate_step(env, prev_out, actions, out, np.asarray(out.done))

    # actions must be legal for the active seat: drive from the mask
    run_masked_loop(env, args.num_envs, args.num_steps, args.seed, validate,
                    args.asserts, semantic)


def run_masked_loop(env, num_envs, num_steps, seed, validate_fn, asserts,
                    semantic_fn=None):
    import time

    import jax

    from madrona_rl_envs_playground_tpu.core.batch import Simulator

    sim = Simulator(env, num_envs)
    rs = np.random.RandomState(seed)
    out = sim.last_out
    errors = checks = 0
    t0 = time.perf_counter()
    for t in range(num_steps):
        mask = np.asarray(out.action_mask)
        active = np.asarray(out.active)
        actions = np.zeros((num_envs, env.players), np.int32)
        for i in range(num_envs):
            seat = int(np.nonzero(active[i])[0][0])
            legal = np.nonzero(mask[i, seat])[0]
            actions[i, seat] = int(legal[rs.randint(len(legal))])
        prev = out
        out = sim.step(jnp.asarray(actions))
        if semantic_fn is not None:
            semantic_fn(prev, actions, out)
        if validate_fn is not None:
            bad = validate_fn(t, actions, out)
            checks += 1
            if bad:
                errors += 1
                if asserts:
                    raise AssertionError(f"step {t}: envs {bad}")
    jax.block_until_ready(out.obs)
    dt = time.perf_counter() - t0
    print(f"{num_steps * num_envs / dt:,.0f} step*worlds/sec")
    if validate_fn is not None:
        print(f"Error rate: {errors / max(checks, 1)}")


def run_isolated_hanabi(env, num_envs, num_steps, seed, repeats=3):
    import time

    import jax
    from jax import lax

    from madrona_rl_envs_playground_tpu.core.batch import Simulator, batched_step

    sim = Simulator(env, num_envs)

    def body(carry, _):
        bstate, out, key = carry
        key, sub = jax.random.split(key)
        # sample uniformly over legal actions of each seat; inactive seats'
        # actions are ignored by the env
        logits = jnp.where(out.action_mask, 0.0, -jnp.inf)
        acts = jax.random.categorical(sub, logits, axis=-1).astype(jnp.int32)
        bstate, out = batched_step(env, bstate, acts)
        chk = out.reward.sum() + out.obs.astype(jnp.int32).sum()
        return (bstate, out, key), chk

    @jax.jit
    def run(bstate, out, key):
        (bstate, out, _), chks = lax.scan(
            body, (bstate, out, key), None, length=num_steps
        )
        return bstate, out, chks.sum()

    key = jax.random.PRNGKey(seed)
    bstate, out, s = run(sim.bstate, sim.last_out, key)
    s.block_until_ready()
    t0 = time.perf_counter()
    outs = []
    for r in range(repeats):
        bstate, out, s = run(bstate, out, jax.random.fold_in(key, r))
        outs.append(s)
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    print(f"{repeats * num_steps * num_envs / dt:,.0f} step*worlds/sec (isolated)")


if __name__ == "__main__":
    main()
