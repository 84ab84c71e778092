"""Phase breakdown + MFU accounting for the fused SelfPlayPPO train step.

VERDICT r4 #1: the sim does 432M steps/s but end-to-end training does ~3.8M
@8k envs (~167-260 ms/update) with no committed accounting of where the time
goes.  This script compiles each phase of ``SelfPlayPPO._train_step``
SEPARATELY (the r5 refactor split it into ``_rollout`` / ``_advantage`` /
``_update``), times them on the real chip, pulls the compiled FLOP counts
from XLA's cost model, and reports achieved FLOP/s vs the v5e peak.

Methodology notes:
* Phase times are measured on separately-jitted functions, so each phase
  pays its own HBM materialization of the phase boundary buffers; the full
  fused step is timed too and is the number that counts.  Sum(phases) >=
  full is expected.
* FLOPs come from ``compiled.cost_analysis()['flops']`` — XLA's static cost
  model of the exact HLO that ran.
* MFU peak: v5e = 197 TFLOP/s bf16.  JAX's default f32 matmul precision on
  TPU runs bf16 MXU passes with f32 accumulate, so the same peak is the
  right denominator for both dtype configs.

Usage:
  python scripts/profile_train_step.py --num-envs 8192 --repeats 20
  python scripts/profile_train_step.py --bf16   # the optimized config
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from madrona_rl_envs_playground_tpu.envs import overcooked as overcooked1, overcooked2
from madrona_rl_envs_playground_tpu.train.selfplay import (
    SelfPlayConfig,
    SelfPlayPPO,
)

V5E_PEAK_FLOPS = 197e12  # bf16 systolic-array peak, one v5e chip


def _sync(res):
    """Device->host VALUE fetch of the smallest output leaf — through the
    remote tunnel ``block_until_ready`` can return before the executable
    finishes (see scripts/selfplay_train.py's sync note), so a value fetch
    is the only trustworthy fence.  TPU executables run in submission
    order, so one leaf of the last output syncs everything queued."""
    leaf = min(jax.tree_util.tree_leaves(res),
               key=lambda l: getattr(l, "size", 1))
    jax.device_get(leaf)


def rpc_baseline(repeats=20):
    """Per-fetch tunnel round-trip cost, to subtract from per-call-synced
    timings."""
    import jax.numpy as jnp

    x = jax.device_put(jnp.zeros((1,), jnp.float32))
    jax.device_get(x)
    t0 = time.perf_counter()
    for _ in range(repeats):
        jax.device_get(x)
    return (time.perf_counter() - t0) / repeats


def timed_chain(fn, state0, repeats=10, warmup=2):
    """fn: state -> state.  Chains outputs into inputs so only two states
    are ever alive; ONE value-fetch fence at the end amortizes the RPC."""
    state = state0
    for _ in range(warmup):
        state = fn(state)
    _sync(state)
    t0 = time.perf_counter()
    for _ in range(repeats):
        state = fn(state)
    _sync(state)
    return (time.perf_counter() - t0) / repeats


def timed_each(fn, *args, repeats=10, warmup=2, rpc_ms=0.0):
    """Per-call fence (for fns whose big outputs can't chain — bounding
    in-flight memory to one output set); subtracts the measured tunnel
    RPC baseline from each call."""
    res = None
    for _ in range(warmup):
        res = fn(*args)
        _sync(res)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = fn(*args)
        _sync(res)
        ts.append(time.perf_counter() - t0 - rpc_ms / 1e3)
    ts.sort()
    return max(ts[len(ts) // 2], 1e-9)


def cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    return {
        "flops": float(ca.get("flops", 0.0)),
        "hbm_bytes": float(ca.get("bytes accessed", 0.0)),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="overcooked")
    p.add_argument("--layout", default="cramped_room")
    p.add_argument("--num-envs", type=int, default=8192)
    p.add_argument("--num-steps", type=int, default=128)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--hidden", type=int, default=512)
    p.add_argument("--layers", type=int, default=3)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--value-loss", default="clipped_mse",
                   choices=["clipped_mse", "smooth_l1"])
    p.add_argument("--rollout-backend", default="auto")
    p.add_argument("--repeats", type=int, default=10)
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    if args.env == "overcooked":
        env = overcooked1.make(args.layout)
    elif args.env == "overcooked2":
        env = overcooked2.make(args.layout)
    else:
        from madrona_rl_envs_playground_tpu.envs import balance_beam, cartpole, hanabi
        env = {"balance": balance_beam.make, "cartpole": cartpole.make,
               "hanabi": hanabi.make}[args.env]()

    cfg = SelfPlayConfig(
        num_steps=args.num_steps,
        use_bf16=args.bf16,
        hidden=args.hidden,
        num_layers=args.layers,
        update_epochs=args.epochs,
        value_loss=args.value_loss,
        rollout_backend=args.rollout_backend,
    )
    ppo = SelfPlayPPO(env, args.num_envs, cfg, seed=0)
    state = ppo.state

    # ---- compile each phase on its own ------------------------------------
    rollout_j = jax.jit(ppo._rollout)
    rollout_c = rollout_j.lower(state).compile()
    bstate, out, key, tr = rollout_j(state)

    adv_j = jax.jit(ppo._advantage)
    adv_c = adv_j.lower(state["params"], tr, out).compile()
    chunks, _stats = adv_j(state["params"], tr, out)

    upd_j = jax.jit(ppo._update)
    upd_c = upd_j.lower(state["params"], state["opt_state"], chunks).compile()

    full_c = ppo.train_step.lower(state).compile()

    rpc_ms = rpc_baseline() * 1e3

    phases = {}
    phases["rollout"] = {
        "ms": timed_each(rollout_j, state, repeats=args.repeats,
                         rpc_ms=rpc_ms) * 1e3,
        **cost(rollout_c),
    }
    phases["advantage"] = {
        "ms": timed_each(adv_j, state["params"], tr, out,
                         repeats=args.repeats, rpc_ms=rpc_ms) * 1e3,
        **cost(adv_c),
    }
    del tr, bstate, out, key  # free the trajectory set before update timing

    # update chains (params, opt_state) -> (params, opt_state): one fence
    def upd_state(s, ch):
        params, opt_state, auxes = upd_j(s["params"], s["opt_state"], ch)
        return {"params": params, "opt_state": opt_state}

    phases["update"] = {
        "ms": timed_chain(lambda s: upd_state(s, chunks),
                          {"params": state["params"],
                           "opt_state": state["opt_state"]},
                          repeats=args.repeats) * 1e3,
        **cost(upd_c),
    }
    del chunks  # and the minibatch view before the fused full step
    full_ms = timed_chain(lambda s: ppo.train_step(s)[0], state,
                          repeats=args.repeats) * 1e3
    full_cost = cost(full_c)

    env_steps = args.num_envs * args.num_steps
    for name, ph in phases.items():
        ph["tflops_per_s"] = ph["flops"] / (ph["ms"] / 1e3) / 1e12
        ph["mfu_pct"] = 100.0 * ph["flops"] / (ph["ms"] / 1e3) / V5E_PEAK_FLOPS
        ph["hbm_gb_per_s"] = ph["hbm_bytes"] / (ph["ms"] / 1e3) / 1e9

    report = {
        "config": {
            "env": args.env, "layout": args.layout,
            "num_envs": args.num_envs, "num_steps": args.num_steps,
            "bf16": args.bf16, "value_loss": args.value_loss,
            "obs_size": int(env.obs_size), "state_size": int(env.state_size),
            "num_agents": int(env.num_agents),
            "hidden": cfg.hidden, "num_layers": cfg.num_layers,
            "rollout_backend": cfg.rollout_backend,
            "update_epochs": cfg.update_epochs,
            "backend": jax.default_backend(),
        },
        "phases": phases,
        "full": {
            "ms": full_ms,
            **full_cost,
            "tflops_per_s": full_cost["flops"] / (full_ms / 1e3) / 1e12,
            "mfu_pct": 100.0 * full_cost["flops"] / (full_ms / 1e3)
            / V5E_PEAK_FLOPS,
            "env_steps_per_s": env_steps / (full_ms / 1e3),
        },
        "phase_sum_ms": sum(ph["ms"] for ph in phases.values()),
        "rpc_baseline_ms": rpc_ms,
    }

    print(json.dumps(report, indent=2))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
