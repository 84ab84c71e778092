"""Component breakdown of the many-player Overcooked jnp step.

Times, per (num_players, num_envs): the full fused-scan step, the
transition alone, the encode alone, and transition variants (interact loop
unrolled / movement only) — one process, one device claim, JSON lines out.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax import lax

from madrona_rl_envs_playground_tpu.core.batch import batched_reset, batched_step
from madrona_rl_envs_playground_tpu.envs import overcooked


def timed(fn, args, steps, num_envs, repeats=3):
    float(fn(*args))  # value fetch = the only trustworthy barrier through
    ts = []           # the tunnel (bench.py methodology note)
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    dt = ts[len(ts) // 2]
    return steps * num_envs / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--players", type=int, default=30)
    p.add_argument("--num-envs", type=int, default=1024)
    p.add_argument("--num-steps", type=int, default=200)
    args = p.parse_args()
    P, N, T = args.players, args.num_envs, args.num_steps

    env = overcooked.make("many_player_layout", num_players=P)
    bstate, out0 = batched_reset(env, N)

    def rand_actions(key):
        return jax.random.randint(key, (N, P), 0, env.num_actions, jnp.int32)

    # --- full step (the bench discipline) -----------------------------
    @jax.jit
    def full(bstate, key):
        def body(carry, _):
            bs, key = carry
            key, sub = jax.random.split(key)
            bs, out = batched_step(env, bs, rand_actions(sub))
            chk = (out.reward.astype(jnp.int32).sum()
                   + out.obs.astype(jnp.int32).sum()
                   + out.done.astype(jnp.int32).sum())
            return (bs, key), chk
        (bs, _), chks = lax.scan(body, (bstate, key), None, length=T)
        return chks.sum()

    # --- transition only (state checksum consumed) ---------------------
    vstep = jax.vmap(env.transition, in_axes=(0, 0))

    @jax.jit
    def transition_only(states, key):
        def body(carry, _):
            st, key = carry
            key, sub = jax.random.split(key)
            st, rew, done = vstep(st, rand_actions(sub))
            # reset timestep so horizon resets don't fire (transition only)
            st = st.replace(timestep=jnp.zeros_like(st.timestep))
            return (st, key), rew.sum() + done.sum()
        (st, _), chks = lax.scan(body, (states, key), None, length=T)
        return chks.sum() + st.pos.sum()

    # --- encode only (obs checksum consumed; rotate orientations so the
    #     encode can't be hoisted out of the scan) -----------------------
    venc = jax.vmap(env.encode, in_axes=(0, 0))

    @jax.jit
    def encode_only(states, key):
        def body(carry, t):
            st = carry
            st = st.replace(orient=(st.orient + 1) % 4)
            _, obs, _, _, _ = venc(st, jnp.zeros((N,), jnp.bool_))
            return st, obs.astype(jnp.int32).sum()
        st, chks = lax.scan(body, states, jnp.arange(T))
        return chks.sum()

    # --- encode without the obs checksum (write-only consumer: done sum)
    @jax.jit
    def encode_nosum(states, key):
        def body(carry, t):
            st = carry
            st = st.replace(orient=(st.orient + 1) % 4)
            _, obs, _, _, _ = venc(st, jnp.zeros((N,), jnp.bool_))
            return st, obs[:, 0, 0].astype(jnp.int32).sum()
        st, chks = lax.scan(body, states, jnp.arange(T))
        return chks.sum()

    key = jax.random.PRNGKey(0)
    states = bstate.env_states
    for name, fn, a in [
        ("full_step", full, (bstate, key)),
        ("transition_only", transition_only, (states, key)),
        ("encode_only", encode_only, (states, key)),
        ("encode_first_bit_only", encode_nosum, (states, key)),
    ]:
        sps = timed(fn, a, T, N)
        print(json.dumps({"component": name, "players": P, "num_envs": N,
                          "steps_per_s": round(sps, 1)}), flush=True)


if __name__ == "__main__":
    main()
