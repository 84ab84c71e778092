"""The policy inference server (scripts/serve_policy.py): served actions
must equal a direct deterministic actor forward on the same checkpoint."""

import json
import threading
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("cpu",), reason="host-loop server test")


def test_serve_roundtrip(tmp_path):
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]
                           / "scripts"))
    import serve_policy

    from madrona_rl_envs_playground_tpu.envs import balance_beam
    from madrona_rl_envs_playground_tpu.train.mappo import (
        MAPPOConfig, MAPPORunner)

    cfg = MAPPOConfig(episode_length=6, n_rollout_threads=4, hidden_size=16,
                      layer_N=1, ppo_epoch=1)
    runner = MAPPORunner(cfg, balance_beam.Env())
    runner.run(episodes=1)
    ck = str(tmp_path / "ck")
    runner.save(ck)

    class Args:
        checkpoint = ck
        env_name = "balance"
        over_layout = "simple"
        episode_length = 6
        hidden_size = 16
        layer_N = 1

    act, env = serve_policy.load_actor(Args)
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve_policy.make_handler(act, env))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["obs_size"] == env.obs_size

        rs = np.random.RandomState(0)
        obs = rs.randint(0, 3, size=(3, env.obs_size)).astype(float)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/act",
            data=json.dumps({"obs": obs.tolist()}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            served = json.loads(r.read())["actions"]

        # direct deterministic forward for comparison
        params = runner.trainer.state.policy.actor_params
        mc = cfg.model_config()
        rnn = jnp.zeros((3, mc.recurrent_N, mc.hidden_size))
        logits, _ = runner.policy.actor.apply(
            params, jnp.asarray(obs, jnp.float32), rnn, jnp.ones((3,)),
            jnp.ones((3, env.num_actions), bool))
        expect = np.asarray(jnp.argmax(logits, -1))
        np.testing.assert_array_equal(served, expect)

        # malformed request -> 400, server stays alive
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/act",
            data=json.dumps({"obs": [[1.0, 2.0]]}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad, timeout=30)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=30) as r:
            assert json.loads(r.read())["ok"]
    finally:
        server.shutdown()
