"""Round-trip smoke for the browser export bundle (torch_to_tfjs analog):
export a trained-ish MAPPO actor, reload model.json, interpret the op
schema, and require the result to match the flax actor's probabilities."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from madrona_rl_envs_playground_tpu.models.mappo_nets import ModelConfig, R_Actor
from madrona_rl_envs_playground_tpu.utils.browser_export import (
    export_browser_bundle,
    run_ops,
)


def _make_actor(seed=0, obs=9, hidden=24, layer_n=1, acts=5, relu=True):
    mc = ModelConfig(hidden_size=hidden, layer_N=layer_n, use_relu=relu)
    actor = R_Actor(mc, (obs,), acts)
    params = actor.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, obs)),
        jnp.zeros((1, mc.recurrent_N, hidden)), jnp.ones((1,)),
    )
    return actor, params, mc


def test_export_roundtrip_matches_flax(tmp_path):
    actor, params, mc = _make_actor()
    rs = np.random.RandomState(4)
    obs = rs.randn(9).astype(np.float32)
    mask = np.array([1, 1, 0, 1, 0], bool)

    export_browser_bundle(
        str(tmp_path), params, mc, 5, obs, mask, meta={"env": "unit"}
    )
    for fname in ("model.json", "policy.js", "testvector.json", "demo.html"):
        assert os.path.exists(tmp_path / fname), fname

    model = json.loads((tmp_path / "model.json").read_text())
    tv = json.loads((tmp_path / "testvector.json").read_text())

    probs_np = run_ops(model["ops"], np.asarray(tv["obs"]),
                       np.asarray(tv["action_mask"], bool))
    np.testing.assert_allclose(probs_np, tv["expected_probs"], rtol=1e-6)

    logits, _ = actor.apply(
        params, jnp.asarray(obs)[None], jnp.zeros((1, 1, 24)),
        jnp.ones((1,)), jnp.asarray(mask)[None],
    )
    probs_flax = np.asarray(jax.nn.softmax(logits[0]))
    np.testing.assert_allclose(probs_np, probs_flax, rtol=2e-4, atol=1e-6)
    # illegal actions carry ~zero probability
    assert probs_np[2] < 1e-8 and probs_np[4] < 1e-8


def test_export_tanh_variant(tmp_path):
    actor, params, mc = _make_actor(seed=2, relu=False, layer_n=2)
    obs = np.linspace(-1, 1, 9).astype(np.float32)
    model = export_browser_bundle(str(tmp_path), params, mc, 5, obs, None)
    probs = run_ops(model["ops"], obs, None)
    logits, _ = actor.apply(
        params, jnp.asarray(obs)[None], jnp.zeros((1, 1, 24)), jnp.ones((1,))
    )
    np.testing.assert_allclose(
        probs, np.asarray(jax.nn.softmax(logits[0])), rtol=2e-4, atol=1e-6
    )


def test_recurrent_actor_rejected(tmp_path):
    import pytest

    mc = ModelConfig(hidden_size=8, use_recurrent_policy=True)
    with pytest.raises(ValueError):
        export_browser_bundle(str(tmp_path), {"params": {}}, mc, 2, np.zeros(4))
