"""The megakernel rollout-collection seam (train/fused_collect.py).

Two layers of proof, both on CPU in Pallas interpret mode (the identical
kernels compile on real TPU — see tests/test_overcooked_pallas.py /
test_hanabi_megakernel.py):

1. ``FusedCollect.step`` emits a ``StepOutput`` bit-identical to
   ``batched_step``'s for every field (including the assembled ones the
   kernel doesn't emit directly: hanabi ``state_obs``/``active``, overcooked
   constant masks) and round-trips the BatchState through pack/unpack.
2. ``SelfPlayPPO`` trained with ``rollout_backend="pallas"`` matches the
   ``"jnp"`` trainer's metrics and parameters — same trajectories, same
   updates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_rl_envs_playground_tpu.core.batch import batched_reset, batched_step
from madrona_rl_envs_playground_tpu.envs import acrobot, balance_beam, cartpole, hanabi, overcooked
from madrona_rl_envs_playground_tpu.train.fused_collect import make_fused_collect
from madrona_rl_envs_playground_tpu.train.selfplay import SelfPlayConfig, SelfPlayPPO

N = 8


def _assert_out_equal(got, ref, t):
    for f in ("obs", "state_obs", "action_mask", "active", "reward", "done"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)),
            err_msg=f"t={t} {f}",
        )


def _assert_bstate_equal(got, ref, t):
    assert int(got.episode_counter) == int(ref.episode_counter), f"t={t} counter"
    for f in ref.env_states.__dataclass_fields__:
        np.testing.assert_array_equal(
            np.asarray(getattr(got.env_states, f)),
            np.asarray(getattr(ref.env_states, f)),
            err_msg=f"t={t} state.{f}",
        )


def _legal_actions(rs, mask_np):
    n, p, _ = mask_np.shape
    out = np.zeros((n, p), np.int32)
    for i in range(n):
        for q in range(p):
            legal = np.nonzero(mask_np[i, q])[0]
            out[i, q] = rs.choice(legal) if len(legal) else 0
    return out


@pytest.mark.parametrize("kind", ["overcooked", "hanabi", "balance", "acrobot", "cartpole"])
def test_fused_collect_matches_batched_step(kind):
    if kind == "overcooked":
        env = overcooked.make("cramped_room", horizon=13)
    elif kind == "balance":
        env = balance_beam.Env()
    elif kind == "acrobot":
        env = acrobot.Env()
    elif kind == "cartpole":
        env = cartpole.Env()
    else:
        env = hanabi.Env(**hanabi.CONFIGS["very_small"])
    fc = make_fused_collect(env, N, interpret=True)
    assert fc is not None

    bstate, out = batched_reset(env, N)
    carry = fc.pack(bstate)
    _assert_bstate_equal(fc.unpack(carry), bstate, -1)

    step_jnp = jax.jit(batched_step, static_argnums=(0,))
    step_fc = jax.jit(fc.step)
    rs = np.random.RandomState(7)
    for t in range(30):
        actions = jnp.asarray(_legal_actions(rs, np.asarray(out.action_mask)))
        bstate, out = step_jnp(env, bstate, actions)
        carry, fout = step_fc(carry, actions)
        _assert_out_equal(fout, out, t)
    _assert_bstate_equal(fc.unpack(carry), bstate, t)


@pytest.mark.parametrize("kind", ["overcooked", "hanabi", "balance", "cartpole"])
def test_selfplay_pallas_rollout_matches_jnp(kind):
    if kind == "overcooked":
        env = overcooked.make("cramped_room", horizon=10)
    elif kind == "balance":
        env = balance_beam.Env()
    elif kind == "cartpole":
        env = cartpole.Env()
    else:
        env = hanabi.Env(**hanabi.CONFIGS["very_small"])
    cfg = dict(num_steps=12, hidden=32, num_layers=2, update_epochs=2,
               num_minibatches=2)
    tr_j = SelfPlayPPO(env, N, SelfPlayConfig(rollout_backend="jnp", **cfg),
                       seed=3)
    tr_p = SelfPlayPPO(env, N, SelfPlayConfig(rollout_backend="pallas", **cfg),
                       seed=3)
    assert tr_p._fused is not None and tr_j._fused is None
    for u in range(2):
        tr_j.state, m_j = tr_j.train_step(tr_j.state)
        tr_p.state, m_p = tr_p.train_step(tr_p.state)
        for k in m_j:
            np.testing.assert_allclose(
                np.asarray(m_j[k]), np.asarray(m_p[k]), rtol=2e-5, atol=1e-6,
                err_msg=f"u={u} metric {k}",
            )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
        tr_j.state["params"], tr_p.state["params"],
    )


def test_mappo_pallas_collect_matches_jnp():
    from madrona_rl_envs_playground_tpu.train.mappo import (
        MAPPOConfig, MAPPORunner)

    env = overcooked.make("cramped_room", horizon=8)
    mk = lambda backend: MAPPORunner(
        MAPPOConfig(episode_length=8, n_rollout_threads=4, hidden_size=16,
                    layer_N=1, ppo_epoch=2, num_mini_batch=1, seed=5,
                    rollout_backend=backend),
        env,
    )
    r_j, r_p = mk("jnp"), mk("pallas")
    assert r_p._fused is not None and r_j._fused is None
    r_j.run(episodes=2)
    r_p.run(episodes=2)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
        r_j.trainer.state.policy.actor_params,
        r_p.trainer.state.policy.actor_params,
    )


@pytest.mark.parametrize("kind", ["overcooked", "balance", "hanabi"])
def test_cols_rollout_trajectory_matches_generic(kind):
    """Direct trajectory-level equivalence of the lane-resident cols
    rollout (r5): per-(env, seat) streams must carry IDENTICAL actions and
    stored values as the generic env-major body — the cols path only
    permutes stream order (p-major vs n-major) and feature-major obs
    layout.  Stricter than the metrics/params test above: any sampling or
    credit misalignment shows up here immediately."""
    if kind == "overcooked":
        env = overcooked.make("cramped_room", horizon=10)
    elif kind == "balance":
        env = balance_beam.Env()
    else:
        env = hanabi.Env(**hanabi.CONFIGS["very_small"])
    P = env.num_agents
    cfg = dict(num_steps=10, hidden=32, num_layers=2, update_epochs=1)

    tr_p = SelfPlayPPO(env, N, SelfPlayConfig(rollout_backend="pallas",
                                              **cfg), seed=9)
    tr_j = SelfPlayPPO(env, N, SelfPlayConfig(rollout_backend="jnp",
                                              **cfg), seed=9)
    assert tr_p._cols and not tr_j._cols

    bs_p, out_p, _, t_p = jax.jit(tr_p._rollout)(tr_p.state)
    bs_j, out_j, _, t_j = jax.jit(tr_j._rollout)(tr_j.state)

    # reorder cols streams (b = p*N + n) to the generic order (m = n*P + p)
    def to_rows_order(x):  # [T, B] -> [T, M]
        return np.asarray(x).reshape(x.shape[0], P, N).transpose(0, 2, 1) \
            .reshape(x.shape[0], N * P)

    np.testing.assert_array_equal(to_rows_order(t_p["action"]),
                                  np.asarray(t_j["action"]))
    np.testing.assert_array_equal(to_rows_order(t_p["done"]),
                                  np.asarray(t_j["done"]))
    np.testing.assert_allclose(to_rows_order(t_p["reward"]),
                               np.asarray(t_j["reward"]), atol=0)
    np.testing.assert_allclose(to_rows_order(t_p["logp"]),
                               np.asarray(t_j["logp"]), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(to_rows_order(t_p["value"]),
                               np.asarray(t_j["value"]), rtol=2e-5, atol=1e-6)
    # obs: cols [T, F, B] vs generic [T, M, F]
    T = t_j["obs"].shape[0]
    obs_p = np.asarray(t_p["obs_cols"]).transpose(0, 2, 1) \
        .reshape(T, P, N, -1).transpose(0, 2, 1, 3).reshape(T, N * P, -1)
    np.testing.assert_array_equal(obs_p, np.asarray(t_j["obs"]))
    # post-rollout StepOutput agrees field-for-field
    np.testing.assert_array_equal(np.asarray(out_p.obs), np.asarray(out_j.obs))
    np.testing.assert_array_equal(np.asarray(out_p.done),
                                  np.asarray(out_j.done))
    np.testing.assert_array_equal(np.asarray(out_p.active),
                                  np.asarray(out_j.active))
