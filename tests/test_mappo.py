"""MAPPO stack tests: ValueNorm/PopArt vs numpy oracles of the reference EMA
semantics (``train/MAPPO/utils/valuenorm.py``, ``popart.py``), buffer GAE vs a
loop oracle (``shared_buffer.py:176-233``), and an end-to-end runner smoke."""

import jax
import jax.numpy as jnp
import numpy as np

from madrona_rl_envs_playground_tpu.envs import balance_beam
from madrona_rl_envs_playground_tpu.train.mappo import (
    MAPPOConfig,
    MAPPORunner,
    compute_returns,
    init_buffer,
    init_valuenorm,
    popart_update,
    vn_denormalize,
    vn_normalize,
    vn_update,
)


def test_valuenorm_matches_reference_ema():
    rng = np.random.RandomState(0)
    s = init_valuenorm()
    beta = 0.99999
    rm = rm_sq = db = 0.0
    for _ in range(5):
        x = rng.randn(64).astype(np.float32) * 3 + 1
        s = vn_update(s, jnp.asarray(x), beta=beta)
        rm = rm * beta + x.mean() * (1 - beta)
        rm_sq = rm_sq * beta + (x**2).mean() * (1 - beta)
        db = db * beta + (1 - beta)
    mean = rm / max(db, 1e-5)
    var = max(rm_sq / max(db, 1e-5) - mean**2, 1e-2)
    y = rng.randn(16).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(vn_normalize(s, jnp.asarray(y))), (y - mean) / np.sqrt(var),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(vn_denormalize(s, jnp.asarray(y))), y * np.sqrt(var) + mean,
        rtol=1e-4, atol=1e-5,
    )


def test_popart_preserves_outputs():
    rng = np.random.RandomState(1)
    kernel = jnp.asarray(rng.randn(8).astype(np.float32))
    bias = jnp.float32(0.3)
    s = init_valuenorm()
    x_in = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    raw_out = x_in @ kernel + bias  # pre-update denormalized prediction
    denorm_before = vn_denormalize(s, raw_out)
    batch = jnp.asarray(rng.randn(32).astype(np.float32) * 5 + 2)
    k2, b2, s2 = popart_update(kernel, bias, s, batch, beta=0.9)
    denorm_after = vn_denormalize(s2, x_in @ k2 + b2)
    np.testing.assert_allclose(
        np.asarray(denorm_after), np.asarray(denorm_before), rtol=1e-4, atol=1e-4
    )


def _oracle_returns(rew, vp, masks, gamma, lam, denorm):
    T = rew.shape[0]
    rets = np.zeros_like(rew)
    gae = np.zeros_like(rew[0])
    for t in reversed(range(T)):
        delta = rew[t] + gamma * denorm(vp[t + 1]) * masks[t + 1] - denorm(vp[t])
        gae = delta + gamma * lam * masks[t + 1] * gae
        rets[t] = gae + denorm(vp[t])
    return rets


def test_compute_returns_matches_oracle():
    T, N, A = 12, 4, 2
    M = N * A  # buffer stores threads x agents merged
    rng = np.random.RandomState(2)
    buf = init_buffer(T, N, A, 3, 3, 2, 1, 8)
    rew = rng.randn(T, M).astype(np.float32)
    vp = rng.randn(T + 1, M).astype(np.float32)
    masks = (rng.rand(T + 1, M) > 0.2).astype(np.float32)
    buf = buf.replace(
        rewards=jnp.asarray(rew),
        value_preds=jnp.asarray(vp),
        masks=jnp.asarray(masks),
    )
    nv = jnp.asarray(vp[-1])

    # plain (no valuenorm)
    out = compute_returns(buf, nv, None, 0.99, 0.95)
    oracle = _oracle_returns(rew, vp, masks, 0.99, 0.95, lambda v: v)
    np.testing.assert_allclose(np.asarray(out.returns[:-1]), oracle, rtol=1e-4, atol=1e-4)

    # with valuenorm denormalization
    s = vn_update(init_valuenorm(), jnp.asarray(rng.randn(100) * 2 + 3), beta=0.9)
    out2 = compute_returns(buf, nv, s, 0.99, 0.95)
    dn = lambda v: np.asarray(vn_denormalize(s, jnp.asarray(v)))
    oracle2 = _oracle_returns(rew, vp, masks, 0.99, 0.95, dn)
    np.testing.assert_allclose(np.asarray(out2.returns[:-1]), oracle2, rtol=1e-4, atol=1e-3)


def test_terminal_mask_written_to_final_slot():
    """Regression: with horizon == episode_length (the mappo_train default for
    overcooked), done fires at the final collected step of every rollout.  The
    post-collect carry mask must land in buf.masks[T]; the reference
    SharedReplayBuffer.insert writes masks[step+1] for all steps, so masks[T]
    is 0 there.  Otherwise every terminal transition bootstraps the value of
    the NEXT episode's reset obs."""
    env = balance_beam.Env()  # 3-timestep horizon
    cfg = MAPPOConfig(
        episode_length=3, n_rollout_threads=4, hidden_size=16, layer_N=1,
        ppo_epoch=1, num_mini_batch=1,
    )
    runner = MAPPORunner(cfg, env)
    (bstate, out, rnn, rnnc, masks, _, tr) = runner._collect(
        runner.trainer.state.policy, runner.bstate, runner.out,
        runner._rnn, runner._rnnc, runner._masks, jax.random.PRNGKey(0),
    )
    m = np.asarray(masks)  # post-collect carry = 1 - done(final step)
    assert m.min() == 0.0, "at least one env must terminate at the final step"
    buf = runner._tr_to_buffer(tr, masks, out.active.astype(jnp.float32))
    N, A = cfg.n_rollout_threads, env.num_agents
    np.testing.assert_array_equal(np.asarray(buf.masks[-1]), m)
    # and GAE must NOT bootstrap past a terminal final step
    nv = jnp.ones((N * A,)) * 123.0
    out_buf = compute_returns(buf, nv, None, 0.99, 0.95)
    final_ret = np.asarray(out_buf.returns[cfg.episode_length - 1])
    final_rew = np.asarray(buf.rewards[-1])
    ended = m == 0.0
    np.testing.assert_allclose(final_ret[ended], final_rew[ended], rtol=1e-5, atol=1e-5)
    assert np.all(final_ret[~ended] != final_rew[~ended]) or ended.all()


def test_critic_head_accessor():
    from madrona_rl_envs_playground_tpu.models.mappo_nets import (
        R_Critic, get_critic_head,
    )
    import pytest

    cfg = MAPPOConfig(hidden_size=16, layer_N=1)
    runner = MAPPORunner(
        MAPPOConfig(episode_length=3, n_rollout_threads=2, hidden_size=16),
        balance_beam.Env(),
    )
    cp = runner.trainer.state.policy.critic_params
    head = get_critic_head(cp)
    assert head["kernel"].shape[-1] == 1 and head["bias"].shape == (1,)
    # a renamed/moved head must fail loudly, not silently skip PopArt surgery
    tampered = {"params": {k: v for k, v in cp["params"].items()
                           if k != R_Critic.HEAD_NAME}}
    with pytest.raises(KeyError):
        get_critic_head(tampered)


def test_mappo_runner_smoke():
    cfg = MAPPOConfig(
        episode_length=6, n_rollout_threads=8, hidden_size=32, layer_N=1,
        ppo_epoch=2, num_mini_batch=2, lr=1e-3, critic_lr=1e-3,
    )
    runner = MAPPORunner(cfg, balance_beam.Env())
    info = runner.run(episodes=2)
    assert np.isfinite(float(info["value_loss"]))
    assert np.isfinite(float(info["policy_loss"]))
    score = runner.evaluate(episodes=1)
    assert np.isfinite(score)


def test_mappo_recurrent_smoke():
    cfg = MAPPOConfig(
        episode_length=8, n_rollout_threads=4, hidden_size=32, layer_N=1,
        ppo_epoch=2, use_recurrent_policy=True, data_chunk_length=4,
    )
    runner = MAPPORunner(cfg, balance_beam.Env())
    info = runner.run(episodes=1)
    assert np.isfinite(float(info["value_loss"]))


def test_mappo_popart_smoke():
    cfg = MAPPOConfig(
        episode_length=6, n_rollout_threads=8, hidden_size=32, layer_N=1,
        ppo_epoch=2, use_popart=True, use_valuenorm=False,
    )
    runner = MAPPORunner(cfg, balance_beam.Env())
    info = runner.run(episodes=2)
    assert np.isfinite(float(info["value_loss"]))


def test_mappo_cnn_smoke():
    """use_cnn_obs routes the base to CNNBase over the overcooked [W,H,C]
    grid (reference train/MAPPO/utils/cnn.py, selected by 3-D obs shape);
    train + eval run and the actor params contain the conv kernel."""
    from madrona_rl_envs_playground_tpu.envs import overcooked2

    cfg = MAPPOConfig(
        episode_length=8, n_rollout_threads=4, hidden_size=32, layer_N=1,
        ppo_epoch=2, use_cnn_obs=True,
    )
    env = overcooked2.make("cramped_room", horizon=8)
    runner = MAPPORunner(cfg, env)
    # the base resolved to the CNN: a Conv kernel [3,3,C,hidden//2] exists
    leaves = jax.tree_util.tree_leaves_with_path(runner.policy.state.actor_params)
    conv = [p for p, l in leaves if getattr(l, "ndim", 0) == 4]
    assert conv, "no 4-D conv kernel in actor params — CNNBase not selected"
    info = runner.run(episodes=2)
    assert np.isfinite(float(info["value_loss"]))
    assert np.isfinite(runner.evaluate(episodes=1, deterministic=True))


def test_mappo_cnn_obs_requires_grid_env():
    cfg = MAPPOConfig(episode_length=4, n_rollout_threads=2, hidden_size=16,
                      use_cnn_obs=True)
    try:
        MAPPORunner(cfg, balance_beam.Env())
        raise AssertionError("expected ValueError for flat-obs env")
    except ValueError:
        pass
