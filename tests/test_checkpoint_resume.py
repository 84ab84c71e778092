"""Checkpoint/resume semantics — beyond the reference's params-only saves:

* ``SelfPlayPPO.save``/``load`` round-trips the FULL training state
  (params, optimizer, RNG key, batched env state), so a restored trainer
  continues the exact trajectory of an uninterrupted one.
* ``MAPPORunner.save``/``restore`` persists both Adam states + ValueNorm,
  so training resumes instead of restarting the optimizer; params-only
  (older) checkpoints still load.
"""

import numpy as np
import jax
import pytest

from madrona_rl_envs_playground_tpu.envs import balance_beam, overcooked2
from madrona_rl_envs_playground_tpu.train.selfplay import (
    SelfPlayConfig, SelfPlayPPO)


def _metrics_close(a, b):
    for k in a:
        np.testing.assert_allclose(
            float(a[k]), float(b[k]), rtol=1e-5, atol=1e-6, err_msg=k)


def test_selfplay_full_resume(tmp_path):
    env = overcooked2.make("simple", horizon=10)
    cfg = SelfPlayConfig(num_steps=8, hidden=16, num_layers=1,
                         update_epochs=2)
    tr = SelfPlayPPO(env, num_envs=8, cfg=cfg, seed=5)
    tr.run(2)
    path = str(tmp_path / "ck")
    tr.save(path)
    _, m_cont = tr.train_step(tr.state)

    tr2 = SelfPlayPPO(env, num_envs=8, cfg=cfg, seed=99)  # different seed
    tr2.load(path)
    _, m_res = tr2.train_step(tr2.state)
    _metrics_close(
        {k: v for k, v in m_cont.items()},
        {k: v for k, v in m_res.items()},
    )


def test_selfplay_policy_only_restore_across_batch_sizes(tmp_path):
    env = balance_beam.Env()
    cfg = SelfPlayConfig(num_steps=6, hidden=16, num_layers=1,
                         update_epochs=1)
    tr = SelfPlayPPO(env, num_envs=8, cfg=cfg, seed=1)
    tr.run(1)
    path = str(tmp_path / "ck")
    tr.save(path)

    tr2 = SelfPlayPPO(env, num_envs=16, cfg=cfg, seed=2)  # other batch size
    tr2.load(path)  # env state dropped, params/opt restored
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        tr.state["params"], tr2.state["params"])
    _, m = tr2.train_step(tr2.state)
    assert np.isfinite(float(m["pg_loss"]))


def test_mappo_optimizer_state_roundtrip(tmp_path):
    from madrona_rl_envs_playground_tpu.train.mappo import (
        MAPPOConfig, MAPPORunner)

    cfg = MAPPOConfig(episode_length=6, n_rollout_threads=8, hidden_size=16,
                      layer_N=1, ppo_epoch=2)
    runner = MAPPORunner(cfg, balance_beam.Env())
    runner.run(episodes=1)
    path = str(tmp_path / "run")
    runner.save(path)

    runner2 = MAPPORunner(cfg, balance_beam.Env())
    runner2.restore(path)
    for field in ("actor_params", "critic_params", "actor_opt", "critic_opt"):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            getattr(runner.trainer.state.policy, field),
            getattr(runner2.trainer.state.policy, field))

    # params-only (legacy) checkpoints still load
    import pickle, os
    with open(os.path.join(path, "checkpoint.pkl"), "rb") as f:
        blob = pickle.load(f)
    legacy = {k: blob[k] for k in ("actor_params", "critic_params", "vn")}
    with open(os.path.join(path, "checkpoint.pkl"), "wb") as f:
        pickle.dump(legacy, f)
    runner3 = MAPPORunner(cfg, balance_beam.Env())
    runner3.restore(path)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        runner.trainer.state.policy.actor_params,
        runner3.trainer.state.policy.actor_params)
