"""Multi-device correctness on the virtual 8-CPU mesh (SURVEY §7.5).

The driver's ``dryrun_multichip`` only proves the sharded train step
compiles and runs; these tests prove it computes the SAME thing:

* sharded ``batched_step`` == unsharded (bit-exact, every env family);
* ``SelfPlayPPO.train_step`` on a mesh == single-device (tolerance —
  reduction orders differ across shards);
* the MAPPO collect+train episode on sharded batch state == single-device.

Run via the standard CPU invocation (conftest forces
``xla_force_host_platform_device_count=8``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_rl_envs_playground_tpu.core.batch import batched_reset, batched_step
from madrona_rl_envs_playground_tpu.envs import balance_beam, cartpole, hanabi, overcooked2
from madrona_rl_envs_playground_tpu.parallel.mesh import (
    make_mesh,
    shard_batch_pytree,
)

need8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs >= 8 devices (virtual CPU mesh)"
)

N = 32


def _envs():
    return {
        "cartpole": cartpole.Env(),
        "balance": balance_beam.Env(),
        "overcooked2": overcooked2.make("simple", horizon=20),
        "hanabi": hanabi.Env(**hanabi.CONFIGS["very_small"]),
    }


@need8
@pytest.mark.parametrize("name", ["cartpole", "balance", "overcooked2", "hanabi"])
def test_sharded_step_bitexact(name):
    """env-axis-sharded step must equal the single-device step bit for bit
    (pure integer/float ops on disjoint env rows; no cross-env reduction
    except the episode counter cumsum, which XLA computes identically)."""
    env = _envs()[name]
    mesh = make_mesh(8)
    step = jax.jit(batched_step, static_argnums=(0,))

    bstate_s, out_s = batched_reset(env, N)
    bstate_r = jax.tree_util.tree_map(lambda x: jnp.array(x), bstate_s)
    bstate_s = shard_batch_pytree(bstate_s, mesh)

    rs = np.random.RandomState(5)
    for t in range(12):
        actions = jnp.asarray(
            rs.randint(0, env.num_actions, size=(N, env.num_agents)), jnp.int32
        )
        bstate_r, out_r = step(env, bstate_r, actions)
        bstate_s, out_s = step(env, bstate_s, shard_batch_pytree(actions, mesh))
        for field in ("obs", "state_obs", "action_mask", "active", "reward", "done"):
            np.testing.assert_array_equal(
                np.asarray(getattr(out_r, field)),
                np.asarray(getattr(out_s, field)),
                err_msg=f"{name} t={t} {field}",
            )
        assert int(bstate_r.episode_counter) == int(bstate_s.episode_counter)


@need8
def test_selfplay_train_step_sharded_equals_single():
    from madrona_rl_envs_playground_tpu.train import SelfPlayConfig, SelfPlayPPO

    env = balance_beam.Env()
    cfg = SelfPlayConfig(num_steps=8, hidden=32, num_layers=1, lr=1e-3)
    mesh = make_mesh(8)
    a = SelfPlayPPO(env, num_envs=N, cfg=cfg, seed=3)
    b = SelfPlayPPO(env, num_envs=N, cfg=cfg, seed=3, mesh=mesh)

    for _ in range(2):
        a.state, ma = a.train_step(a.state)
        b.state, mb = b.train_step(b.state)

    for k in ma:
        np.testing.assert_allclose(
            float(ma[k]), float(mb[k]), rtol=2e-3, atol=2e-3, err_msg=k
        )
    pa, pb = jax.device_get(a.state["params"]), jax.device_get(b.state["params"])
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(x, y, rtol=5e-3, atol=5e-4), pa, pb
    )


@need8
def test_mappo_episode_sharded_equals_single():
    from madrona_rl_envs_playground_tpu.train.mappo import MAPPOConfig, MAPPORunner

    env = balance_beam.Env()
    cfg = MAPPOConfig(
        episode_length=6, n_rollout_threads=N, hidden_size=32, layer_N=1,
        ppo_epoch=2, num_mini_batch=2, lr=1e-3, critic_lr=1e-3, seed=11,
    )
    mesh = make_mesh(8)

    def one_episode(runner, shard):
        if shard:
            runner.bstate = shard_batch_pytree(runner.bstate, mesh)
            runner.out = shard_batch_pytree(runner.out, mesh)
        info = runner.run(episodes=1)
        return info, jax.device_get(runner.trainer.state.policy.actor_params)

    ia, pa = one_episode(MAPPORunner(cfg, env), shard=False)
    ib, pb = one_episode(MAPPORunner(cfg, env), shard=True)
    for k in ia:
        np.testing.assert_allclose(
            float(ia[k]), float(ib[k]), rtol=2e-3, atol=2e-3, err_msg=k
        )
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(x, y, rtol=5e-3, atol=5e-4), pa, pb
    )


@need8
def test_selfplay_fused_collect_sharded_equals_single():
    """The shard_map-wrapped overcooked megakernel rollout on an 8-device
    mesh must train identically (to reduction-order tolerance) to the
    single-device fused trainer — overcooked resets are episode-index-free,
    so the per-device kernels are exact (see make_fused_collect)."""
    from madrona_rl_envs_playground_tpu.train import SelfPlayConfig, SelfPlayPPO

    env = overcooked2.make("simple", horizon=10)
    cfg = SelfPlayConfig(num_steps=8, hidden=32, num_layers=1, lr=1e-3,
                         rollout_backend="pallas")
    mesh = make_mesh(8)
    a = SelfPlayPPO(env, num_envs=N, cfg=cfg, seed=3)
    b = SelfPlayPPO(env, num_envs=N, cfg=cfg, seed=3, mesh=mesh)
    assert a._fused is not None and b._fused is not None

    for _ in range(2):
        a.state, ma = a.train_step(a.state)
        b.state, mb = b.train_step(b.state)
    for k in ma:
        np.testing.assert_allclose(
            float(ma[k]), float(mb[k]), rtol=2e-3, atol=2e-3, err_msg=k
        )
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(x, y, rtol=5e-3, atol=5e-4),
        jax.device_get(a.state["params"]), jax.device_get(b.state["params"]),
    )


@need8
def test_mappo_fused_collect_sharded_equals_single():
    """MAPPORunner(mesh=...) with the pallas rollout backend must train
    identically (to tolerance) to the single-device fused runner — same
    shard_map overcooked-kernel argument as the selfplay test above."""
    from madrona_rl_envs_playground_tpu.train.mappo import MAPPOConfig, MAPPORunner

    env = overcooked2.make("simple", horizon=20)
    cfg = MAPPOConfig(
        episode_length=6, n_rollout_threads=N, hidden_size=32, layer_N=1,
        ppo_epoch=2, num_mini_batch=2, lr=1e-3, critic_lr=1e-3, seed=11,
        rollout_backend="pallas",
    )
    mesh = make_mesh(8)
    a = MAPPORunner(cfg, env)
    b = MAPPORunner(cfg, env, mesh=mesh)
    assert a._fused is not None and b._fused is not None
    ia = a.run(episodes=1)
    ib = b.run(episodes=1)
    for k in ia:
        np.testing.assert_allclose(
            float(ia[k]), float(ib[k]), rtol=2e-3, atol=2e-3, err_msg=k
        )
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(x, y, rtol=5e-3, atol=5e-4),
        jax.device_get(a.trainer.state.policy.actor_params),
        jax.device_get(b.trainer.state.policy.actor_params),
    )


@need8
def test_persistent_rollout_sharded_bitexact():
    """The overcooked persistent whole-rollout kernel under shard_map over
    the virtual mesh == single-device (overcooked resets are episode-index
    free and action streams are per-env, so env-axis sharding is exact;
    block == per-shard envs keeps the in-shard schedule identical)."""
    from jax.sharding import PartitionSpec as PS

    from madrona_rl_envs_playground_tpu.envs import overcooked
    from madrona_rl_envs_playground_tpu.ops import overcooked_pallas as ok
    from madrona_rl_envs_playground_tpu.parallel.mesh import ENV_AXIS

    env = overcooked.make("cramped_room", horizon=12)
    T = 30
    ts0 = ok.init_packed(env, N)
    w0 = ok.init_action_rng(N, env.num_players)

    single = jax.jit(lambda ts, w: ok.fused_rollout(
        env, ts, w, T, block=N // 8, interpret=True))
    ts_a, w_a, dcnt_a, chk_a = single(ts0, w0)

    mesh = make_mesh(8)
    lanes = PS(None, ENV_AXIS)
    sharded = jax.jit(jax.shard_map(
        lambda ts, w: ok.fused_rollout(env, ts, w, T, block=N // 8,
                                       interpret=True),
        mesh=mesh, in_specs=(lanes, lanes),
        out_specs=(lanes, lanes, PS(ENV_AXIS), PS(ENV_AXIS)),
        check_vma=False,
    ))
    ts_b, w_b, dcnt_b, chk_b = sharded(ts0, w0)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        (ts_a, w_a, dcnt_a, chk_a), (ts_b, w_b, dcnt_b, chk_b),
    )


@need8
def test_mappo_shard_local_minibatch_no_allgather():
    """num_mini_batch>1 default all-gathers the whole buffer each epoch
    (documented cliff, docs/multihost_projection.md); the flag-gated
    shard_local_minibatch (timestep-band permutation) must compile with
    ZERO all-gathers — only the gradient all-reduces."""
    import re

    from madrona_rl_envs_playground_tpu.train.mappo import (
        MAPPOConfig, MAPPORunner)

    env = balance_beam.Env()
    mesh = make_mesh(8)

    def compiled_allgather_count(local_flag):
        cfg = MAPPOConfig(
            episode_length=8, n_rollout_threads=N, hidden_size=32,
            layer_N=1, ppo_epoch=2, num_mini_batch=4, seed=5,
            shard_local_minibatch=local_flag,
        )
        runner = MAPPORunner(cfg, env, mesh=mesh)
        ck, tk = jax.random.split(jax.random.PRNGKey(0))
        (bstate, out, rnn, rnnc, masks, _, tr) = runner._collect(
            runner.trainer.state.policy, runner.bstate, runner.out,
            runner._rnn, runner._rnnc, runner._masks, ck)
        buf = runner._tr_to_buffer(tr, masks, out.active.astype(jnp.float32))
        buf = runner._compute(runner.trainer.state, buf, out, rnnc, masks)
        txt = runner.trainer.train.lower(
            runner.trainer.state, buf, tk,
            (jnp.float32(1e-3), jnp.float32(1e-3))).compile().as_text()
        return len(re.findall(r" all-gather(?:-start)?\(", txt)), runner, buf, tk

    n_local, runner, buf, tk = compiled_allgather_count(True)
    assert n_local == 0, f"shard-local path compiled {n_local} all-gathers"
    # and it actually trains: one update with finite metrics
    runner.trainer.state, info = runner.trainer.train(
        runner.trainer.state, buf, tk, (jnp.float32(1e-3), jnp.float32(1e-3)))
    assert all(np.isfinite(float(v)) for v in info.values())

    n_default, *_ = compiled_allgather_count(False)
    assert n_default > 0, (
        "expected the reference flat-permutation path to all-gather on the "
        "mesh — if this stopped happening, update the docs and retire the "
        "flag")


def test_mappo_shard_local_minibatch_learns():
    """Single-device learning smoke for the flag (semantics deviation is
    sampling-order only): balance reward improves over a few episodes."""
    from madrona_rl_envs_playground_tpu.train.mappo import (
        MAPPOConfig, MAPPORunner)

    cfg = MAPPOConfig(
        episode_length=8, n_rollout_threads=16, hidden_size=32, layer_N=1,
        ppo_epoch=3, num_mini_batch=4, lr=5e-3, critic_lr=5e-3, seed=2,
        shard_local_minibatch=True,
    )
    runner = MAPPORunner(cfg, balance_beam.Env())
    info = runner.run(episodes=3)
    assert np.isfinite(float(info["value_loss"]))
