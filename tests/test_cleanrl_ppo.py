"""CleanRL PPO agent tests.

The GAE oracle below re-derives the reference's active-masked advantage loop
(``pantheonrl_extension/vectoragent.py:230-262``) in plain numpy, including
the bootstrapping/de-activation rules, and checks the jitted ``lax.scan``
version against it on randomized turn-based activity patterns.
"""

import jax
import jax.numpy as jnp
import numpy as np

from madrona_rl_envs_playground_tpu.api import RandomVectorAgent, TpuVecEnv
from madrona_rl_envs_playground_tpu.envs import balance_beam
from madrona_rl_envs_playground_tpu.train.cleanrl_ppo import (
    CleanPPOAgent,
    Rollout,
    active_masked_gae,
)


def _oracle_gae(rew, done, val, act, next_value, next_done, final_active, gamma, lam):
    """Numpy re-derivation of the reference loop semantics."""
    T, N = rew.shape
    adv = np.zeros((T, N))
    active_out = act.copy()
    bootstrapped = final_active.copy()
    nnt = np.zeros(N)
    nv = np.zeros(N)
    nnt[bootstrapped] = 1.0 - next_done[bootstrapped]
    nv[bootstrapped] = next_value[bootstrapped]
    lastgaelam = np.zeros(N)
    for t in reversed(range(T)):
        mask = act[t].copy()
        computemask = mask.copy()
        if not bootstrapped.all():
            bootmask = mask & ~bootstrapped
            computemask = mask & ~bootstrapped
            bootstrapped |= mask
            active_out[t][bootmask] = False
        delta = rew[t] + gamma * nv * nnt - val[t]
        cand = delta + gamma * lam * nnt * lastgaelam
        lastgaelam = np.where(computemask, cand, lastgaelam)
        adv[t] = np.where(computemask, cand, 0.0)
        nnt = np.where(mask, 1.0 - done[t], nnt)
        nv = np.where(mask, val[t], nv)
    return adv, adv + val, active_out


def _random_case(seed, T=16, N=5, turn_based=True):
    rng = np.random.RandomState(seed)
    rew = rng.randn(T, N).astype(np.float32)
    done = rng.rand(T, N) < 0.15
    val = rng.randn(T, N).astype(np.float32)
    if turn_based:
        offset = rng.randint(0, 2, size=N)
        act = ((np.arange(T)[:, None] + offset) % 2 == 0)
    else:
        act = rng.rand(T, N) < 0.8
    next_value = rng.randn(N).astype(np.float32)
    next_done = rng.rand(N) < 0.2
    final_active = rng.rand(N) < 0.6
    return rew, done, val, act, next_value, next_done, final_active


def test_gae_matches_reference_semantics():
    for seed in range(6):
        rew, done, val, act, nv, nd, fa = _random_case(seed, turn_based=(seed % 2 == 0))
        T, N = rew.shape
        buf = Rollout(
            obs=jnp.zeros((T, N, 1)),
            states=jnp.zeros((T, N, 1)),
            actions=jnp.zeros((T, N), jnp.int32),
            action_masks=jnp.ones((T, N, 2), jnp.bool_),
            logprobs=jnp.zeros((T, N)),
            rewards=jnp.asarray(rew),
            dones=jnp.asarray(done),
            active=jnp.asarray(act),
            values=jnp.asarray(val),
        )
        adv, ret, act_out = jax.jit(active_masked_gae, static_argnums=(4, 5))(
            buf, jnp.asarray(nv), jnp.asarray(nd), jnp.asarray(fa), 0.99, 0.95
        )
        o_adv, o_ret, o_act = _oracle_gae(
            rew, done.astype(float), val, act, nv, nd.astype(float), fa, 0.99, 0.95
        )
        np.testing.assert_allclose(np.asarray(adv), o_adv, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ret), o_ret, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(act_out), o_act)


def test_ppo_agent_smoke_balance():
    """Two CleanPPO agents (ego + partner) run several update cycles on
    Balance Beam without error — the decentralized-training loop of
    ``scripts/balance_train.py``."""
    env = balance_beam.Env()
    venv = TpuVecEnv(env, num_envs=8)
    partner = CleanPPOAgent(venv, "partner", num_updates=4, verbose=False,
                            num_steps=6, hidden=32, seed=1)
    venv.add_partner_agent(partner)
    ego = CleanPPOAgent(venv, "ego", num_updates=4, verbose=False,
                        num_steps=6, hidden=32, seed=2)

    obs = venv.reset()
    for _ in range(14):  # crosses two train boundaries
        act = ego.get_action(obs)
        obs, rew, done, _ = venv.step(act)
        ego.update(rew, done)
    assert ego.updates >= 3
    m = ego._last_metrics
    assert m is not None and np.isfinite(float(m["pg_loss"]))


def test_ppo_improves_on_bandit_like_balance():
    """Sanity learning signal: with enough updates the masked PPO update
    moves the policy (entropy decreases or return improves)."""
    env = balance_beam.Env()
    venv = TpuVecEnv(env, num_envs=16)
    partner = RandomVectorAgent(env.num_actions, seed=3)
    venv.add_partner_agent(partner)
    ego = CleanPPOAgent(venv, "learner", num_updates=10, verbose=False,
                        num_steps=12, hidden=32, seed=4, lr=1e-3)
    obs = venv.reset()
    rets = []
    for _ in range(10 * 12):
        act = ego.get_action(obs)
        obs, rew, done, _ = venv.step(act)
        ego.update(rew, done)
        if ego._last_metrics is not None:
            rets.append(float(ego._last_metrics["entropy"]))
    assert len(rets) >= 2 and np.isfinite(rets[-1])


def test_plain_gae_equals_masked_gae_all_active():
    """plain_gae is the active==ones specialization of active_masked_gae
    (the r5 associative-scan fast path) — equal on random streams."""
    import numpy as np

    from madrona_rl_envs_playground_tpu.train.cleanrl_ppo import (
        Rollout, active_masked_gae, plain_gae)

    rs = np.random.RandomState(3)
    T, M = 17, 33
    rew = jnp.asarray(rs.randn(T, M), jnp.float32)
    dones = jnp.asarray(rs.rand(T, M) < 0.15)
    vals = jnp.asarray(rs.randn(T, M), jnp.float32)
    nv = jnp.asarray(rs.randn(M), jnp.float32)
    nd = jnp.asarray(rs.rand(M) < 0.3)
    ones = jnp.ones((T, M), bool)
    buf = Rollout(obs=None, states=None, actions=None, action_masks=None,
                  logprobs=None, rewards=rew, dones=dones, active=ones,
                  values=vals)
    adv_m, ret_m, act = active_masked_gae(buf, nv, nd, jnp.ones((M,), bool),
                                          0.99, 0.95)
    adv_p, ret_p = plain_gae(rew, dones, vals, nv, nd, 0.99, 0.95)
    assert bool(act.all())
    np.testing.assert_allclose(np.asarray(adv_p), np.asarray(adv_m),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(ret_p), np.asarray(ret_m),
                               rtol=2e-5, atol=2e-6)


def test_apply_t_matches_net_apply():
    """The transposed towers (models/cleanrl.apply_t) compute the same
    logits/values as the flax net on the same params — row vs cols layout
    only (r5 lane-resident path)."""
    import numpy as np

    from madrona_rl_envs_playground_tpu.models.cleanrl import (
        CleanRLNetwork, apply_t, value_t)

    rs = np.random.RandomState(0)
    B, F, Fs, A = 37, 23, 29, 7
    net = CleanRLNetwork(num_actions=A, hidden=16, num_layers=2)
    obs = jnp.asarray(rs.randn(B, F), jnp.float32)
    st = jnp.asarray(rs.randn(B, Fs), jnp.float32)
    mask = jnp.asarray(rs.rand(B, A) < 0.7)
    mask = mask.at[:, 0].set(True)
    params = net.init(jax.random.PRNGKey(1), obs, st, mask)

    logits_r, value_r = net.apply(params, obs, st, mask)
    logits_t, value_t_ = apply_t(params, net, obs.T, mask_t=mask.T,
                                 x_critic=st.T)
    np.testing.assert_allclose(np.asarray(logits_t.T), np.asarray(logits_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(value_t_), np.asarray(value_r),
                               rtol=1e-5, atol=1e-5)
    # value_t (critic-only) agrees too
    np.testing.assert_allclose(np.asarray(value_t(params, net, st.T)),
                               np.asarray(value_r), rtol=1e-5, atol=1e-5)
    # the shared-input default path (state==obs envs) on an equal-size net
    net2 = CleanRLNetwork(num_actions=A, hidden=16, num_layers=2)
    p2 = net2.init(jax.random.PRNGKey(2), obs, obs, mask)
    lg2, v2 = apply_t(p2, net2, obs.T)
    lg2_ref, v2_ref = net2.apply(p2, obs, obs, None)
    np.testing.assert_allclose(np.asarray(lg2.T), np.asarray(lg2_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v2_ref),
                               rtol=1e-5, atol=1e-5)
