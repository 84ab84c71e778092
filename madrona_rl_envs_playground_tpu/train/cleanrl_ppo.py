"""CleanRL-style PPO as a partner-pluggable VectorAgent (pure JAX).

Behavioral parity with the reference ``CleanPPOAgent``
(``pantheonrl_extension/vectoragent.py:116-372``), with the multi-agent
credit rules preserved exactly:

* rewards received while inactive accumulate into the agent's **last active**
  buffer slot; rewards from before the agent's first action of an episode are
  dropped from returns (``new_game`` gating) but kept in the episodic-return
  stats (``vectoragent.py:197-216``);
* done flags OR-accumulate between recorded actions (``:205``);
* GAE skips steps where the agent did not act, bootstraps per env from the
  last active step, and marks as untrainable ("de-activates") the final
  active step of any env whose next value was never observed
  (``:230-262`` — including the reference's quirk of freezing advantage
  computation for already-bootstrapped envs while *any* env remains
  unbootstrapped, which this port reproduces bit-for-bit);
* update = ``update_epochs`` full-batch passes over the active rows (the
  reference's ``mb_inds = randperm(batch)`` covers the whole batch at once,
  ``:281``), with active-masked advantage normalization, clip/value-clip
  losses, entropy bonus, global-norm gradient clipping, optional target-KL
  early stop, and linear LR anneal (``:279-327``).

One deliberate divergence: the reference's inactive-reward routing line
``self.rewards[self.last_active] += ...`` (``:203``) indexes a [T, N] buffer
with a per-env [N] row index, which in torch adds each env's reward at
*every* env's last-active row (cross-env contamination whenever last_active
differs between envs, i.e. turn-based play).  Here the reward lands only in
the env's own last-active slot — the intended semantics.
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import chex
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..api.agents import VectorAgent
from ..api.vectorobservation import VectorObservation
from ..models.cleanrl import CleanRLNetwork
from ..models.common import dist_entropy, dist_log_prob, dist_sample
from ..utils.logger import maybe_logger

Array = jnp.ndarray


@chex.dataclass(frozen=True)
class Rollout:
    obs: Array          # [T, N, obs]
    states: Array       # [T, N, state]
    actions: Array      # [T, N] int32
    action_masks: Array  # [T, N, A] bool
    logprobs: Array     # [T, N] f32
    rewards: Array      # [T, N] f32
    dones: Array        # [T, N] bool
    active: Array       # [T, N] bool
    values: Array       # [T, N] f32


@chex.dataclass(frozen=True)
class AgentCarry:
    buf: Rollout
    next_done: Array        # [N] bool
    new_game: Array         # [N] bool
    running_rewards: Array  # [N] f32
    last_active: Array      # [N] int32
    mean_return_sum: Array  # [] f32
    num_returns: Array      # [] int32


def init_carry(num_steps: int, num_envs: int, obs_size: int, state_size: int,
               num_actions: int) -> AgentCarry:
    T, N, A = num_steps, num_envs, num_actions
    return AgentCarry(
        buf=Rollout(
            obs=jnp.zeros((T, N, obs_size), jnp.float32),
            states=jnp.zeros((T, N, state_size), jnp.float32),
            actions=jnp.zeros((T, N), jnp.int32),
            action_masks=jnp.ones((T, N, A), jnp.bool_),
            logprobs=jnp.zeros((T, N), jnp.float32),
            rewards=jnp.zeros((T, N), jnp.float32),
            dones=jnp.zeros((T, N), jnp.bool_),
            active=jnp.zeros((T, N), jnp.bool_),
            values=jnp.zeros((T, N), jnp.float32),
        ),
        next_done=jnp.zeros((N,), jnp.bool_),
        new_game=jnp.zeros((N,), jnp.bool_),
        running_rewards=jnp.zeros((N,), jnp.float32),
        last_active=jnp.zeros((N,), jnp.int32),
        mean_return_sum=jnp.float32(0.0),
        num_returns=jnp.int32(0),
    )


def active_masked_gae(
    buf: Rollout,
    next_value: Array,
    next_done: Array,
    final_active: Array,
    gamma: float,
    gae_lambda: float,
) -> Tuple[Array, Array, Array]:
    """The reference's active-mask GAE loop (``vectoragent.py:230-262``) as a
    reverse ``lax.scan``.  Returns (advantages [T,N], returns [T,N],
    trainable_active [T,N])."""

    boot0 = final_active
    nnt0 = jnp.where(boot0, 1.0 - next_done.astype(jnp.float32), 0.0)
    nv0 = jnp.where(boot0, next_value, 0.0)
    lg0 = jnp.zeros_like(next_value)

    def step(carry, xs):
        bootstrapped, nextnonterminal, nextvalues, lastgaelam = carry
        rew_t, done_t, val_t, mask_t = xs

        all_boot = jnp.all(bootstrapped)
        bootmask = mask_t & ~bootstrapped
        computemask = jnp.where(all_boot, mask_t, bootmask)
        active_out = mask_t & ~(bootmask & ~all_boot)
        bootstrapped = bootstrapped | mask_t

        delta = rew_t + gamma * nextvalues * nextnonterminal - val_t
        cand = delta + gamma * gae_lambda * nextnonterminal * lastgaelam
        lastgaelam = jnp.where(computemask, cand, lastgaelam)
        adv_t = jnp.where(computemask, cand, 0.0)

        nextnonterminal = jnp.where(mask_t, 1.0 - done_t.astype(jnp.float32), nextnonterminal)
        nextvalues = jnp.where(mask_t, val_t, nextvalues)
        return (bootstrapped, nextnonterminal, nextvalues, lastgaelam), (adv_t, active_out)

    xs = (buf.rewards, buf.dones, buf.values, buf.active)
    _, (advantages, active_out) = jax.lax.scan(
        step, (boot0, nnt0, nv0, lg0), xs, reverse=True
    )
    return advantages, advantages + buf.values, active_out


def plain_gae(
    rewards: Array,
    dones: Array,
    values: Array,
    next_value: Array,
    next_done: Array,
    gamma: float,
    gae_lambda: float,
) -> Tuple[Array, Array]:
    """Standard GAE (the ``active`` == all-ones specialization of
    ``active_masked_gae``) as a LOG-DEPTH ``associative_scan``.

    The sequential reverse scan costs T tiny per-step launches (~150 us each
    on TPU for [T, M] buffers — measured r5, scripts/ablate_rollout.py); the
    first-order linear recurrence A_t = delta_t + (gamma*lam*nnt_t) * A_{t+1}
    is associative, so log2(T) bulk ops over the whole [T, M] plane replace
    them.  Matches the loop semantics to fp-reassociation (~1e-7).
    Returns (advantages [T, M], returns [T, M]).
    """

    nnt = 1.0 - jnp.concatenate(
        [dones[1:].astype(jnp.float32),
         next_done.astype(jnp.float32)[None]], axis=0)
    nv = jnp.concatenate([values[1:], next_value[None]], axis=0)
    delta = rewards + gamma * nv * nnt - values
    coeff = gamma * gae_lambda * nnt

    # affine composition; under reverse=True the FIRST operand carries the
    # combination of LATER timesteps, so the result must apply the second
    # operand's affine map outermost: (a_x,b_x) then (a_y,b_y) -> y∘x
    # (verified against the loop oracle, tests/test_cleanrl_ppo.py)
    def comb(x, y):
        return x[0] * y[0], y[1] + y[0] * x[1]

    _, advantages = jax.lax.associative_scan(
        comb, (coeff, delta), reverse=True, axis=0
    )
    return advantages, advantages + values


class CleanPPOAgent(VectorAgent):
    """Drop-in analog of the reference agent; all device work is jitted."""

    def __init__(
        self,
        envs,
        name: str,
        num_updates: int,
        verbose: bool = True,
        run_dir: Optional[str] = None,
        seed: int = 0,
        lr: float = 2.5e-4,
        num_steps: int = 128,
        anneal_lr: bool = True,
        gamma: float = 0.99,
        gae_lambda: float = 0.95,
        num_minibatches: int = 4,
        update_epochs: int = 4,
        norm_adv: bool = True,
        clip_coef: float = 0.2,
        clip_vloss: bool = True,
        ent_coef: float = 0.01,
        vf_coef: float = 0.5,
        max_grad_norm: float = 0.5,
        target_kl: Optional[float] = None,
        hidden: int = 512,
    ):
        self.envs = envs
        self.num_envs = envs.num_envs
        self.name = name
        self.verbose = verbose
        self.lr = lr
        self.num_steps = num_steps
        self.anneal_lr = anneal_lr
        self.gamma = gamma
        self.gae_lambda = gae_lambda
        self.update_epochs = update_epochs
        self.norm_adv = norm_adv
        self.clip_coef = clip_coef
        self.clip_vloss = clip_vloss
        self.ent_coef = ent_coef
        self.vf_coef = vf_coef
        self.max_grad_norm = max_grad_norm
        self.target_kl = target_kl

        obs_size = int(np.prod(envs.observation_space.shape))
        state_size = int(np.prod(envs.share_observation_space.shape))
        self.num_actions = envs.action_space.n

        self.net = CleanRLNetwork(num_actions=self.num_actions, hidden=hidden)
        key = jax.random.PRNGKey(seed)
        key, pk = jax.random.split(key)
        self.params = self.net.init(
            pk,
            jnp.zeros((1, obs_size)),
            jnp.zeros((1, state_size)),
            jnp.ones((1, self.num_actions), jnp.bool_),
        )
        self._key = key

        self.tx = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.clip_by_global_norm(max_grad_norm),
                optax.adam(learning_rate, eps=1e-5),
            )
        )(learning_rate=lr)
        self.opt_state = self.tx.init(self.params)

        self.carry = init_carry(
            num_steps, self.num_envs, obs_size, state_size, self.num_actions
        )

        self.global_step = 0
        self.step = 0
        self.num_updates = num_updates
        self.updates = 1
        self.start_time = time.time()
        self.logger = maybe_logger(run_dir or f"runs/{name}", verbose)

        self._jit_act_record = jax.jit(self._act, static_argnames=("record",))
        self._jit_update = jax.jit(self._update_impl)
        self._jit_train = jax.jit(self._train_impl)
        self._last_metrics = None

    # ---------------- device functions --------------------------------
    def _act(self, params, key, obs, state, action_mask, active, carry, step, record: bool):
        obs_f = obs.astype(jnp.float32)
        state_f = state.astype(jnp.float32)
        logits, value = self.net.apply(params, obs_f, state_f, action_mask)
        action = dist_sample(key, logits)
        if not record:
            return action, carry
        logprob = dist_log_prob(logits, action)
        buf = self.carry_buf_write(
            carry.buf, step, obs_f, state_f, action, action_mask, logprob, value,
            carry.next_done,
            active,
        )
        carry = carry.replace(
            buf=buf,
            next_done=jnp.zeros_like(carry.next_done),
            last_active=jnp.where(active, step, carry.last_active),
            new_game=jnp.where(active, False, carry.new_game),
        )
        return action, carry

    @staticmethod
    def carry_buf_write(buf, step, obs, state, action, mask, logprob, value, next_done, active):
        return buf.replace(
            obs=buf.obs.at[step].set(obs),
            states=buf.states.at[step].set(state),
            actions=buf.actions.at[step].set(action),
            action_masks=buf.action_masks.at[step].set(mask),
            logprobs=buf.logprobs.at[step].set(logprob),
            values=buf.values.at[step].set(value),
            dones=buf.dones.at[step].set(next_done),
            active=buf.active.at[step].set(active),
            rewards=buf.rewards.at[step].set(jnp.zeros_like(buf.rewards[0])),
        )

    def _update_impl(self, carry, rewards, dones):
        rewards = rewards.astype(jnp.float32).reshape(-1)
        dones = dones.astype(jnp.bool_)
        running = carry.running_rewards + rewards
        add = jnp.where(carry.new_game, 0.0, rewards)
        buf = carry.buf.replace(
            rewards=carry.buf.rewards.at[
                carry.last_active, jnp.arange(rewards.shape[0])
            ].add(add)
        )
        any_done = jnp.any(dones)
        n_done = jnp.sum(dones.astype(jnp.int32))
        mean_done_ret = jnp.where(
            any_done, jnp.sum(jnp.where(dones, running, 0.0)) / jnp.maximum(n_done, 1), 0.0
        )
        return carry.replace(
            buf=buf,
            next_done=carry.next_done | dones,
            running_rewards=jnp.where(dones, 0.0, running),
            new_game=carry.new_game | dones,
            mean_return_sum=carry.mean_return_sum + mean_done_ret,
            num_returns=carry.num_returns + any_done.astype(jnp.int32),
        )

    def _train_impl(self, params, opt_state, carry, final_obs, lr, key):
        buf = carry.buf
        state_f = final_obs["state"].astype(jnp.float32)
        next_value = self.net.apply(params, state_f, method=CleanRLNetwork.get_value)
        advantages, returns, active = active_masked_gae(
            buf, next_value, carry.next_done, final_obs["active"],
            self.gamma, self.gae_lambda,
        )

        T, N = buf.logprobs.shape
        flat = lambda x: x.reshape((T * N,) + x.shape[2:])
        b_obs, b_states = flat(buf.obs), flat(buf.states)
        b_actions, b_masks = flat(buf.actions), flat(buf.action_masks)
        b_logprobs, b_adv = flat(buf.logprobs), flat(advantages)
        b_returns, b_values = flat(returns), flat(buf.values)
        b_active = flat(active).astype(jnp.float32)
        n_active = jnp.maximum(b_active.sum(), 1.0)

        def masked_mean(x):
            return (x * b_active).sum() / n_active

        if self.norm_adv:
            adv_mean = masked_mean(b_adv)
            adv_var = masked_mean((b_adv - adv_mean) ** 2)
            # torch .std() is Bessel-corrected
            adv_std = jnp.sqrt(adv_var * n_active / jnp.maximum(n_active - 1.0, 1.0))
            b_adv_n = (b_adv - adv_mean) / (adv_std + 1e-8)
        else:
            b_adv_n = b_adv

        opt = self.tx
        set_lr = lambda s: optax.tree_utils.tree_set(s, learning_rate=lr)
        opt_state = set_lr(opt_state)

        def loss_fn(p):
            logits, newvalue = self.net.apply(p, b_obs, b_states, b_masks)
            newlogprob = dist_log_prob(logits, b_actions)
            entropy = dist_entropy(logits)
            logratio = newlogprob - b_logprobs
            ratio = jnp.exp(logratio)

            pg1 = -b_adv_n * ratio
            pg2 = -b_adv_n * jnp.clip(ratio, 1 - self.clip_coef, 1 + self.clip_coef)
            pg_loss = masked_mean(jnp.maximum(pg1, pg2))

            if self.clip_vloss:
                v_unclipped = (newvalue - b_returns) ** 2
                v_clipped_val = b_values + jnp.clip(
                    newvalue - b_values, -self.clip_coef, self.clip_coef
                )
                v_loss = 0.5 * masked_mean(
                    jnp.maximum(v_unclipped, (v_clipped_val - b_returns) ** 2)
                )
            else:
                v_loss = 0.5 * masked_mean((newvalue - b_returns) ** 2)

            ent_loss = masked_mean(entropy)
            total = pg_loss - self.ent_coef * ent_loss + v_loss * self.vf_coef
            approx_kl = masked_mean((ratio - 1) - logratio)
            old_kl = masked_mean(-logratio)
            clipfrac = masked_mean((jnp.abs(ratio - 1.0) > self.clip_coef).astype(jnp.float32))
            return total, (pg_loss, v_loss, ent_loss, approx_kl, old_kl, clipfrac)

        def epoch_body(carry_in, _):
            params, opt_state, stopped = carry_in
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = opt.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            approx_kl = aux[3]
            if self.target_kl is not None:
                exceeded = approx_kl > self.target_kl
            else:
                exceeded = jnp.bool_(False)
            take = ~stopped
            sel = lambda a, b: jax.tree_util.tree_map(
                lambda x, y: jnp.where(take, x, y), a, b
            )
            params = sel(new_params, params)
            opt_state = sel(new_opt, opt_state)
            stopped = stopped | exceeded
            return (params, opt_state, stopped), aux

        (params, opt_state, _), auxes = jax.lax.scan(
            epoch_body,
            (params, opt_state, jnp.bool_(False)),
            None,
            length=self.update_epochs,
        )

        y_var = b_returns * b_active
        var_y = masked_mean((b_returns - masked_mean(b_returns)) ** 2)
        resid = masked_mean((b_returns - b_values - masked_mean(b_returns - b_values)) ** 2)
        explained_var = jnp.where(var_y > 0, 1.0 - resid / var_y, jnp.nan)
        del y_var

        metrics = {
            "pg_loss": auxes[0][-1],
            "v_loss": auxes[1][-1],
            "entropy": auxes[2][-1],
            "approx_kl": auxes[3][-1],
            "old_approx_kl": auxes[4][-1],
            "clipfrac": auxes[5].mean(),
            "explained_variance": explained_var,
            "mean_return": jnp.where(
                carry.num_returns > 0,
                carry.mean_return_sum / jnp.maximum(carry.num_returns, 1),
                jnp.nan,
            ),
        }
        carry = carry.replace(mean_return_sum=jnp.float32(0.0), num_returns=jnp.int32(0))
        return params, opt_state, carry, metrics

    # ---------------- host interface ----------------------------------
    def get_action(self, obs: VectorObservation, record: bool = True) -> Array:
        if self.global_step > 0 and self.global_step % self.num_steps == 0 and record:
            self.step = 0
            lr = (
                self.lr * (1.0 - (self.updates - 1.0) / self.num_updates)
                if self.anneal_lr
                else self.lr
            )
            self._key, tk = jax.random.split(self._key)
            final = {"state": obs.state, "active": obs.active}
            self.params, self.opt_state, self.carry, metrics = self._jit_train(
                self.params, self.opt_state, self.carry, final, jnp.float32(lr), tk
            )
            self._last_metrics = metrics
            if self.logger is not None:
                for k, v in metrics.items():
                    v = float(v)
                    if not np.isnan(v):
                        tag = "charts/episodic_return" if k == "mean_return" else f"losses/{k}"
                        self.logger.add_scalar(tag, v, self.global_step)
                self.logger.add_scalar(
                    "charts/SPS",
                    int(self.global_step * self.num_envs / (time.time() - self.start_time)),
                    self.global_step,
                )
                self.logger.flush()
            self.updates += 1

        self._key, ak = jax.random.split(self._key)
        mask = (
            obs.action_mask
            if obs.action_mask is not None
            else jnp.ones((self.num_envs, self.num_actions), jnp.bool_)
        )
        action, self.carry = self._jit_act_record(
            self.params, ak, obs.obs, obs.state, mask, obs.active, self.carry,
            jnp.int32(self.step), record=record,
        )
        return action

    def update(self, rewards: Array, dones: Array) -> None:
        self.carry = self._jit_update(self.carry, rewards, dones)
        self.step += 1
        self.global_step += 1

    # ---- checkpointing -------------------------------------------------
    def save(self, path: str) -> None:
        from ..utils.checkpoint import save_pytree

        save_pytree(path, {
            "params": self.params,
            "opt_state": self.opt_state,
            "updates": self.updates,
            "global_step": self.global_step,
        })

    def load(self, path: str) -> None:
        from ..utils.checkpoint import load_pytree

        blob = load_pytree(path)
        self.params = jax.device_put(blob["params"])
        self.opt_state = jax.device_put(blob["opt_state"])
        self.updates = blob["updates"]
        self.global_step = blob["global_step"]
