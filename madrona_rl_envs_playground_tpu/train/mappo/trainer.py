"""R_MAPPO trainer (pure-JAX, fully jitted update).

Behavioral parity with the reference ``R_MAPPO``
(``train/MAPPO/r_mappo.py``):

* advantages = returns - denormalized value_preds, normalized with
  NaN-masking over inactive steps (``:166-176``);
* ppo_epoch x num_mini_batch updates via permuted flat minibatches
  (feed-forward) or data-chunk minibatches with GRU unroll (recurrent,
  ``shared_buffer.py:393-502``);
* actor loss: clipped surrogate with per-sample active-mask weighting
  (``:128-141``), entropy bonus, per-network Adam + global-norm clip;
* critic loss: value-clip + huber(delta) against value-normalized returns,
  with the ValueNorm/PopArt statistics updated minibatch-by-minibatch
  *before* normalization, exactly like ``cal_value_loss`` (``:52-90``).
"""

from __future__ import annotations

from typing import Tuple

import chex
import jax
import jax.numpy as jnp
import optax

from ...models.mappo_nets import R_Critic, get_critic_head
from .buffer import MAPPOBuffer
from .config import MAPPOConfig
from .policy import MAPPOPolicy, PolicyState
from .valuenorm import (
    ValueNormState,
    init_valuenorm,
    popart_update,
    vn_denormalize,
    vn_normalize,
    vn_update,
)

Array = jnp.ndarray


def huber(e: Array, delta: float) -> Array:
    a = jnp.abs(e)
    return jnp.where(a > delta, delta * (a - 0.5 * delta), 0.5 * e**2)


@chex.dataclass(frozen=True)
class TrainerState:
    policy: PolicyState
    vn: ValueNormState


class RMAPPOTrainer:
    def __init__(self, cfg: MAPPOConfig, policy: MAPPOPolicy):
        assert not (cfg.use_popart and cfg.use_valuenorm)
        self.cfg = cfg
        self.policy = policy
        self.state = TrainerState(policy=policy.state, vn=init_valuenorm())
        self._recurrent = cfg.use_recurrent_policy or cfg.use_naive_recurrent_policy
        self.train = jax.jit(
            self._train_recurrent if self._recurrent else self._train
        )

    # ------------------------------------------------------------------
    def _denorm(self, vn: ValueNormState, v: Array) -> Array:
        if self.cfg.use_popart or self.cfg.use_valuenorm:
            return vn_denormalize(vn, v)
        return v

    def _value_loss(self, vn, values, value_preds_b, return_b, active_b,
                    stats_updated: bool = False):
        cfg = self.cfg
        clipped = value_preds_b + jnp.clip(
            values - value_preds_b, -cfg.clip_param, cfg.clip_param
        )
        if cfg.use_popart or cfg.use_valuenorm:
            if not stats_updated:
                vn = vn_update(vn, return_b)
            target = vn_normalize(vn, return_b)
        else:
            target = return_b
        err_clip, err_orig = target - clipped, target - values
        if cfg.use_huber_loss:
            l_clip, l_orig = huber(err_clip, cfg.huber_delta), huber(err_orig, cfg.huber_delta)
        else:
            l_clip, l_orig = 0.5 * err_clip**2, 0.5 * err_orig**2
        loss = jnp.maximum(l_orig, l_clip) if cfg.use_clipped_value_loss else l_orig
        if cfg.use_value_active_masks:
            vl = (loss * active_b).sum() / active_b.sum()
        else:
            vl = loss.mean()
        return vl, vn

    def _ppo_update(self, pstate: PolicyState, vn, sample, lrs, sequence: bool):
        cfg = self.cfg
        pol = self.policy
        (sobs, obs, rnn, rnnc, act, vp, ret, msk, amsk, old_logp, adv, avail) = sample
        actor_lr, critic_lr = lrs

        stats_updated = False
        if cfg.use_popart:
            # PopArt (reference utils/popart.py::update, invoked from
            # cal_value_loss): refresh the running stats on this minibatch's
            # returns and rescale the critic head so its outputs are
            # preserved under the new normalization.
            vo = get_critic_head(pstate.critic_params)
            k2, b2, vn = popart_update(vo["kernel"][:, 0], vo["bias"][0], vn, ret)
            new_cp = jax.tree_util.tree_map(lambda x: x, pstate.critic_params)
            new_cp["params"][R_Critic.HEAD_NAME] = {
                "kernel": k2[:, None],
                "bias": b2[None],
            }
            pstate = pstate.replace(critic_params=new_cp)
            stats_updated = True

        def actor_loss_fn(actor_params):
            _, logp, entropy = pol.evaluate_actions(
                actor_params, pstate.critic_params, sobs, obs, rnn, rnnc, act,
                msk, avail, amsk, sequence=sequence,
            )
            ratio = jnp.exp(logp - old_logp)
            surr1 = ratio * adv
            surr2 = jnp.clip(ratio, 1 - cfg.clip_param, 1 + cfg.clip_param) * adv
            per = -jnp.minimum(surr1, surr2)
            if cfg.use_policy_active_masks:
                pl = (per * amsk).sum() / amsk.sum()
            else:
                pl = per.mean()
            return pl - entropy * cfg.entropy_coef, (pl, entropy, ratio.mean())

        (a_loss, (pg_loss, entropy, ratio)), a_grads = jax.value_and_grad(
            actor_loss_fn, has_aux=True
        )(pstate.actor_params)
        a_opt = optax.tree_utils.tree_set(pstate.actor_opt, learning_rate=actor_lr)
        a_up, a_opt = pol.actor_tx.update(a_grads, a_opt, pstate.actor_params)
        actor_params = optax.apply_updates(pstate.actor_params, a_up)

        def critic_loss_fn(critic_params):
            values, _, _ = pol.evaluate_actions(
                pstate.actor_params, critic_params, sobs, obs, rnn, rnnc, act,
                msk, avail, amsk, sequence=sequence,
            )
            vl, vn2 = self._value_loss(vn, values, vp, ret, amsk,
                                       stats_updated=stats_updated)
            return vl * cfg.value_loss_coef, (vl, vn2)

        (c_loss, (v_loss, vn)), c_grads = jax.value_and_grad(
            critic_loss_fn, has_aux=True
        )(pstate.critic_params)
        c_opt = optax.tree_utils.tree_set(pstate.critic_opt, learning_rate=critic_lr)
        c_up, c_opt = pol.critic_tx.update(c_grads, c_opt, pstate.critic_params)
        critic_params = optax.apply_updates(pstate.critic_params, c_up)

        pstate = PolicyState(
            actor_params=actor_params,
            critic_params=critic_params,
            actor_opt=a_opt,
            critic_opt=c_opt,
        )
        metrics = (v_loss, pg_loss, entropy, ratio)
        return pstate, vn, metrics

    # ------------------------------------------------------------------
    def _train(self, tstate: TrainerState, buf: MAPPOBuffer, key,
               lrs: Tuple[Array, Array]):
        cfg = self.cfg
        T, M = buf.rewards.shape  # M = threads * agents (merged storage)

        adv_raw = buf.returns[:-1] - self._denorm(tstate.vn, buf.value_preds[:-1])
        act_m = buf.active_masks[:-1]
        n_act = jnp.maximum((act_m > 0).sum(), 1)
        mean_adv = jnp.where(act_m > 0, adv_raw, 0.0).sum() / n_act
        # population variance (ddof=0) to match the reference's np.nanstd
        # (r_mappo.py advantage normalization)
        var_adv = (jnp.where(act_m > 0, (adv_raw - mean_adv) ** 2, 0.0)).sum() / n_act
        advantages = (adv_raw - mean_adv) / (jnp.sqrt(var_adv) + 1e-5)

        B = T * M
        # num_mini_batch=1 (and the shard_local_minibatch option): keep
        # [T, M, ...] — flattening would merge the sharded env axis into
        # T*M, which GSPMD cannot express and would all-gather the buffers
        # on a mesh (see the nmb==1 branch below)
        local = cfg.shard_local_minibatch and cfg.num_mini_batch > 1
        if local and T % cfg.num_mini_batch:
            raise ValueError(
                f"shard_local_minibatch needs episode_length "
                f"({T}) % num_mini_batch ({cfg.num_mini_batch}) == 0")
        flat = ((lambda x: x) if cfg.num_mini_batch == 1 or local
                else (lambda x: x.reshape((B,) + x.shape[2:])))
        data = (
            flat(buf.share_obs[:-1]),
            flat(buf.obs[:-1]),
            flat(buf.rnn_states[:-1]),
            flat(buf.rnn_states_critic[:-1]),
            flat(buf.actions),
            flat(buf.value_preds[:-1]),
            flat(buf.returns[:-1]),
            flat(buf.masks[:-1]),
            flat(buf.active_masks[:-1]),
            flat(buf.action_log_probs),
            flat(advantages),
            flat(buf.available_actions[:-1]),
        )

        nmb = cfg.num_mini_batch
        mb_size = B // nmb

        def epoch_body(carry, ekey):
            pstate, vn = carry
            if nmb == 1:
                # The single minibatch is the whole batch and every
                # reduction in _ppo_update is order-invariant, so the
                # reference's shuffle (feed_forward_generator) is a
                # semantic no-op at num_mini_batch=1 (the reference
                # default and the Colab config).  Skipping the permuted
                # gather keeps the env axis sharded on a mesh — no
                # all-gather of the buffers (docs/multihost_projection.md).
                pstate, vn, metrics = self._ppo_update(
                    pstate, vn, data, lrs, sequence=False
                )
                return (pstate, vn), metrics

            def mb_body(carry2, idx):
                pstate, vn = carry2
                sample = tuple(d[idx] for d in data)
                pstate, vn, metrics = self._ppo_update(
                    pstate, vn, sample, lrs, sequence=False
                )
                return (pstate, vn), metrics

            if local:
                # mesh-friendly variant: minibatches are randomly-permuted
                # TIMESTEP bands [T/nmb, M, ...]; indexing touches only the
                # replicated T axis, so the sharded env axis never gathers
                perm = jax.random.permutation(ekey, T)
                idxs = perm.reshape(nmb, T // nmb)
            else:
                perm = jax.random.permutation(ekey, B)
                idxs = perm[: nmb * mb_size].reshape(nmb, mb_size)
            (pstate, vn), metrics = jax.lax.scan(mb_body, (pstate, vn), idxs)
            return (pstate, vn), jax.tree_util.tree_map(jnp.mean, metrics)

        keys = jax.random.split(key, cfg.ppo_epoch)
        (pstate, vn), metrics = jax.lax.scan(
            epoch_body, (tstate.policy, tstate.vn), keys
        )

        info = {
            "value_loss": metrics[0].mean(),
            "policy_loss": metrics[1].mean(),
            "dist_entropy": metrics[2].mean(),
            "ratio": metrics[3].mean(),
        }
        return TrainerState(policy=pstate, vn=vn), info

    # recurrent-chunk training (reference shared_buffer.py:393-502)
    def _train_recurrent(self, tstate: TrainerState, buf: MAPPOBuffer, key,
                         lrs: Tuple[Array, Array]):
        cfg = self.cfg
        T, M = buf.rewards.shape  # M = threads * agents (merged storage)
        L = cfg.data_chunk_length if cfg.use_recurrent_policy else T
        assert T % L == 0, "episode_length must be divisible by data_chunk_length"
        C = (T // L) * M  # number of chunks

        adv_raw = buf.returns[:-1] - self._denorm(tstate.vn, buf.value_preds[:-1])
        act_m = buf.active_masks[:-1]
        n_act = jnp.maximum((act_m > 0).sum(), 1)
        mean_adv = jnp.where(act_m > 0, adv_raw, 0.0).sum() / n_act
        # population variance (ddof=0) to match the reference's np.nanstd
        # (r_mappo.py advantage normalization)
        var_adv = (jnp.where(act_m > 0, (adv_raw - mean_adv) ** 2, 0.0)).sum() / n_act
        advantages = (adv_raw - mean_adv) / (jnp.sqrt(var_adv) + 1e-5)

        def chunk(x):
            # [T, M, ...] -> [C, L, ...] with chunk-major batch
            y = x.reshape((T // L, L, M) + x.shape[2:])
            y = jnp.moveaxis(y, 2, 0).reshape((C, L) + x.shape[2:])
            return y

        def chunk_start(x):
            # rnn state at each chunk's first step: [T, M, Lr, H] -> [C, Lr, H]
            y = x[::L]  # already [T//L, M, Lr, H]
            return jnp.moveaxis(y, 1, 0).reshape((C,) + x.shape[2:])

        data = (
            chunk(buf.share_obs[:-1]),
            chunk(buf.obs[:-1]),
            chunk_start(buf.rnn_states[:-1]),
            chunk_start(buf.rnn_states_critic[:-1]),
            chunk(buf.actions),
            chunk(buf.value_preds[:-1]),
            chunk(buf.returns[:-1]),
            chunk(buf.masks[:-1]),
            chunk(buf.active_masks[:-1]),
            chunk(buf.action_log_probs),
            chunk(advantages),
            chunk(buf.available_actions[:-1]),
        )

        nmb = cfg.num_mini_batch
        mb = C // nmb

        def epoch_body(carry, ekey):
            pstate, vn = carry
            perm = jax.random.permutation(ekey, C)

            def mb_body(carry2, idx):
                pstate, vn = carry2
                s = [d[idx] for d in data]
                # sequence-major: [mb, L, ...] -> [L, mb, ...]
                seq = lambda x: jnp.swapaxes(x, 0, 1)
                sample = (
                    seq(s[0]), seq(s[1]), s[2], s[3], seq(s[4]), seq(s[5]),
                    seq(s[6]), seq(s[7]), seq(s[8]), seq(s[9]), seq(s[10]),
                    seq(s[11]),
                )
                pstate, vn, metrics = self._ppo_update(
                    pstate, vn, sample, lrs, sequence=True
                )
                return (pstate, vn), metrics

            idxs = perm[: nmb * mb].reshape(nmb, mb)
            (pstate, vn), metrics = jax.lax.scan(mb_body, (pstate, vn), idxs)
            return (pstate, vn), jax.tree_util.tree_map(jnp.mean, metrics)

        keys = jax.random.split(key, cfg.ppo_epoch)
        (pstate, vn), metrics = jax.lax.scan(
            epoch_body, (tstate.policy, tstate.vn), keys
        )
        info = {
            "value_loss": metrics[0].mean(),
            "policy_loss": metrics[1].mean(),
            "dist_entropy": metrics[2].mean(),
            "ratio": metrics[3].mean(),
        }
        return TrainerState(policy=pstate, vn=vn), info
