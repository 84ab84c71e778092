"""Shared replay buffer for MAPPO (device pytree + host wrapper).

Semantic parity with the reference ``SharedReplayBuffer``
(``train/MAPPO/utils/shared_buffer.py:24-148``): time-major arrays, both
``insert`` (simultaneous envs: next obs goes to slot t+1) and
``chooseinsert`` (turn-based: obs goes to slot t) write modes,
``after_update`` carry-over of the final slot, and GAE ``compute_returns``
with masks/bad_masks and optional value-normalizer denormalization
(``:176-233``).

Physical layout diverges from the reference's ``[T, N, A, ...]`` numpy on
purpose: the thread and agent axes are stored MERGED as ``M = N * A``
(``[T+1, M, feat]``).  TPU tiles the two minor dims of every array; with a
separate agent axis, A=2 lands in the tiled dims and pads f32 ``[T+1, N, 2]``
mask/value buffers 64x (2 -> 128 lanes) and int8 obs buffers 2.5x — at 8k
envs that padding alone is ~8 GB of HBM.  Every consumer flattens (N, A)
before use anyway (reference ``shared_buffer.py:393-502`` generators do the
same reshape), so the merged form is the natural storage.  Scalar fields
also drop the reference's trailing dim-1 (rewards [T, M] not [T,N,A,1]).
"""

from __future__ import annotations

from typing import Optional

import chex
import jax
import jax.numpy as jnp

from .valuenorm import ValueNormState, vn_denormalize

Array = jnp.ndarray


@chex.dataclass(frozen=True)
class MAPPOBuffer:
    share_obs: Array          # [T+1, M, S]      (M = N * A, thread-major)
    obs: Array                # [T+1, M, O]
    rnn_states: Array         # [T+1, M, L, H]
    rnn_states_critic: Array  # [T+1, M, L, H]
    value_preds: Array        # [T+1, M]
    returns: Array            # [T+1, M]
    available_actions: Array  # [T+1, M, Act]
    actions: Array            # [T, M] int32
    action_log_probs: Array   # [T, M]
    rewards: Array            # [T, M]
    masks: Array              # [T+1, M]  (0 => episode boundary before t)
    bad_masks: Array          # [T+1, M]
    active_masks: Array       # [T+1, M]


def init_buffer(episode_length: int, n_rollout_threads: int, num_agents: int,
                obs_size: int, share_obs_size: int, num_actions: int,
                recurrent_N: int, hidden_size: int,
                obs_dtype=jnp.float32) -> MAPPOBuffer:
    """obs/share_obs may be stored in the env's native dtype (int8 for the
    grid/bit-vector envs) — the network bases cast to f32 at their input, and
    the 4x smaller buffer is what makes 8k-env episode buffers fit in HBM.

    Values for slots are expected flattened to M = n_rollout_threads *
    num_agents, thread-major (the (N, A) reshape order)."""
    T = episode_length
    M = n_rollout_threads * num_agents
    L, H = recurrent_N, hidden_size
    z = jnp.zeros
    return MAPPOBuffer(
        share_obs=z((T + 1, M, share_obs_size), obs_dtype),
        obs=z((T + 1, M, obs_size), obs_dtype),
        rnn_states=z((T + 1, M, L, H), jnp.float32),
        rnn_states_critic=z((T + 1, M, L, H), jnp.float32),
        value_preds=z((T + 1, M), jnp.float32),
        returns=z((T + 1, M), jnp.float32),
        available_actions=jnp.ones((T + 1, M, num_actions), jnp.bool_),
        actions=z((T, M), jnp.int32),
        action_log_probs=z((T, M), jnp.float32),
        rewards=z((T, M), jnp.float32),
        masks=jnp.ones((T + 1, M), jnp.float32),
        bad_masks=jnp.ones((T + 1, M), jnp.float32),
        active_masks=jnp.ones((T + 1, M), jnp.float32),
    )


def insert(buf: MAPPOBuffer, step: Array, share_obs, obs, rnn_states,
           rnn_states_critic, actions, action_log_probs, value_preds, rewards,
           masks, bad_masks=None, active_masks=None,
           available_actions=None) -> MAPPOBuffer:
    """Simultaneous-env insert (reference ``shared_buffer.py:80-114``).
    Slot values are [M, ...] (threads x agents flattened thread-major)."""
    rep = dict(
        share_obs=buf.share_obs.at[step + 1].set(share_obs),
        obs=buf.obs.at[step + 1].set(obs),
        rnn_states=buf.rnn_states.at[step + 1].set(rnn_states),
        rnn_states_critic=buf.rnn_states_critic.at[step + 1].set(rnn_states_critic),
        actions=buf.actions.at[step].set(actions),
        action_log_probs=buf.action_log_probs.at[step].set(action_log_probs),
        value_preds=buf.value_preds.at[step].set(value_preds),
        rewards=buf.rewards.at[step].set(rewards),
        masks=buf.masks.at[step + 1].set(masks),
    )
    if bad_masks is not None:
        rep["bad_masks"] = buf.bad_masks.at[step + 1].set(bad_masks)
    if active_masks is not None:
        rep["active_masks"] = buf.active_masks.at[step + 1].set(active_masks)
    if available_actions is not None:
        rep["available_actions"] = buf.available_actions.at[step + 1].set(available_actions)
    return buf.replace(**rep)


def chooseinsert(buf: MAPPOBuffer, step: Array, share_obs, obs, rnn_states,
                 rnn_states_critic, actions, action_log_probs, value_preds,
                 rewards, masks, bad_masks=None, active_masks=None,
                 available_actions=None) -> MAPPOBuffer:
    """Turn-based insert (reference ``shared_buffer.py:116-148``): current
    obs/active/available land at slot t, rnn/masks at t+1.  Slot values are
    [M, ...] (threads x agents flattened thread-major)."""
    rep = dict(
        share_obs=buf.share_obs.at[step].set(share_obs),
        obs=buf.obs.at[step].set(obs),
        rnn_states=buf.rnn_states.at[step + 1].set(rnn_states),
        rnn_states_critic=buf.rnn_states_critic.at[step + 1].set(rnn_states_critic),
        actions=buf.actions.at[step].set(actions),
        action_log_probs=buf.action_log_probs.at[step].set(action_log_probs),
        value_preds=buf.value_preds.at[step].set(value_preds),
        rewards=buf.rewards.at[step].set(rewards),
        masks=buf.masks.at[step + 1].set(masks),
    )
    if bad_masks is not None:
        rep["bad_masks"] = buf.bad_masks.at[step + 1].set(bad_masks)
    if active_masks is not None:
        rep["active_masks"] = buf.active_masks.at[step].set(active_masks)
    if available_actions is not None:
        rep["available_actions"] = buf.available_actions.at[step].set(available_actions)
    return buf.replace(**rep)


def after_update(buf: MAPPOBuffer) -> MAPPOBuffer:
    """Copy the last slot to index 0 (reference ``:150-163``)."""
    return buf.replace(
        share_obs=buf.share_obs.at[0].set(buf.share_obs[-1]),
        obs=buf.obs.at[0].set(buf.obs[-1]),
        rnn_states=buf.rnn_states.at[0].set(buf.rnn_states[-1]),
        rnn_states_critic=buf.rnn_states_critic.at[0].set(buf.rnn_states_critic[-1]),
        masks=buf.masks.at[0].set(buf.masks[-1]),
        bad_masks=buf.bad_masks.at[0].set(buf.bad_masks[-1]),
        active_masks=buf.active_masks.at[0].set(buf.active_masks[-1]),
        available_actions=buf.available_actions.at[0].set(buf.available_actions[-1]),
    )


def compute_returns(buf: MAPPOBuffer, next_value: Array,
                    vn_state: Optional[ValueNormState],
                    gamma: float, gae_lambda: float,
                    use_gae: bool = True,
                    use_proper_time_limits: bool = False) -> MAPPOBuffer:
    """GAE over the episode buffer (reference ``shared_buffer.py:176-233``)."""
    value_preds = buf.value_preds.at[-1].set(next_value)

    if vn_state is not None:
        denorm = lambda v: vn_denormalize(vn_state, v)
    else:
        denorm = lambda v: v

    if use_gae:
        def scan_fn(gae, xs):
            rew_t, vp_t, vp_t1, mask_t1, bad_t1 = xs
            delta = rew_t + gamma * denorm(vp_t1) * mask_t1 - denorm(vp_t)
            gae = delta + gamma * gae_lambda * mask_t1 * gae
            if use_proper_time_limits:
                gae = gae * bad_t1
            ret_t = gae + denorm(vp_t)
            return gae, ret_t

        xs = (
            buf.rewards,
            value_preds[:-1],
            value_preds[1:],
            buf.masks[1:],
            buf.bad_masks[1:],
        )
        _, rets = jax.lax.scan(scan_fn, jnp.zeros_like(next_value), xs, reverse=True)
        returns = buf.returns.at[:-1].set(rets)
    else:
        def scan_fn(ret_next, xs):
            rew_t, vp_t, mask_t1, bad_t1 = xs
            ret_t = ret_next * gamma * mask_t1 + rew_t
            if use_proper_time_limits:
                ret_t = ret_t * bad_t1 + (1.0 - bad_t1) * denorm(vp_t)
            return ret_t, ret_t

        xs = (buf.rewards, value_preds[:-1], buf.masks[1:], buf.bad_masks[1:])
        _, rets = jax.lax.scan(scan_fn, next_value, xs, reverse=True)
        returns = buf.returns.at[:-1].set(rets).at[-1].set(next_value)

    return buf.replace(value_preds=value_preds, returns=returns)
