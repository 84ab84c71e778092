"""MAPPO policy wrapper: actor + critic with separate optimizers.

Parity with the reference ``R_MAPPOPolicy`` (``train/MAPPO/rMAPPOPolicy.py``):
``get_actions`` / ``get_values`` / ``evaluate_actions`` / ``act``, two Adam
optimizers (lr / critic_lr, eps=opti_eps, weight_decay), linear LR decay.
Functional: all state lives in ``PolicyState``; methods are pure and jitted
by callers.
"""

from __future__ import annotations

from typing import Optional, Tuple

import chex
import jax
import jax.numpy as jnp
import optax

from ...models.common import dist_entropy, dist_log_prob, dist_sample
from ...models.mappo_nets import ModelConfig, R_Actor, R_Critic
from .config import MAPPOConfig

Array = jnp.ndarray


@chex.dataclass(frozen=True)
class PolicyState:
    actor_params: chex.ArrayTree
    critic_params: chex.ArrayTree
    actor_opt: chex.ArrayTree
    critic_opt: chex.ArrayTree


class MAPPOPolicy:
    def __init__(self, cfg: MAPPOConfig, obs_shape, share_obs_shape, num_actions: int,
                 seed: int = 0):
        self.cfg = cfg
        mc = cfg.model_config()
        self.mc = mc
        self.num_actions = num_actions
        self.obs_shape = tuple(obs_shape)
        self.share_obs_shape = tuple(share_obs_shape)
        self.actor = R_Actor(mc, self.obs_shape, num_actions)
        self.critic = R_Critic(mc, self.share_obs_shape)

        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        L, H = mc.recurrent_N, mc.hidden_size
        # networks take FLAT obs rows [..., F] and reshape to obs_shape
        # internally (a grid obs_shape selects CNNBase)
        import math

        dummy_obs = jnp.zeros((1, math.prod(self.obs_shape)))
        dummy_sobs = jnp.zeros((1, math.prod(self.share_obs_shape)))
        dummy_rnn = jnp.zeros((1, L, H))
        dummy_mask = jnp.ones((1,))
        actor_params = self.actor.init(k1, dummy_obs, dummy_rnn, dummy_mask)
        critic_params = self.critic.init(k2, dummy_sobs, dummy_rnn, dummy_mask)

        def make_tx(lr):
            def build(learning_rate):
                chain = []
                if cfg.use_max_grad_norm:
                    chain.append(optax.clip_by_global_norm(cfg.max_grad_norm))
                if cfg.weight_decay:
                    chain.append(
                        optax.adamw(
                            learning_rate, eps=cfg.opti_eps, weight_decay=cfg.weight_decay
                        )
                    )
                else:
                    chain.append(optax.adam(learning_rate, eps=cfg.opti_eps))
                return optax.chain(*chain)

            return optax.inject_hyperparams(build)(learning_rate=lr)

        self.actor_tx = make_tx(cfg.lr)
        self.critic_tx = make_tx(cfg.critic_lr)
        self.state = PolicyState(
            actor_params=actor_params,
            critic_params=critic_params,
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
        )

    # ---- pure functions ------------------------------------------------
    def get_actions(self, state: PolicyState, key, share_obs, obs, rnn_states,
                    rnn_states_critic, masks, available_actions=None,
                    deterministic: bool = False):
        """All inputs flat [B, ...]. Returns (values, actions, log_probs,
        rnn_states', rnn_states_critic')."""
        logits, rnn2 = self.actor.apply(
            state.actor_params, obs, rnn_states, masks, available_actions
        )
        if deterministic:
            actions = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            actions = dist_sample(key, logits)
        logp = dist_log_prob(logits, actions)
        values, rnnc2 = self.critic.apply(
            state.critic_params, share_obs, rnn_states_critic, masks
        )
        return values, actions, logp, rnn2, rnnc2

    def get_values(self, state: PolicyState, share_obs, rnn_states_critic, masks):
        values, _ = self.critic.apply(
            state.critic_params, share_obs, rnn_states_critic, masks
        )
        return values

    def evaluate_actions(self, actor_params, critic_params, share_obs, obs,
                         rnn_states, rnn_states_critic, actions, masks,
                         available_actions=None, active_masks=None,
                         sequence: bool = False):
        """Returns (values, log_probs, entropy_scalar).  With
        ``sequence=True`` inputs are [T, B, ...] and the GRU is unrolled."""
        if sequence:
            logits, _ = self.actor.apply(
                actor_params, obs, rnn_states, masks, available_actions,
                method=R_Actor.unroll,
            )
            values, _ = self.critic.apply(
                critic_params, share_obs, rnn_states_critic, masks,
                method=R_Critic.unroll,
            )
        else:
            logits, _ = self.actor.apply(
                actor_params, obs, rnn_states, masks, available_actions
            )
            values, _ = self.critic.apply(
                critic_params, share_obs, rnn_states_critic, masks
            )
        logp = dist_log_prob(logits, actions)
        ent = dist_entropy(logits)
        if self.cfg.use_policy_active_masks and active_masks is not None:
            entropy = (ent * active_masks).sum() / active_masks.sum()
        else:
            entropy = ent.mean()
        return values, logp, entropy

    def lr_for(self, episode: int, episodes: int) -> Tuple[float, float]:
        """Linear decay (reference ``utils/util.py::update_linear_schedule``)."""
        if not self.cfg.use_linear_lr_decay:
            return self.cfg.lr, self.cfg.critic_lr
        frac = 1.0 - episode / float(episodes)
        return self.cfg.lr * frac, self.cfg.critic_lr * frac
