"""CleanRL-style actor/critic network (TPU-native flax).

Architecture parity with the reference ``CleanRLNetwork``
(``pantheonrl_extension/vectoragent.py:67-116``): separate actor and critic
MLPs, 3 hidden layers x 512 ReLU, orthogonal init (hidden std sqrt(2), output
std 0.01), masked categorical head.  Inputs are cast to float32 at entry (the
reference calls ``.float()`` on int8 observations).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .common import (
    _MASK_NEG,
    Array,
    dense,
    dist_entropy,
    dist_log_prob,
    dist_sample,
    masked_categorical_logits,
)


class MLPTower(nn.Module):
    out_features: int
    hidden: int = 512
    num_layers: int = 3
    out_scale: float = 0.01
    dtype: Optional[jnp.dtype] = None  # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x.astype(self.dtype or jnp.float32)
        for _ in range(self.num_layers):
            x = nn.relu(dense(self.hidden, dtype=self.dtype)(x))
        # the head's logits/value come back in float32 for stable softmax /
        # loss math regardless of the trunk dtype
        return dense(self.out_features, scale=self.out_scale,
                     dtype=self.dtype)(x).astype(jnp.float32)


class CleanRLNetwork(nn.Module):
    num_actions: int
    hidden: int = 512
    num_layers: int = 3
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.actor = MLPTower(self.num_actions, self.hidden, self.num_layers,
                              dtype=self.dtype)
        self.critic = MLPTower(1, self.hidden, self.num_layers,
                               dtype=self.dtype)

    def get_value(self, state: Array) -> Array:
        return self.critic(state)[..., 0]

    def get_logits(self, obs: Array, action_mask: Optional[Array]) -> Array:
        return masked_categorical_logits(self.actor(obs), action_mask)

    def __call__(self, obs: Array, state: Array, action_mask: Optional[Array]):
        """Returns (logits, value) — sampling/log-prob happen outside so the
        same apply serves rollout and update."""
        return self.get_logits(obs, action_mask), self.get_value(state)


def _tower_t(tp, x, num_layers: int, dtype):
    """Transposed MLPTower forward over [..., F, B] feature-major input —
    identical math to ``MLPTower.__call__`` (params cast to the compute
    dtype, head back to f32), contraction over the feature axis so the
    batch never leaves the TPU lane axis."""
    import jax

    h = x.astype(dtype)
    for i in range(num_layers):
        k = tp[f"Dense_{i}"]["kernel"].astype(dtype)
        b = tp[f"Dense_{i}"]["bias"].astype(dtype)
        h = jax.nn.relu(jnp.einsum("fh,...fb->...hb", k, h) + b[:, None])
    k = tp[f"Dense_{num_layers}"]["kernel"].astype(dtype)
    b = tp[f"Dense_{num_layers}"]["bias"].astype(dtype)
    return (jnp.einsum("fh,...fb->...hb", k, h)
            + b[:, None]).astype(jnp.float32)


def apply_t(params, net: CleanRLNetwork, x: Array,
            mask_t: Optional[Array] = None,
            x_critic: Optional[Array] = None) -> Tuple[Array, Array]:
    """Transposed-layout forward on the SAME params as ``net.apply``:
    x [..., F, B] -> (masked logits [..., A, B], value [..., B]).
    ``x_critic`` feeds the critic tower when the centralized state differs
    from the actor obs (hanabi); defaults to ``x``.

    The r5 training-step traces showed the kernel-major [.., N]-on-lanes
    observations paying ~320 us/step of relayout copies to reach the
    row-major [B, F] the flax towers want; contracting the feature axis
    instead (W^T @ x) consumes them in place."""
    p = params["params"]
    dtype = net.dtype or jnp.float32
    logits = _tower_t(p["actor"], x, net.num_layers, dtype)
    if mask_t is not None:
        logits = jnp.where(mask_t, logits, _MASK_NEG)
    xc = x if x_critic is None else x_critic
    value = _tower_t(p["critic"], xc, net.num_layers, dtype)[..., 0, :]
    return logits, value


def value_t(params, net: CleanRLNetwork, x: Array) -> Array:
    """Critic-only transposed forward: x [..., F, B] -> value [..., B]."""
    p = params["params"]
    dtype = net.dtype or jnp.float32
    return _tower_t(p["critic"], x, net.num_layers, dtype)[..., 0, :]


def action_and_value(
    params, net: CleanRLNetwork, key, obs, state, action_mask, action=None
) -> Tuple[Array, Array, Array, Array]:
    """Functional analog of ``get_action_and_value``
    (``vectoragent.py:107-116``): sample if no action given."""
    logits, value = net.apply(params, obs, state, action_mask)
    if action is None:
        action = dist_sample(key, logits)
    return action, dist_log_prob(logits, action), dist_entropy(logits), value
