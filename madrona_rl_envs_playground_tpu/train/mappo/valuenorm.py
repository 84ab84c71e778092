"""Value normalization for MAPPO (pure-JAX pytree state).

``ValueNorm`` — debiased running mean/var of value targets
(reference ``train/MAPPO/utils/valuenorm.py``: EMA with beta=0.99999,
optional per-element batch weighting, variance clamped to >= 1e-2).

``popart_update`` — PopArt head update (reference ``utils/popart.py``):
the critic output layer's kernel/bias are rescaled so its outputs are
preserved under the new statistics.  Stats state is shared with ValueNorm.
"""

from __future__ import annotations

from typing import Tuple

import chex
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


@chex.dataclass(frozen=True)
class ValueNormState:
    running_mean: Array
    running_mean_sq: Array
    debiasing_term: Array


def init_valuenorm() -> ValueNormState:
    return ValueNormState(
        running_mean=jnp.float32(0.0),
        running_mean_sq=jnp.float32(0.0),
        debiasing_term=jnp.float32(0.0),
    )


def _debiased_mean_var(s: ValueNormState, epsilon=1e-5) -> Tuple[Array, Array]:
    mean = s.running_mean / jnp.maximum(s.debiasing_term, epsilon)
    mean_sq = s.running_mean_sq / jnp.maximum(s.debiasing_term, epsilon)
    var = jnp.maximum(mean_sq - mean**2, 1e-2)
    return mean, var


def vn_update(s: ValueNormState, x: Array, beta: float = 0.99999,
              per_element_update: bool = False) -> ValueNormState:
    batch_mean = jnp.mean(x)
    batch_sq_mean = jnp.mean(x**2)
    if per_element_update:
        weight = beta ** float(np.prod(x.shape))
    else:
        weight = beta
    return ValueNormState(
        running_mean=s.running_mean * weight + batch_mean * (1.0 - weight),
        running_mean_sq=s.running_mean_sq * weight + batch_sq_mean * (1.0 - weight),
        debiasing_term=s.debiasing_term * weight + (1.0 - weight),
    )


def vn_normalize(s: ValueNormState, x: Array) -> Array:
    mean, var = _debiased_mean_var(s)
    return (x - mean) / jnp.sqrt(var)


def vn_denormalize(s: ValueNormState, x: Array) -> Array:
    mean, var = _debiased_mean_var(s)
    return x * jnp.sqrt(var) + mean


def popart_update(kernel: Array, bias: Array, s: ValueNormState, x: Array,
                  beta: float = 0.99999):
    """Update stats AND rescale the v_out layer so outputs are preserved
    (reference ``popart.py:49-73``).  Returns (kernel', bias', state')."""
    old_mean, old_var = _debiased_mean_var(s)
    old_std = jnp.sqrt(old_var)
    s2 = vn_update(s, x, beta=beta)
    new_mean, new_var = _debiased_mean_var(s2)
    new_std = jnp.sqrt(new_var)
    kernel2 = kernel * old_std / new_std
    bias2 = (old_std * bias + old_mean - new_mean) / new_std
    return kernel2, bias2, s2
