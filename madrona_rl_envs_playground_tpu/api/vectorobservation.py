"""Per-seat batched observation container.

Field-for-field parity with the reference's ``VectorObservation``
(``pantheonrl_extension/vectorobservation.py:19-32``): ``active`` mask,
partial ``obs``, full-state ``state`` (defaults to ``obs``), optional
``action_mask`` — as a JAX pytree so it flows through jitted agents
unchanged.
"""

from __future__ import annotations

from typing import Optional

import chex
import jax.numpy as jnp

Array = jnp.ndarray


@chex.dataclass(frozen=True)
class VectorObservation:
    """active: [N] bool — does this seat act on the next step.

    obs:         [N, ...] per-seat observation
    state:       [N, ...] full-state observation (critic input)
    action_mask: [N, A] bool or None (None = all actions legal)
    """

    active: Array
    obs: Array
    state: Optional[Array] = None
    action_mask: Optional[Array] = None

    def __post_init__(self):
        if self.state is None:
            object.__setattr__(self, "state", self.obs)
