"""Hashable env base: jit treats env objects as static config.

Two env instances with equal config tuples compile to the same executable,
mirroring the reference's per-config compilation + kernel cache.
"""

from __future__ import annotations


class EnvBase:
    # Static trajectory-structure hints (r5 training-step profiling): the
    # step() contract is unchanged — these only tell training stacks which
    # outputs carry no information so their storage/compute can be skipped.
    # state_is_obs: state_obs is the same tensor as obs every step.
    # masked: action_mask/active are informative; False = the env always
    #   emits an all-ones mask and all-active seats.
    state_is_obs: bool = False
    masked: bool = True

    def _config_key(self):
        """Override in configured envs; default = no config."""
        return ()

    def __hash__(self):
        return hash((type(self), self._config_key()))

    def __eq__(self, other):
        return type(self) is type(other) and self._config_key() == other._config_key()
