"""Hashable env base: jit treats env objects as static config.

Two env instances with equal config tuples compile to the same executable,
mirroring the reference's per-config compilation + kernel cache.
"""

from __future__ import annotations


class EnvBase:
    def _config_key(self):
        """Override in configured envs; default = no config."""
        return ()

    def __hash__(self):
        return hash((type(self), self._config_key()))

    def __eq__(self, other):
        return type(self) is type(other) and self._config_key() == other._config_key()
