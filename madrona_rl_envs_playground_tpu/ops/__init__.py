"""Pallas TPU kernels for the hot paths (optional alternates to the fused
jnp formulations; see each module's docstring for when they win)."""
