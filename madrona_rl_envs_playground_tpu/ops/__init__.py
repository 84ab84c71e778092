"""Pallas TPU kernels for the hot paths (optional alternates to the fused
jnp formulations; see each module's docstring for when they win)."""

import math


def pick_block(num_envs: int, desired: int, on_tpu: bool = True):
    """Largest valid kernel env-block <= ``desired`` for this batch size,
    or None when the kernels cannot run.

    Valid means: divides ``num_envs`` (the grid partitions the lane axis
    exactly), and on real TPU is a multiple of 128 lanes (Mosaic tile
    constraint) unless it IS the whole batch.  Callers fall back to the
    jnp path (auto mode) or raise with guidance (explicit --backend) when
    this returns None — never a bare AssertionError deep in a builder.
    """
    desired = max(1, min(desired, num_envs))
    b = desired if num_envs % desired == 0 else math.gcd(num_envs, desired)
    if num_envs % b:
        return None
    if on_tpu and b != num_envs and b % 128:
        return None
    return b
