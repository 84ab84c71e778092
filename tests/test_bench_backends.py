"""bench.py backend dispatch: every (env, backend) route must build and run.

Tiny shapes in interpret mode on CPU — this is a wiring regression guard
(the perf numbers come from real-TPU runs), covering the jnp scan, the
per-step megakernels, and the persistent whole-rollout kernels.
"""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import build_rollout, make_env  # noqa: E402


@pytest.mark.parametrize("name,backend,num_envs", [
    ("overcooked", "jnp", 8),
    ("overcooked", "pallas", 8),
    ("overcooked", "persistent", 8),
    ("overcooked2", "persistent", 8),
    ("cartpole", "jnp", 8),
    ("cartpole", "pallas", 8),
    ("cartpole", "persistent", 8),
    ("balance", "pallas", 8),
    ("balance", "persistent", 8),
    ("hanabi", "pallas", 8),
])
def test_backend_route_runs(name, backend, num_envs):
    env = make_env(name, None, None)
    bstate, out, run = build_rollout(env, name, num_envs, 4, backend=backend)
    bstate, out, s = run(bstate, out, jax.random.PRNGKey(0))
    assert np.isfinite(float(s))
    # a second call continues from the carry (the bench repeat loop)
    bstate, out, s2 = run(bstate, out, jax.random.PRNGKey(1))
    assert np.isfinite(float(s2))


def test_pick_block():
    from madrona_rl_envs_playground_tpu.ops import pick_block

    assert pick_block(8192, 1024) == 1024          # divides cleanly
    assert pick_block(4608, 1024) == 512           # gcd fallback, %128
    assert pick_block(100000, 8192) is None        # gcd=32, not %128 on TPU
    assert pick_block(100000, 8192, on_tpu=False) == 32
    assert pick_block(64, 2048) == 64              # whole batch is exempt
    assert pick_block(100, 2048) == 100
    assert pick_block(98304, 65536) == 32768       # 3*2^15 meets 2^16
