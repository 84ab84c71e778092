"""RNG parity tests: the vectorized TEA+LCG stream must match a pure-Python
reimplementation of the reference spec (``src/cartpole_env/rng.hpp:7-36``)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from madrona_rl_envs_playground_tpu.core import rng

M32 = 0xFFFFFFFF


def py_seed(idx: int) -> int:
    v0, v1, s0 = idx & M32, 0, 0
    for _ in range(8):
        s0 = (s0 + 0x9E3779B9) & M32
        v0 = (v0 + ((((v1 << 4) & M32) + 0xA341316C) ^ ((v1 + s0) & M32) ^ (((v1 >> 5) + 0xC8013EA4) & M32))) & M32
        v1 = (v1 + ((((v0 << 4) & M32) + 0xAD90777D) ^ ((v0 + s0) & M32) ^ (((v0 >> 5) + 0x7E95761E) & M32))) & M32
    return v0


def py_rand(v: int):
    v = (1664525 * v + 1013904223) & M32
    return v, np.float32(v & 0x00FFFFFF) / np.float32(0x01000000)


pytestmark = pytest.mark.quick


def test_seed_matches_python():
    idxs = [0, 1, 2, 7, 12345, 2**31, 2**32 - 1]
    got = jax.vmap(rng.seed)(jnp.array(idxs, dtype=jnp.uint32))
    want = [py_seed(i) for i in idxs]
    np.testing.assert_array_equal(np.asarray(got, dtype=np.uint64), want)


def test_uniform_stream_matches_python():
    v_py = py_seed(42)
    v_jx = rng.seed(jnp.uint32(42))
    for _ in range(100):
        v_py, r_py = py_rand(v_py)
        v_jx, r_jx = rng.uniform(v_jx)
        assert int(v_jx) == v_py
        assert np.float32(r_jx) == r_py


def test_randint_truncation():
    # int32(n * rand()) truncates toward zero exactly as the C++ cast.
    v = rng.seed(jnp.uint32(3))
    for n in (5, 50, 3):
        v2, k = rng.randint(v, n)
        _, u = rng.uniform(v)
        assert int(k) == int(np.float32(n) * np.float32(u))
        assert 0 <= int(k) < n
        v = v2
