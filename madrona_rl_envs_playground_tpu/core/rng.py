"""Bitwise-parity RNG matching the reference simulators' per-episode streams.

The reference engines seed a tiny per-world RNG at every episode boundary from a
global episode counter (reference: ``src/*/rng.hpp:7-36`` — an 8-round TEA-like
hash of the episode index followed by a 32-bit LCG whose low 24 bits become a
float in [0, 1)).  Re-expressed here as pure ``uint32`` jnp ops so the identical
bit stream is produced under ``vmap``/``jit`` on TPU.

All functions are scalar-shaped and intended to be ``vmap``-ed over the env
batch axis; the LCG word is carried inside each env's state pytree.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["seed", "next_uint", "uniform", "randint"]

_LCG_A = jnp.uint32(1664525)
_LCG_C = jnp.uint32(1013904223)
_TEA_DELTA = jnp.uint32(0x9E3779B9)
_K0 = jnp.uint32(0xA341316C)
_K1 = jnp.uint32(0xC8013EA4)
_K2 = jnp.uint32(0xAD90777D)
_K3 = jnp.uint32(0x7E95761E)
_MASK24 = jnp.uint32(0x00FFFFFF)
_INV_2_24 = jnp.float32(1.0) / jnp.float32(0x01000000)


def seed(episode_idx) -> jnp.ndarray:
    """Hash an episode index into the initial LCG word.

    Parity target: ``RNG::make(idx)`` (reference ``src/cartpole_env/rng.hpp:7-26``).
    """
    v0 = jnp.asarray(episode_idx, jnp.uint32)
    v1 = jnp.uint32(0)
    s0 = jnp.uint32(0)

    def round_fn(_, carry):
        v0, v1, s0 = carry
        s0 = s0 + _TEA_DELTA
        v0 = v0 + (((v1 << 4) + _K0) ^ (v1 + s0) ^ ((v1 >> 5) + _K1))
        v1 = v1 + (((v0 << 4) + _K2) ^ (v0 + s0) ^ ((v0 >> 5) + _K3))
        return v0, v1, s0

    v0, v1, s0 = lax.fori_loop(0, 8, round_fn, (v0, v1, s0), unroll=True)
    return v0


def next_uint(v: jnp.ndarray) -> jnp.ndarray:
    """Advance the LCG word one step."""
    return _LCG_A * v + _LCG_C


def lcg_skip_constants(k: int):
    """(A^k, C_k) mod 2^32 such that v_k = A^k * v_0 + C_k — lets k sequential
    LCG draws be evaluated in parallel from the seed."""
    a, c = 1, 0
    for _ in range(k):
        a = (a * 1664525) % (1 << 32)
        c = (c * 1664525 + 1013904223) % (1 << 32)
    return jnp.uint32(a), jnp.uint32(c)


def uniform_from(v: jnp.ndarray):
    """The [0,1) sample the LCG word v itself encodes (low 24 bits)."""
    return (v & _MASK24).astype(jnp.float32) * _INV_2_24


def uniform(v: jnp.ndarray):
    """Draw one float32 in [0, 1) with 24-bit resolution; returns (v', sample).

    Parity target: ``RNG::rand()`` (reference ``src/cartpole_env/rng.hpp:28-36``).
    """
    v = next_uint(v)
    return v, (v & _MASK24).astype(jnp.float32) * _INV_2_24


def randint(v: jnp.ndarray, n):
    """Draw ``int32(n * rand())`` exactly as the reference's truncating casts do.

    ``n`` may be a traced integer (e.g. the live deck size in Hanabi).
    """
    v, u = uniform(v)
    return v, (jnp.asarray(n, jnp.float32) * u).astype(jnp.int32)
