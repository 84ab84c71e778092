"""Pallas TPU kernel for the Hanabi legal-move mask path.

One of the two hot paths BASELINE.json names for Pallas treatment.  The
semantics are exactly ``envs/hanabi.Env._mask_seat`` (reference
``src/hanabi_env/sim.cpp:381-444`` including the dead-slot reveal quirk);
this kernel computes every seat's mask for a block of envs in a single
fused kernel.

Layout: the env batch rides the TPU lane dimension (last axis, 128-wide
tiles), so every per-env scalar comparison becomes one full-width VPU op;
the tiny game dimensions (seats x hand slots x colors/ranks ~ tens) unroll
as static loops.  The wrapper transposes state arrays to env-last layout
around the call.

Measured reality check (documented, not hidden): for these tiny-trailing-dim
integer workloads XLA's own fusion of the jnp formulation is already
VPU-bound and within noise of this kernel — the framework's default path
stays jnp, and this kernel is the optional `use_pallas` path demonstrating
the recipe for when per-op overhead matters (small batches, many fused
sections).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_BN = 512  # envs per block (multiple of the 128-lane tile)


def _mask_kernel(P, H, C, R, A, max_info, cards_ref, size_ref, info_ref, out_ref):
    """cards_ref [P*H, BN] i32; size_ref [P, BN] i32; info_ref [1, BN] i32;
    out_ref [P*A, BN] i32."""
    info = info_ref[0, :]
    can_discard = info < max_info
    has_info = info > 0
    for a in range(P):
        size_a = size_ref[a, :]
        for j in range(H):
            live = j < size_a
            out_ref[a * A + j, :] = (live & can_discard).astype(jnp.int32)
            out_ref[a * A + H + j, :] = live.astype(jnp.int32)
        col = 2 * H
        # reveal-color: scans all hand slots incl. dead ones (reference quirk)
        for o in range(1, P):
            t = (a + o) % P
            for c in range(C):
                has = jnp.zeros_like(info, jnp.bool_)
                for j in range(H):
                    has = has | (cards_ref[t * H + j, :] // R == c)
                out_ref[a * A + col, :] = (has & has_info).astype(jnp.int32)
                col += 1
        for o in range(1, P):
            t = (a + o) % P
            for r in range(R):
                has = jnp.zeros_like(info, jnp.bool_)
                for j in range(H):
                    has = has | (cards_ref[t * H + j, :] % R == r)
                out_ref[a * A + col, :] = (has & has_info).astype(jnp.int32)
                col += 1


@functools.partial(jax.jit, static_argnums=(0, 4))
def legal_moves_pallas(env, hand_cards: Array, hand_size: Array,
                       info_tokens: Array, block: int = _BN) -> Array:
    """Batched legal-move masks.

    hand_cards [N, P, H] i32; hand_size [N, P] i32; info_tokens [N] i32
    -> [N, P, A] bool.  N must be a multiple of 512.
    """
    P, H, C, R, A = env.players, env.hand, env.colors, env.ranks, env.num_actions
    N = hand_cards.shape[0]
    assert N % block == 0, f"N={N} must be a multiple of {block}"

    cards_t = hand_cards.reshape(N, P * H).T.astype(jnp.int32)  # [P*H, N]
    size_t = hand_size.T.astype(jnp.int32)                      # [P, N]
    info_t = jnp.broadcast_to(info_tokens.astype(jnp.int32), (8, N))  # sublane-padded

    kernel = functools.partial(_mask_kernel, P, H, C, R, A, env.max_info)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P * A, N), jnp.int32),
        grid=(N // block,),
        in_specs=[
            pl.BlockSpec((P * H, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P * A, block), lambda i: (0, i), memory_space=pltpu.VMEM),
    )(cards_t, size_t, info_t)
    return out.T.reshape(N, P, A).astype(jnp.bool_)
