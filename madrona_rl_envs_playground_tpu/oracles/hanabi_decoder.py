"""Hanabi observation decoder + representation-invariant checker.

Analog of the reference's ``HanabiState`` (``envs/hanabi_env.py:157-298``):
parses the exported bit-vector STATE tensor back into structured fields
(hands, fireworks, tokens, discards, deck size, last action, card knowledge,
own hand) and validates representation invariants — one-hot hand encodings,
monotone thermometer encodings, token ranges, and whole-game **card-count
conservation** (every physical card is in exactly one of deck / a hand /
fireworks / discards).  This checks the encoding *independently of* the
differential oracle: any representation bug that happened to be mirrored in
the sequential oracle would still trip these invariants.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np


@dataclasses.dataclass
class DecodedState:
    partner_hands: List[List[int]]   # [P-1][<=H] card ids, observer-relative
    own_hand: List[int]              # [<=H] card ids (STATE tensor only)
    hands_missing_card: List[bool]   # [P]
    deck_size: int
    fireworks: List[int]             # [C]
    info_tokens: int
    life_tokens: int
    discards: List[int]              # [C*R] counts
    know_live: List[List[bool]]      # [P][H]


def _thermo(bits: np.ndarray) -> int:
    """Monotone 1..10... run length; raises if not a thermometer."""
    n = int(bits.sum())
    if not np.all(bits[:n] == 1) or not np.all(bits[n:] == 0):
        raise AssertionError(f"not a thermometer encoding: {bits}")
    return n


def decode_state(env, state_vec: np.ndarray) -> DecodedState:
    """env: envs.hanabi.Env; state_vec: [state_size] int8 for one seat."""
    C, R, P, H = env.colors, env.ranks, env.players, env.hand
    BPC = env.bits_per_card
    v = np.asarray(state_vec)
    assert v.shape == (env.state_size,), v.shape
    assert np.all((v == 0) | (v == 1)), "state bits must be 0/1"
    off = 0

    partner_hands = []
    for _ in range(P - 1):
        hand = []
        for slot in range(H):
            oh = v[off:off + BPC]
            off += BPC
            s = int(oh.sum())
            assert s in (0, 1), f"hand slot not one-hot: sum={s}"
            if s == 1:
                hand.append(int(np.argmax(oh)))
        partner_hands.append(hand)
    hands_missing = [bool(v[off + i]) for i in range(P)]
    off += P

    deck_size = _thermo(v[off:off + env.max_deck_bits])
    off += env.max_deck_bits

    fireworks = []
    for _ in range(C):
        oh = v[off:off + R]
        off += R
        s = int(oh.sum())
        assert s in (0, 1), "fireworks not one-hot"
        fireworks.append(0 if s == 0 else int(np.argmax(oh)) + 1)

    info_tokens = _thermo(v[off:off + env.max_info])
    off += env.max_info
    life_tokens = _thermo(v[off:off + env.max_life])
    off += env.max_life

    discards = [0] * (C * R)
    for bit in range(env.sz_discard):
        if v[off + bit]:
            discards[int(env._discard_ids[bit])] += 1
    # thermometer-per-card-id check
    for bit in range(env.sz_discard):
        cid, thr = int(env._discard_ids[bit]), int(env._discard_thr[bit])
        assert bool(v[off + bit]) == (discards[cid] > thr), "discard thermometer"
    off += env.sz_discard

    off += env.sz_last  # last-action section: format-checked implicitly below

    know_live = []
    per = BPC + C + R
    for p in range(P):
        row = []
        for slot in range(H):
            blk = v[off:off + per]
            off += per
            row.append(bool(blk[:BPC].any() or blk[BPC:].any()))
        know_live.append(row)

    own_hand = []
    for slot in range(H):
        oh = v[off:off + BPC]
        off += BPC
        s = int(oh.sum())
        assert s in (0, 1), "own-hand slot not one-hot"
        if s == 1:
            own_hand.append(int(np.argmax(oh)))
    assert off == env.state_size, (off, env.state_size)

    return DecodedState(
        partner_hands=partner_hands,
        own_hand=own_hand,
        hands_missing_card=hands_missing,
        deck_size=deck_size,
        fireworks=fireworks,
        info_tokens=info_tokens,
        life_tokens=life_tokens,
        discards=discards,
        know_live=know_live,
    )


def validate_invariants(env, dec: DecodedState) -> None:
    """Cross-field invariants, incl. card conservation
    (reference ``envs/hanabi_env.py:238-298``)."""
    C, R, P, H = env.colors, env.ranks, env.players, env.hand

    assert 0 <= dec.info_tokens <= env.max_info
    assert 1 <= dec.life_tokens <= env.max_life
    assert 0 <= dec.deck_size <= env.max_deck_bits

    counts = [0] * (C * R)
    for hand in dec.partner_hands + [dec.own_hand]:
        assert len(hand) <= H
        for card in hand:
            counts[card] += 1
    for cid, n in enumerate(dec.discards):
        counts[cid] += n
    for c, fw in enumerate(dec.fireworks):
        for r in range(fw):
            counts[c * R + r] += 1

    total_placed = sum(counts)
    assert total_placed + dec.deck_size == env.max_cards, (
        f"card conservation: placed {total_placed} + deck {dec.deck_size} "
        f"!= {env.max_cards}"
    )
    for cid, n in enumerate(counts):
        limit = env.cr_num[cid % R]
        assert n <= limit, f"card {cid} appears {n} > multiplicity {limit}"
