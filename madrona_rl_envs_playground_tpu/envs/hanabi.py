"""Hanabi batch simulator (TPU-native).

Capability parity with the reference's Madrona Hanabi (``src/hanabi_env/``):
the full card game as a Dec-POMDP — deck as a 50-slot array with random-swap
draws (``sim.cpp:45-52``), per-agent hands with ``card_plausible`` bitmask
knowledge, 20-move space (discard/play/reveal-color/reveal-rank,
``sim.hpp:15-16``), turn-based control via ``cur_player`` + per-agent active
flags (``sim.cpp:794-810``), bit-vector observation encoder of five sections
(hands/board/discards/last-action/card-knowledge) plus own-hand appended only
to the state tensor (``sim.cpp:54-379``), legal-move mask generation
(``sim.cpp:381-444``), reward = Δscore with life/score/turn-exhaustion
termination (``sim.cpp:812-849``).

Only the acting seat's observation/mask is re-encoded each step; the other
seats keep their stale snapshots exactly as the reference does
(``observationSystem``, ``sim.cpp:786-810``) — so the per-seat obs buffers are
part of the simulator state.

Two reference quirks are reproduced bit-for-bit on purpose (they are what the
C++ computes, and bitwise parity is the goal):

* ``encodeCardKnowledge`` broadcasts plausible-mask **bit i** (the observer-
  relative player offset) across the whole bits-per-card block instead of
  testing bit v per card value (``sim.cpp:322``: ``card_plausible[cardnum] &
  (1 << i)``).
* the reveal-color/rank legality scan loops over all ``hand_size`` slots, not
  the live ``size``, so stale cards in dead slots still count
  (``sim.cpp:414-436``); similarly ``newly_revealed_bitmask`` tests
  ``known_color`` in the reveal-rank branch (``sim.cpp:746``) — irrelevant
  here since that mask is never observed.

Config (colors/ranks/players/tokens) is static per-instance; hand size is 5
below 4 players else 4 (``sim.cpp:873``).
"""

from __future__ import annotations

import chex
import numpy as np
import jax
import jax.numpy as jnp

from ..core import rng
from ..core.base import EnvBase

Array = jnp.ndarray

# Reference C++ caps the move space at 20 (src/hanabi_env/sim.hpp:15-16,
# enough for its 2-player configs); this build sizes the mask to the
# config's actual move count, so >2-player games fit too.
NUM_MOVES_MAX = 60

FULL_CONFIG = dict(colors=5, ranks=5, players=2, max_information_tokens=8, max_life_tokens=3)
SMALL_CONFIG = dict(colors=2, ranks=5, players=2, max_information_tokens=3, max_life_tokens=1)
VERY_SMALL_CONFIG = dict(colors=1, ranks=5, players=2, max_information_tokens=3, max_life_tokens=1)
CONFIGS = {"full": FULL_CONFIG, "small": SMALL_CONFIG, "very_small": VERY_SMALL_CONFIG}


@chex.dataclass(frozen=True)
class State:
    deck: Array            # [MAX_CARDS] int32 card ids
    deck_size: Array       # [] int32
    discard_counts: Array  # [CR] int32
    fireworks: Array       # [colors] int32
    info_tokens: Array     # [] int32
    life_tokens: Array     # [] int32
    cur_player: Array      # [] int32
    turns_to_play: Array   # [] int32
    score: Array           # [] int32
    # last move
    lm_move: Array         # [] int32: 0=discard 1=play 2=revealC 3=revealR 4=invalid
    lm_player: Array
    lm_target: Array
    lm_card_index: Array
    lm_scored: Array
    lm_info_token: Array
    lm_color: Array
    lm_rank: Array
    lm_reveal_bits: Array
    # hands
    hand_cards: Array      # [P, H] int32
    hand_plausible: Array  # [P, H] uint32 bitmask over CR card values
    hand_size: Array       # [P] int32
    known_color: Array     # [P, H] int32 (-1 unknown)
    known_rank: Array      # [P, H] int32
    # stale per-seat encodings (exported verbatim); the STATE tensor is the
    # OBS bits plus the own-hand block, so only the own-hand part is stored
    # separately — halves the buffer bytes carried through every fusion
    # boundary, the bandwidth hot spot of the hanabi step
    obs_buf: Array         # [P, OBS] int8
    own_buf: Array         # [P, H*BPC] int8
    mask_buf: Array        # [P, M] bool
    rng_v: Array


M_DISCARD, M_PLAY, M_REVEAL_C, M_REVEAL_R, M_INVALID = 0, 1, 2, 3, 4


# Dynamic one-element get/set expressed as arange-compare selects: under vmap
# a traced index would otherwise lower to an XLA gather/scatter, which the TPU
# executes orders of magnitude slower than these pure-VPU masked ops (the
# arrays involved are only 50/10/5 wide).
def _get1(arr: Array, idx: Array) -> Array:
    k = jnp.arange(arr.shape[-1])
    return jnp.sum(jnp.where(k == idx, arr, jnp.zeros_like(arr)), axis=-1)


def _set1(arr: Array, idx: Array, val: Array) -> Array:
    k = jnp.arange(arr.shape[-1])
    return jnp.where(k == idx, jnp.asarray(val, arr.dtype), arr)


def _setrow(mat: Array, row_idx: Array, new_row: Array) -> Array:
    sel = (jnp.arange(mat.shape[0]) == row_idx).reshape(
        (mat.shape[0],) + (1,) * (mat.ndim - 1)
    )
    return jnp.where(sel, new_row, mat)


def _take_rows(mat: Array, order: Array) -> Array:
    """mat[order] for a tiny traced row-index vector, as unrolled selects
    (a traced gather under vmap is far slower on TPU)."""
    P = mat.shape[0]
    outs = []
    for k in range(order.shape[0]):
        acc = jnp.zeros_like(mat[0])
        for p in range(P):
            acc = acc + jnp.where(order[k] == p, mat[p], jnp.zeros_like(mat[0]))
        outs.append(acc)
    return jnp.stack(outs)


class Env(EnvBase):
    reward_dtype = jnp.float32
    obs_dtype = jnp.int8

    def __init__(self, colors=5, ranks=5, players=2, max_information_tokens=8,
                 max_life_tokens=3, **_ignored):
        self.colors = int(colors)
        self.ranks = int(ranks)
        self.players = int(players)
        self.max_info = int(max_information_tokens)
        self.max_life = int(max_life_tokens)
        self.hand = 5 if self.players < 4 else 4
        self.num_agents = self.players

        C, R, P, H = self.colors, self.ranks, self.players, self.hand
        self.bits_per_card = C * R
        # per-(color,rank) multiplicity: 3 for rank 0, 1 for top rank, else 2
        self.cr_num = [3 if r == 0 else 1 if r == R - 1 else 2 for r in range(R)]
        self.cards_per_color = sum(self.cr_num)
        self.max_cards = self.cards_per_color * C
        self.max_deck_bits = self.max_cards - H * P

        self.sz_hands = self.bits_per_card * H * (P - 1) + P
        self.sz_board = self.max_deck_bits + C * R + self.max_info + self.max_life
        self.sz_discard = self.max_cards
        self.sz_last = P + 4 + P + C + R + H + H + C * R + 2
        self.sz_know = P * H * (C * R + C + R)
        self.obs_size = self.sz_hands + self.sz_board + self.sz_discard + self.sz_last + self.sz_know
        self.state_size = self.obs_size + H * self.bits_per_card
        self.num_actions = 2 * H + (P - 1) * C + (P - 1) * R
        assert self.num_actions <= NUM_MOVES_MAX

        # static discard-encoding structure: bit -> (card_id, threshold)
        ids, thr = [], []
        for c in range(C):
            for r in range(R):
                for i in range(self.cr_num[r]):
                    ids.append(c * R + r)
                    thr.append(i)
        self._discard_ids = np.asarray(ids, np.int32)
        self._discard_thr = np.asarray(thr, np.int32)

        # initial deck: card id c*R+r repeated cr_num[r] times, in (c, r) order
        deck0 = []
        for c in range(C):
            for r in range(R):
                deck0 += [c * R + r] * self.cr_num[r]
        self._deck0 = np.asarray(deck0, np.int32)
        self._valid_mask = np.uint32((1 << self.bits_per_card) - 1)

    def _config_key(self):
        return (self.colors, self.ranks, self.players, self.max_info, self.max_life)

    # ------------------------------------------------------------------
    def _draw(self, deck, size, v):
        """Random-swap draw (sim.cpp:45-52). Returns (deck', size', v', card)."""
        v, loc = rng.randint(v, size)
        card = _get1(deck, loc)
        deck = _set1(deck, loc, _get1(deck, size - 1))
        return deck, size - 1, v, card

    def init_core(self, episode_idx: Array) -> State:
        C, R, P, H = self.colors, self.ranks, self.players, self.hand
        v0 = rng.seed(episode_idx)
        M = self.max_cards
        D = P * H  # number of deal draws

        # The deal's draw sequence is action-independent, so the whole
        # swap-draw loop (reference sim.cpp:45-52 repeated P*H times at
        # resetWorld) collapses to closed form: the LCG words of all D draws
        # come straight from the seed via precomputed (A^k, C_k), and the
        # swap chain resolves with an unrolled last-write-wins compare
        # cascade over the <=D touched positions — no sequential [N, M] deck
        # updates.  This runs every step for every world (fused auto-reset),
        # so it is hot.
        locs = []
        for k in range(D):
            a_k, c_k = rng.lcg_skip_constants(k + 1)
            v_k = a_k * v0 + c_k
            u = rng.uniform_from(v_k)
            locs.append((jnp.float32(M - k) * u).astype(jnp.int32))
        a_D, c_D = rng.lcg_skip_constants(D)
        v = a_D * v0 + c_D

        deck0 = self._deck0  # static numpy [M]

        def orig(loc):
            # deck0[loc] arithmetically: color = loc // cards_per_color,
            # rank from the static within-color pattern via thresholds.
            cpc = self.cards_per_color
            rem = loc % cpc
            rank = jnp.int32(0)
            acc = 0
            for r in range(R):
                acc += self.cr_num[r]
                rank = jnp.where(rem >= acc, r + 1, rank)
            return (loc // cpc) * R + rank

        # moved[j] = value sitting at position M-1-j just before draw j
        moved = []
        for j in range(D):
            tgt = M - 1 - j  # static
            val = jnp.int32(int(deck0[tgt]))
            for i in range(j):
                val = jnp.where(locs[i] == tgt, moved[i], val)
            moved.append(val)

        # dealt card k = last value written at locs[k] (original if none)
        cards = []
        for k in range(D):
            val = orig(locs[k])
            for j in range(k):
                val = jnp.where(locs[j] == locs[k], moved[j], val)
            cards.append(val)
        hand_cards = jnp.stack(cards).reshape(P, H)

        # final deck: last-write-wins over the touched positions
        pos = jnp.arange(M)
        deck = jnp.asarray(deck0)
        for j in range(D):
            deck = jnp.where(pos == locs[j], moved[j], deck)
        size = jnp.int32(M - D)

        obs = jnp.zeros((P, self.obs_size), jnp.int8)
        own = jnp.zeros((P, H * self.bits_per_card), jnp.int8)
        mask = jnp.zeros((P, self.num_actions), jnp.bool_)
        return State(
            deck=deck,
            deck_size=size,
            discard_counts=jnp.zeros((C * R,), jnp.int32),
            fireworks=jnp.zeros((C,), jnp.int32),
            info_tokens=jnp.int32(self.max_info),
            life_tokens=jnp.int32(self.max_life),
            cur_player=jnp.int32(0),
            turns_to_play=jnp.int32(P),
            score=jnp.int32(0),
            lm_move=jnp.int32(M_INVALID),
            lm_player=jnp.int32(-1),
            lm_target=jnp.int32(-1),
            lm_card_index=jnp.int32(-1),
            lm_scored=jnp.int32(0),
            lm_info_token=jnp.int32(0),
            lm_color=jnp.int32(-1),
            lm_rank=jnp.int32(-1),
            lm_reveal_bits=jnp.int32(0),
            hand_cards=hand_cards,
            hand_plausible=jnp.full((P, H), self._valid_mask, jnp.uint32),
            hand_size=jnp.full((P,), H, jnp.int32),
            known_color=jnp.full((P, H), -1, jnp.int32),
            known_rank=jnp.full((P, H), -1, jnp.int32),
            obs_buf=obs,
            own_buf=own,
            mask_buf=mask,
            rng_v=v,
        )

    # ------------------------------------------------------------------
    def _remove_from_hand(self, s: State, agent: Array, idx: Array):
        """removeFromHand (sim.cpp:567-595): refill from deck, or shift left
        when the deck is empty (dead slots keep their stale values)."""
        H = self.hand
        deck_empty = s.deck_size == 0

        # --- branch A: deck has cards — replace slot idx with a fresh draw
        deck_a, size_a, v_a, card = self._draw(s.deck, s.deck_size, s.rng_v)

        # --- branch B: empty deck — shift slots (idx, size-1) left by one
        k = jnp.arange(H)
        size_here = _get1(s.hand_size, agent)
        shift_sel = (k >= idx) & (k < size_here - 1)

        def shift_row(row):
            return jnp.where(shift_sel, jnp.roll(row, -1, axis=-1), row)

        a_cards = jnp.sum(
            jnp.where((jnp.arange(s.hand_cards.shape[0]) == agent)[:, None], s.hand_cards, 0),
            axis=0,
        )
        a_plaus = jnp.sum(
            jnp.where(
                (jnp.arange(s.hand_plausible.shape[0]) == agent)[:, None],
                s.hand_plausible,
                jnp.uint32(0),
            ),
            axis=0,
        )
        a_kc = jnp.sum(
            jnp.where((jnp.arange(s.known_color.shape[0]) == agent)[:, None], s.known_color, 0),
            axis=0,
        )
        a_kr = jnp.sum(
            jnp.where((jnp.arange(s.known_rank.shape[0]) == agent)[:, None], s.known_rank, 0),
            axis=0,
        )

        cards_b = shift_row(a_cards)
        plaus_b = shift_row(a_plaus)
        kc_b = shift_row(a_kc)
        kr_b = shift_row(a_kr)

        new_cards = jnp.where(deck_empty, cards_b, _set1(a_cards, idx, card))
        new_plaus = jnp.where(deck_empty, plaus_b, _set1(a_plaus, idx, self._valid_mask))
        new_kc = jnp.where(deck_empty, kc_b, _set1(a_kc, idx, -1))
        new_kr = jnp.where(deck_empty, kr_b, _set1(a_kr, idx, -1))

        return s.replace(
            deck=jnp.where(deck_empty, s.deck, deck_a),
            deck_size=jnp.where(deck_empty, s.deck_size, size_a),
            rng_v=jnp.where(deck_empty, s.rng_v, v_a),
            hand_cards=_setrow(s.hand_cards, agent, new_cards),
            hand_plausible=_setrow(s.hand_plausible, agent, new_plaus),
            hand_size=s.hand_size - jnp.where(
                (jnp.arange(s.hand_size.shape[0]) == agent) & deck_empty, 1, 0
            ),
            known_color=_setrow(s.known_color, agent, new_kc),
            known_rank=_setrow(s.known_rank, agent, new_kr),
        )

    def transition(self, s: State, actions: Array):
        C, R, P, H = self.colors, self.ranks, self.players, self.hand

        s = s.replace(turns_to_play=s.turns_to_play - (s.deck_size == 0).astype(jnp.int32))
        agent = s.cur_player
        uid = _get1(actions, agent)

        # classify the move
        is_discard = uid < H
        is_play = (uid >= H) & (uid < 2 * H)
        rc_base = 2 * H
        rr_base = 2 * H + (P - 1) * C
        is_rc = (uid >= rc_base) & (uid < rr_base)
        is_rr = uid >= rr_base

        card_idx = jnp.where(is_discard, uid, uid - H)  # for discard/play
        card_idx = jnp.clip(card_idx, 0, H - 1)
        card = _get1(_get1(s.hand_cards.T, agent), card_idx)
        card_color = card // R
        card_rank = card % R

        # ---- discard ---------------------------------------------------
        disc_counts = s.discard_counts + (
            is_discard.astype(jnp.int32) * jax.nn.one_hot(card, C * R, dtype=jnp.int32)
        )
        info = s.info_tokens + is_discard.astype(jnp.int32)

        # ---- play -------------------------------------------------------
        success = is_play & (_get1(s.fireworks, card_color) == card_rank)
        fireworks = s.fireworks + (
            success.astype(jnp.int32) * jax.nn.one_hot(card_color, C, dtype=jnp.int32)
        )
        completed = success & (_get1(fireworks, card_color) == R)
        info = info + completed.astype(jnp.int32)
        failed = is_play & ~success
        disc_counts = disc_counts + (
            failed.astype(jnp.int32) * jax.nn.one_hot(card, C * R, dtype=jnp.int32)
        )
        life = s.life_tokens - failed.astype(jnp.int32)

        # ---- reveals ----------------------------------------------------
        rc_uid = jnp.clip(uid - rc_base, 0, (P - 1) * C)
        rr_uid = jnp.clip(uid - rr_base, 0, (P - 1) * R)
        tgt_off = jnp.where(is_rc, 1 + rc_uid // C, 1 + rr_uid // R)
        rev_color = rc_uid % C
        rev_rank = rr_uid % R
        target = (agent + tgt_off) % P
        info = info - (is_rc | is_rr).astype(jnp.int32)

        rowsel = lambda m: jnp.sum(
            jnp.where((jnp.arange(m.shape[0]) == target)[:, None], m, jnp.zeros_like(m)),
            axis=0,
        )
        t_cards = rowsel(s.hand_cards)
        t_size = _get1(s.hand_size, target)
        slot = jnp.arange(H)
        live = slot < t_size
        match_c = (t_cards // R == rev_color) & live
        match_r = (t_cards % R == rev_rank) & live

        # plausible-mask updates
        color_mask = jnp.uint32(((1 << R) - 1)) << (rev_color * R).astype(jnp.uint32)
        rank_bits = np.zeros((), np.uint32)
        rank_mask = jnp.sum(
            jnp.uint32(1) << (jnp.arange(R, dtype=jnp.uint32) * jnp.uint32(R) + rev_rank.astype(jnp.uint32))
        ).astype(jnp.uint32)
        del rank_bits

        t_plaus = rowsel(s.hand_plausible)
        plaus_rc = jnp.where(match_c, t_plaus & color_mask, t_plaus & ~color_mask)
        plaus_rr = jnp.where(match_r, t_plaus & rank_mask, t_plaus & ~rank_mask)
        new_t_plaus = jnp.where(is_rc, plaus_rc, jnp.where(is_rr, plaus_rr, t_plaus))

        t_kc = rowsel(s.known_color)
        t_kr = rowsel(s.known_rank)
        new_t_kc = jnp.where(is_rc & match_c, rev_color, t_kc)
        new_t_kr = jnp.where(is_rr & match_r, rev_rank, t_kr)

        reveal_bits = jnp.sum(
            jnp.where(is_rc, match_c, match_r).astype(jnp.int32) << slot
        ) * (is_rc | is_rr).astype(jnp.int32)

        s = s.replace(
            discard_counts=disc_counts,
            fireworks=fireworks,
            info_tokens=info,
            life_tokens=life,
            hand_plausible=_setrow(s.hand_plausible, target, new_t_plaus),
            known_color=_setrow(s.known_color, target, new_t_kc),
            known_rank=_setrow(s.known_rank, target, new_t_kr),
            cur_player=(s.cur_player + 1) % P,
            lm_move=jnp.where(
                is_discard,
                M_DISCARD,
                jnp.where(is_play, M_PLAY, jnp.where(is_rc, M_REVEAL_C, M_REVEAL_R)),
            ),
            lm_player=agent,
            lm_target=jnp.where(is_rc | is_rr, target, -1),
            lm_card_index=jnp.where(is_discard | is_play, card_idx, -1),
            lm_scored=success.astype(jnp.int32),
            lm_info_token=completed.astype(jnp.int32),
            lm_color=jnp.where(
                is_discard | is_play, card_color, jnp.where(is_rc, rev_color, -1)
            ),
            lm_rank=jnp.where(
                is_discard | is_play, card_rank, jnp.where(is_rr, rev_rank, -1)
            ),
            lm_reveal_bits=reveal_bits,
        )

        # replace/shift the played or discarded card
        s_removed = self._remove_from_hand(s, agent, card_idx)
        took_card = is_discard | is_play
        s = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                took_card.reshape((1,) * a.ndim), a, b
            ) if a.ndim else jnp.where(took_card, a, b),
            s_removed,
            s,
        )

        # ---- checkDone (sim.cpp:812-849) ---------------------------------
        old_score = s.score
        score = jnp.where(s.life_tokens > 0, jnp.sum(s.fireworks), 0)
        new_rew = (score - old_score).astype(jnp.float32)
        s = s.replace(score=score)
        done = (s.life_tokens < 1) | (score >= C * R) | (s.turns_to_play <= 0)
        reward = jnp.broadcast_to(new_rew, (P,))
        return s, reward, done

    # ------------------------------------------------------------------
    # Observation encoding (sim.cpp:54-379), vmapped over the observer seat.
    def _encode_seat(self, s: State, a: Array):
        C, R, P, H = self.colors, self.ranks, self.players, self.hand
        BPC = self.bits_per_card
        slot = jnp.arange(H)

        parts = []

        # -- hands: partners' actual cards, observer-relative order ----------
        partner_order = (a + 1 + jnp.arange(P - 1)) % P
        p_cards = _take_rows(s.hand_cards, partner_order)            # [P-1, H]
        p_live = slot[None, :] < _take_rows(s.hand_size[:, None], partner_order)
        hands_oh = jax.nn.one_hot(p_cards, BPC, dtype=jnp.int8) * p_live[..., None].astype(jnp.int8)
        parts.append(hands_oh.reshape(-1))
        all_order = (a + jnp.arange(P)) % P
        parts.append((_take_rows(s.hand_size[:, None], all_order)[:, 0] < H).astype(jnp.int8))

        # -- board ------------------------------------------------------------
        parts.append((jnp.arange(self.max_deck_bits) < s.deck_size).astype(jnp.int8))
        fw = jax.nn.one_hot(s.fireworks - 1, R, dtype=jnp.int8)  # rank i+1 == fireworks
        parts.append(fw.reshape(-1))
        parts.append((jnp.arange(self.max_info) < s.info_tokens).astype(jnp.int8))
        parts.append((jnp.arange(self.max_life) < s.life_tokens).astype(jnp.int8))

        # -- discards -----------------------------------------------------------
        parts.append(
            (s.discard_counts[jnp.asarray(self._discard_ids)] > jnp.asarray(self._discard_thr)).astype(jnp.int8)
        )

        # -- last action ----------------------------------------------------------
        lm = s
        rel_actor = jnp.where(lm.lm_player == -1, -1, (a - lm.lm_player + P) % P)
        parts.append((jnp.arange(P) == rel_actor).astype(jnp.int8))
        mt = lm.lm_move
        parts.append(
            jnp.stack([mt == M_PLAY, mt == M_DISCARD, mt == M_REVEAL_C, mt == M_REVEAL_R]).astype(jnp.int8)
        )
        is_reveal = (mt == M_REVEAL_C) | (mt == M_REVEAL_R)
        rel_target = (a - lm.lm_target + P) % P
        parts.append(((jnp.arange(P) == rel_target) & is_reveal).astype(jnp.int8))
        parts.append(((jnp.arange(C) == lm.lm_color) & (mt == M_REVEAL_C)).astype(jnp.int8))
        parts.append(((jnp.arange(R) == lm.lm_rank) & (mt == M_REVEAL_R)).astype(jnp.int8))
        parts.append(
            (((lm.lm_reveal_bits >> slot) & 1) * is_reveal.astype(jnp.int32)).astype(jnp.int8)
        )
        is_pd = (mt == M_PLAY) | (mt == M_DISCARD)
        parts.append(((slot == lm.lm_card_index) & is_pd).astype(jnp.int8))
        parts.append(
            ((jnp.arange(C * R) == lm.lm_color * R + lm.lm_rank) & is_pd).astype(jnp.int8)
        )
        is_p = mt == M_PLAY
        parts.append(
            jnp.stack([lm.lm_scored * is_p, lm.lm_info_token * is_p]).astype(jnp.int8)
        )

        # -- card knowledge (quirk reproduced: plausible bit index = player
        #    offset i, broadcast over the whole bits-per-card block) ------------
        know_order = (a + jnp.arange(P)) % P
        offsets = jnp.arange(P)
        plaus_bit = (
            (_take_rows(s.hand_plausible, know_order) >> offsets[:, None].astype(jnp.uint32)) & 1
        ).astype(jnp.int8)  # [P, H]
        k_live = (slot[None, :] < _take_rows(s.hand_size[:, None], know_order)).astype(jnp.int8)
        blk_plaus = jnp.broadcast_to((plaus_bit * k_live)[:, :, None], (P, H, BPC))
        kc = _take_rows(s.known_color, know_order)
        kr = _take_rows(s.known_rank, know_order)
        blk_c = (jnp.arange(C)[None, None, :] == kc[:, :, None]).astype(jnp.int8) * k_live[:, :, None]
        blk_r = (jnp.arange(R)[None, None, :] == kr[:, :, None]).astype(jnp.int8) * k_live[:, :, None]
        know = jnp.concatenate([blk_plaus, blk_c, blk_r], axis=2)  # [P, H, BPC+C+R]
        parts.append(know.reshape(-1))

        obs = jnp.concatenate(parts)

        # -- own hand appended to the state tensor only ------------------------
        own_live = slot < _get1(s.hand_size, a)
        own_cards = _take_rows(s.hand_cards, a[None])[0]
        own = jax.nn.one_hot(own_cards, BPC, dtype=jnp.int8) * own_live[:, None].astype(jnp.int8)
        return obs, own.reshape(-1)

    def _mask_seat(self, s: State, a: Array):
        C, R, P, H = self.colors, self.ranks, self.players, self.hand
        slot = jnp.arange(H)
        live = slot < _get1(s.hand_size, a)
        discard_ok = live & (s.info_tokens < self.max_info)
        play_ok = live

        partner_order = (a + 1 + jnp.arange(P - 1)) % P
        p_cards = _take_rows(s.hand_cards, partner_order)  # [P-1, H] — scans dead slots too (quirk)
        has_color = jnp.any(
            p_cards[:, :, None] // R == jnp.arange(C)[None, None, :], axis=1
        )  # [P-1, C]
        has_rank = jnp.any(
            p_cards[:, :, None] % R == jnp.arange(R)[None, None, :], axis=1
        )
        info_avail = s.info_tokens > 0
        rc_ok = (has_color & info_avail).reshape(-1)
        rr_ok = (has_rank & info_avail).reshape(-1)
        return jnp.concatenate([discard_ok, play_ok, rc_ok, rr_ok])

    def encode(self, s: State, just_reset: Array):
        P = self.players
        seats = jnp.arange(P)
        obs_new, own_new = jax.vmap(lambda a: self._encode_seat(s, a))(seats)
        mask_new = jax.vmap(lambda a: self._mask_seat(s, a))(seats)
        refresh = just_reset | (seats == s.cur_player)
        obs_buf = jnp.where(refresh[:, None], obs_new, s.obs_buf)
        own_buf = jnp.where(refresh[:, None], own_new, s.own_buf)
        mask_buf = jnp.where(refresh[:, None], mask_new, s.mask_buf)
        s = s.replace(obs_buf=obs_buf, own_buf=own_buf, mask_buf=mask_buf)
        state_buf = jnp.concatenate([obs_buf, own_buf], axis=-1)
        active = seats == s.cur_player
        return s, obs_buf, state_buf, mask_buf, active
