"""Fused Hanabi step megakernel + persistent whole-rollout kernel (Pallas
TPU) — 2-player configs.

The BASELINE-named "Hanabi legal-move/observation-encoding" hot paths, fused
with the full game transition into ONE kernel: move resolution (discard /
play / reveal), the random-swap replacement draw, turn/score/life
termination, world-order episode allocation, the closed-form TEA+LCG deal,
the 658-bit observation encoder with the reference's stale-seat semantics,
and the legal-move mask — everything in VMEM per env block.  Semantics
source: ``envs/hanabi.py`` (itself bit-parity with
``src/hanabi_env/sim.cpp:45-891``), including both documented C++ quirks
(knowledge bit = player offset broadcast over the bits-per-card block;
reveal legality scans dead hand slots).

Layout follows ``overcooked_pallas``: the env batch rides the lanes; every
per-env scalar is a ``[1, B]`` row; hands/knowledge stay python lists of
rows (they are indexed by static ``(player, slot)``), while the deck
(``[M, B]``), discard piles (``[CR, B]``), fireworks (``[C, B]``) and every
observation/mask section live as **multi-row sublane blocks**: one-hot and
thermometer bits come from a single ``broadcasted_iota`` compare per
section instead of one ``[1, B]`` compare per bit, so the VPU's 8 sublanes
all do useful work (the row-per-bit form left 7/8 idle — measured
VPU-compute-bound, not HBM-bound).  The per-seat obs/own/mask buffers are
``[P, bits, B]`` int8 blocks assembled by one axis-0 concat per seat, with
the stale-seat rule applied as an int8 bitwise blend
(``old ^ ((old ^ new) & refresh_mask)`` — Mosaic lowers neither bool
selects over i8 blocks nor i8 multiplies).  The episode counter crosses
blocks via SMEM scratch + a lane prefix sum, exactly like
``cartpole_pallas``.

Two kernels share one transition/encode body (``_make_body``):

* ``fused_step`` — one step per launch, obs/own/mask stored to HBM like the
  reference's exported tensors (``src/hanabi_env/mgr.cpp:197-207``).
* ``fused_rollout`` — T steps per launch per env block, the analog of the
  reference's persistent CUDA megakernel execution
  (``src/hanabi_env/sim.cpp:852-863`` graph, launched once per rollout).
  Game state stays resident in VMEM for the whole rollout; actions are
  drawn in-kernel from a per-env LCG, uniform over the ACTIVE seat's
  legal moves (the reference's isolated bench also samples mask-legal
  random actions inside the timed loop); and the full observation encode
  is consumed every step by per-seat in-VMEM accumulators carrying the
  exact sum of each seat's (stale-blended) obs/own/mask buffer — the
  fused-consumer discipline (bench.py's module docstring).  The returned
  state dict's obs/own/mask fields are the launch-time snapshot (the true
  buffers never leave VMEM); everything else — deck, hands, knowledge,
  tokens, last-move, episode counter, RNG — is exact, proven by a jnp
  replay of the identical action stream and block-sequential episode
  schedule in ``tests/test_hanabi_megakernel.py``.

Bit-exactness vs the jnp ``batched_step`` is enforced by
``tests/test_hanabi_megakernel.py`` (interpret on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..envs.hanabi import (
    M_DISCARD,
    M_INVALID,
    M_PLAY,
    M_REVEAL_C,
    M_REVEAL_R,
    Env,
    State,
)

Array = jnp.ndarray

# RNG constants + int32 helper shared with the other kernels so they cannot
# drift per-module (bit-parity with core/rng.py rests on these)
from .cartpole_pallas import (  # noqa: E402
    _INV_2_24,
    _K0,
    _K1,
    _K2,
    _K3,
    _LCG_A,
    _LCG_C,
    _MASK24,
    _TEA_DELTA,
    _i32 as _i32c,
    _lcg_next,
    _tea_seed,
)


def fused_supported(env: Env) -> bool:
    """2-player configs only (the reference's own NUM_MOVES=20 envelope);
    >2 players stays on the jnp path."""
    return env.players == 2


# ---------------------------------------------------------------------------
# packing between the vmap State and the lane-major row layout
# ---------------------------------------------------------------------------
# scalar-row indices in the `scal` array
(_DECKSZ, _INFO, _LIFE, _CUR, _TURNS, _SCORE, _LMM, _LMP, _LMT, _LMCI,
 _LMSC, _LMIT, _LMC, _LMR, _LMRB, _RNG) = range(16)

# state-dict keys for the scal rows, in pack order
_SCAL_KEYS = ("ds", "info", "life", "cur", "turns", "score", "lmm", "lmp",
              "lmt", "lmci", "lmsc", "lmit", "lmc", "lmr", "lmrb", "v")


def pack_state(env: Env, v: State):
    t = lambda a: jnp.transpose(a)
    fl = lambda a: a.reshape(a.shape[0], -1).T  # [N, P, H] -> [P*H, N]
    scal = jnp.stack([
        v.deck_size, v.info_tokens, v.life_tokens, v.cur_player,
        v.turns_to_play, v.score, v.lm_move, v.lm_player, v.lm_target,
        v.lm_card_index, v.lm_scored, v.lm_info_token, v.lm_color,
        v.lm_rank, v.lm_reveal_bits,
        lax.bitcast_convert_type(v.rng_v, jnp.int32),
    ]).astype(jnp.int32)
    return dict(
        deck=t(v.deck), disc=t(v.discard_counts), fw=t(v.fireworks),
        scal=scal,
        hc=fl(v.hand_cards),
        hp=lax.bitcast_convert_type(v.hand_plausible, jnp.int32)
            .reshape(v.hand_plausible.shape[0], -1).T,
        hs=t(v.hand_size),
        kc=fl(v.known_color), kr=fl(v.known_rank),
        obs=jnp.transpose(v.obs_buf, (1, 2, 0)),   # [P, OBS, N]
        own=jnp.transpose(v.own_buf, (1, 2, 0)),
        mask=jnp.transpose(v.mask_buf, (1, 2, 0)).astype(jnp.int8),
    )


def unpack_state(env: Env, d) -> State:
    P, H = env.players, env.hand
    N = d["deck"].shape[-1]
    t = lambda a: jnp.transpose(a)
    unfl = lambda a: a.T.reshape(N, P, H)
    s = d["scal"]
    return State(
        deck=t(d["deck"]), deck_size=s[_DECKSZ],
        discard_counts=t(d["disc"]), fireworks=t(d["fw"]),
        info_tokens=s[_INFO], life_tokens=s[_LIFE], cur_player=s[_CUR],
        turns_to_play=s[_TURNS], score=s[_SCORE],
        lm_move=s[_LMM], lm_player=s[_LMP], lm_target=s[_LMT],
        lm_card_index=s[_LMCI], lm_scored=s[_LMSC], lm_info_token=s[_LMIT],
        lm_color=s[_LMC], lm_rank=s[_LMR], lm_reveal_bits=s[_LMRB],
        hand_cards=unfl(d["hc"]),
        hand_plausible=lax.bitcast_convert_type(
            unfl(d["hp"]), jnp.uint32),
        hand_size=t(d["hs"]),
        known_color=unfl(d["kc"]), known_rank=unfl(d["kr"]),
        obs_buf=jnp.transpose(d["obs"], (2, 0, 1)),
        own_buf=jnp.transpose(d["own"], (2, 0, 1)),
        mask_buf=jnp.transpose(d["mask"], (2, 0, 1)) != 0,
        rng_v=lax.bitcast_convert_type(s[_RNG], jnp.uint32),
    )


# ---------------------------------------------------------------------------
# shared kernel body: transition + legal sampling + encode sections
# ---------------------------------------------------------------------------

def _make_body(env: Env, block: int):
    """Block-form step body shared by the per-step kernel and the persistent
    whole-rollout kernel.  State is a dict of [rows, B] blocks / [1, B] rows
    (keys: deck/disc/fw blocks, hc/hp/kc/kr as P x H nested tuples of rows,
    hs as P rows, plus the ``_SCAL_KEYS`` scalar rows).  Returns
    ``(setup, sample_legal, transition, encode_parts, consts)``:

    * ``setup()`` — loop-invariant iota blocks, built once per launch.
    * ``sample_legal(ctx, st, w)`` — advance the action LCG one step and
      draw a uniform legal move for the ACTIVE seat from state-derived
      legality (identical bits to the stale ``mask_buf`` row of the seat
      about to act; replayable via ``action_from_mask``).
    * ``transition(ctx, st, uid, base)`` — one full game step incl. the
      episode-counter prefix sum and the fused fresh deal on done;
      returns ``(st', rew, done, base')``.
    * ``encode_parts(ctx, st, a)`` — the seat-``a`` observation / own-hand /
      mask encodes as LISTS of [rows, B] blocks (int8/bool mixed); the
      per-step kernel concatenates + stale-blends + stores them, the
      persistent kernel folds each block into per-seat in-VMEM sums.
    """
    B = block
    C, R, P, H = env.colors, env.ranks, env.players, env.hand
    assert P == 2
    CR = C * R
    BPC = env.bits_per_card
    M = env.max_cards
    A = env.num_actions
    max_info, max_life = env.max_info, env.max_life
    deck0 = [int(x) for x in env._deck0]  # scalar constants for `moved`
    cr_num = env.cr_num
    cpc = env.cards_per_color
    VALID = (1 << BPC) - 1
    RANK_BASE = sum(1 << (i * R) for i in range(R))  # rank-mask base pattern
    COLOR_ONES = (1 << R) - 1
    D = P * H

    def _skip(k):
        a, c = 1, 0
        for _ in range(k):
            a = (a * _LCG_A) % (1 << 32)
            c = (c * _LCG_A + _LCG_C) % (1 << 32)
        return a, c

    skip_consts = [_skip(k) for k in range(1, D + 1)]
    srl = lax.shift_right_logical
    rc_base, rr_base = 2 * H, 2 * H + (P - 1) * C
    i32 = lambda b: b.astype(jnp.int32)
    i8b = lambda b: b.astype(jnp.int8)

    def setup():
        # multi-row iota columns: one compare against these covers a whole
        # one-hot/thermometer section in ceil(n/8) sublane tiles (generated
        # in-kernel — captured array constants crash the tunnel's Mosaic)
        iob = lambda n: lax.broadcasted_iota(jnp.int32, (n, B), 0)
        io = {}
        for n in set([M, C, R, CR, H, BPC, P, env.max_deck_bits, max_info,
                      max_life] + list(cr_num)):
            if n > 0:
                io[n] = iob(n)
        return io

    def sel_p(rows, pidx):
        out = rows[0]
        for p in range(1, len(rows)):
            out = jnp.where(pidx == p, rows[p], out)
        return out

    def sel_ph(rows2d, pidx, hidx):
        out = jnp.zeros_like(rows2d[0][0])
        for p in range(P):
            for h in range(H):
                out = jnp.where((pidx == p) & (hidx == h), rows2d[p][h], out)
        return out

    def sample_legal(ctx, st, w):
        """In-kernel action draw: w' = lcg(w); uid = the
        ``(u24(w') * L) >> 24``-th legal move of the active seat, legality
        derived from state (== the stale mask row of the seat about to
        act, including the dead-slot reveal quirk).  L >= 1 always: plays
        stay legal while the hand is non-empty, and hands only shrink in
        the P post-deck-exhaustion turns (H=5 > P=2)."""
        cur, info, hs = st["cur"], st["info"], st["hs"]
        hs_a = sel_p(hs, cur)
        hcp = [jnp.where(cur == 0, st["hc"][1][h], st["hc"][0][h])
               for h in range(H)]
        rows = []
        can_disc = info < max_info
        for h in range(H):
            rows.append((hs_a > h) & can_disc)
        for h in range(H):
            rows.append(hs_a > h)
        info_ok = info > 0
        for c in range(C):
            any_c = (hcp[0] // R) == c
            for h in range(1, H):  # dead slots too (reference quirk)
                any_c = any_c | ((hcp[h] // R) == c)
            rows.append(any_c & info_ok)
        for r in range(R):
            any_r = (hcp[0] % R) == r
            for h in range(1, H):
                any_r = any_r | ((hcp[h] % R) == r)
            rows.append(any_r & info_ok)
        assert len(rows) == A
        w2 = _lcg_next(w)
        u24 = srl(w2, 8) & _i32c(0x00FFFFFF)
        L = i32(rows[0])
        for r in rows[1:]:
            L = L + i32(r)
        idx = srl(u24 * L, 24)
        cum = jnp.zeros_like(idx)
        uid = jnp.zeros_like(idx)
        for k, r in enumerate(rows):
            if k:
                uid = uid + k * i32(r & (cum == idx))
            cum = cum + i32(r)
        return w2, uid

    def transition(ctx, st, uid, base):
        """One game step (envs/hanabi.py::transition + _remove_from_hand +
        checkDone + episode allocation + fresh deal).  ``uid`` is the
        active seat's move id row; ``base`` the [1, 1] running episode
        counter.  Returns (st', rew, done, base')."""
        io = ctx
        ioM, ioC, ioR, ioCR = io[M], io[C], io[R], io[CR]
        deckb, discb, fwb = st["deck"], st["disc"], st["fw"]
        hc = [list(st["hc"][p]) for p in range(P)]
        hp = [list(st["hp"][p]) for p in range(P)]
        kc = [list(st["kc"][p]) for p in range(P)]
        kr = [list(st["kr"][p]) for p in range(P)]
        hs = list(st["hs"])
        deck_size, info, life = st["ds"], st["info"], st["life"]
        cur, turns, score, v = st["cur"], st["turns"], st["score"], st["v"]

        # ---- transition (envs/hanabi.py::transition) -----------------
        turns = turns - i32(deck_size == 0)
        agent = cur

        is_discard = uid < H
        is_play = (uid >= H) & (uid < 2 * H)
        is_rc = (uid >= rc_base) & (uid < rr_base)
        is_rr = uid >= rr_base
        took = is_discard | is_play

        card_idx = jnp.clip(jnp.where(is_discard, uid, uid - H), 0, H - 1)
        card = sel_ph(hc, agent, card_idx)
        card_color = card // R
        card_rank = card % R

        # fireworks[card_color] via masked sublane reduce over [C, B]
        fwc = jnp.sum(fwb * (ioC == card_color), axis=0, keepdims=True)
        success = is_play & (fwc == card_rank)
        completed = success & (fwc + 1 == R)
        failed = is_play & ~success

        discb = discb + i32((is_discard | failed) & (ioCR == card))
        fwb = fwb + i32(success & (ioC == card_color))
        info = info + i32(is_discard) + i32(completed)
        life = life - i32(failed)

        # reveals (P == 2: the target is always the partner)
        rev_color = jnp.clip(uid - rc_base, 0, C - 1)
        rev_rank = jnp.clip(uid - rr_base, 0, R - 1)
        target = (agent + 1) % P
        info = info - i32(is_rc | is_rr)

        color_mask = _i32c(COLOR_ONES) << (rev_color * R)
        rank_mask = _i32c(RANK_BASE) << rev_rank
        reveal_bits = jnp.zeros_like(uid)
        for p in range(P):
            tgt_here = (target == p) & (is_rc | is_rr)
            size_p = hs[p]
            for h in range(H):
                live = h < size_p
                mc = (hc[p][h] // R == rev_color) & live
                mr = (hc[p][h] % R == rev_rank) & live
                newp_rc = jnp.where(mc, hp[p][h] & color_mask,
                                    hp[p][h] & ~color_mask)
                newp_rr = jnp.where(mr, hp[p][h] & rank_mask,
                                    hp[p][h] & ~rank_mask)
                hp[p][h] = jnp.where(
                    tgt_here & is_rc, newp_rc,
                    jnp.where(tgt_here & is_rr, newp_rr, hp[p][h]))
                kc[p][h] = jnp.where(tgt_here & is_rc & mc, rev_color, kc[p][h])
                kr[p][h] = jnp.where(tgt_here & is_rr & mr, rev_rank, kr[p][h])
                # boolean algebra, not where(): Mosaic's helper crashes
                # on select over i1 vectors
                hit = ((is_rc & mc) | (is_rr & mr)) & tgt_here
                reveal_bits = reveal_bits + (i32(hit) << h)
        reveal_bits = reveal_bits * i32(is_rc | is_rr)

        lm_move = jnp.where(is_discard, M_DISCARD, jnp.where(
            is_play, M_PLAY, jnp.where(is_rc, M_REVEAL_C, M_REVEAL_R)))
        lm_player = agent
        lm_target = jnp.where(is_rc | is_rr, target, -1)
        lm_card_index = jnp.where(took, card_idx, -1)
        lm_scored = i32(success)
        lm_info_token = i32(completed)
        lm_color = jnp.where(took, card_color,
                             jnp.where(is_rc, rev_color, -1))
        lm_rank = jnp.where(took, card_rank,
                            jnp.where(is_rr, rev_rank, -1))
        cur = (cur + 1) % P

        # ---- removeFromHand --------------------------------------------
        deck_empty = deck_size == 0
        draw_now = took & ~deck_empty
        v1 = _i32c(_LCG_A) * v + _i32c(_LCG_C)
        u = (v1 & _i32c(_MASK24)).astype(jnp.float32) * jnp.float32(_INV_2_24)
        loc = (deck_size.astype(jnp.float32) * u).astype(jnp.int32)
        v = jnp.where(draw_now, v1, v)
        at_loc = ioM == loc  # [M, B], exactly one hit (or none when empty)
        drawn = jnp.sum(deckb * at_loc, axis=0, keepdims=True)
        last = jnp.sum(deckb * (ioM == deck_size - 1), axis=0, keepdims=True)
        deckb = jnp.where(draw_now & at_loc, jnp.broadcast_to(last, (M, B)),
                          deckb)
        deck_size = deck_size - i32(draw_now)

        shift_now = took & deck_empty
        for p in range(P):
            in_p = agent == p
            size_p = hs[p]
            newhc, newhp, newkc, newkr = [], [], [], []
            for h in range(H):
                sh = (h >= card_idx) & (h < size_p - 1)
                nxt = h + 1 if h + 1 < H else h
                s_hc = jnp.where(sh, hc[p][nxt], hc[p][h])
                s_hp = jnp.where(sh, hp[p][nxt], hp[p][h])
                s_kc = jnp.where(sh, kc[p][nxt], kc[p][h])
                s_kr = jnp.where(sh, kr[p][nxt], kr[p][h])
                at = card_idx == h
                d_hc = jnp.where(at, drawn, hc[p][h])
                d_hp = jnp.where(at, _i32c(VALID), hp[p][h])
                d_kc = jnp.where(at, -1, kc[p][h])
                d_kr = jnp.where(at, -1, kr[p][h])
                pick = lambda sv, dv, ov: jnp.where(
                    in_p & shift_now, sv, jnp.where(in_p & draw_now, dv, ov))
                newhc.append(pick(s_hc, d_hc, hc[p][h]))
                newhp.append(pick(s_hp, d_hp, hp[p][h]))
                newkc.append(pick(s_kc, d_kc, kc[p][h]))
                newkr.append(pick(s_kr, d_kr, kr[p][h]))
            hc[p], hp[p], kc[p], kr[p] = newhc, newhp, newkc, newkr
            hs[p] = hs[p] - i32(in_p & shift_now)

        # ---- checkDone --------------------------------------------------
        fwsum = jnp.sum(fwb, axis=0, keepdims=True)
        new_score = jnp.where(life > 0, fwsum, 0)
        rew = new_score - score
        score = new_score
        done = (life < 1) | (score >= CR) | (turns <= 0)

        # ---- episode allocation + fresh deal ---------------------------
        d32 = i32(done)
        lane = lax.broadcasted_iota(jnp.int32, (1, B), 1)
        ps = d32
        k = 1
        while k < B:
            ps = ps + jnp.where(lane >= k, pltpu.roll(ps, shift=k, axis=1), 0)
            k *= 2
        eps = base + (ps - d32)
        base = base + jnp.sum(d32, axis=1, keepdims=True)[0:1, 0:1]

        seed = _tea_seed(eps)

        def orig_card(locv):
            rem = locv % cpc
            rankv = jnp.zeros_like(locv)
            acc = 0
            for r in range(R):
                acc += cr_num[r]
                rankv = jnp.where(rem >= acc, r + 1, rankv)
            return (locv // cpc) * R + rankv

        locs, moved = [], []
        for kdraw in range(D):
            a_k, c_k = skip_consts[kdraw]
            v_k = _i32c(a_k) * seed + _i32c(c_k)
            u_k = (v_k & _i32c(_MASK24)).astype(jnp.float32) * jnp.float32(_INV_2_24)
            locs.append((jnp.float32(M - kdraw) * u_k).astype(jnp.int32))
        for j in range(D):
            tgt = M - 1 - j
            val = jnp.full_like(locs[0], deck0[tgt])
            for i in range(j):
                val = jnp.where(locs[i] == tgt, moved[i], val)
            moved.append(val)
        fresh_cards = []
        for kdraw in range(D):
            val = orig_card(locs[kdraw])
            for j in range(kdraw):
                val = jnp.where(locs[j] == locs[kdraw], moved[j], val)
            fresh_cards.append(val)
        a_D, c_D = skip_consts[D - 1]
        fresh_v = _i32c(a_D) * seed + _i32c(c_D)

        # fresh deck in one [M, B] block: deck0[m] == orig_card(m) (both walk
        # the (color, rank, copies) order), overridden by the D swap writes
        fd = orig_card(ioM)
        for j in range(D):
            fd = jnp.where(ioM == locs[j], moved[j], fd)
        deckb = jnp.where(done, fd, deckb)
        discb = jnp.where(done, 0, discb)
        fwb = jnp.where(done, 0, fwb)
        for p in range(P):
            for h in range(H):
                hc[p][h] = jnp.where(done, fresh_cards[p * H + h], hc[p][h])
                hp[p][h] = jnp.where(done, _i32c(VALID), hp[p][h])
                kc[p][h] = jnp.where(done, -1, kc[p][h])
                kr[p][h] = jnp.where(done, -1, kr[p][h])
            hs[p] = jnp.where(done, H, hs[p])
        deck_size = jnp.where(done, M - D, deck_size)
        info = jnp.where(done, max_info, info)
        life = jnp.where(done, max_life, life)
        cur = jnp.where(done, 0, cur)
        turns = jnp.where(done, P, turns)
        score = jnp.where(done, 0, score)
        v = jnp.where(done, fresh_v, v)
        lm_move = jnp.where(done, M_INVALID, lm_move)
        lm_player = jnp.where(done, -1, lm_player)
        lm_target = jnp.where(done, -1, lm_target)
        lm_card_index = jnp.where(done, -1, lm_card_index)
        lm_scored = jnp.where(done, 0, lm_scored)
        lm_info_token = jnp.where(done, 0, lm_info_token)
        lm_color = jnp.where(done, -1, lm_color)
        lm_rank = jnp.where(done, -1, lm_rank)
        reveal_bits = jnp.where(done, 0, reveal_bits)

        st2 = dict(
            deck=deckb, disc=discb, fw=fwb,
            hc=tuple(tuple(hc[p]) for p in range(P)),
            hp=tuple(tuple(hp[p]) for p in range(P)),
            kc=tuple(tuple(kc[p]) for p in range(P)),
            kr=tuple(tuple(kr[p]) for p in range(P)),
            hs=tuple(hs),
            ds=deck_size, info=info, life=life, cur=cur, turns=turns,
            score=score, lmm=lm_move, lmp=lm_player, lmt=lm_target,
            lmci=lm_card_index, lmsc=lm_scored, lmit=lm_info_token,
            lmc=lm_color, lmr=lm_rank, lmrb=reveal_bits, v=v,
        )
        return st2, rew, done, base

    # ---- encode (envs/hanabi.py::_encode_seat / _mask_seat) ---------
    # whole sections per op: each one-hot/thermometer block is ONE iota
    # compare on [n, B] (all 8 sublanes useful) instead of n [1, B] rows.
    # Blocks are returned as a LIST (int8 / bool mixed) so the per-step
    # kernel can concat+store while the persistent kernel folds sums.

    def encode_parts(ctx, st, a):
        io = ctx
        ioC, ioR, ioCR, ioH, ioBPC = io[C], io[R], io[CR], io[H], io[BPC]
        hc, hp, hs = st["hc"], st["hp"], st["hs"]
        kc, kr = st["kc"], st["kr"]
        deck_size, info, life = st["ds"], st["info"], st["life"]
        fwb, discb = st["fw"], st["disc"]

        def onehot(val, io_n, live=None):
            m = io_n == val
            if live is not None:
                m = m & live
            return i8b(m)

        blocks = []
        # hands: partners in observer-relative order
        for off in range(1, P):
            q = (a + off) % P
            for h in range(H):
                blocks.append(onehot(hc[q][h], ioBPC, h < hs[q]))
        for off in range(P):
            q = (a + off) % P
            blocks.append(i8b(hs[q] < H))
        # board (zero-size thermometers — e.g. very_small's deck — must
        # not emit an iota: Mosaic rejects 0-row vectors)
        if env.max_deck_bits > 0:
            blocks.append(i8b(io[env.max_deck_bits] < deck_size))
        for c in range(C):
            blocks.append(i8b(fwb[c:c + 1] == ioR + 1))
        if max_info > 0:
            blocks.append(i8b(io[max_info] < info))
        if max_life > 0:
            blocks.append(i8b(io[max_life] < life))
        # discards: bit -> (id, threshold) walks card ids consecutively
        # with thresholds 0..copies-1, so each id is one compare
        for cid in range(CR):
            blocks.append(i8b(discb[cid:cid + 1] > io[cr_num[cid % R]]))
        # last action
        lmp, lmm, lmt = st["lmp"], st["lmm"], st["lmt"]
        lmc, lmr, lmrb = st["lmc"], st["lmr"], st["lmrb"]
        lmci, lmsc, lmit = st["lmci"], st["lmsc"], st["lmit"]
        rel_actor = jnp.where(lmp == -1, -1, (a - lmp + P) % P)
        blocks.append(onehot(rel_actor, io[P]))
        for mtv in (M_PLAY, M_DISCARD, M_REVEAL_C, M_REVEAL_R):
            blocks.append(i8b(lmm == mtv))
        is_reveal = (lmm == M_REVEAL_C) | (lmm == M_REVEAL_R)
        rel_target = (a - lmt + P) % P
        blocks.append(i8b((io[P] == rel_target) & is_reveal))
        blocks.append(i8b((ioC == lmc) & (lmm == M_REVEAL_C)))
        blocks.append(i8b((ioR == lmr) & (lmm == M_REVEAL_R)))
        blocks.append(i8b(((jnp.right_shift(lmrb, ioH) & 1) != 0)
                          & is_reveal))
        is_pd = (lmm == M_PLAY) | (lmm == M_DISCARD)
        blocks.append(i8b((ioH == lmci) & is_pd))
        blocks.append(i8b((ioCR == lmc * R + lmr) & is_pd))
        blocks.append(i8b((lmsc != 0) & (lmm == M_PLAY)))
        blocks.append(i8b((lmit != 0) & (lmm == M_PLAY)))
        # card knowledge (quirk: plausible bit index = player offset)
        for off in range(P):
            q = (a + off) % P
            for h in range(H):
                live = h < hs[q]
                pb = i8b(((srl(hp[q][h], off) & 1) != 0) & live)
                blocks.append(jnp.broadcast_to(pb, (BPC, B)))
                blocks.append(onehot(kc[q][h], ioC, live))
                blocks.append(onehot(kr[q][h], ioR, live))

        own_blocks = [onehot(hc[a][h], ioBPC, h < hs[a]) for h in range(H)]

        mask_blocks = [
            i8b((ioH < hs[a]) & (info < max_info)),
            i8b(ioH < hs[a]),
        ]
        info_ok = info > 0
        for off in range(1, P):
            q = (a + off) % P
            any_c = ioC == hc[q][0] // R
            for h in range(1, H):  # dead slots too (reference quirk)
                any_c = any_c | (ioC == hc[q][h] // R)
            mask_blocks.append(i8b(any_c & info_ok))
        for off in range(1, P):
            q = (a + off) % P
            any_r = ioR == hc[q][0] % R
            for h in range(1, H):
                any_r = any_r | (ioR == hc[q][h] % R)
            mask_blocks.append(i8b(any_r & info_ok))
        return blocks, own_blocks, mask_blocks

    consts = dict(C=C, R=R, P=P, H=H, CR=CR, M=M, A=A, BPC=BPC, D=D)
    return setup, sel_p, sample_legal, transition, encode_parts, consts


def _load_state(env: Env, refs):
    """Build the body's state dict from the kernel input refs."""
    P, H = env.players, env.hand
    (deck_ref, disc_ref, fw_ref, scal_ref, hc_ref, hp_ref, hs_ref, kc_ref,
     kr_ref) = refs
    rows2d = lambda ref: tuple(
        tuple(ref[p * H + h:p * H + h + 1] for h in range(H))
        for p in range(P))
    st = dict(
        deck=deck_ref[:], disc=disc_ref[:], fw=fw_ref[:],
        hc=rows2d(hc_ref), hp=rows2d(hp_ref),
        kc=rows2d(kc_ref), kr=rows2d(kr_ref),
        hs=tuple(hs_ref[p:p + 1] for p in range(P)),
    )
    for i, k in enumerate(_SCAL_KEYS):
        st[k] = scal_ref[i:i + 1]
    return st


def _store_state(env: Env, st, outs):
    """Write the body's state dict back to the kernel output refs."""
    P, H = env.players, env.hand
    (deck_o, disc_o, fw_o, scal_o, hc_o, hp_o, hs_o, kc_o, kr_o) = outs
    cat = lambda rows_: jnp.concatenate(list(rows_), axis=0)
    flat = lambda key: cat([st[key][p][h] for p in range(P) for h in range(H)])
    deck_o[:] = st["deck"]
    disc_o[:] = st["disc"]
    fw_o[:] = st["fw"]
    hc_o[:] = flat("hc")
    hp_o[:] = flat("hp")
    hs_o[:] = cat(st["hs"])
    kc_o[:] = flat("kc")
    kr_o[:] = flat("kr")
    scal_o[:] = cat([st[k] for k in _SCAL_KEYS])


# ---------------------------------------------------------------------------
# per-step kernel
# ---------------------------------------------------------------------------

def _build_kernel(env: Env, block: int):
    B = block
    P, H = env.players, env.hand
    setup, sel_p, _sample, transition, encode_parts, consts = _make_body(
        env, block)
    i32 = lambda b: b.astype(jnp.int32)

    def kernel(cnt_ref, deck_ref, disc_ref, fw_ref, scal_ref, hc_ref, hp_ref,
               hs_ref, kc_ref, kr_ref, obs_ref, own_ref, mask_ref, act_ref,
               deck_o, disc_o, fw_o, scal_o, hc_o, hp_o, hs_o, kc_o, kr_o,
               obs_o, own_o, mask_o, rew_o, done_o, cnt_o, base_s):
        gi = pl.program_id(0)

        @pl.when(gi == 0)
        def _():
            base_s[0, 0] = cnt_ref[0, 0]

        ctx = setup()
        st = _load_state(env, (deck_ref, disc_ref, fw_ref, scal_ref, hc_ref,
                               hp_ref, hs_ref, kc_ref, kr_ref))
        act = [act_ref[p:p + 1] for p in range(P)]
        uid = sel_p(act, st["cur"])
        base = jnp.full((1, 1), base_s[0, 0], jnp.int32)

        st, rew, done, base = transition(ctx, st, uid, base)
        base_s[0, 0] = base[0, 0]

        for a in range(P):
            obs_blocks, own_blocks, mask_blocks = encode_parts(ctx, st, a)
            # refresh mask as i8 0x00/0xFF and blend bitwise: Mosaic lowers
            # neither broadcast bool selects over i8 blocks (trunci i8->i1)
            # nor i8*i8 multiplies, but i8 xor/and are fine
            r = (done | (st["cur"] == a)).astype(jnp.int32)  # [1, B] 0/1
            m8 = (-r).astype(jnp.int8)                       # 0x00 / 0xFF
            blend = lambda new8, old8: old8 ^ ((old8 ^ new8) & m8)
            obs_o[a] = blend(jnp.concatenate(obs_blocks, axis=0), obs_ref[a])
            own_o[a] = blend(jnp.concatenate(own_blocks, axis=0), own_ref[a])
            mask_o[a] = blend(jnp.concatenate(mask_blocks, axis=0),
                              mask_ref[a])

        _store_state(env, st, (deck_o, disc_o, fw_o, scal_o, hc_o, hp_o,
                               hs_o, kc_o, kr_o))
        rew_o[:] = rew
        done_o[:] = i32(done)

        @pl.when(gi == pl.num_programs(0) - 1)
        def _():
            cnt_o[0, 0] = base_s[0, 0]

    return kernel


@functools.lru_cache(maxsize=None)
def _compiled_step(env: Env, num_envs: int, block: int, interpret: bool):
    C, R, P, H = env.colors, env.ranks, env.players, env.hand
    CR, M, A = C * R, env.max_cards, env.num_actions
    OBS, OWN = env.obs_size, H * env.bits_per_card
    assert num_envs % block == 0
    grid = (num_envs // block,)
    kernel = _build_kernel(env, block)

    rows = lambda r: pl.BlockSpec((r, block), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    buf3 = lambda bits: pl.BlockSpec((P, bits, block), lambda i: (0, 0, i),
                                     memory_space=pltpu.VMEM)
    smem11 = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    sds = jax.ShapeDtypeStruct
    i32s = lambda r: sds((r, num_envs), jnp.int32)
    i8b = lambda bits: sds((P, bits, num_envs), jnp.int8)

    call = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[smem11, rows(M), rows(CR), rows(C), rows(16),
                  rows(P * H), rows(P * H), rows(P), rows(P * H), rows(P * H),
                  buf3(OBS), buf3(OWN), buf3(A), rows(P)],
        out_specs=(rows(M), rows(CR), rows(C), rows(16),
                   rows(P * H), rows(P * H), rows(P), rows(P * H),
                   rows(P * H), buf3(OBS), buf3(OWN), buf3(A),
                   rows(1), rows(1), smem11),
        out_shape=(i32s(M), i32s(CR), i32s(C), i32s(16),
                   i32s(P * H), i32s(P * H), i32s(P), i32s(P * H),
                   i32s(P * H), i8b(OBS), i8b(OWN), i8b(A),
                   i32s(1), i32s(1), sds((1, 1), jnp.int32)),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )

    def step(d: dict, counter, actions_t: Array):
        (deck, disc, fw, scal, hc, hp, hs, kc, kr, obs, own, mask, rew,
         done, cnt) = call(
            counter.reshape(1, 1).astype(jnp.int32),
            d["deck"], d["disc"], d["fw"], d["scal"], d["hc"], d["hp"],
            d["hs"], d["kc"], d["kr"], d["obs"], d["own"], d["mask"],
            actions_t.astype(jnp.int32),
        )
        d2 = dict(deck=deck, disc=disc, fw=fw, scal=scal, hc=hc, hp=hp,
                  hs=hs, kc=kc, kr=kr, obs=obs, own=own, mask=mask)
        return d2, rew[0], done[0] != 0, cnt[0, 0]

    return step


def fused_step(env: Env, d: dict, counter, actions_t: Array,
               block: int = 512, interpret: bool = False):
    """One fused hanabi step.  ``actions_t`` [P, N] int32.  Returns
    ``(state', reward_delta [N] i32, done [N] bool, counter')``; obs/own/
    mask live inside the state dict in [P, bits, N] layout (world-minor,
    like the reference's exported {2, numWorlds, 658} tensors)."""
    N = d["deck"].shape[-1]
    block = min(block, N)
    return _compiled_step(env, N, block, interpret)(d, counter, actions_t)


def init_packed(env: Env, num_envs: int, start_episode: int = 0):
    from ..core.batch import batched_reset

    bstate, _ = batched_reset(env, num_envs, start_episode=start_episode)
    return (pack_state(env, bstate.env_states),
            jnp.int32(start_episode + num_envs))


# ---------------------------------------------------------------------------
# persistent-rollout kernel: T steps in ONE launch, state resident in VMEM
# ---------------------------------------------------------------------------
#
# The per-step kernel pays, per step, an HBM round-trip of the full game
# state (~550 B/env) plus the write AND stale-blend re-read of the per-seat
# obs/own/mask buffers (2 x 1606 B/env) — ~5.9 KB/env/step with the bench's
# full-checksum consumption.  This kernel runs the whole T-step rollout in
# one launch per env block: game state lives in VMEM, actions come from an
# in-kernel per-env LCG sampled uniformly over the ACTIVE seat's legal
# moves (``sample_legal``; replay via ``action_from_mask``), and the
# observation encode is consumed every step through per-seat in-VMEM sum
# accumulators that carry EXACTLY the sum of each seat's stale-blended
# obs/own/mask buffer (refreshed where ``done | (cur == seat)``, held
# stale elsewhere) — so the checksum equals the per-step discipline's
# value while the buffers themselves never round-trip HBM, and the blend
# collapses from [1606, B] int8 blocks to [1, B] i32 rows.
#
# Episode-counter order: within a block, world order per step via the lane
# prefix sum; across blocks the TPU grid is sequential, so SMEM carries the
# counter block to block (block-sequential allocation, exactly like
# cartpole_pallas — deterministic, unlike the reference GPU executor's
# fetch_add order).  The returned dict's obs/own/mask fields are the
# launch-time snapshot (documented in fused_rollout); deck/hands/tokens/
# last-move/rng/counter are exact.


def _build_rollout_kernel(env: Env, block: int, num_steps: int):
    B = block
    P, H = env.players, env.hand
    setup, sel_p, sample_legal, transition, encode_parts, consts = _make_body(
        env, block)
    i32 = lambda b: b.astype(jnp.int32)

    def blocks_sum(blocks):
        acc = None
        for b in blocks:
            s = jnp.sum(i32(b), axis=0, keepdims=True)
            acc = s if acc is None else acc + s
        return acc

    def kernel(cnt_ref, deck_ref, disc_ref, fw_ref, scal_ref, hc_ref, hp_ref,
               hs_ref, kc_ref, kr_ref, obs_ref, own_ref, mask_ref, arng_ref,
               deck_o, disc_o, fw_o, scal_o, hc_o, hp_o, hs_o, kc_o, kr_o,
               arng_o, dcnt_o, chk_o, cnt_o, base_s):
        gi = pl.program_id(0)

        @pl.when(gi == 0)
        def _():
            base_s[0, 0] = cnt_ref[0, 0]

        ctx = setup()
        st0 = _load_state(env, (deck_ref, disc_ref, fw_ref, scal_ref, hc_ref,
                                hp_ref, hs_ref, kc_ref, kr_ref))
        # launch-time per-seat consumption sums from the real buffers
        osum0 = tuple(jnp.sum(i32(obs_ref[a]), axis=0, keepdims=True)
                      for a in range(P))
        wsum0 = tuple(jnp.sum(i32(own_ref[a]), axis=0, keepdims=True)
                      for a in range(P))
        msum0 = tuple(jnp.sum(i32(mask_ref[a]), axis=0, keepdims=True)
                      for a in range(P))
        zrow = jnp.zeros((1, B), jnp.int32)
        init = dict(
            st=st0, w=arng_ref[:],
            base=jnp.full((1, 1), base_s[0, 0], jnp.int32),
            osum=osum0, wsum=wsum0, msum=msum0,
            dcnt=zrow, chk=zrow,
        )

        def body(_, cy):
            st, w = cy["st"], cy["w"]
            w, uid = sample_legal(ctx, st, w)
            st, rew, done, base = transition(ctx, st, uid, cy["base"])
            d32 = i32(done)
            osum, wsum, msum = list(cy["osum"]), list(cy["wsum"]), list(cy["msum"])
            for a in range(P):
                ob, ow, mk = encode_parts(ctx, st, a)
                refresh = done | (st["cur"] == a)
                osum[a] = jnp.where(refresh, blocks_sum(ob), osum[a])
                wsum[a] = jnp.where(refresh, blocks_sum(ow), wsum[a])
                msum[a] = jnp.where(refresh, blocks_sum(mk), msum[a])
            chk = cy["chk"] + rew * P + d32
            for a in range(P):
                chk = chk + osum[a] + wsum[a] + msum[a]
            return dict(st=st, w=w, base=base, osum=tuple(osum),
                        wsum=tuple(wsum), msum=tuple(msum),
                        dcnt=cy["dcnt"] + d32, chk=chk)

        out = lax.fori_loop(0, num_steps, body, init)
        _store_state(env, out["st"], (deck_o, disc_o, fw_o, scal_o, hc_o,
                                      hp_o, hs_o, kc_o, kr_o))
        arng_o[:] = out["w"]
        dcnt_o[:] = out["dcnt"]
        chk_o[:] = out["chk"]
        base_s[0, 0] = out["base"][0, 0]

        @pl.when(gi == pl.num_programs(0) - 1)
        def _():
            cnt_o[0, 0] = base_s[0, 0]

    return kernel


@functools.lru_cache(maxsize=None)
def _compiled_rollout(env: Env, num_envs: int, block: int, num_steps: int,
                      interpret: bool):
    C, R, P, H = env.colors, env.ranks, env.players, env.hand
    CR, M, A = C * R, env.max_cards, env.num_actions
    OBS, OWN = env.obs_size, H * env.bits_per_card
    assert num_envs % block == 0, (num_envs, block)
    grid = (num_envs // block,)
    kernel = _build_rollout_kernel(env, block, num_steps)

    rows = lambda r: pl.BlockSpec((r, block), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    buf3 = lambda bits: pl.BlockSpec((P, bits, block), lambda i: (0, 0, i),
                                     memory_space=pltpu.VMEM)
    smem11 = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    sds = jax.ShapeDtypeStruct
    i32s = lambda r: sds((r, num_envs), jnp.int32)

    call = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[smem11, rows(M), rows(CR), rows(C), rows(16),
                  rows(P * H), rows(P * H), rows(P), rows(P * H), rows(P * H),
                  buf3(OBS), buf3(OWN), buf3(A), rows(1)],
        out_specs=(rows(M), rows(CR), rows(C), rows(16),
                   rows(P * H), rows(P * H), rows(P), rows(P * H),
                   rows(P * H), rows(1), rows(1), rows(1), smem11),
        out_shape=(i32s(M), i32s(CR), i32s(C), i32s(16),
                   i32s(P * H), i32s(P * H), i32s(P), i32s(P * H),
                   i32s(P * H), i32s(1), i32s(1), i32s(1),
                   sds((1, 1), jnp.int32)),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )

    def rollout(d: dict, counter, act_rng: Array):
        (deck, disc, fw, scal, hc, hp, hs, kc, kr, arng, dcnt, chk,
         cnt) = call(
            counter.reshape(1, 1).astype(jnp.int32),
            d["deck"], d["disc"], d["fw"], d["scal"], d["hc"], d["hp"],
            d["hs"], d["kc"], d["kr"], d["obs"], d["own"], d["mask"],
            act_rng,
        )
        d2 = dict(deck=deck, disc=disc, fw=fw, scal=scal, hc=hc, hp=hp,
                  hs=hs, kc=kc, kr=kr,
                  # launch-time snapshot — see fused_rollout docstring
                  obs=d["obs"], own=d["own"], mask=d["mask"])
        return d2, cnt[0, 0], arng, dcnt[0], chk[0]

    return rollout


# Per-block VMEM: the ~150 carried i32 state rows plus the in/out double
# buffering of the launch-time obs/own/mask blocks and the unrolled encode
# expression's scoped stack.  1024 lanes compiles on the v5e; larger blocks
# trade grid pipelining for nothing (the rollout is compute-bound).
PERSISTENT_MAX_BLOCK = 1024


def fused_rollout(env: Env, d: dict, counter, act_rng: Array,
                  num_steps: int, block: int = PERSISTENT_MAX_BLOCK,
                  interpret: bool = False):
    """T fused hanabi steps in ONE kernel launch per env block.

    ``act_rng``: [1, N] int32 (``init_action_rng``) — the in-kernel action
    stream, advanced once per step and sampled uniformly over the active
    seat's legal moves (replay with ``action_from_mask``).  Returns
    ``(state', counter', act_rng', done_count [N] i32, checksum [N] i32)``
    where checksum = sum over steps of (sum of both seats' stale-blended
    obs+own+mask buffers + P * reward + done) per env — the fused-consumer
    discipline: every observation bit of every step feeds the checksum
    through the steps it stays live, without the buffers leaving VMEM.

    **The returned dict's obs/own/mask fields are the launch-time
    snapshot**, NOT the final buffers (those never materialize to HBM);
    deck/hands/knowledge/tokens/last-move/rng/counter are exact.  Episode
    indices are allocated block-sequentially (module note above).
    Requires ``fused_supported(env)``.
    """
    if not fused_supported(env):
        raise ValueError("hanabi fused kernels support 2-player configs")
    N = d["deck"].shape[-1]
    block = min(block, N, PERSISTENT_MAX_BLOCK)
    if N % block:
        raise ValueError(
            f"persistent rollout needs num_envs divisible by the env block "
            f"({N} % {block} != 0); use a power-of-two env count or pass a "
            f"block that divides it (Mosaic also requires block % 128 == 0 "
            f"or block == num_envs on real TPU)"
        )
    return _compiled_rollout(env, N, block, num_steps, interpret)(
        d, counter, act_rng)


def init_action_rng(num_envs: int, seed: int = 0) -> Array:
    """[1, N] per-env action-LCG seeds: the shared 8-round TEA over a
    tagged stream (xor tag keeps it disjoint from the episode streams)."""
    idx = jnp.arange(num_envs, dtype=jnp.int32) + jnp.int32(seed * num_envs)
    return _tea_seed(idx ^ _i32c(0x48414E41))[None, :]  # "HANA"


def action_from_mask(w: Array, mask: Array):
    """jnp replay of the in-kernel legal draw, for differential tests.

    ``w``: [N] int32 LCG words; ``mask``: [N, A] bool — the ACTIVE seat's
    legal-move mask at the start of the step.  Returns ``(w', uid [N])``:
    w' = lcg(w); uid = the ``(u24(w') * L) >> 24``-th legal move."""
    w2 = _lcg_next(w)
    u24 = lax.shift_right_logical(w2, 8) & jnp.int32(0x00FFFFFF)
    mi = mask.astype(jnp.int32)
    L = jnp.sum(mi, axis=-1)
    idx = lax.shift_right_logical(u24 * L, 24)
    cum_before = jnp.cumsum(mi, axis=-1) - mi
    hit = mi * (cum_before == idx[..., None]).astype(jnp.int32)
    uid = jnp.sum(
        jnp.arange(mask.shape[-1], dtype=jnp.int32)[None, :] * hit, axis=-1)
    return w2, uid
