"""Fused Hanabi step megakernel (Pallas TPU) — 2-player configs.

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
# kernel
# ---------------------------------------------------------------------------

def _build_kernel(env: Env, block: int):
    B = block
    C, R, P, H = env.colors, env.ranks, env.players, env.hand
    assert P == 2
    CR = C * R
    BPC = env.bits_per_card
    M = env.max_cards
    A = env.num_actions
    OBS = env.obs_size
    OWN = H * BPC
    D = P * H
    max_info, max_life = env.max_info, env.max_life
    deck0 = [int(x) for x in env._deck0]  # scalar constants for `moved`
    cr_num = env.cr_num
    cpc = env.cards_per_color
    VALID = (1 << BPC) - 1
    RANK_BASE = sum(1 << (i * R) for i in range(R))  # rank-mask base pattern
    COLOR_ONES = (1 << R) - 1
    def _skip(k):
        a, c = 1, 0
        for _ in range(k):
            a = (a * _LCG_A) % (1 << 32)
            c = (c * _LCG_A + _LCG_C) % (1 << 32)
        return a, c

    skip_consts = [_skip(k) for k in range(1, D + 1)]
    srl = lax.shift_right_logical
    rc_base, rr_base = 2 * H, 2 * H + (P - 1) * C

    def kernel(cnt_ref, deck_ref, disc_ref, fw_ref, scal_ref, hc_ref, hp_ref,
               hs_ref, kc_ref, kr_ref, obs_ref, own_ref, mask_ref, act_ref,
               deck_o, disc_o, fw_o, scal_o, hc_o, hp_o, hs_o, kc_o, kr_o,
               obs_o, own_o, mask_o, rew_o, done_o, cnt_o, base_s):
        gi = pl.program_id(0)

        @pl.when(gi == 0)
        def _():
            base_s[0, 0] = cnt_ref[0, 0]

        i32 = lambda b: b.astype(jnp.int32)
        # multi-row iota columns: one compare against these covers a whole
        # one-hot/thermometer section in ceil(n/8) sublane tiles (generated
        # in-kernel — captured array constants crash the tunnel's Mosaic)
        iob = lambda n: lax.broadcasted_iota(jnp.int32, (n, B), 0)
        ioM, ioC, ioR = iob(M), iob(C), iob(R)
        ioCR, ioH, ioBPC = iob(CR), iob(H), iob(BPC)
        deckb = deck_ref[:]   # [M, B]
        discb = disc_ref[:]   # [CR, B]
        fwb = fw_ref[:]       # [C, B]
        hc = [[hc_ref[p * H + h:p * H + h + 1] for h in range(H)] for p in range(P)]
        hp = [[hp_ref[p * H + h:p * H + h + 1] for h in range(H)] for p in range(P)]
        hs = [hs_ref[p:p + 1] for p in range(P)]
        kc = [[kc_ref[p * H + h:p * H + h + 1] for h in range(H)] for p in range(P)]
        kr = [[kr_ref[p * H + h:p * H + h + 1] for h in range(H)] for p in range(P)]
        sc = {i: scal_ref[i:i + 1] for i in range(16)}
        act = [act_ref[p:p + 1] for p in range(P)]

        deck_size, info, life = sc[_DECKSZ], sc[_INFO], sc[_LIFE]
        cur, turns, score = sc[_CUR], sc[_TURNS], sc[_SCORE]
        v = sc[_RNG]

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

        # ---- transition (envs/hanabi.py::transition) -----------------
        turns = turns - i32(deck_size == 0)
        agent = cur
        uid = sel_p(act, agent)

        is_discard = uid < H
        is_play = (uid >= H) & (uid < 2 * H)
        is_rc = (uid >= rc_base) & (uid < rr_base)
        is_rr = uid >= rr_base
        took = is_discard | is_play

        card_idx = jnp.clip(jnp.where(is_discard, uid, uid - H), 0, H - 1)
        card = sel_ph(hc, agent, card_idx)
        card_color = card // R
        card_rank = card % R

        # fireworks[card_color] via masked sublane reduce over the [C, B] block
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
        base = base_s[0, 0]
        eps = base + (ps - d32)
        base_s[0, 0] = base + jnp.sum(d32, axis=1, keepdims=True)[0, 0]

        # TEA seed
        s0 = jnp.zeros_like(eps)
        t0, t1 = eps, jnp.zeros_like(eps)
        for _ in range(8):
            s0 = s0 + _i32c(_TEA_DELTA)
            t0 = t0 + (((t1 << 4) + _i32c(_K0)) ^ (t1 + s0) ^ (srl(t1, 5) + _i32c(_K1)))
            t1 = t1 + (((t0 << 4) + _i32c(_K2)) ^ (t0 + s0) ^ (srl(t0, 5) + _i32c(_K3)))
        seed = t0

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

        # ---- encode (envs/hanabi.py::_encode_seat / _mask_seat) ---------
        # whole sections per op: each one-hot/thermometer block is ONE iota
        # compare on [n, B] (all 8 sublanes useful) instead of n [1, B] rows
        i8b = lambda b: b.astype(jnp.int8)

        def onehot(val, io_n, live=None):
            m = io_n == val
            if live is not None:
                m = m & live
            return i8b(m)

        def encode_obs(a):
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
                blocks.append(i8b(iob(env.max_deck_bits) < deck_size))
            for c in range(C):
                blocks.append(i8b(fwb[c:c + 1] == ioR + 1))
            if max_info > 0:
                blocks.append(i8b(iob(max_info) < info))
            if max_life > 0:
                blocks.append(i8b(iob(max_life) < life))
            # discards: bit -> (id, threshold) walks card ids consecutively
            # with thresholds 0..copies-1, so each id is one compare
            for cid in range(CR):
                blocks.append(i8b(discb[cid:cid + 1] > iob(cr_num[cid % R])))
            # last action
            rel_actor = jnp.where(lm_player == -1, -1, (a - lm_player + P) % P)
            blocks.append(onehot(rel_actor, iob(P)))
            for mtv in (M_PLAY, M_DISCARD, M_REVEAL_C, M_REVEAL_R):
                blocks.append(i8b(lm_move == mtv))
            is_reveal = (lm_move == M_REVEAL_C) | (lm_move == M_REVEAL_R)
            rel_target = (a - lm_target + P) % P
            blocks.append(i8b((iob(P) == rel_target) & is_reveal))
            blocks.append(i8b((ioC == lm_color) & (lm_move == M_REVEAL_C)))
            blocks.append(i8b((ioR == lm_rank) & (lm_move == M_REVEAL_R)))
            blocks.append(i8b(((jnp.right_shift(reveal_bits, ioH) & 1) != 0)
                              & is_reveal))
            is_pd = (lm_move == M_PLAY) | (lm_move == M_DISCARD)
            blocks.append(i8b((ioH == lm_card_index) & is_pd))
            blocks.append(i8b((ioCR == lm_color * R + lm_rank) & is_pd))
            blocks.append(i8b((lm_scored != 0) & (lm_move == M_PLAY)))
            blocks.append(i8b((lm_info_token != 0) & (lm_move == M_PLAY)))
            # card knowledge (quirk: plausible bit index = player offset)
            for off in range(P):
                q = (a + off) % P
                for h in range(H):
                    live = h < hs[q]
                    pb = i8b(((srl(hp[q][h], off) & 1) != 0) & live)
                    blocks.append(jnp.broadcast_to(pb, (BPC, B)))
                    blocks.append(onehot(kc[q][h], ioC, live))
                    blocks.append(onehot(kr[q][h], ioR, live))
            return jnp.concatenate(blocks, axis=0)  # [OBS, B] int8

        def encode_own(a):
            return jnp.concatenate(
                [onehot(hc[a][h], ioBPC, h < hs[a]) for h in range(H)], axis=0)

        def encode_mask(a):
            blocks = [
                i8b((ioH < hs[a]) & (info < max_info)),
                i8b(ioH < hs[a]),
            ]
            info_ok = info > 0
            for off in range(1, P):
                q = (a + off) % P
                any_c = ioC == hc[q][0] // R
                for h in range(1, H):  # dead slots too (reference quirk)
                    any_c = any_c | (ioC == hc[q][h] // R)
                blocks.append(i8b(any_c & info_ok))
            for off in range(1, P):
                q = (a + off) % P
                any_r = ioR == hc[q][0] % R
                for h in range(1, H):
                    any_r = any_r | (ioR == hc[q][h] % R)
                blocks.append(i8b(any_r & info_ok))
            return jnp.concatenate(blocks, axis=0)

        for a in range(P):
            # refresh mask as i8 0x00/0xFF and blend bitwise: Mosaic lowers
            # neither broadcast bool selects over i8 blocks (trunci i8->i1)
            # nor i8*i8 multiplies, but i8 xor/and are fine
            r = (done | (cur == a)).astype(jnp.int32)  # [1, B] 0/1
            m8 = (-r).astype(jnp.int8)                 # 0x00 / 0xFF
            blend = lambda new8, old8: old8 ^ ((old8 ^ new8) & m8)
            obs_o[a] = blend(encode_obs(a), obs_ref[a])
            own_o[a] = blend(encode_own(a), own_ref[a])
            mask_o[a] = blend(encode_mask(a), mask_ref[a])

        # ---- write state back ------------------------------------------
        cat = lambda rows_: jnp.concatenate(rows_, axis=0)
        deck_o[:] = deckb
        disc_o[:] = discb
        fw_o[:] = fwb
        hc_o[:] = cat([hc[p][h] for p in range(P) for h in range(H)])
        hp_o[:] = cat([hp[p][h] for p in range(P) for h in range(H)])
        hs_o[:] = cat(hs)
        kc_o[:] = cat([kc[p][h] for p in range(P) for h in range(H)])
        kr_o[:] = cat([kr[p][h] for p in range(P) for h in range(H)])
        scal_o[:] = cat([
            deck_size, info, life, cur, turns, score, lm_move, lm_player,
            lm_target, lm_card_index, lm_scored, lm_info_token, lm_color,
            lm_rank, reveal_bits, v,
        ])
        rew_o[:] = rew
        done_o[:] = d32

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
