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
per-env scalar is a ``[1, B]`` row, tiny game arrays (deck 50, hands P*H,
discard piles C*R) are python lists of rows, and the per-seat obs/own/mask
buffers are ``[P, bits, B]`` int8 blocks assembled by one big axis-0 concat
per seat, with the stale-seat rule applied as a single whole-block select
(``where(refresh_p, fresh, old)``).  The episode counter crosses blocks via
SMEM scratch + a lane prefix sum, exactly like ``cartpole_pallas``.

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
    deck0 = [int(x) for x in env._deck0]
    disc_ids = [int(x) for x in env._discard_ids]
    disc_thr = [int(x) for x in env._discard_thr]
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
        deck = [deck_ref[m:m + 1] for m in range(M)]
        disc = [disc_ref[c:c + 1] for c in range(CR)]
        fw = [fw_ref[c:c + 1] for c in range(C)]
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

        fwc = sel_p(fw, card_color)  # fireworks[card_color]
        success = is_play & (fwc == card_rank)
        completed = success & (fwc + 1 == R)
        failed = is_play & ~success

        for c in range(CR):
            disc[c] = disc[c] + i32((is_discard | failed) & (card == c))
        for c in range(C):
            fw[c] = fw[c] + i32(success & (card_color == c))
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
        drawn = jnp.zeros_like(loc)
        last = jnp.zeros_like(loc)
        for m in range(M):
            drawn = jnp.where(loc == m, deck[m], drawn)
            last = jnp.where(deck_size - 1 == m, deck[m], last)
        for m in range(M):
            deck[m] = jnp.where(draw_now & (loc == m), last, deck[m])
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
        fwsum = fw[0]
        for c in range(1, C):
            fwsum = fwsum + fw[c]
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

        for m in range(M):
            fd = jnp.full_like(locs[0], deck0[m])
            for j in range(D):
                fd = jnp.where(locs[j] == m, moved[j], fd)
            deck[m] = jnp.where(done, fd, deck[m])
        for c in range(CR):
            disc[c] = jnp.where(done, 0, disc[c])
        for c in range(C):
            fw[c] = jnp.where(done, 0, fw[c])
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
        # rows build in i32 (i8*i8 multiplies crash the tunnel's Mosaic
        # helper); the blend with the stale buffer runs in i32 and casts
        # to i8 once at the store
        i8 = lambda b: b.astype(jnp.int32)

        def encode_obs(a):
            rows = []
            # hands: partners in observer-relative order
            for off in range(1, P):
                q = (a + off) % P
                for h in range(H):
                    live = h < hs[q]
                    for vv in range(BPC):
                        rows.append(i8((hc[q][h] == vv) & live))
            for off in range(P):
                q = (a + off) % P
                rows.append(i8(hs[q] < H))
            # board
            for kbit in range(env.max_deck_bits):
                rows.append(i8(kbit < deck_size))
            for c in range(C):
                for r in range(R):
                    rows.append(i8(fw[c] == r + 1))
            for kbit in range(max_info):
                rows.append(i8(kbit < info))
            for kbit in range(max_life):
                rows.append(i8(kbit < life))
            # discards
            for b in range(M):
                rows.append(i8(disc[disc_ids[b]] > disc_thr[b]))
            # last action
            rel_actor = jnp.where(lm_player == -1, -1, (a - lm_player + P) % P)
            for i in range(P):
                rows.append(i8(rel_actor == i))
            for mtv in (M_PLAY, M_DISCARD, M_REVEAL_C, M_REVEAL_R):
                rows.append(i8(lm_move == mtv))
            is_reveal = (lm_move == M_REVEAL_C) | (lm_move == M_REVEAL_R)
            rel_target = (a - lm_target + P) % P
            for i in range(P):
                rows.append(i8((rel_target == i) & is_reveal))
            for i in range(C):
                rows.append(i8((lm_color == i) & (lm_move == M_REVEAL_C)))
            for i in range(R):
                rows.append(i8((lm_rank == i) & (lm_move == M_REVEAL_R)))
            for h in range(H):
                rows.append(i8(((srl(reveal_bits, h) & 1) != 0) & is_reveal))
            is_pd = (lm_move == M_PLAY) | (lm_move == M_DISCARD)
            for h in range(H):
                rows.append(i8((lm_card_index == h) & is_pd))
            for i in range(CR):
                rows.append(i8((lm_color * R + lm_rank == i) & is_pd))
            rows.append(i8((lm_scored != 0) & (lm_move == M_PLAY)))
            rows.append(i8((lm_info_token != 0) & (lm_move == M_PLAY)))
            # card knowledge (quirk: plausible bit index = player offset)
            for off in range(P):
                q = (a + off) % P
                for h in range(H):
                    live = h < hs[q]
                    pb = i8(((srl(hp[q][h], off) & 1) != 0) & live)
                    for _vv in range(BPC):
                        rows.append(pb)
                    for i in range(C):
                        rows.append(i8((kc[q][h] == i) & live))
                    for i in range(R):
                        rows.append(i8((kr[q][h] == i) & live))
            return jnp.concatenate(rows, axis=0)  # [OBS, B] int8

        def encode_own(a):
            rows = []
            for h in range(H):
                live = h < hs[a]
                for vv in range(BPC):
                    rows.append(i8((hc[a][h] == vv) & live))
            return jnp.concatenate(rows, axis=0)

        def encode_mask(a):
            rows = []
            for h in range(H):
                rows.append(i8((h < hs[a]) & (info < max_info)))
            for h in range(H):
                rows.append(i8(h < hs[a]))
            info_ok = info > 0
            for off in range(1, P):
                q = (a + off) % P
                for c in range(C):
                    any_c = jnp.zeros_like(info_ok)
                    for h in range(H):  # dead slots too (reference quirk)
                        any_c = any_c | (hc[q][h] // R == c)
                    rows.append(i8(any_c & info_ok))
            for off in range(1, P):
                q = (a + off) % P
                for r in range(R):
                    any_r = jnp.zeros_like(info_ok)
                    for h in range(H):
                        any_r = any_r | (hc[q][h] % R == r)
                    rows.append(i8(any_r & info_ok))
            return jnp.concatenate(rows, axis=0)

        for a in range(P):
            # arithmetic blend in i32: Mosaic cannot lower the broadcast
            # bool select over i8 blocks (trunci i8->i1), and i8*i8
            # multiplies crash the compile helper
            r = (done | (cur == a)).astype(jnp.int32)  # [1, B]
            nr = 1 - r
            blend = lambda new32, old8: (
                new32 * r + old8.astype(jnp.int32) * nr
            ).astype(jnp.int8)
            obs_o[a] = blend(encode_obs(a), obs_ref[a])
            own_o[a] = blend(encode_own(a), own_ref[a])
            mask_o[a] = blend(encode_mask(a), mask_ref[a])

        # ---- write state back ------------------------------------------
        cat = lambda rows_: jnp.concatenate(rows_, axis=0)
        deck_o[:] = cat(deck)
        disc_o[:] = cat(disc)
        fw_o[:] = cat(fw)
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
