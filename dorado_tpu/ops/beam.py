"""On-device batched CRF beam search.

The reference runs its beam search in CUDA (Koi `host_beam_search_step`)
because moving per-chunk scores to the host is too expensive; the same logic
applies on TPU, where the tunnel/PCIe transfer of [N, T, C] score tensors
dwarfs compute. This module re-expresses the reference algorithm
(dorado/basecall/decode/beam_search.cpp:126-520 — CRC32C sequence hashing,
stay/step log-sum-exp merging, score cutoff with binary-search width
control) as a fixed-shape `lax.scan` over time, vectorised across the chunk
batch:

  - candidates live in a fixed [N, 5W] layout (4 steps per element, then W
    stays), dead slots carry -inf scores;
  - order-preserving cutoff selection = stable argsort on (dropped, index);
  - the stay/step merge is fully vectorised as a [N, W_stay, 4W_step] match
    matrix (hash + base equality) — exact whenever each stay matches at most
    one step, which holds unless duplicate sequences co-exist in the beam
    (the merge itself removes duplicates, so this is self-stabilising);
  - NO last-dim gathers anywhere in the hot loop: TPU lane-dimension gathers
    run near one element/cycle (~100us/step measured for the naive [N, 4C]
    score gather), so the score/back-guide lookups are one-hot matmuls on
    the MXU instead. The 4 step states of an element are consecutive
    (shifted|base), so [S] lookups collapse to [S/4]-row one-hot matmuls
    against a [S/4, 16]-reshaped score block — exact, because each one-hot
    row has a single 1.0 so the f32 accumulation adds only zeros. Survivor
    selection uses masked-max reductions over [N, W, 5W] (integer-safe);
  - history (state/parent/stay per step) stays in HBM; traceback is a second
    `reverse=True` scan (no materialised flips).

Parity: bit-identical to the host implementations on the vast majority of
chunks; divergence is possible only when duplicate sequences co-exist in the
beam (the sequential fold order differs), which the merge is designed to
remove. The C++ host beam (native/beam.cpp) remains the exact oracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_POLY = np.uint32(0x82F63B78)
_CRC_SEED = np.uint32(0x12345678)
NEG = jnp.float32(np.finfo(np.float32).min)


def _crc_table(nbits: int) -> np.ndarray:
    size = 1 << nbits
    table = np.zeros(size, dtype=np.uint32)
    for v in range(size):
        crc = v
        for _ in range(nbits):
            b = crc & 1
            crc >>= 1
            if b:
                crc ^= int(_POLY)
        table[v] = crc
    return table


_CRC2 = jnp.asarray(_crc_table(2))
_CRC8 = jnp.asarray(_crc_table(8))


def _crc2(crc, bits):
    folded = crc ^ (bits.astype(jnp.uint32) & jnp.uint32(3))
    return (folded >> jnp.uint32(2)) ^ _CRC2[(folded & jnp.uint32(3)).astype(jnp.int32)]


def _crc32(crc, word):
    folded = crc.astype(jnp.uint32) ^ word.astype(jnp.uint32)
    for _ in range(4):
        folded = (folded >> jnp.uint32(8)) ^ _CRC8[
            (folded & jnp.uint32(0xFF)).astype(jnp.int32)
        ]
    return folded


def _lse(x, y):
    d = jnp.abs(x - y)
    return jnp.maximum(x, y) + jnp.where(d < 17.0, jnp.log1p(jnp.exp(-d)), 0.0)


def _oh_lookup(spec, oh, vals):
    """BIT-exact one-hot lookup einsum in three bf16 MXU passes (vs 6 for
    HIGHEST precision).

    vals = a + b + c with each part an 8-mantissa-bit slice (a = bf16(vals),
    b = bf16(vals - a), c the exact f32 remainder, itself bf16-representable
    since 24 = 8+8+8). Each product against a one-hot 1.0 is exact, and the
    accumulation (a + b) + c re-assembles the original f32 bit-exactly:
    a + b carries <= 16 significant bits, + c restores all 24."""
    a = vals.astype(jnp.bfloat16).astype(jnp.float32)
    r = vals - a
    b = r.astype(jnp.bfloat16).astype(jnp.float32)
    c = r - b
    return jnp.einsum(spec, oh, a) + jnp.einsum(spec, oh, b) + jnp.einsum(spec, oh, c)


@partial(jax.jit, static_argnames=("beam_width", "beam_cut", "fixed_stay_score"))
def beam_search_device(
    scores_tnc: jnp.ndarray,  # [T, N, C] f32
    back_guide: jnp.ndarray,  # [T+1, N, S] f32
    beam_width: int = 32,
    beam_cut: float = 100.0,
    fixed_stay_score: float = 2.0,
):
    """Returns (states [N, T] i32, moves [N, T] u8)."""
    t_len, n, c = scores_tnc.shape
    num_states = c // 4
    num_state_bits = int(num_states).bit_length() - 1
    w = beam_width
    states_mask = jnp.uint32(num_states - 1)
    log_beam_cut = float(np.log(beam_cut)) if beam_cut > 0 else np.finfo(np.float32).max

    # ---- init from top back-guide states, in state order ----
    bg0 = back_guide[0]  # [N, S]
    kth = -jnp.sort(-bg0, axis=1)[:, w - 1 : w]  # [N, 1] threshold
    sel = bg0 >= kth
    order_key = jnp.where(sel, 0, 1) * num_states + jnp.arange(num_states)[None, :]
    init_states = jnp.sort(order_key, axis=1)[:, :w] % num_states  # [N, W]
    init_states = init_states.astype(jnp.int32)

    beam_state0 = init_states
    beam_hash0 = _crc32(jnp.full((n, w), _CRC_SEED, jnp.uint32), init_states)
    beam_score0 = jnp.zeros((n, w), jnp.float32)

    elem_idx = jnp.arange(w, dtype=jnp.int32)
    r = num_states // 4  # one-hot row space (4 consecutive step states/row)

    def step(carry, xs):
        beam_state, beam_hash, beam_score, _ = carry
        block_scores_r, block_back_r = xs  # [N, r, 16], [N, r, 4]

        prev = beam_state.astype(jnp.uint32)
        shifted = (prev << 2) & states_mask
        dropped = ((prev << 2) & jnp.uint32(0xFFFF)) >> jnp.uint32(num_state_bits)

        # -- score/back lookups as one-hot MXU matmuls (see module docstring;
        # a naive lane-dim gather here costs ~100us/step on TPU). The 16
        # columns of a score row are (base, dropped); the 4 columns of a
        # back-guide row are the last base.
        row_step = (prev & jnp.uint32(r - 1)).astype(jnp.int32)  # shifted >> 2
        oh_step = jax.nn.one_hot(row_step, r, dtype=jnp.float32)  # [N, W, r]
        g_scores = _oh_lookup("nwr,nrk->nwk", oh_step, block_scores_r)  # [N, W, 16]
        back_step = _oh_lookup("nwr,nrd->nwd", oh_step, block_back_r)  # [N, W, 4]
        oh_drop = jax.nn.one_hot(dropped.astype(jnp.int32), 4, dtype=jnp.float32)
        # 4-wide contraction: plain VPU mult-reduce, exact in f32
        trans = (g_scores.reshape(n, w, 4, 4) * oh_drop[:, :, None, :]).sum(
            axis=-1
        )  # [N, W, 4] transition scores for the 4 step bases

        base = jnp.arange(4, dtype=jnp.uint32)
        step_state = (shifted[..., None] | base).astype(jnp.int32)  # [N, W, 4]
        step_score = beam_score[..., None] + trans + back_step
        step_hash = _crc2(jnp.repeat(beam_hash[..., None], 4, axis=-1), base)

        row_stay = (prev >> jnp.uint32(2)).astype(jnp.int32)
        oh_stay = jax.nn.one_hot(row_stay, r, dtype=jnp.float32)
        g_stay = _oh_lookup("nwr,nrd->nwd", oh_stay, block_back_r)
        oh_base = jax.nn.one_hot((prev & 3).astype(jnp.int32), 4, dtype=jnp.float32)
        stay_back = (g_stay * oh_base).sum(axis=-1)
        stay_score = beam_score + fixed_stay_score + stay_back

        cand_state = jnp.concatenate([step_state.reshape(n, -1), beam_state], axis=1)
        cand_hash = jnp.concatenate([step_hash.reshape(n, -1), beam_hash], axis=1)
        cand_parent = jnp.concatenate(
            [jnp.repeat(elem_idx[None], 4, axis=0).T.reshape(-1)[None].repeat(n, 0),
             elem_idx[None].repeat(n, 0)],
            axis=1,
        )
        cand_stay = jnp.concatenate(
            [jnp.zeros((n, 4 * w), bool), jnp.ones((n, w), bool)], axis=1
        )

        # ---- stay/step merge, fully vectorised. A stay (element i) can only
        # be the same sequence as a step whose emitted base equals the stay's
        # last base AND whose CRC matches (beam_search.cpp:303-340). Distinct
        # stays have distinct hashes (duplicates were merged away last step),
        # so all merges are independent: one [N, W, 4W] comparison replaces
        # the reference's sequential outer loop with no scatters at all.
        step_s_flat = step_score.reshape(n, -1)  # [N, 4W]
        step_h_flat = step_hash.reshape(n, -1)
        slot_base = (jnp.arange(4 * w, dtype=jnp.int32) & 3)[None, None, :]
        match = (
            (step_h_flat[:, None, :] == beam_hash[:, :, None])
            & (slot_base == (beam_state[:, :, None] & 3))
            & (step_s_flat[:, None, :] > NEG / 2)
            & (stay_score[:, :, None] > NEG / 2)
        )  # [N, W_stay, 4W_step]
        folded = _lse(stay_score[:, :, None], step_s_flat[:, None, :])
        stay_wins = stay_score[:, :, None] > step_s_flat[:, None, :]

        step_killed = (match & stay_wins).any(axis=1)  # [N, 4W]
        step_folded = (match & ~stay_wins).any(axis=1)
        step_fold_val = jnp.max(jnp.where(match & ~stay_wins, folded, NEG), axis=1)
        new_step = jnp.where(
            step_killed, NEG, jnp.where(step_folded, step_fold_val, step_s_flat)
        )

        stay_loses = (match & ~stay_wins).any(axis=2)  # [N, W]
        stay_folds = (match & stay_wins).any(axis=2)
        stay_fold_val = jnp.max(jnp.where(match & stay_wins, folded, NEG), axis=2)
        new_stay = jnp.where(
            stay_loses, NEG, jnp.where(stay_folds, stay_fold_val, stay_score)
        )

        cand_score = jnp.concatenate([new_step, new_stay], axis=1)

        # ---- cutoff with binary-search width control ----
        max_score = cand_score.max(axis=1)  # [N]
        cutoff0 = max_score - log_beam_cut

        def count_ge(cut):
            return (cand_score >= cut[:, None]).sum(axis=1)

        min_width = (w * 8) // 10

        def bsearch(state):
            cutoff, lo, hi, done = state
            cnt = count_ge(cutoff)
            too_many = cnt > w
            too_few = cnt < min_width
            need = (too_many | too_few) & ~done
            new_lo = jnp.where(too_many & need, cutoff, lo)
            new_hi = jnp.where(~too_many & need, cutoff, hi)
            new_cut = jnp.where(
                need,
                jnp.where(too_many, (cutoff + hi) / 2.0, (cutoff + lo) / 2.0),
                cutoff,
            )
            return (new_cut, new_lo, new_hi, done | ~need)

        cnt0 = count_ge(cutoff0)
        needs_search = cnt0 > w
        state = (cutoff0, cutoff0, max_score, ~needs_search)
        for _ in range(9):  # unrolled: reference caps guesses at 10
            state = bsearch(state)
        cutoff, _, hi, done = state
        # unfinished searches fall back to hi (reference guesses==10 branch)
        cutoff = jnp.where(done, cutoff, hi)
        elem_count = jnp.minimum(count_ge(cutoff), w)

        # ---- order-preserving selection of survivors. Rank compaction
        # (rank = exclusive running count of keeps) picks the same first-W
        # kept candidates in index order that a stable sort would, without
        # the ~64-stage bitonic network a 160-lane jnp.sort lowers to (the
        # sort measured as the single largest slice of the step body). ----
        keep = cand_score >= cutoff[:, None]
        rank = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1  # [N, 5W]
        kept_rank = jnp.arange(w)[None, :]
        n_kept = jnp.minimum(keep.sum(axis=1), w)
        alive = kept_rank < jnp.minimum(elem_count, n_kept)[:, None]

        # masked-max selection — integer-exact, no lane gathers. Each selm
        # row has at most one True (ranks are unique among kept candidates).
        cand_back = jnp.concatenate([back_step.reshape(n, -1), stay_back], axis=1)
        selm = keep[:, None, :] & (rank[:, None, :] == kept_rank[:, :, None])
        k_state = jnp.max(jnp.where(selm, cand_state[:, None, :], 0), axis=2)
        k_hash = jnp.max(jnp.where(selm, cand_hash[:, None, :], jnp.uint32(0)), axis=2)
        k_parent = jnp.max(jnp.where(selm, cand_parent[:, None, :], 0), axis=2)
        k_score = jnp.max(jnp.where(selm, cand_score[:, None, :], NEG), axis=2)
        k_stay = (selm & cand_stay[:, None, :]).any(axis=2)
        k_back = jnp.max(jnp.where(selm, cand_back[:, None, :], NEG), axis=2)

        next_score = jnp.where(alive, k_score - k_back, NEG)
        raw_score = jnp.where(alive, k_score, NEG)
        out = (k_state.astype(jnp.int32), k_parent.astype(jnp.int8), k_stay)
        return (k_state, k_hash, next_score, raw_score), out

    # time-blocked scan: lax.scan costs ~20us/iteration regardless of body,
    # so advance several timesteps per iteration (identical math/results)
    from dorado_tpu.ops.crf_scan import _scan_block

    block = _scan_block(t_len, 8)

    def blocked_step(carry, xs_blk):
        sc_blk, bg_blk = xs_blk
        outs = []
        for k in range(block):
            carry, out = step(carry, (sc_blk[k], bg_blk[k]))
            outs.append(out)
        return carry, tuple(jnp.stack(o) for o in zip(*outs))

    xs = (
        scores_tnc.reshape(t_len // block, block, n, r, 16),
        back_guide[1:].reshape(t_len // block, block, n, r, 4),
    )
    (_, _, _, final_score), (hist_state, hist_parent, hist_stay) = jax.lax.scan(
        blocked_step,
        (beam_state0, beam_hash0, beam_score0, beam_score0),
        xs,
    )
    hist_state = hist_state.reshape(t_len, n, w)
    hist_parent = hist_parent.reshape(t_len, n, w)
    hist_stay = hist_stay.reshape(t_len, n, w)
    return _traceback(hist_state, hist_parent, hist_stay, final_score)


@jax.jit
def _traceback(hist_state, hist_parent, hist_stay, final_score):
    """(states [N, T] i32, moves [N, T] u8): reverse-time traceback from the
    best final element (no materialised history flips). Shared by the XLA
    scan above and the Mosaic forward kernel (ops/beam_pallas.py)."""
    t_len, n, w = hist_state.shape
    from dorado_tpu.ops.crf_scan import _scan_block

    block = _scan_block(t_len, 8)
    best0 = jnp.argmax(final_score, axis=1).astype(jnp.int32)  # [N]

    def back(elem, hs):
        h_state, h_parent, h_stay = hs
        st = jnp.take_along_axis(h_state, elem[:, None], axis=1)[:, 0]
        sy = jnp.take_along_axis(h_stay, elem[:, None], axis=1)[:, 0]
        pa = jnp.take_along_axis(h_parent.astype(jnp.int32), elem[:, None], axis=1)[:, 0]
        return pa, (st, jnp.where(sy, 0, 1).astype(jnp.uint8))

    def back_blocked(elem, hs_blk):
        sts, mvs = [], []
        for k in reversed(range(block)):
            elem, (st, mv) = back(
                elem, tuple(h[k] for h in hs_blk)
            )
            sts.append(st)
            mvs.append(mv)
        # emitted newest-first inside the block; flip to time order
        return elem, (jnp.stack(sts[::-1]), jnp.stack(mvs[::-1]))

    _, (states_t, moves_t) = jax.lax.scan(
        back_blocked,
        best0,
        tuple(
            h.reshape(t_len // block, block, n, w)
            for h in (hist_state, hist_parent, hist_stay)
        ),
        reverse=True,
    )
    states_t = states_t.reshape(t_len, n)
    moves_t = moves_t.reshape(t_len, n)
    states = states_t.swapaxes(0, 1)  # [N, T]
    moves = moves_t.swapaxes(0, 1)
    moves = moves.at[:, 0].set(1)
    return states, moves
