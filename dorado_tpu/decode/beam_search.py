"""Reference CRF beam-search decoder (host-side, numpy).

Algorithmic parity with dorado/basecall/decode/beam_search.cpp:126-520:
fixed-width beam (default 32) over 16-bit k-mer states, CRC32C sequence
hashing, stay/step merging via log-sum-exp, score cutoff with binary-search
width control, posterior-derived per-base qualities.

This implementation is the *golden reference* used by tests and by the exact
--emit-reference-decode mode; the production on-device path is the Viterbi
decoder in ops/crf_scan.py (see decode/decoder.py). A C++ port of this file
drives the fast host decode (csrc/beamsearch).
"""

from __future__ import annotations

import numpy as np

from dorado_tpu.decode.common import DecodedChunk, generate_sequence

_POLY = np.uint32(0x82F63B78)
_CRC_SEED = np.uint32(0x12345678)


def _make_crc_table(nbits: int) -> np.ndarray:
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


_CRC2 = _make_crc_table(2)
_CRC8 = _make_crc_table(8)


def crc32c_2bit(crc: np.ndarray, new_bits: np.ndarray) -> np.ndarray:
    """Incorporate 2 new bits into CRC32C (vectorised)."""
    crc = crc.astype(np.uint32)
    folded = crc ^ (np.asarray(new_bits).astype(np.uint32) & np.uint32(3))
    return (folded >> np.uint32(2)) ^ _CRC2[folded & np.uint32(3)]


def crc32c_32bit(crc: np.ndarray | int, word: np.ndarray | int) -> np.ndarray:
    """Incorporate a 32-bit word into CRC32C (vectorised, byte-at-a-time)."""
    crc = np.asarray(crc, dtype=np.uint32)
    word = np.asarray(word, dtype=np.uint32)
    folded = crc ^ word
    for _ in range(4):
        folded = (folded >> np.uint32(8)) ^ _CRC8[folded & np.uint32(0xFF)]
    return folded


def _log_sum_exp(x: float, y: float) -> float:
    d = abs(x - y)
    return max(x, y) + (np.log1p(np.exp(-d)) if d < 17.0 else 0.0)


def beam_search(
    scores: np.ndarray,  # [T, C] transition scores (float)
    back_guide: np.ndarray,  # [T+1, S] float backward scores
    posts: np.ndarray,  # [T+1, S] float posteriors
    beam_width: int,
    beam_cut: float,
    fixed_stay_score: float,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    """Decode one chunk. Returns (states [T], moves [T], qual_data [T,4], score)."""
    num_blocks, c = scores.shape
    num_states = c // 4
    num_state_bits = int(num_states).bit_length() - 1
    if 1 << num_state_bits != num_states:
        raise ValueError("num_states must be a power of 2")
    if beam_width > 256:
        raise ValueError("beam_width cannot exceed 256")
    states_mask = num_states - 1

    log_beam_cut = np.log(beam_cut) if beam_cut > 0.0 else np.finfo(np.float32).max

    # Beam history: state / parent / stay flag per (block+1, element).
    hist_state = np.zeros((num_blocks + 1, beam_width), dtype=np.int64)
    hist_parent = np.zeros((num_blocks + 1, beam_width), dtype=np.int64)
    hist_stay = np.zeros((num_blocks + 1, beam_width), dtype=bool)

    # Initialise beam from the top back-guide states (ties keep lowest state
    # index first, like the reference's in-order scan against a threshold).
    bg0 = back_guide[0]
    if beam_width < num_states:
        threshold = np.partition(bg0, num_states - beam_width)[num_states - beam_width]
        init_states = np.nonzero(bg0 >= threshold)[0][:beam_width]
    else:
        init_states = np.arange(num_states)
    cur_width = len(init_states)

    beam_state = np.zeros(beam_width, dtype=np.int64)
    beam_hash = np.zeros(beam_width, dtype=np.uint32)
    beam_score = np.full(beam_width, 0.0, dtype=np.float32)
    beam_state[:cur_width] = init_states
    beam_hash[:cur_width] = crc32c_32bit(
        np.full(cur_width, _CRC_SEED, dtype=np.uint32), init_states.astype(np.uint32)
    )
    beam_score[:cur_width] = 0.0
    hist_state[0, :cur_width] = init_states

    hash_present_bits = 4096
    hash_mask = hash_present_bits - 1

    for block_idx in range(num_blocks):
        block_scores = scores[block_idx]
        block_back = back_guide[block_idx + 1]

        prev_state = beam_state[:cur_width]
        prev_hash = beam_hash[:cur_width]
        prev_score = beam_score[:cur_width]

        # --- step candidates: 4 per element, laid out [elem*4 + base] ---
        new_base = np.arange(4, dtype=np.int64)
        shifted = (prev_state[:, None] << 2) & states_mask
        step_state = shifted | new_base[None, :]  # [W, 4]
        # score index: (new_state << 2) + dropped oldest base of prev
        dropped = ((prev_state[:, None] << 2) & 0xFFFF) >> num_state_bits
        # the C++ uses 16-bit state_t; (prev<<2) as u16 then >> num_state_bits
        move_idx = (step_state << 2) + dropped
        step_score = (
            prev_score[:, None]
            + block_scores[move_idx].astype(np.float32)
            + block_back[step_state].astype(np.float32)
        )
        step_hash = crc32c_2bit(
            np.repeat(prev_hash, 4).reshape(-1, 4), new_base[None, :]
        )

        cand_state = step_state.reshape(-1)
        cand_hash = step_hash.reshape(-1)
        cand_parent = np.repeat(np.arange(cur_width), 4)
        cand_score = step_score.reshape(-1).astype(np.float32)
        cand_stay = np.zeros(cur_width * 4, dtype=bool)

        step_hash_present = np.zeros(hash_present_bits, dtype=bool)
        step_hash_present[cand_hash & hash_mask] = True

        # --- stay candidates: one per element, appended after the steps ---
        stay_score = (
            prev_score + fixed_stay_score + block_back[prev_state].astype(np.float32)
        )
        cand_state = np.concatenate([cand_state, prev_state])
        cand_hash = np.concatenate([cand_hash, prev_hash])
        cand_parent = np.concatenate([cand_parent, np.arange(cur_width)])
        cand_score = np.concatenate([cand_score, stay_score.astype(np.float32)])
        cand_stay = np.concatenate([cand_stay, np.ones(cur_width, dtype=bool)])

        # --- merge stays with identical-sequence steps (same CRC hash) ---
        # Processed in element order, exactly like the reference loop.
        for prev_elem_idx in range(cur_width):
            stay_elem = cur_width * 4 + prev_elem_idx
            if not step_hash_present[cand_hash[stay_elem] & hash_mask]:
                continue
            stay_latest_base = int(prev_state[prev_elem_idx] & 3)
            for comp in range(cur_width):
                step_elem = (comp << 2) | stay_latest_base
                if cand_hash[stay_elem] == cand_hash[step_elem]:
                    folded = _log_sum_exp(
                        float(cand_score[stay_elem]), float(cand_score[step_elem])
                    )
                    if cand_score[stay_elem] > cand_score[step_elem]:
                        cand_score[stay_elem] = folded
                        cand_score[step_elem] = np.finfo(np.float32).min
                    else:
                        cand_score[step_elem] = folded
                        cand_score[stay_elem] = np.finfo(np.float32).min

        max_score = float(cand_score.max())

        # --- cutoff: keep scores >= max - log(beam_cut), binary-search the
        # threshold if too many survive ---
        beam_cutoff = max_score - log_beam_cut
        elem_count = int((cand_score >= beam_cutoff).sum())
        if elem_count > beam_width:
            min_width = (beam_width * 8) // 10
            lo, hi = beam_cutoff, max_score
            guesses = 1
            while (elem_count > beam_width or elem_count < min_width) and guesses < 10:
                if elem_count > beam_width:
                    lo = beam_cutoff
                    beam_cutoff = (beam_cutoff + hi) / 2.0
                else:
                    hi = beam_cutoff
                    beam_cutoff = (beam_cutoff + lo) / 2.0
                elem_count = int((cand_score >= beam_cutoff).sum())
                guesses += 1
            if guesses == 10:
                beam_cutoff = hi
                elem_count = int((cand_score >= beam_cutoff).sum())
            elem_count = min(elem_count, beam_width)

        keep = np.nonzero(cand_score >= beam_cutoff)[0][:beam_width]
        kept_state = cand_state[keep]
        kept_hash = cand_hash[keep]
        kept_parent = cand_parent[keep]
        kept_score = cand_score[keep]
        kept_stay = cand_stay[keep]

        if block_idx == num_blocks - 1:
            # ensure the best path is element 0
            best = int(np.argmax(kept_score[:elem_count]))
            for arr in (kept_state, kept_hash, kept_parent, kept_score, kept_stay):
                arr[0], arr[best] = arr[best].copy(), arr[0].copy()

        # remove the backwards contribution before persisting scores
        kept_score = kept_score - block_back[kept_state].astype(np.float32)

        n_kept = len(keep)
        hist_state[block_idx + 1, :n_kept] = kept_state
        hist_parent[block_idx + 1, :n_kept] = kept_parent
        hist_stay[block_idx + 1, :n_kept] = kept_stay

        beam_state[:n_kept] = kept_state
        beam_hash[:n_kept] = kept_hash
        beam_score[:n_kept] = kept_score
        cur_width = min(elem_count, n_kept)

    final_score = float(beam_score[0])

    # --- traceback ---
    states = np.zeros(num_blocks, dtype=np.int32)
    moves = np.zeros(num_blocks, dtype=np.uint8)
    elem = 0
    for beam_idx in range(num_blocks, 0, -1):
        states[beam_idx - 1] = hist_state[beam_idx, elem]
        moves[beam_idx - 1] = 0 if hist_stay[beam_idx, elem] else 1
        elem = hist_parent[beam_idx, elem]
    moves[0] = 1

    qual_data = _qual_data_from_posts(states, posts, num_states)
    return states, moves, qual_data, final_score


def _qual_data_from_posts(
    states: np.ndarray, posts: np.ndarray, num_states: int
) -> np.ndarray:
    """Per-block base probabilities from posterior mass on the path k-mer and
    its left/right-shifted neighbours (beam_search.cpp:411-470)."""
    num_blocks = len(states)
    qual_data = np.zeros((num_blocks, 4), dtype=np.float32)
    msb = num_states >> 2

    state = states.astype(np.int64)
    base_to_emit = (state & 3).astype(np.int64)

    l_shift_idx = state >> 2
    r_shift_idx = (state << 2) % num_states
    shift_base = np.arange(4, dtype=np.int64)
    # interleaved [l0, r0, l1, r1, ...] matching the reference's dedup order
    shifted = np.empty((num_blocks, 8), dtype=np.int64)
    shifted[:, 0::2] = l_shift_idx[:, None] + msb * shift_base[None, :]
    shifted[:, 1::2] = r_shift_idx[:, None] + shift_base[None, :]

    t_posts = posts[1 : num_blocks + 1]
    block_prob = np.take_along_axis(t_posts, state[:, None], axis=1)[:, 0].astype(
        np.float32
    )

    # add each unique shifted state not equal to the path state
    not_self = shifted != state[:, None]
    first_occurrence = np.ones_like(not_self)
    for j in range(1, 8):
        dup = (shifted[:, :j] == shifted[:, j : j + 1]).any(axis=1)
        first_occurrence[:, j] = ~dup
    count = not_self & first_occurrence
    gathered = np.take_along_axis(t_posts, shifted, axis=1).astype(np.float32)
    block_prob = block_prob + (gathered * count).sum(axis=1)

    block_prob = np.clip(block_prob, 0.0, 1.0) ** 0.4  # power fudge factor
    wrong = (1.0 - block_prob) / 3.0

    qual_data[:] = wrong[:, None]
    np.put_along_axis(qual_data, base_to_emit[:, None], block_prob[:, None], axis=1)
    return qual_data


def beam_search_decode(
    scores: np.ndarray,
    back_guides: np.ndarray,
    posts: np.ndarray,
    beam_width: int = 32,
    beam_cut: float = 100.0,
    fixed_stay_score: float = 2.0,
    q_shift: float = 0.0,
    q_scale: float = 1.0,
) -> DecodedChunk:
    states, moves, qual_data, _ = beam_search(
        np.asarray(scores),
        np.asarray(back_guides, dtype=np.float32),
        np.asarray(posts, dtype=np.float32),
        beam_width,
        beam_cut,
        fixed_stay_score,
    )
    seq, qstring = generate_sequence(moves, states, qual_data, q_shift, q_scale)
    return DecodedChunk(sequence=seq, qstring=qstring, moves=moves)
