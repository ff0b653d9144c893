"""Duplex modified-base calling.

Mirrors ModBaseCallerNode::duplex_mod_call
(dorado/read_pipeline/nodes/ModBaseCallerNode.cpp:155-300): each strand's
simplex signal is re-used by realigning its move table onto the duplex
consensus (template direction: duplex as-is; complement direction: the
reverse-complemented duplex against the original-orientation complement
call), the
modbase models run on the realigned windows, and per-direction hit
probabilities merge into one [len(duplex) * num_states] tensor. Complement
-direction hits land at reverse-complemented duplex positions with the
channel offsets already indexed by the RC base (ModBaseCallerNode.cpp:552-560).
"""

from __future__ import annotations

import numpy as np

from dorado_tpu.utils import reverse_complement

_MATCH, _INSERT, _DELETE, _MISMATCH = 0, 1, 2, 3


def realign_moves(
    query_seq: str, target_seq: str, moves: np.ndarray
) -> tuple[int, int, np.ndarray]:
    """Remap a move table from ``query_seq`` (the simplex call the signal
    belongs to) onto ``target_seq`` (the duplex consensus).

    Returns (old_moves_offset, target_start, new_moves): the block offset
    into the old move table where the remapped window starts, the offset
    into ``target_seq`` of the first remapped base, and the new move table
    (one entry per signal block of the window). (-1, -1, empty) when no
    usable alignment exists — parity with utils::realign_moves
    (dorado/utils/sequence_utils.cpp:327-440), with the native banded
    aligner standing in for the minimap2-overlap + edlib pair.
    """
    from dorado_tpu.native import EDOP_MATCH, MODE_HW, align

    failed = (-1, -1, np.zeros(0, np.uint8))
    moves = np.asarray(moves, np.uint8)
    if not query_seq or not target_seq or not moves.any():
        return failed

    # infix alignment of the duplex consensus inside the simplex read
    # (free gaps at the simplex ends; the duplex span is covered by both
    # strands, so it sits inside each strand's basecall)
    try:
        res = align(target_seq, query_seq, mode=MODE_HW)
    except Exception:
        return failed
    ops = np.asarray(res.ops, np.uint8)
    if len(ops) == 0:
        return failed

    # advance to the first exactly-matching base (sequence_utils.cpp:351-358)
    di = 0  # position in target_seq (duplex)
    si = int(res.t_start)  # position in query_seq (simplex)
    k = 0
    while k < len(ops) and ops[k] != EDOP_MATCH:
        op = ops[k]
        if op == _MISMATCH:
            di += 1
            si += 1
        elif op == _INSERT:  # target(duplex)-consumed only
            di += 1
        else:  # query(simplex)-consumed only
            si += 1
        k += 1
    if k == len(ops):
        return failed
    target_start = di

    ones = np.flatnonzero(moves)
    if si >= len(ones):
        return failed
    old_moves_offset = int(ones[si])

    # walk the alignment, rebuilding the move table in duplex space
    # (sequence_utils.cpp:383-437 cursor logic, including the post-insertion
    # resync that lets an inserted duplex base borrow neighbouring signal)
    new_moves: list[int] = []
    old_cursor = old_moves_offset
    n_old = len(moves)
    for op in ops[k:]:
        if op == _MATCH or op == _MISMATCH:
            new_moves.append(1)
            old_cursor += 1
            while old_cursor < n_old and moves[old_cursor] == 0:
                if old_cursor < old_moves_offset + len(new_moves):
                    old_cursor += 1  # resync after an earlier insertion
                else:
                    new_moves.append(0)
                    old_cursor += 1
        elif op == _INSERT:  # duplex base with no simplex counterpart
            new_moves.append(1)
        else:  # simplex base with no duplex counterpart: blocks become stays
            new_moves.append(0)
            old_cursor += 1
            while old_cursor < n_old and moves[old_cursor] == 0:
                new_moves.append(0)
                old_cursor += 1
    return old_moves_offset, target_start, np.asarray(new_moves, np.uint8)


def call_duplex_mods(
    caller,
    duplex_seq: str,
    stride: int,
    template_seq: str,
    template_moves: np.ndarray,
    template_signal: np.ndarray,
    complement_seq: str,
    complement_moves: np.ndarray,
    complement_signal: np.ndarray,
) -> np.ndarray:
    """Modified-base probabilities for a duplex read, both directions.

    All three complement inputs are in the complement call's ORIGINAL
    orientation — the complement direction aligns the reverse-complemented
    duplex onto the original complement call (the reference stores the
    stereo inputs RC'd/flipped and un-does both for the mod call,
    ModBaseCallerNode.cpp:188-208). Returns uint8
    [len(duplex_seq) * num_states], canonically initialised — the reference
    attaches base_mod_probs to every duplex read once mod models are
    loaded, even when a direction fails to realign or no motifs occur.
    Both directions' chunks run as ONE batched device call
    (caller.call_reads cross-read batching).
    """
    num_states = caller.info.num_states
    n = len(duplex_seq)
    from dorado_tpu.modbase.encode import sequence_to_ints

    probs = caller.init_canonical_probs(sequence_to_ints(duplex_seq))
    if n == 0:
        return probs

    prepared = []  # (PreparedRead-args consumed below)
    metas = []  # (is_template, t_start)
    for is_template in (True, False):
        if is_template:
            simplex_seq = template_seq
            simplex_moves = np.asarray(template_moves, np.uint8)
            simplex_signal = np.asarray(template_signal)
            duplex_dir = duplex_seq
        else:
            simplex_seq = complement_seq
            simplex_moves = np.asarray(complement_moves, np.uint8)
            simplex_signal = np.asarray(complement_signal)
            duplex_dir = reverse_complement(duplex_seq)

        moves_offset, t_start, new_moves = realign_moves(
            simplex_seq, duplex_dir, simplex_moves
        )
        if moves_offset < 0 or len(new_moves) == 0:
            continue
        sig_lo = moves_offset * stride
        window = np.ascontiguousarray(
            simplex_signal[sig_lo : sig_lo + len(new_moves) * stride]
        )
        # the window may be cut short at the signal end; trim the move table
        usable_blocks = len(window) // stride
        if usable_blocks == 0:
            continue
        new_moves = new_moves[:usable_blocks]
        window = window[: usable_blocks * stride]
        num_bases = int(new_moves.sum())
        if num_bases == 0:
            continue
        new_seq = duplex_dir[t_start : t_start + num_bases]
        prepared.append(caller.prepare_read(new_seq, new_moves, window))
        metas.append((is_template, t_start))

    if prepared:
        results = caller.call_reads(prepared)
        for result, (is_template, t_start) in zip(results, metas):
            for p in np.flatnonzero(result.motif_hits):
                if is_template:
                    dpos = t_start + int(p)
                else:
                    dpos = n - (int(p) + t_start + 1)
                if 0 <= dpos < n:
                    probs[dpos * num_states : (dpos + 1) * num_states] = (
                        result.base_mod_probs[
                            int(p) * num_states : (int(p) + 1) * num_states
                        ]
                    )
    return probs
