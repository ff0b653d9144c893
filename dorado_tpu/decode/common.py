"""Shared decode types and sequence/qstring materialisation.

Q-score semantics follow the reference
(dorado/basecall/decode/beam_search.cpp:54-102): per-block base probabilities
are accumulated at sequence positions via the move table, normalised against
the total probability mass, converted to Phred with the model's q_scale/q_shift
calibration and clamped to [1, 50].
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

ALPHABET = np.frombuffer(b"ACGT", dtype=np.uint8)


@dataclass
class DecoderOptions:
    beam_width: int = 32
    beam_cut: float = 100.0
    blank_score: float = 2.0
    q_shift: float = 0.0
    q_scale: float = 1.0


@dataclass
class DecodedChunk:
    sequence: str
    qstring: str
    moves: np.ndarray  # uint8 [T]


def generate_sequence(
    moves: np.ndarray,
    states: np.ndarray,
    qual_data: np.ndarray,
    shift: float,
    scale: float,
) -> tuple[str, str]:
    """Materialise (sequence, qstring) from a decoded lattice path.

    moves: [T] uint8; states: [T] int (low 2 bits = emitted base);
    qual_data: [T, 4] per-block probabilities (called base + 3 wrong bases).
    """
    moves = np.asarray(moves, dtype=np.int64)
    states = np.asarray(states, dtype=np.int64)
    seq_len = int(moves.sum())
    num_blocks = len(moves)

    bases = (states & 3).astype(np.int64)

    # Sequence position of each block: cumsum of moves - 1, clipped at 0 for
    # leading stays (block 0 always moves).
    seq_pos = np.cumsum(moves) - 1
    seq_pos = np.maximum(seq_pos, 0)

    # prob position per block: blk 0 at 0; later blocks at seqPos + (move-1)
    # which equals the position of the base this block belongs to.
    base_probs = np.zeros(seq_len, dtype=np.float32)
    total_probs = np.zeros(seq_len, dtype=np.float32)
    np.add.at(base_probs, seq_pos, qual_data[np.arange(num_blocks), bases])
    np.add.at(total_probs, seq_pos, qual_data.sum(axis=1))

    # Sequence bases: positions where move==1 emit `base`; move>1 cannot occur
    # for CRF models (move table is 0/1).
    seq_bases = bases[moves > 0]
    sequence = ALPHABET[seq_bases].tobytes().decode()

    with np.errstate(divide="ignore", invalid="ignore"):
        probs = 1.0 - base_probs / total_probs
        phred = -10.0 * np.log10(probs)
    qscore = np.clip(phred * scale + shift, 1.0, 50.0)
    qstring = (33.5 + qscore).astype(np.uint8).tobytes().decode()
    return sequence, qstring
