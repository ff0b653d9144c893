"""Decoder accuracy study: exact Viterbi vs reference beam search.

The reference ships beam search (width 32) as its only GPU decoder
(dorado/basecall/decode/CUDADecoder.cpp:77-106, DecodedChunk.h:16-24); this
framework additionally has an exact Viterbi decoder that runs ~7x faster on
TPU (the serial beam-candidate logic is latency-bound; the Viterbi max-scan
is a dense fused Pallas pass). Choosing the shipping default requires an
accuracy comparison, and real model weights are not downloadable in this
environment — so this module measures both decoders against *known truth* on
synthetic CRF lattices:

  - draw a ground-truth state path through the 4^state_len lattice
    (geometric dwell times, exactly like a nanopore move table);
  - emit transition scores = N(0, sigma) noise, with the true transition's
    score raised by a margin (the stay transition keeps the model's fixed
    blank score, as in the real lattice — CPUDecoder.cpp:47-66);
  - decode with (a) the exact Viterbi path (ops/crf_scan.viterbi_path) and
    (b) the bit-exact C++ reference beam search (native/beam.cpp, verified
    against beam_search.cpp:126-520);
  - score each decoder's sequence against the truth with unit-cost edit
    distance (native/align.cpp) and report per-decoder accuracy, mutual
    identity, and qscore distributions.

Run `python -m dorado_tpu.decode.accuracy` for the study table that
docs/decoder_choice.md records; tests/test_decoder_choice.py asserts the
ranking holds.
"""

from __future__ import annotations

import numpy as np


def synthetic_lattice(
    rng: np.random.RandomState,
    t_len: int,
    state_len: int = 4,
    margin: float = 5.0,
    sigma: float = 1.0,
    move_prob: float = 0.4,
):
    """Returns (scores [T, C] f32, true_seq str, true_states [T], true_moves [T]).

    move_prob ~ bases per signal block; the hac model averages ~0.4
    (stride-6 blocks at ~400 bases/s, 5 kHz sampling).
    """
    num_states = 4**state_len
    mask = num_states - 1
    shift_hi = 2 * (state_len - 1)

    states = np.empty(t_len, dtype=np.int64)
    moves = np.zeros(t_len, dtype=np.uint8)
    prev = int(rng.randint(num_states))  # fictitious t=-1 state
    scores = (rng.randn(t_len, num_states * 4) * sigma).astype(np.float32)
    for t in range(t_len):
        if t == 0 or rng.rand() < move_prob:
            b = int(rng.randint(4))
            s = ((prev << 2) | b) & mask
            r = prev >> shift_hi  # dropped oldest base
            scores[t, s * 4 + r] += margin
            states[t] = s
            moves[t] = 1
            prev = s
        else:
            states[t] = prev
            moves[t] = 0

    bases = states[moves > 0] & 3
    true_seq = np.frombuffer(b"ACGT", dtype=np.uint8)[bases].tobytes().decode()
    return scores, true_seq, states, moves


def _decode_both(scores: np.ndarray, blank: float, beam_width: int = 32):
    """Decode one chunk both ways. Returns dict name -> (seq, qstring)."""
    import jax.numpy as jnp

    from dorado_tpu.decode.common import generate_sequence
    from dorado_tpu.native import beam_search_native
    from dorado_tpu.ops.crf_scan import (
        backward_scores,
        forward_scores,
        viterbi_path,
    )

    t_len, c = scores.shape
    s_tnc = jnp.asarray(scores[:, None, :])
    alpha = forward_scores(s_tnc, blank)
    beta = backward_scores(s_tnc, blank)
    import jax

    posts = np.asarray(jax.nn.softmax(alpha + beta, axis=-1))[:, 0]  # [T+1, S]

    # exact Viterbi
    v_states, v_moves = (np.asarray(x)[:, 0] for x in viterbi_path(s_tnc, blank))
    from dorado_tpu.basecall.runner import _qual_data_from_posts_batch

    v_qual = _qual_data_from_posts_batch(
        v_states[None], posts[None], c // 4
    )[0]
    v_seq, v_q = generate_sequence(v_moves, v_states, v_qual, 0.0, 1.0)

    # reference beam (exact C++ oracle)
    b_states, b_moves, b_qual, _ = beam_search_native(
        scores, np.asarray(beta)[:, 0], posts, beam_width, 100.0, blank
    )
    b_seq, b_q = generate_sequence(b_moves, b_states, b_qual, 0.0, 1.0)
    return {"viterbi": (v_seq, v_q), "beam": (b_seq, b_q)}


def _accuracy(decoded: str, truth: str) -> float:
    from dorado_tpu.native import align

    if not truth:
        return 1.0
    return 1.0 - align(decoded, truth).distance / len(truth)


def _mean_phred(qstring: str) -> float:
    if not qstring:
        return 0.0
    q = np.frombuffer(qstring.encode(), np.uint8).astype(np.float64) - 33.0
    # mean error probability -> phred, the reference's mean-qscore semantics
    err = np.power(10.0, -q / 10.0).mean()
    return float(-10.0 * np.log10(max(err, 1e-30)))


def run_study(
    sigmas=(1.0, 1.5, 2.0, 2.5, 3.0),
    n_chunks: int = 8,
    t_len: int = 600,
    state_len: int = 4,
    margin: float = 5.0,
    blank: float = 2.0,
    seed: int = 0,
) -> list[dict]:
    """Accuracy table across noise levels. Each row:
    {sigma, viterbi_acc, beam_acc, mutual_identity, viterbi_q, beam_q}."""
    rows = []
    for sigma in sigmas:
        accs = {"viterbi": [], "beam": []}
        qs = {"viterbi": [], "beam": []}
        mutual = []
        for i in range(n_chunks):
            rng = np.random.RandomState(seed * 1000 + int(sigma * 10) * 97 + i)
            scores, truth, _, _ = synthetic_lattice(
                rng, t_len, state_len, margin=margin, sigma=sigma
            )
            out = _decode_both(scores, blank)
            for name, (seq, q) in out.items():
                accs[name].append(_accuracy(seq, truth))
                qs[name].append(_mean_phred(q))
            v_seq = out["viterbi"][0]
            b_seq = out["beam"][0]
            mutual.append(
                1.0
                - (
                    _accuracy(v_seq, b_seq)
                    if b_seq
                    else (0.0 if v_seq else 1.0)
                )
            )
        rows.append(
            {
                "sigma": sigma,
                "viterbi_acc": float(np.mean(accs["viterbi"])),
                "beam_acc": float(np.mean(accs["beam"])),
                "mutual_divergence": float(np.mean(mutual)),
                "viterbi_q": float(np.mean(qs["viterbi"])),
                "beam_q": float(np.mean(qs["beam"])),
            }
        )
    return rows


def main() -> None:
    print(
        f"{'sigma':>5} {'viterbi_acc':>12} {'beam_acc':>12} "
        f"{'divergence':>11} {'viterbi_q':>10} {'beam_q':>8}"
    )
    for row in run_study():
        print(
            f"{row['sigma']:>5.1f} {row['viterbi_acc']:>12.5f} "
            f"{row['beam_acc']:>12.5f} {row['mutual_divergence']:>11.5f} "
            f"{row['viterbi_q']:>10.2f} {row['beam_q']:>8.2f}"
        )


if __name__ == "__main__":
    main()
