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


def synthetic_squiggle(
    rng: np.random.RandomState,
    n_samples: int,
    kmer_len: int = 9,
    samples_per_base: float = 12.5,
    noise: float = 0.15,
) -> np.ndarray:
    """Pore-like synthetic signal: a random DNA sequence mapped through a
    fixed random k-mer -> current-level table, geometric dwell times around
    the hac rate (5 kHz / 400 bases/s = 12.5 samples/base), plus Gaussian
    noise — the squiggle structure (piecewise-constant levels, dwell
    autocorrelation) that shapes real CRF score statistics."""
    n_kmers = 4**kmer_len
    # deterministic level table from its own stream so signals with the
    # same seed share chemistry
    table_rng = np.random.RandomState(1234)
    levels = table_rng.randn(min(n_kmers, 1 << 18)).astype(np.float32)
    sig = np.empty(n_samples, np.float32)
    kmer = int(rng.randint(len(levels)))
    i = 0
    p_move = 1.0 / samples_per_base
    while i < n_samples:
        dwell = 1 + int(rng.geometric(p_move))
        dwell = min(dwell, n_samples - i)
        sig[i : i + dwell] = levels[kmer]
        i += dwell
        kmer = int(((kmer << 2) | int(rng.randint(4))) % len(levels))
    sig += rng.randn(n_samples).astype(np.float32) * noise
    return sig


def _truth_path(
    rng: np.random.RandomState, t_len: int, state_len: int, move_prob: float = 0.4
):
    """(true_seq, states [T], moves [T], margin positions [(t, c)]) —
    the same path process as synthetic_lattice, exposed so a caller can
    inject its own noise field."""
    num_states = 4**state_len
    mask = num_states - 1
    shift_hi = 2 * (state_len - 1)
    states = np.empty(t_len, dtype=np.int64)
    moves = np.zeros(t_len, dtype=np.uint8)
    pos = []
    prev = int(rng.randint(num_states))
    for t in range(t_len):
        if t == 0 or rng.rand() < move_prob:
            b = int(rng.randint(4))
            s = ((prev << 2) | b) & mask
            r = prev >> shift_hi
            pos.append((t, s * 4 + r))
            moves[t] = 1
            prev = s
        states[t] = prev
    seq = "".join("ACGT"[int(s) & 3] for s, m in zip(states, moves) if m)
    return seq, states, moves, pos


def run_model_score_study(
    margins=(3.0, 4.0, 5.0),
    n_chunks: int = 6,
    chunk: int = 3996,
    blank: float = 2.0,
    seed: int = 0,
) -> list[dict]:
    """Decoder comparison on lattices whose NOISE FIELD is produced by the
    REAL hac graph (random weights — real model downloads are
    environment-blocked) over synthetic squiggle signal, with a known
    truth path injected on top.

    Unlike run_study's iid N(0, sigma) lattices, the model-generated
    field carries the conv/LSTM-induced temporal correlation and the CRF
    head's actual cross-transition covariance — the properties VERDICT r3
    flagged as missing from the synthetic ranking. The field is z-scored
    per chunk (unit sigma) and the truth transition scores are raised by
    `margin`, exactly as in synthetic_lattice, so per-decoder accuracy
    against known truth is measurable alongside mutual divergence and
    qscores. Reference decode semantics: CPUDecoder.cpp:100-157."""
    import jax

    from dorado_tpu.models.crf_model import init_lstm_crf_params, lstm_crf_forward
    from dorado_tpu.models.presets import hac_v43_config

    config = hac_v43_config()
    params = init_lstm_crf_params(config, jax.random.PRNGKey(seed))
    rng = np.random.RandomState(seed)
    sig = np.stack(
        [synthetic_squiggle(rng, chunk) for _ in range(n_chunks)]
    )  # [N, T]
    field = np.asarray(
        lstm_crf_forward(params, sig, config), np.float32
    )  # [N, T_out, C]
    # z-score each chunk's field to unit sigma so `margin` means the same
    # thing as in run_study
    field = (field - field.mean(axis=(1, 2), keepdims=True)) / np.maximum(
        field.std(axis=(1, 2), keepdims=True), 1e-6
    )
    t_out = field.shape[1]

    rows = []
    for margin in margins:
        accs = {"viterbi": [], "beam": []}
        qs = {"viterbi": [], "beam": []}
        divs = []
        for i in range(n_chunks):
            path_rng = np.random.RandomState(seed * 777 + i)
            truth, _, _, pos = _truth_path(path_rng, t_out, config.state_len)
            scores = field[i].copy()
            for t, c in pos:
                scores[t, c] += margin
            out = _decode_both(scores, blank)
            for name, (s, q) in out.items():
                accs[name].append(_accuracy(s, truth))
                qs[name].append(_mean_phred(q))
            divs.append(align_divergence(out["viterbi"][0], out["beam"][0]))
        rows.append(
            {
                "margin": margin,
                "viterbi_acc": float(np.mean(accs["viterbi"])),
                "beam_acc": float(np.mean(accs["beam"])),
                "mutual_divergence": float(np.mean(divs)),
                "viterbi_q": float(np.mean(qs["viterbi"])),
                "beam_q": float(np.mean(qs["beam"])),
            }
        )
    return rows


def _observed_error(seqs: list[str], truths: list[str]) -> float:
    """Pooled per-base error rate vs truth, Laplace-smoothed so perfect
    samples yield a finite implied Q (the +1 keeps -10log10 defined)."""
    from dorado_tpu.native import align

    errors = sum(
        align(s, t).distance for s, t in zip(seqs, truths) if t
    )
    bases = sum(len(t) for t in truths)
    return (errors + 1) / (bases + 1)


def fit_qscore_shift(qstrings: list[str], seqs: list[str], truths: list[str]) -> float:
    """Fit the qbias-style shift that makes mean predicted error match the
    observed error rate on a calibration set.

    This is the mechanism the reference models ship: every config.toml
    carries trained `qbias`/`qscale` constants applied to the raw
    posterior-derived phreds (CRFModelConfig qbias/qscale; generate_sequence
    applies them the same way) — calibration is a TRAINED property of a
    model, not an emergent one. Random-weight lattices z-scored to unit
    sigma put the softmax at an arbitrary temperature, so their raw
    posteriors are systematically under-confident; one fitted shift
    transfers that correction to held-out chunks."""
    arrays = [
        np.frombuffer(qs.encode(), np.uint8).astype(np.float64) - 33.0
        for qs in qstrings
        if qs
    ]
    if not arrays:
        return 0.0  # nothing decoded on the calibration set: no correction
    q = np.concatenate(arrays)
    pred_err = np.power(10.0, -q / 10.0).mean()
    obs_err = _observed_error(seqs, truths)
    return float(10.0 * np.log10(pred_err / obs_err))


def run_calibration_study(
    margins=(3.0, 4.0, 5.0),
    n_chunks: int = 6,
    chunk: int = 3996,
    blank: float = 2.0,
    seed: int = 0,
) -> list[dict]:
    """Q-score calibration on model-generated lattices: fit the qbias-style
    shift on the first half of the chunks, evaluate mean Q vs
    accuracy-implied Q (-10*log10(err)) on the held-out second half.

    Returns rows {margin, acc, q_raw, q_cal, q_implied}: q_cal within ~2 Q
    of q_implied demonstrates the posterior ORDERING is sound and a single
    trained shift (what real models ship as qbias) calibrates it; q_raw
    shows the uncalibrated under-confidence the z-scored random-weight
    field induces."""
    import jax

    from dorado_tpu.models.crf_model import init_lstm_crf_params, lstm_crf_forward
    from dorado_tpu.models.presets import hac_v43_config

    config = hac_v43_config()
    params = init_lstm_crf_params(config, jax.random.PRNGKey(seed))
    rng = np.random.RandomState(seed)
    sig = np.stack([synthetic_squiggle(rng, chunk) for _ in range(n_chunks)])
    field = np.asarray(lstm_crf_forward(params, sig, config), np.float32)
    field = (field - field.mean(axis=(1, 2), keepdims=True)) / np.maximum(
        field.std(axis=(1, 2), keepdims=True), 1e-6
    )
    t_out = field.shape[1]
    half = max(1, n_chunks // 2)

    rows = []
    for margin in margins:
        seqs, quals, truths = [], [], []
        for i in range(n_chunks):
            path_rng = np.random.RandomState(seed * 777 + i)
            truth, _, _, pos = _truth_path(path_rng, t_out, config.state_len)
            scores = field[i].copy()
            for t, c in pos:
                scores[t, c] += margin
            out = _decode_both(scores, blank)
            s, q = out["viterbi"]
            seqs.append(s)
            quals.append(q)
            truths.append(truth)
        shift = fit_qscore_shift(quals[:half], seqs[:half], truths[:half])
        ev_q, ev_s, ev_t = quals[half:], seqs[half:], truths[half:]
        q_raw = np.concatenate(
            [
                np.frombuffer(q.encode(), np.uint8).astype(np.float64) - 33.0
                for q in ev_q
                if q
            ]
        )
        mean_q = lambda q: float(  # noqa: E731
            -10.0 * np.log10(max(np.power(10.0, -q / 10.0).mean(), 1e-30))
        )
        obs_err = _observed_error(ev_s, ev_t)
        rows.append(
            {
                "margin": margin,
                "acc": 1.0 - obs_err,
                "q_raw": mean_q(q_raw),
                "q_cal": mean_q(q_raw + shift),
                "q_implied": float(-10.0 * np.log10(obs_err)),
                "shift": shift,
            }
        )
    return rows


def align_divergence(a: str, b: str) -> float:
    """1 - identity between two decoded sequences (edit distance / len)."""
    from dorado_tpu.native import align

    if not b:
        return 0.0 if not a else 1.0
    return align(a, b).distance / len(b)


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
    print("\nmodel-generated noise field (real hac graph over squiggle):")
    print(
        f"{'margin':>6} {'viterbi_acc':>12} {'beam_acc':>12} "
        f"{'divergence':>11} {'viterbi_q':>10} {'beam_q':>8}"
    )
    for row in run_model_score_study():
        print(
            f"{row['margin']:>6.1f} {row['viterbi_acc']:>12.5f} "
            f"{row['beam_acc']:>12.5f} {row['mutual_divergence']:>11.5f} "
            f"{row['viterbi_q']:>10.2f} {row['beam_q']:>8.2f}"
        )


if __name__ == "__main__":
    main()
