"""CRF decode tests: scans vs dense reference, Viterbi vs brute force,
beam search behaviour on planted paths."""

import numpy as np
import pytest

import jax.numpy as jnp

from dorado_tpu.decode import beam_search_decode, generate_sequence
from dorado_tpu.decode.beam_search import beam_search, crc32c_2bit, crc32c_32bit
from dorado_tpu.ops.crf_scan import (
    backward_scores,
    forward_scores,
    posterior_scores,
    predecessor_index,
    successor_index,
    viterbi_path,
)


def dense_transition_matrix(scores_t: np.ndarray, stay: float) -> np.ndarray:
    """[C] flat transition scores -> dense [S_from, S_to] matrix with -inf
    for disallowed transitions (independent construction used as oracle)."""
    c = scores_t.shape[-1]
    s = c // 4
    state_len = int(round(np.log(s) / np.log(4)))
    mat = np.full((s, s), -np.inf, dtype=np.float64)
    for p in range(s):
        for b in range(4):
            dest = ((p << 2) | b) & (s - 1)
            r = p >> (2 * (state_len - 1))  # dropped oldest base
            mat[p, dest] = scores_t[dest * 4 + r]
        mat[p, p] = max(mat[p, p], -np.inf)  # step may also map p->p; stay added below
    return mat


def dense_forward(scores: np.ndarray, stay: float) -> np.ndarray:
    from scipy.special import logsumexp

    t_len, c = scores.shape
    s = c // 4
    alpha = np.zeros((t_len + 1, s), dtype=np.float64)
    for t in range(t_len):
        mat = dense_transition_matrix(scores[t], stay)
        prev = alpha[t]
        stepped = prev[:, None] + mat  # [from, to]
        stay_sc = prev + stay
        alpha[t + 1] = np.logaddexp(logsumexp(stepped, axis=0), stay_sc)
    return alpha


def make_random_scores(rng, t_len, n, state_len):
    c = 4 ** (state_len + 1)
    return rng.standard_normal((t_len, n, c)).astype(np.float32)


class TestIndices:
    def test_predecessor_successor_duality(self):
        s = 64
        pred = predecessor_index(s)
        succ = successor_index(s)
        for st in range(s):
            for r in range(4):
                p = pred[st, r]
                assert st in succ[p]
            for b in range(4):
                d = succ[st, b]
                assert st in pred[d]


class TestScans:
    @pytest.mark.parametrize("state_len", [2, 3])
    def test_forward_matches_dense(self, state_len):
        rng = np.random.default_rng(0)
        scores = make_random_scores(rng, 12, 2, state_len)
        stay = 2.0
        got = np.asarray(forward_scores(jnp.asarray(scores), stay))
        for n in range(2):
            want = dense_forward(scores[:, n].astype(np.float64), stay)
            np.testing.assert_allclose(got[:, n], want, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("state_len", [2, 3])
    def test_backward_matches_reversed_forward_total(self, state_len):
        # total path mass from fwd at T equals from bwd at 0
        rng = np.random.default_rng(1)
        scores = make_random_scores(rng, 15, 3, state_len)
        stay = 2.0
        fwd = np.asarray(forward_scores(jnp.asarray(scores), stay))
        bwd = np.asarray(backward_scores(jnp.asarray(scores), stay))
        from scipy.special import logsumexp

        total_f = logsumexp(fwd[-1], axis=-1)
        total_b = logsumexp(bwd[0], axis=-1)
        np.testing.assert_allclose(total_f, total_b, rtol=1e-4)

        # fwd+bwd total is constant across time
        tot = logsumexp(fwd + bwd, axis=-1)
        np.testing.assert_allclose(tot, np.broadcast_to(tot[0], tot.shape), rtol=1e-4)

    def test_posteriors_normalised(self):
        rng = np.random.default_rng(2)
        scores = make_random_scores(rng, 10, 2, 2)
        posts, bwd = posterior_scores(jnp.asarray(scores), 2.0)
        np.testing.assert_allclose(np.asarray(posts).sum(-1), 1.0, rtol=1e-5)


def plant_path(rng, t_len, state_len, boost=50.0):
    """Scores with one dominant valid path; returns (scores [T,C], states, moves)."""
    s = 4**state_len
    c = s * 4
    scores = rng.standard_normal((t_len, c)).astype(np.float32) * 0.1
    states = np.zeros(t_len, dtype=np.int64)
    moves = np.zeros(t_len, dtype=np.uint8)
    state = int(rng.integers(s))
    for t in range(t_len):
        if t == 0 or rng.random() < 0.7:
            base = int(rng.integers(4))
            new_state = ((state << 2) | base) & (s - 1)
            r = state >> (2 * (state_len - 1))
            scores[t, new_state * 4 + r] += boost
            moves[t] = 1
            state = new_state
        else:
            moves[t] = 0  # stay: no score to boost (fixed stay score)
            # suppress all steps at this t so the stay wins
            scores[t] -= boost
        states[t] = state
    return scores, states, moves


class TestViterbi:
    def test_recovers_planted_path(self):
        rng = np.random.default_rng(3)
        scores, want_states, want_moves = plant_path(rng, 25, 2)
        st, mv = viterbi_path(jnp.asarray(scores[:, None, :]), 2.0)
        np.testing.assert_array_equal(np.asarray(st)[:, 0], want_states)
        np.testing.assert_array_equal(np.asarray(mv)[:, 0], want_moves)

    def test_batched(self):
        rng = np.random.default_rng(4)
        chunks = [plant_path(rng, 20, 2) for _ in range(3)]
        scores = np.stack([c[0] for c in chunks], axis=1)
        st, mv = viterbi_path(jnp.asarray(scores), 2.0)
        for i, (sc, ws, wm) in enumerate(chunks):
            np.testing.assert_array_equal(np.asarray(st)[:, i], ws)
            np.testing.assert_array_equal(np.asarray(mv)[:, i], wm)


class TestCrc32c:
    def test_2bit_equals_bitwise(self):
        def bitwise(crc, new_bits, n):
            for _ in range(n):
                b = (new_bits ^ crc) & 1
                crc >>= 1
                if b:
                    crc ^= 0x82F63B78
                new_bits >>= 1
            return crc

        rng = np.random.default_rng(5)
        for _ in range(50):
            crc = int(rng.integers(0, 2**32))
            bits = int(rng.integers(0, 4))
            got = int(crc32c_2bit(np.asarray([crc], dtype=np.uint32), np.asarray([bits]))[0])
            assert got == bitwise(crc, bits, 2)

    def test_32bit_equals_bitwise(self):
        def bitwise(crc, new_bits, n):
            for _ in range(n):
                b = (new_bits ^ crc) & 1
                crc >>= 1
                if b:
                    crc ^= 0x82F63B78
                new_bits >>= 1
            return crc

        rng = np.random.default_rng(6)
        for _ in range(20):
            crc = int(rng.integers(0, 2**32))
            word = int(rng.integers(0, 2**32))
            got = int(crc32c_32bit(crc, word))
            assert got == bitwise(crc, word, 32)

    def test_hash_path_dependence(self):
        # same end state via different sequences -> different hashes
        h1 = crc32c_2bit(crc32c_2bit(np.uint32(1), 0), 1)
        h2 = crc32c_2bit(crc32c_2bit(np.uint32(1), 1), 1)
        assert int(h1) != int(h2)


class TestBeamSearch:
    def test_recovers_planted_path(self):
        rng = np.random.default_rng(7)
        scores, want_states, want_moves = plant_path(rng, 30, 2)
        sj = jnp.asarray(scores[:, None, :])
        posts, bwd = posterior_scores(sj, 2.0)
        states, moves, qual, score = beam_search(
            scores,
            np.asarray(bwd)[:, 0],
            np.asarray(posts)[:, 0],
            beam_width=16,
            beam_cut=100.0,
            fixed_stay_score=2.0,
        )
        np.testing.assert_array_equal(states, want_states)
        np.testing.assert_array_equal(moves, want_moves)
        assert qual.shape == (30, 4)
        assert np.all(qual >= 0) and np.all(qual <= 1)

    def test_decode_produces_sequence(self):
        rng = np.random.default_rng(8)
        scores, want_states, want_moves = plant_path(rng, 40, 3)
        sj = jnp.asarray(scores[:, None, :])
        posts, bwd = posterior_scores(sj, 2.0)
        chunk = beam_search_decode(
            scores, np.asarray(bwd)[:, 0], np.asarray(posts)[:, 0], beam_width=32
        )
        assert len(chunk.sequence) == int(want_moves.sum())
        assert len(chunk.qstring) == len(chunk.sequence)
        assert set(chunk.sequence) <= set("ACGT")
        # sequence should match the planted path bases
        want_bases = "".join("ACGT"[s & 3] for s, m in zip(want_states, want_moves) if m)
        assert chunk.sequence == want_bases


class TestGenerateSequence:
    def test_qstring_formula(self):
        moves = np.array([1, 0, 1], dtype=np.uint8)
        states = np.array([2, 2, 9], dtype=np.int64)
        qual = np.zeros((3, 4), dtype=np.float32)
        qual[0] = [0.1, 0.1, 0.7, 0.1]  # base G (2)
        qual[1] = [0.05, 0.05, 0.85, 0.05]  # stay accumulates onto pos 0
        qual[2] = [0.0, 0.9, 0.05, 0.05]  # base C (1)
        seq, qstring = generate_sequence(moves, states, qual, shift=0.0, scale=1.0)
        assert seq == "GC"
        p0 = 1.0 - (0.7 + 0.85) / (1.0 + 1.0)
        q0 = np.clip(-10 * np.log10(p0), 1.0, 50.0)
        assert qstring[0] == chr(int(33.5 + q0))
        p1 = 1.0 - 0.9
        q1 = np.clip(-10 * np.log10(p1), 1.0, 50.0)
        assert qstring[1] == chr(int(33.5 + q1))
