"""Modified-base subsystem tests: config parsing (real reference configs),
motif matching, kmer encoding, scaler regression, chunking arithmetic, model
torch parity, caller end-to-end, MM/ML tags."""

from pathlib import Path

import jax
import numpy as np
import pytest

from dorado_tpu.modbase.caller import (
    ModBaseCaller,
    base_prob_offsets,
    get_chunk_starts,
    get_modbase_info,
    resolve_score_index,
)
from dorado_tpu.modbase.config import ModBaseModelType, load_modbase_config
from dorado_tpu.modbase.encode import (
    encode_kmer_chunk,
    moves_to_map,
    sequence_to_ints,
)
from dorado_tpu.modbase.model import (
    init_modbase_params,
    load_modbase_params,
    modbase_forward,
    save_modbase_params,
    stride_ratio,
)
from dorado_tpu.modbase.motif import MotifMatcher
from dorado_tpu.modbase.scaler import ModBaseScaler, index_from_int_kmer
from dorado_tpu.modbase.tags import generate_modbase_tags, modbase_threshold_uint8

REF_CONFIGS = Path("/root/reference/tests/data/model_configs")
V2_CFG = REF_CONFIGS / "dna_r10.4.1_e8.2_400bps_hac@v5.0.0_5mCG_5hmCG@v3"
V3_CFG = REF_CONFIGS / "dna_r10.4.1_e8.2_400bps_sup@v5.0.0_6mA@v4"


class TestConfig:
    def test_v2(self):
        cfg = load_modbase_config(V2_CFG)
        assert cfg.model_type is ModBaseModelType.CONV_LSTM_V2
        assert cfg.size == 256 and cfg.kmer_len == 9 and cfg.num_out == 3
        assert cfg.stride == 6
        assert cfg.mods.codes == ["h", "m"]
        assert cfg.mods.motif == "CG" and cfg.mods.base == "C"
        assert cfg.context.chunk_size == 192
        assert cfg.context.samples_before == 96
        assert cfg.refine.do_rough_rescale and cfg.refine.center_idx == 6
        assert cfg.is_chunked_input_model
        assert stride_ratio(cfg) == 1

    def test_v3(self):
        cfg = load_modbase_config(V3_CFG)
        assert cfg.model_type is ModBaseModelType.CONV_LSTM_V3
        assert cfg.mods.codes == ["a"]
        assert len(cfg.signal_encoder) == 3 and len(cfg.sequence_encoder) == 2
        assert stride_ratio(cfg) == 6


class TestMotif:
    def test_cg(self):
        hits = MotifMatcher("CG", 0).get_motif_hits("ACGTCGCG")
        assert hits == [1, 4, 6]

    def test_offset(self):
        hits = MotifMatcher("DRACH", 2).get_motif_hits("GGACTAAA")
        assert hits == [2]

    def test_overlapping(self):
        # overlapping motifs are all reported (reference advances by 1)
        hits = MotifMatcher("AA", 0).get_motif_hits("AAAA")
        assert hits == [0, 1, 2]


class TestEncode:
    def test_moves_to_map(self):
        moves = np.array([1, 0, 1, 1, 0], dtype=np.uint8)
        m = moves_to_map(moves, 6, 30)
        assert m.tolist() == [0, 12, 18, 30]

    def test_kmer_encoding_centered(self):
        int_seq = sequence_to_ints("ACGT")
        s2s = np.array([0, 2, 4, 6, 8], dtype=np.uint64)
        enc = encode_kmer_chunk(int_seq, s2s, 3, 8, kmer_centered=True)
        assert enc.shape == (8, 12)
        # sample 0 belongs to base 0 ('A'); centered 3-mer is [N, A, C]
        row = enc[0].reshape(3, 4)
        assert row[0].tolist() == [0, 0, 0, 0]  # N
        assert row[1].tolist() == [1, 0, 0, 0]  # A
        assert row[2].tolist() == [0, 1, 0, 0]  # C
        # samples 2,3 belong to base 1 ('C'): kmer [A, C, G]
        row = enc[2].reshape(3, 4)
        assert row[0].tolist() == [1, 0, 0, 0]
        assert row[1].tolist() == [0, 1, 0, 0]
        assert row[2].tolist() == [0, 0, 1, 0]

    def test_kmer_index(self):
        # "ACGT" with first base most significant: 0*64 + 1*16 + 2*4 + 3
        idx = index_from_int_kmer(np.array([[0, 1, 2, 3]]), 4)
        assert idx[0] == 27


class TestScaler:
    def test_identity_when_matching(self):
        rng = np.random.RandomState(0)
        kmer_len = 3
        levels = rng.randn(4**kmer_len).astype(np.float32)
        scaler = ModBaseScaler(levels, kmer_len, 1)
        seq = rng.randint(0, 4, 200)
        seq_levels = scaler.extract_levels(seq)
        # signal whose base midpoints equal the expected levels
        s2s = np.arange(0, 2 * (len(seq) + 1), 2, dtype=np.uint64)
        signal = np.repeat(seq_levels, 2).astype(np.float32)
        offset, scale = scaler.calc_offset_scale(signal, s2s, seq_levels)
        assert abs(scale - 1.0) < 0.05
        assert abs(offset) < 0.05


class TestChunking:
    def test_chunk_contains_hit_context(self):
        hits = np.array([500, 520, 2000])
        chunks = get_chunk_starts(4000, hits, 192, 96, 96)
        assert chunks[0] == (404, 0)
        # all hits covered: each hit must be in some chunk with full context
        for h in hits:
            assert any(
                st <= h - 0 and h <= st + 192 - 96 or st <= h for st, _ in chunks
            )

    def test_resolve_score_index(self):
        # hit exactly at context start -> index 0
        assert resolve_score_index(404 + 96, 404, 3, 192, 96, 96, 6) == 96 // 6 * 3
        # stride-aligned hit inside the context window
        assert resolve_score_index(404 + 102, 404, 3, 192, 96, 3, 6) == 102 // 6 * 3
        # hit too close to chunk end -> -2 (handled by the next chunk)
        assert resolve_score_index(404 + 186, 404, 3, 192, 96, 96, 6) == -2
        # hit with incomplete lead-in context -> -1 (handled by previous chunk)
        assert resolve_score_index(404 + 90, 404, 3, 192, 96, 96, 6) == -1

    def test_info_and_offsets(self):
        cfg = load_modbase_config(V2_CFG)
        info = get_modbase_info([cfg])
        assert info.alphabet == ["A", "C", "h", "m", "G", "T"]
        assert info.num_states == 6
        # context slots are per canonical base A:C:G:T; CG sits in the C slot
        assert info.context == "_:XG:_:_"
        assert base_prob_offsets(info) == [0, 1, 4, 5]


class TestModel:
    @pytest.fixture(scope="class")
    def v2_cfg(self):
        return load_modbase_config(V2_CFG)

    def test_forward_shapes(self, v2_cfg):
        params = init_modbase_params(v2_cfg, jax.random.PRNGKey(0))
        sigs = np.random.RandomState(0).randn(2, 192).astype(np.float32)
        seqs = np.zeros((2, 192, 36), dtype=np.int8)
        out = np.asarray(modbase_forward(params, sigs, seqs, v2_cfg))
        assert out.shape == (2, (192 // 6) * 3)
        s = out.reshape(2, 32, 3).sum(axis=-1)
        np.testing.assert_allclose(s, 1.0, atol=1e-5)

    def test_torch_parity(self, v2_cfg):
        torch = pytest.importorskip("torch")
        params = init_modbase_params(v2_cfg, jax.random.PRNGKey(1))
        rng = np.random.RandomState(1)
        sigs = rng.randn(2, 192).astype(np.float32)
        seqs = (rng.rand(2, 192, 36) < 0.3).astype(np.int8)
        ours = np.asarray(modbase_forward(params, sigs, seqs, v2_cfg))

        def t(a):
            return torch.from_numpy(np.asarray(a))

        def conv(x, p, stride, pad):
            w = t(p["w"]).permute(2, 1, 0).contiguous()
            return torch.nn.functional.conv1d(x, w, t(p["b"]), stride=stride, padding=pad)

        x = t(sigs)[:, None, :]
        x = torch.nn.functional.silu(conv(x, params["sig_convs"][0], 1, 2))
        x = torch.nn.functional.silu(conv(x, params["sig_convs"][1], 1, 2))
        x = torch.nn.functional.silu(conv(x, params["sig_convs"][2], 6, 4))
        s = t(seqs).float().permute(0, 2, 1)
        s = torch.nn.functional.silu(conv(s, params["seq_convs"][0], 1, 2))
        s = torch.nn.functional.silu(conv(s, params["seq_convs"][1], 6, 6))
        z = torch.cat([x, s], dim=1)
        z = torch.nn.functional.silu(conv(z, params["merge_conv"], 1, 2))
        z = z.permute(2, 0, 1)  # TNC

        def lstm(z, p):
            m = torch.nn.LSTM(z.shape[-1], z.shape[-1])
            m.weight_ih_l0.data = t(p["w_ih"])
            m.weight_hh_l0.data = t(p["w_hh"])
            m.bias_ih_l0.data = t(p["b_ih"])
            m.bias_hh_l0.data = t(p["b_hh"])
            return m(z)[0]

        z = torch.nn.functional.silu(lstm(z, params["lstm1"])).flip(0)
        z = torch.nn.functional.silu(lstm(z, params["lstm2"])).flip(0)
        z = z.permute(1, 0, 2)
        z = z @ t(params["fc"]["w"]).T + t(params["fc"]["b"])
        ref = z.softmax(2).flatten(1).detach().numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_weight_roundtrip(self, v2_cfg, tmp_path):
        import dataclasses

        params = init_modbase_params(v2_cfg, jax.random.PRNGKey(2))
        cfg = dataclasses.replace(v2_cfg, model_path=tmp_path)
        save_modbase_params(cfg, params, tmp_path)
        loaded = load_modbase_params(cfg)
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)
        ):
            np.testing.assert_array_equal(np.asarray(a), b)


class TestCaller:
    def test_call_read(self):
        cfg = load_modbase_config(V2_CFG)
        params = init_modbase_params(cfg, jax.random.PRNGKey(0))
        caller = ModBaseCaller([cfg], [params], canonical_stride=6, batch_size=8)

        rng = np.random.RandomState(0)
        seq = "".join(rng.choice(list("ACGT"), 300))
        # moves: one move per base over 600 output positions
        t_out = 600
        moves = np.zeros(t_out, dtype=np.uint8)
        pos = np.sort(rng.choice(np.arange(1, t_out), len(seq) - 1, replace=False))
        moves[0] = 1
        moves[pos] = 1
        signal = rng.randn(t_out * 6).astype(np.float32)

        result = caller.call_read(seq, moves, signal)
        assert result.base_mod_probs.shape == (len(seq) * 6,)
        probs = result.base_mod_probs.reshape(len(seq), 6)
        # every CG hit position should have (C, h, m) probs summing near 256
        hits = [i for i in range(len(seq) - 1) if seq[i : i + 2] == "CG"]
        assert hits, "test sequence should contain CG motifs"
        called = 0
        for h in hits:
            assert result.motif_hits[h]
            row = probs[h, 1:4].astype(int)
            if row.sum() > 240:  # called hits carry a prob distribution
                called += 1
        assert called > len(hits) * 0.8
        # non-motif A positions keep one-hot canonical init
        for i in range(len(seq)):
            if seq[i] == "A":
                assert probs[i, 0] == 1 and probs[i, 1:].sum() == 0


class TestCrossReadBatching:
    """call_reads batches chunks across reads (ModBaseChunkCallerNode.cpp:174-290)."""

    def _make_reads(self, n, rng):
        reads = []
        for _ in range(n):
            ln = int(rng.randint(40, 120))
            seq = "".join(rng.choice(list("ACGT"), ln))
            t_out = ln * 2
            moves = np.zeros(t_out, dtype=np.uint8)
            pos = np.sort(rng.choice(np.arange(1, t_out), ln - 1, replace=False))
            moves[0] = 1
            moves[pos] = 1
            signal = rng.randn(t_out * 6).astype(np.float32)
            reads.append((seq, moves, signal))
        return reads

    def test_call_reads_matches_per_read(self):
        cfg = load_modbase_config(V2_CFG)
        params = init_modbase_params(cfg, jax.random.PRNGKey(0))
        caller = ModBaseCaller([cfg], [params], canonical_stride=6, batch_size=16)
        rng = np.random.RandomState(1)
        reads = self._make_reads(6, rng)

        solo = [caller.call_read(*r) for r in reads]
        batched = caller.call_reads([caller.prepare_read(*r) for r in reads])
        for a, b in zip(solo, batched):
            np.testing.assert_array_equal(a.base_mod_probs, b.base_mod_probs)
            np.testing.assert_array_equal(a.motif_hits, b.motif_hits)

    def test_scheduler_threads(self):
        from concurrent.futures import ThreadPoolExecutor

        from dorado_tpu.modbase.caller import ModBaseBatchScheduler

        cfg = load_modbase_config(V2_CFG)
        params = init_modbase_params(cfg, jax.random.PRNGKey(0))
        caller = ModBaseCaller([cfg], [params], canonical_stride=6, batch_size=64)
        rng = np.random.RandomState(2)
        reads = self._make_reads(8, rng)
        solo = [caller.call_read(*r) for r in reads]

        sched = ModBaseBatchScheduler(caller, timeout_s=0.05)
        try:
            with ThreadPoolExecutor(max_workers=4) as pool:
                futs = [
                    pool.submit(lambda r=r: sched.call(caller.prepare_read(*r)))
                    for r in reads
                ]
                results = [f.result() for f in futs]
        finally:
            sched.close()
        for a, b in zip(solo, results):
            np.testing.assert_array_equal(a.base_mod_probs, b.base_mod_probs)


class TestTags:
    def test_mm_ml(self):
        cfg = load_modbase_config(V2_CFG)
        info = get_modbase_info([cfg])
        seq = "ACGACGTT"
        n = info.num_states
        probs = np.zeros(len(seq) * n, dtype=np.uint8)
        mask = np.zeros(len(seq), dtype=bool)
        # mark the two C's (positions 1, 4) as motif hits with mod probs
        for pos, (h, m) in [(1, (200, 30)), (4, (10, 220))]:
            mask[pos] = True
            probs[pos * n + 2] = h
            probs[pos * n + 3] = m
        mm, ml, mn = generate_modbase_tags(seq, probs, info, mask, threshold=13)
        assert mn == len(seq)
        assert mm == "C+h?,0,0;C+m?,0,0;"
        assert ml.tolist() == [200, 10, 30, 220]

    def test_threshold(self):
        assert modbase_threshold_uint8(0.05) == 12
        assert modbase_threshold_uint8(1.0) == 255


def test_modbase_lstm_pallas_parity():
    """The TPU modbase path runs the recurrence in the fused Pallas scan
    (interpret mode here): it must match the lax.scan branch at modbase
    geometry — f32 activations, H=256, short T (the VMEM tile budget is
    itemsize-aware for the f32 case)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dorado_tpu.models.crf_model import lstm_layer

    rng = np.random.RandomState(0)
    h = 256
    p = {
        "w_ih": jnp.asarray(rng.randn(4 * h, h).astype(np.float32) * 0.1),
        "w_hh": jnp.asarray(rng.randn(4 * h, h).astype(np.float32) * 0.1),
        "b_ih": jnp.asarray(rng.randn(4 * h).astype(np.float32) * 0.1),
        "b_hh": jnp.asarray(rng.randn(4 * h).astype(np.float32) * 0.1),
    }
    x = jnp.asarray(rng.randn(3, 24, h).astype(np.float32))
    for reverse in (False, True):
        ref = np.asarray(lstm_layer(p, x, reverse=reverse, use_pallas=False))
        got = np.asarray(lstm_layer(p, x, reverse=reverse, use_pallas=True))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
