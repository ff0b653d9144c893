"""Poly(A) tail estimation — golden parity against the reference's checked-in
test cases (tests/PolyACalculatorTest.cpp:35-37: expected tail lengths per
fixture directory, model stride 5)."""

from pathlib import Path

import numpy as np
import pytest

from dorado_tpu.io.tensor_file import load_tensor
from dorado_tpu.polytail import PolyTailConfig, make_calculator
from dorado_tpu.polytail.calculator import ReadContext

DATA = Path("/root/reference/tests/data/poly_a")

CASES = [
    (134, "r9_rev_cdna", False),
    (32, "r10_fwd_cdna", False),
    (39, "rna002", True),
    (76, "rna004", True),
]


def _load_case(name: str) -> ReadContext:
    d = DATA / name
    seq = (d / "seq.txt").read_text().strip()
    moves = np.frombuffer((d / "moves.bin").read_bytes(), dtype=np.uint8)
    signal = load_tensor(d / "signal.tensor").astype(np.float32)
    return ReadContext(seq=seq, moves=moves, signal=signal, stride=5)


@pytest.mark.parametrize("expected,name,is_rna", CASES)
def test_golden_tail_lengths(expected, name, is_rna):
    read = _load_case(name)
    calc = make_calculator(is_rna=is_rna, is_rna_adapter=False)
    result = calc.calculate_num_bases(read)
    assert result.num_bases == expected


def test_no_anchor_returns_empty():
    rng = np.random.RandomState(0)
    seq = "".join(rng.choice(list("ACGT"), 400))
    moves = np.zeros(400, dtype=np.uint8)
    moves[:: max(1, 400 // len(seq))] = 1
    read = ReadContext(seq=seq, moves=moves, signal=rng.randn(2000).astype(np.float32), stride=5)
    calc = make_calculator(is_rna=False)
    result = calc.calculate_num_bases(read)
    assert result.num_bases == -1


class TestPolyTailConfigFile:
    def test_parse_with_overrides(self, tmp_path):
        p = tmp_path / "cfg.toml"
        p.write_text(
            '[anchors]\nfront_primer = "AAGGTT"\nrear_primer = "CCTTAA"\n'
            'primer_window = 120\n'
            '[threshold]\nflank_threshold = 0.7\n'
            '[tail]\ntail_interrupt_length = 5\n'
            '[[overrides]]\nbarcode_id = "barcode02"\n'
            '[overrides.threshold]\nflank_threshold = 0.9\n'
        )
        from dorado_tpu.polytail import load_poly_tail_config, load_poly_tail_configs

        cfgs = load_poly_tail_configs(p)
        assert cfgs[""].front_primer == "AAGGTT"
        assert cfgs[""].flank_threshold == 0.7
        assert cfgs[""].tail_interrupt_length == 5
        assert cfgs[""].primer_window == 120
        # override inherits the default and changes one field
        assert cfgs["barcode02"].flank_threshold == 0.9
        assert cfgs["barcode02"].front_primer == "AAGGTT"
        assert load_poly_tail_config(p).flank_threshold == 0.7

    def test_plasmid_and_errors(self, tmp_path):
        import pytest as _pytest

        p = tmp_path / "cfg.toml"
        p.write_text(
            '[anchors]\nplasmid_front_flank = "ACGT"\nplasmid_rear_flank = "TTTT"\n'
        )
        from dorado_tpu.polytail import load_poly_tail_config
        from dorado_tpu.polytail.calculator import load_poly_tail_configs

        cfg = load_poly_tail_config(p)
        assert cfg.is_plasmid and cfg.flank_threshold == 0.85
        p.write_text('[anchors]\nfront_primer = "ACGT"\n')  # missing rear
        with _pytest.raises(ValueError):
            load_poly_tail_config(p)
        p.write_text('[[overrides]]\nbarcode_id = ""\n')
        with _pytest.raises(ValueError):
            load_poly_tail_configs(p)


class TestPolyTailSelector:
    """PolyTailCalculatorSelector semantics (poly_tail_calculator_selector.cpp:46-82)."""

    def _configs(self):
        from dorado_tpu.polytail import PolyTailConfig

        default = PolyTailConfig(primer_window=150)
        bc1 = PolyTailConfig(primer_window=99)
        disabled = PolyTailConfig(enabled=False)
        return {"": default, "SQK-PCB114-24_barcode01": bc1,
                "SQK-PCB114-24_barcode02": disabled}

    def test_barcode_lookup_and_default(self):
        from dorado_tpu.polytail import PolyTailCalculatorSelector

        sel = PolyTailCalculatorSelector(self._configs())
        assert sel.get_calculator("SQK-PCB114-24_barcode01").config.primer_window == 99
        # unknown barcode falls back to the default config
        assert sel.get_calculator("SQK-PCB114-24_barcode07").config.primer_window == 150
        # no barcode at all (barcoding not run) -> default
        assert sel.get_calculator(None).config.primer_window == 150

    def test_unclassified_with_overrides_gets_none(self):
        from dorado_tpu.demux.barcoder import UNCLASSIFIED
        from dorado_tpu.polytail import PolyTailCalculatorSelector

        sel = PolyTailCalculatorSelector(self._configs())
        assert sel.get_calculator(UNCLASSIFIED) is None
        # ...but with no overrides, unclassified uses the default
        sel2 = PolyTailCalculatorSelector(None)
        assert sel2.get_calculator(UNCLASSIFIED) is not None

    def test_disabled_config_gets_none(self):
        from dorado_tpu.polytail import PolyTailCalculatorSelector

        sel = PolyTailCalculatorSelector(self._configs())
        assert sel.get_calculator("SQK-PCB114-24_barcode02") is None

    def test_status_enabled_parsed(self, tmp_path):
        p = tmp_path / "cfg.toml"
        p.write_text(
            '[[overrides]]\nbarcode_id = "kit_barcode01"\n'
            '[overrides.status]\nenabled = false\n'
        )
        from dorado_tpu.polytail import load_poly_tail_configs

        cfgs = load_poly_tail_configs(p)
        assert cfgs[""].enabled is True
        assert cfgs["kit_barcode01"].enabled is False


class TestPlasmid:
    """Plasmid flank anchor semantics (plasmid_poly_tail_calculator.cpp:22-120):
    both flanks searched anywhere in the read, FORWARD anchor at the front
    flank's end, BACKWARD anchor at the rear flank's start, two anchors when
    the flanks appear out of order (tail split across the junction)."""

    FRONT = "CCGGTTAACCGGTTGC"  # no trailing A
    REAR = "GGCCAATTGGCCAATT"  # no leading A

    @staticmethod
    def _ctx(seq: str) -> ReadContext:
        # one base every 2 strides -> samples_per_base = 10, stride 5
        moves = np.zeros(2 * len(seq), dtype=np.uint8)
        moves[::2] = 1
        signal = np.zeros(10 * len(seq), dtype=np.float32)
        return ReadContext(seq=seq, moves=moves, signal=signal, stride=5)

    @classmethod
    def _calc(cls):
        from dorado_tpu.polytail.calculator import PlasmidPolyTailCalculator

        cfg = PolyTailConfig(
            front_primer=cls.FRONT,
            rear_primer=cls.REAR,
            is_plasmid=True,
            flank_threshold=0.85,
        )
        calc = make_calculator(cfg)
        assert isinstance(calc, PlasmidPolyTailCalculator)
        return calc

    def test_forward_single_anchor(self):
        filler = "ACGTAG" * 20
        seq = filler + self.FRONT + "A" * 40 + self.REAR + filler
        read = self._ctx(seq)
        info = self._calc().determine_signal_anchor_and_strand(read)
        # in-order flanks -> NOT split -> one FORWARD anchor at front end
        assert len(info) == 1
        assert info[0].search_dir == "forward"
        front_end = len(filler) + len(self.FRONT) - 1  # inclusive last base
        assert info[0].signal_anchor == front_end * 10
        assert info[0].trailing_adapter_bases == 0

    def test_split_tail_two_anchors(self):
        filler = "ACGTAG" * 40
        seq = "A" * 25 + self.REAR + filler + self.FRONT + "A" * 15
        read = self._ctx(seq)
        info = self._calc().determine_signal_anchor_and_strand(read)
        # rear before front -> junction-split tail -> both anchors
        assert len(info) == 2
        assert info[0].search_dir == "forward"
        front_end = len(seq) - 15 - 1
        assert info[0].signal_anchor == front_end * 10
        assert info[1].search_dir == "backward"
        assert info[1].signal_anchor == 25 * 10

    def test_reverse_strand(self):
        from dorado_tpu.utils import reverse_complement

        filler = "ACGTAG" * 20
        fwd = filler + self.FRONT + "A" * 40 + self.REAR + filler
        seq = reverse_complement(fwd)
        read = self._ctx(seq)
        info = self._calc().determine_signal_anchor_and_strand(read)
        assert len(info) == 1
        assert info[0].search_dir == "forward"
        # rc(rear) sits where rear was, mirrored: it ends at the mirror of
        # rear's start
        rear_start_fwd = len(filler) + len(self.FRONT) + 40
        front_end_rev = len(seq) - 1 - rear_start_fwd
        assert info[0].signal_anchor == front_end_rev * 10

    def test_trailing_tail_bases_counted(self):
        front = "CCGGTTCCGGAAAA"  # 4 trailing A
        rear = "AAGGCCTTGGCCTT"  # 2 leading A
        cfg = PolyTailConfig(
            front_primer=front, rear_primer=rear, is_plasmid=True, flank_threshold=0.85
        )
        calc = make_calculator(cfg)
        filler = "CGTCGA" * 20
        seq = filler + front + "A" * 40 + rear + filler
        info = calc.determine_signal_anchor_and_strand(self._ctx(seq))
        assert len(info) == 1 and info[0].trailing_adapter_bases == 4
        # split orientation picks up the rear anchor's leading-A count
        seq2 = "A" * 25 + rear + "CGTCGA" * 40 + front + "A" * 15
        info2 = calc.determine_signal_anchor_and_strand(self._ctx(seq2))
        assert len(info2) == 2 and info2[1].trailing_adapter_bases == 2

    def test_no_flanks_no_anchor(self):
        seq = "ACGTAG" * 60
        info = self._calc().determine_signal_anchor_and_strand(self._ctx(seq))
        assert info == []
