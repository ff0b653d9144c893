"""Custom barcode arrangement parsing against the reference's fixtures
(tests/data/barcode_demux/custom_barcodes/, expectations from
tests/CustomBarcodeParsingTest.cpp semantics)."""

from pathlib import Path

import numpy as np
import pytest

from dorado_tpu.demux import (
    BarcodeClassifier,
    add_custom_barcodes,
    parse_custom_arrangement,
    parse_custom_sequences,
)
from dorado_tpu.demux.custom_kit import check_normalized_id_pattern, parse_scoring_params

FIXTURES = Path("/root/reference/tests/data/barcode_demux/custom_barcodes")


def test_pattern_check():
    assert check_normalized_id_pattern("BC%02i")
    assert check_normalized_id_pattern("abcd%25i")
    assert not check_normalized_id_pattern("ab%02")
    assert not check_normalized_id_pattern("ab%02f")
    assert not check_normalized_id_pattern("ab02i")
    assert not check_normalized_id_pattern("ab%02iab")


def test_parse_single_ended():
    name, info = parse_custom_arrangement(FIXTURES / "test_kit_single_ended.toml")
    assert name == "test_kit_single_ended"
    assert info["name"] == "BC"
    assert info["barcodes"] == ["BC01", "BC02", "BC03", "BC04"]
    assert not info["double_ends"]
    assert not info["ends_different"]
    assert info["top_front_flank"] == "C"
    assert info["barcodes2"] == []


def test_parse_double_ended():
    name, info = parse_custom_arrangement(FIXTURES / "test_kit_double_ended.toml")
    assert len(info["barcodes"]) == 24
    assert len(info["barcodes2"]) == 24
    assert info["double_ends"]
    assert not info["ends_different"]


def test_parse_ends_different():
    for f in ("test_kit_ends_different_flanks.toml", "test_kit_ends_different_barcodes.toml"):
        _, info = parse_custom_arrangement(FIXTURES / f)
        assert info["double_ends"]
        assert info["ends_different"]


def test_bad_kits_rejected():
    with pytest.raises(ValueError):
        parse_custom_arrangement(FIXTURES / "bad_double_ended_kit.toml")
    with pytest.raises(ValueError):
        parse_custom_arrangement(FIXTURES / "bad_double_ended_kit_not_all_params_set.toml")


def test_scoring_params_override():
    params = parse_scoring_params(FIXTURES / "scoring_params.toml")
    assert params["max_barcode_penalty"] == 10
    assert params["min_separation_only_dist"] == 5
    assert params["front_barcode_window"] == 150
    # defaults untouched elsewhere
    assert params["midstrand_flank_score"] == 0.95
    # file without a [scoring] section keeps defaults
    defaults = parse_scoring_params(FIXTURES / "test_kit_single_ended.toml")
    assert defaults["max_barcode_penalty"] == 9


def test_parse_custom_sequences():
    seqs = parse_custom_sequences(FIXTURES / "test_sequences.fasta")
    assert seqs["CUSTOM-BC01"] == "AAAAAA"
    assert seqs["CUSTOM-BC04"] == "GGGGGG"


def test_classify_with_custom_kit():
    """End-to-end: custom arrangement + sequences classify a synthetic read."""
    kit_name, info = parse_custom_arrangement(FIXTURES / "test_kit_single_ended.toml")
    rng = np.random.RandomState(0)
    barcodes = {
        f"BC{i:02d}": "".join(rng.choice(list("ACGT"), 24)) for i in range(1, 5)
    }
    add_custom_barcodes(barcodes)
    classifier = BarcodeClassifier(kit_name, kit_info=info)
    read = (
        "".join(rng.choice(list("ACGT"), 10))
        + info["top_front_flank"]
        + barcodes["BC03"]
        + info["top_rear_flank"]
        + "".join(rng.choice(list("ACGT"), 300))
    )
    result = classifier.classify(read)
    assert result.barcode_name == "BC03"
