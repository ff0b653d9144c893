"""BED parsing + aligner bh-tag intersection (alignment/bed_file.cpp,
AlignerNode.cpp:252-265)."""

import numpy as np
import pytest

from dorado_tpu.alignment.bed_file import BedFile, BedFileError


def test_parse_basic(tmp_path):
    p = tmp_path / "r.bed"
    p.write_text(
        "browser position chr1\n"
        "track name=test\n"
        "# comment\n"
        "\n"
        "ctg1\t100\t200\n"
        "ctg1\t300\t400\n"
        "ctg2\t0\t50\n"
    )
    bed = BedFile.load(p)
    assert len(bed.entries["ctg1"]) == 2
    assert bed.entries["ctg2"][0].strand == "."
    assert bed.hits("ctg1", 150, 160, False) == 1
    assert bed.hits("ctg1", 150, 350, True) == 2
    assert bed.hits("ctg1", 200, 300, False) == 0  # half-open: no touch
    assert bed.hits("ctg3", 0, 10, False) == 0


def test_parse_stranded(tmp_path):
    p = tmp_path / "r.bed"
    p.write_text("ctg\t10\t90\tfeat\t0\t+\nctg\t10\t90\tfeat\t0\t-\n")
    bed = BedFile.load(p)
    assert bed.hits("ctg", 20, 30, False) == 1
    assert bed.hits("ctg", 20, 30, True) == 1


def test_parse_errors(tmp_path):
    p = tmp_path / "r.bed"
    p.write_text("ctg\t10\n")
    with pytest.raises(BedFileError):
        BedFile.load(p)
    p.write_text("ctg\t10\t20\nctg\t10\t20\tname\n")  # inconsistent
    with pytest.raises(BedFileError):
        BedFile.load(p)
    p.write_text("ctg\tx\t20\n")
    with pytest.raises(BedFileError):
        BedFile.load(p)
