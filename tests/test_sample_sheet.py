"""SampleSheet parity against the reference's checked-in fixtures
(tests/data/sample_sheets/, expectations from tests/SampleSheetTests.cpp)."""

from pathlib import Path

import pytest

from dorado_tpu.utils.sample_sheet import SampleSheet, SampleSheetError

SHEETS = Path("/root/reference/tests/data/sample_sheets")


def test_no_barcode_sheet():
    ss = SampleSheet(str(SHEETS / "no_barcode.csv"))
    assert ss.type == "none"
    assert ss.get_alias("barcode10", "PAO25751", "pos_id", "") == ""
    assert ss.get_barcode_values() is None
    assert ss.barcode_is_permitted("barcode93")


def test_single_barcode_sheet_indexed():
    ss = SampleSheet(str(SHEETS / "single_barcode.csv"))
    assert ss.type == "barcode"
    assert ss.get_alias("barcode01", "PAO25751", "", "") == "patient_id_5"
    assert ss.get_alias("barcode08", "PAO25751", "", "") == "patient_id_4"
    assert ss.get_sample_type("barcode01", "PAO25751", "", "") == "test_sample"
    # wrong flow cell id -> no alias
    assert ss.get_alias("barcode01", "OTHER", "", "") == ""
    # missing required index -> no alias
    assert ss.get_alias("barcode01") == ""


def test_single_barcode_sheet_skip_index():
    ss = SampleSheet(str(SHEETS / "single_barcode.csv"), skip_index_matching=True)
    assert ss.get_alias("barcode01") == "patient_id_5"
    assert ss.get_alias("barcode08") == "patient_id_4"
    # kit-prefixed barcode names are trimmed (SampleSheet.cpp:221-225)
    assert ss.get_alias("SQK-RBK114-96_barcode05") == "patient_id_1"
    assert ss.get_sample_type("barcode02") == "test_sample"
    assert ss.get_barcode_values() == {f"barcode{i:02d}" for i in range(1, 9)}
    assert ss.barcode_is_permitted("barcode03")
    assert not ss.barcode_is_permitted("barcode55")


def test_invalid_sheet_rejected():
    # alias "barcode01" is forbidden
    with pytest.raises(SampleSheetError):
        SampleSheet(str(SHEETS / "invalid.csv"))


def test_valid_but_weird_loads():
    SampleSheet(str(SHEETS / "valid_but_weird.csv"))


def test_missing_file():
    with pytest.raises(OSError):
        SampleSheet(str(SHEETS / "ovenchips.csv"))


def test_bad_columns(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("flow_cell_id,kit,experiment_id,ovenchips\nx,k,e,y\n")
    with pytest.raises(SampleSheetError):
        SampleSheet(str(p))
    p.write_text("kit,experiment_id\nk,e\n")  # no flow_cell_id/position_id
    with pytest.raises(SampleSheetError):
        SampleSheet(str(p))
    # two experiment ids
    p.write_text("flow_cell_id,kit,experiment_id\nf,k,e1\nf,k,e2\n")
    with pytest.raises(SampleSheetError):
        SampleSheet(str(p))


def test_windows_and_mac_line_endings(tmp_path):
    base = "flow_cell_id,kit,sample_id,experiment_id,barcode,alias"
    row = "F1,SQK-RBK114-96,s,e,barcode01,al1"
    for eol in ("\r\n", "\r"):
        p = tmp_path / "eol.csv"
        p.write_bytes((base + eol + row + eol).encode())
        ss = SampleSheet(str(p), skip_index_matching=True)
        assert ss.get_alias("barcode01") == "al1"


def test_duplicate_barcode_skip_index_rejected(tmp_path):
    p = tmp_path / "dup.csv"
    p.write_text(
        "flow_cell_id,kit,experiment_id,barcode,alias\n"
        "f,k,e,barcode01,a1\nf,k,e,barcode01,a2\n"
    )
    with pytest.raises(SampleSheetError):
        SampleSheet(str(p), skip_index_matching=True)
    # fine without skip_index_matching
    SampleSheet(str(p))


def test_dev_opts():
    from dorado_tpu.utils import dev_utils

    dev_utils.set_dev_opts("foo=3;bar=hello;flag=true")
    assert dev_utils.get_dev_opt("foo", 1) == 3
    assert dev_utils.get_dev_opt("bar", "x") == "hello"
    assert dev_utils.get_dev_opt("flag", False) is True
    assert dev_utils.get_dev_opt("missing", 7) == 7


def test_distributed_helpers():
    from pathlib import Path

    from dorado_tpu.parallel.distributed import host_output_path, shard_files_for_host

    files = [Path(f"f{i}.pod5") for i in range(7)]
    s0 = shard_files_for_host(files, 0, 2)
    s1 = shard_files_for_host(files, 1, 2)
    assert sorted(s0 + s1) == sorted(files)
    assert not set(s0) & set(s1)
    assert host_output_path("out.bam", 0) == Path("out.bam")
    assert host_output_path("out.bam", 2) == Path("out.host2.bam")
