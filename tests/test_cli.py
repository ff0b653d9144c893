"""CLI surface tests: every subcommand driven end-to-end via subprocess on
tiny inputs (the reference's shell-integration tier,
tests/test_simple_basecaller_execution.sh analogue)."""

import os
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
REF_CONFIGS = Path("/root/reference/tests/data/model_configs")
FAST = "dna_r10.4.1_e8.2_260bps_fast@v4.0.0"
POD5_DIR = Path("/root/reference/tests/data/pod5/dna_r10.4.1_e8.2_400bps_5khz")


def run_cli(*args, timeout=400):
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": str(REPO)}
    return subprocess.run(
        [sys.executable, "-m", "dorado_tpu", *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
        env=env,
    )


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    import jax

    from dorado_tpu.config import load_model_config
    from dorado_tpu.models.crf_model import init_lstm_crf_params
    from dorado_tpu.models.load import save_lstm_params

    d = tmp_path_factory.mktemp("cli_model") / FAST
    d.mkdir()
    shutil.copy(REF_CONFIGS / FAST / "config.toml", d / "config.toml")
    cfg = load_model_config(d)
    save_lstm_params(cfg, init_lstm_crf_params(cfg, jax.random.PRNGKey(0)), d)
    return d


@pytest.fixture(scope="module")
def basecalled_bam(model_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("cli_out") / "calls.bam"
    r = run_cli(
        "basecaller", str(model_dir), str(POD5_DIR),
        "--decoder", "viterbi", "-b", "4", "-c", "4000", "--emit-moves",
        "-o", str(out),
    )
    assert r.returncode == 0, r.stderr
    # benchmarking-harness log contract (ProgressTracker.cpp:73-77 /
    # regression_test benchmarking.py parses this exact prefix)
    assert "> Basecalled @ Samples/s:" in r.stderr
    assert "> Padding percentage:" in r.stderr
    # host-starvation metric: fraction of wall time with no batch in flight
    assert "> Device idle:" in r.stderr
    return out


@pytest.fixture(scope="module")
def ref_and_reads(tmp_path_factory):
    rng = np.random.RandomState(0)
    d = tmp_path_factory.mktemp("cli_aln")
    ref_seq = "".join(rng.choice(list("ACGT"), 20000))
    ref = d / "ref.fasta"
    with open(ref, "w") as f:
        f.write(">ctg\n")
        for i in range(0, len(ref_seq), 80):
            f.write(ref_seq[i : i + 80] + "\n")
    reads = d / "reads.fastq"
    with open(reads, "w") as f:
        for i in range(4):
            s = rng.randint(0, 18000)
            sub = ref_seq[s : s + 1200]
            f.write(f"@r{i}\n{sub}\n+\n{'I' * len(sub)}\n")
    return ref, reads


class TestCliSurface:
    def test_basecaller(self, basecalled_bam):
        assert basecalled_bam.stat().st_size > 0

    def test_summary(self, basecalled_bam):
        r = run_cli("summary", str(basecalled_bam))
        assert r.returncode == 0, r.stderr
        lines = r.stdout.splitlines()
        assert lines[0].startswith("input_filename")
        assert len(lines) == 4  # header + 3 reads

    def test_download_list(self):
        r = run_cli("download", "--list")
        assert r.returncode == 0
        assert len(r.stdout.splitlines()) == 180

    def test_aligner(self, ref_and_reads, tmp_path):
        ref, reads = ref_and_reads
        out = tmp_path / "aln.sam"
        r = run_cli("aligner", str(ref), str(reads), "--emit-sam", "-o", str(out))
        assert r.returncode == 0, r.stderr
        assert "Mapped 4/4" in r.stderr
        body = [l for l in out.read_text().splitlines() if not l.startswith("@")]
        assert all(l.split("\t")[2] == "ctg" for l in body)

    def test_trim(self, tmp_path):
        from dorado_tpu.demux.adapters import ADAPTERS
        from dorado_tpu.io.sam import BamWriter, SamHeader, SamRecord

        rng = np.random.RandomState(1)
        front, rear = ADAPTERS["LSK110"]
        insert = "".join(rng.choice(list("ACGT"), 300))
        seq = front + insert + rear
        src = tmp_path / "in.bam"
        with open(src, "wb") as fh:
            w = BamWriter(fh, SamHeader())
            w.write(SamRecord(qname="t", seq=seq, qual="I" * len(seq)))
            w.close()
        out = tmp_path / "trimmed.bam"
        r = run_cli("trim", str(src), "--kit-name", "SQK-LSK114", "-o", str(out))
        assert r.returncode == 0, r.stderr
        from dorado_tpu.io.bam_reader import read_bam

        assert read_bam(out).records[0].seq == insert

    def test_demux(self, tmp_path):
        from dorado_tpu.demux import get_barcode_sequence, get_kit_info
        from dorado_tpu.io.sam import BamWriter, SamHeader, SamRecord
        from dorado_tpu.utils import reverse_complement

        rng = np.random.RandomState(2)
        kit = "SQK-NBD114-24"
        info = get_kit_info(kit)
        bc = get_barcode_sequence("NB02")
        ctx = info["top_front_flank"] + bc + info["top_rear_flank"]
        read = "".join(rng.choice(list("ACGT"), 20)) + ctx + "".join(
            rng.choice(list("ACGT"), 400)
        ) + reverse_complement(ctx)
        src = tmp_path / "in.bam"
        with open(src, "wb") as fh:
            w = BamWriter(fh, SamHeader())
            w.write(SamRecord(qname="b", seq=read, qual="I" * len(read)))
            w.close()
        r = run_cli("demux", str(src), "--kit-name", kit, "--output-dir", str(tmp_path / "dx"))
        assert r.returncode == 0, r.stderr
        assert (tmp_path / "dx" / "NB24_barcode02.bam").exists()

    def test_correct(self, tmp_path):
        rng = np.random.RandomState(3)
        truth = "".join(rng.choice(list("ACGT"), 2500))
        src = tmp_path / "reads.fastq"
        with open(src, "w") as f:
            for i in range(6):
                s = list(truth)
                for p in rng.choice(len(truth), 10, replace=False):
                    s[p] = rng.choice([b for b in "ACGT" if b != s[p]])
                sj = "".join(s)
                f.write(f"@r{i}\n{sj}\n+\n{'I' * len(sj)}\n")
        r = run_cli("correct", str(src), "-o", str(tmp_path / "c.fasta"))
        assert r.returncode == 0, r.stderr
        assert "Corrected 6/6" in r.stderr

        # resume from a skip set: everything up to the furthest skipped read
        # is treated as done (cram-correct-resume-0*.t semantics); remaining
        # targets still use the full read set as overlap evidence
        skip = tmp_path / "skip_set.txt"
        skip.write_text("r3\n")
        r = run_cli("correct", str(src), "--resume-from", str(skip),
                    "-o", str(tmp_path / "c2.fasta"))
        assert r.returncode == 0, r.stderr
        assert "Resuming after read r3" in r.stderr
        names = [
            line[1:].strip()
            for line in (tmp_path / "c2.fasta").read_text().splitlines()
            if line.startswith(">")
        ]
        assert names == ["r4", "r5"]

        # empty skip set: nothing is skipped (cram-correct-resume-01.t)
        skip.write_text("\n")
        r = run_cli("correct", str(src), "--resume-from", str(skip),
                    "-o", str(tmp_path / "c3.fasta"))
        assert r.returncode == 0, r.stderr
        assert "Corrected 6/6" in r.stderr

        # missing skip file: refused (correct.cpp:356-358)
        r = run_cli("correct", str(src), "--resume-from",
                    str(tmp_path / "nope.txt"), "-o", str(tmp_path / "c4.fasta"))
        assert r.returncode == 1
        assert "does not exist" in r.stderr

    def test_polish(self, ref_and_reads, tmp_path):
        ref, reads = ref_and_reads
        r = run_cli(
            "polish", str(reads), str(ref), "-o", str(tmp_path / "p.fasta"),
            "--window-len", "8000",
        )
        assert r.returncode == 0, r.stderr
        assert "Polished 1 contig(s)" in r.stderr

    def test_variant(self, ref_and_reads, tmp_path):
        ref, reads = ref_and_reads
        r = run_cli("variant", str(reads), str(ref), "-o", str(tmp_path / "v.vcf"))
        assert r.returncode == 0, r.stderr
        assert (tmp_path / "v.vcf").read_text().startswith("##fileformat=VCFv4.1")

    def test_variant_read_level_features(self, ref_and_reads, tmp_path):
        """Read-level encoder with dwell/haplotag/snp_qv columns enabled via
        the [feature_encoder] kwargs (encoder_factory.cpp:96-118), haplotags
        computed by the local phasing pass (HaplotagSource::COMPUTE)."""
        ref, reads = ref_and_reads
        cfg = tmp_path / "config.toml"
        cfg.write_text(
            "[model]\n"
            'type = "LatentSpaceLSTM"\n'
            "[model.kwargs]\n"
            "num_classes = 5\nlstm_size = 16\ncnn_size = 16\n"
            'kernel_sizes = "1,17"\nuse_dwells = true\n'
            "[feature_encoder]\n"
            'type = "ReadAlignmentFeatureEncoder"\n'
            "[feature_encoder.kwargs]\n"
            'include_dwells = "true"\ninclude_haplotype = "true"\n'
            'include_snp_qv = "true"\nmax_reads = 50\n'
        )
        r = run_cli(
            "variant", str(reads), str(ref), "--model-config", str(cfg),
            "-o", str(tmp_path / "v.vcf"), "--regions", "ctg:1-4000",
        )
        assert r.returncode == 0, r.stderr
        assert "Model: LatentSpaceLSTM" in r.stderr
        # --unphased and --hp-tag sources also drive end-to-end
        r = run_cli(
            "variant", str(reads), str(ref), "--model-config", str(cfg),
            "--unphased", "-o", str(tmp_path / "v2.vcf"), "--regions", "ctg:1-4000",
        )
        assert r.returncode == 0, r.stderr

    def test_duplex_basespace(self, tmp_path):
        from dorado_tpu.io.sam import BamWriter, SamHeader, SamRecord
        from dorado_tpu.utils import reverse_complement

        rng = np.random.RandomState(4)
        seq = "".join(rng.choice(list("ACGT"), 1500))
        src = tmp_path / "in.bam"
        with open(src, "wb") as fh:
            w = BamWriter(fh, SamHeader())
            w.write(SamRecord(qname="t", seq=seq, qual=chr(63) * 1500))
            w.write(SamRecord(qname="c", seq=reverse_complement(seq), qual=chr(53) * 1500))
            w.close()
        pairs = tmp_path / "pairs.txt"
        pairs.write_text("t c\n")
        r = run_cli(
            "duplex", "basespace", str(src), "--pairs", str(pairs),
            "--emit-sam", "-o", str(tmp_path / "d.sam"),
        )
        assert r.returncode == 0, r.stderr
        assert "Duplex reads basecalled: 1" in r.stderr

    def test_resume(self, model_dir, basecalled_bam, tmp_path):
        out = tmp_path / "resumed.bam"
        r = run_cli(
            "basecaller", str(model_dir), str(POD5_DIR),
            "--decoder", "viterbi", "-b", "4", "-c", "4000",
            "--resume-from", str(basecalled_bam), "-o", str(out),
        )
        assert r.returncode == 0, r.stderr
        assert "Resuming: 3 reads" in r.stderr
        assert "Reads basecalled: 0" in r.stderr

    def test_resume_model_mismatch_refused(self, model_dir, basecalled_bam, tmp_path):
        """Resuming with a different model must be refused by @PG CL
        validation (cli_lib/basecaller.cpp:636-693)."""
        import shutil as _sh

        other = tmp_path / "dna_r10.4.1_e8.2_260bps_hac@v4.0.0"
        _sh.copytree(model_dir, other)
        out = tmp_path / "resumed.bam"
        r = run_cli(
            "basecaller", str(other), str(POD5_DIR),
            "--decoder", "viterbi", "-b", "4", "-c", "4000",
            "--resume-from", str(basecalled_bam), "-o", str(out),
        )
        assert r.returncode == 1
        assert "Inconsistent models" in r.stderr

    def test_demux_sample_sheet(self, tmp_path):
        from dorado_tpu.demux import get_barcode_sequence, get_kit_info
        from dorado_tpu.io.sam import BamWriter, SamHeader, SamRecord
        from dorado_tpu.utils import reverse_complement

        rng = np.random.RandomState(5)
        kit = "SQK-NBD114-24"
        info = get_kit_info(kit)
        bc = get_barcode_sequence("NB02")
        ctx = info["top_front_flank"] + bc + info["top_rear_flank"]
        read = "".join(rng.choice(list("ACGT"), 20)) + ctx + "".join(
            rng.choice(list("ACGT"), 400)
        ) + reverse_complement(ctx)
        src = tmp_path / "in.bam"
        with open(src, "wb") as fh:
            w = BamWriter(fh, SamHeader())
            w.write(SamRecord(qname="b", seq=read, qual="I" * len(read)))
            w.close()
        sheet = tmp_path / "sheet.csv"
        sheet.write_text(
            "flow_cell_id,kit,experiment_id,barcode,alias\n"
            "F1,SQK-NBD114-24,e,barcode02,patient_7\n"
        )
        r = run_cli(
            "demux", str(src), "--kit-name", kit,
            "--sample-sheet", str(sheet),
            "--output-dir", str(tmp_path / "dx"),
        )
        assert r.returncode == 0, r.stderr
        # alias replaces the barcode id in grouping and BC tag
        assert (tmp_path / "dx" / "patient_7.bam").exists()
        from dorado_tpu.io.bam_reader import read_bam

        rec = read_bam(tmp_path / "dx" / "patient_7.bam").records[0]
        assert next(t.value for t in rec.tags if t.tag == "BC") == "patient_7"

    def test_barcode_rg_headers(self, model_dir, tmp_path):
        out = tmp_path / "bc.bam"
        r = run_cli(
            "basecaller", str(model_dir), str(POD5_DIR),
            "--decoder", "viterbi", "-b", "4", "-c", "4000",
            "--kit-name", "SQK-NBD114-24", "-o", str(out),
        )
        assert r.returncode == 0, r.stderr
        from dorado_tpu.io.bam_reader import read_bam

        header = read_bam(out).header_text
        rg_lines = [l for l in header.splitlines() if l.startswith("@RG")]
        # 1 base group + 24 per-barcode groups (bam_utils.cpp
        # add_barcode_kit_rg_hdrs)
        assert len(rg_lines) == 25
        bc_lines = [l for l in rg_lines if "SM:barcode02" in l]
        assert len(bc_lines) == 1
        assert "bk:SQK-NBD114-24" in bc_lines[0]
        assert "_NB24_barcode02" in bc_lines[0]

    def test_sample_sheet_index_matching(self, model_dir, tmp_path):
        """Basecaller sample sheets match aliases against the read's own
        flow_cell_id/position_id (skip_index_matching=False,
        bam_utils.cpp:103-112); a sheet row for a different flowcell must
        NOT alias this run's read groups."""
        def rg_lines(out):
            from dorado_tpu.io.bam_reader import read_bam

            header = read_bam(out).header_text
            return [l for l in header.splitlines() if l.startswith("@RG")]

        # fixture run info: flow_cell_id=TEST, position=test, experiment=test
        matching = tmp_path / "match.csv"
        matching.write_text(
            "flow_cell_id,kit,experiment_id,barcode,alias\n"
            "TEST,SQK-NBD114-24,test,barcode02,patient_7\n"
        )
        out = tmp_path / "m.bam"
        r = run_cli(
            "basecaller", str(model_dir), str(POD5_DIR),
            "--decoder", "viterbi", "-b", "4", "-c", "4000",
            "--kit-name", "SQK-NBD114-24", "--sample-sheet", str(matching),
            "-o", str(out),
        )
        assert r.returncode == 0, r.stderr
        lines = rg_lines(out)
        # sheet restricts to its barcodes: 1 base + 1 barcode group, aliased
        assert len(lines) == 2
        assert any("al:patient_7" in l and "_patient_7" in l for l in lines)

        other = tmp_path / "other.csv"
        other.write_text(
            "flow_cell_id,kit,experiment_id,barcode,alias\n"
            "OTHERFC,SQK-NBD114-24,test,barcode02,patient_7\n"
        )
        out2 = tmp_path / "o.bam"
        r = run_cli(
            "basecaller", str(model_dir), str(POD5_DIR),
            "--decoder", "viterbi", "-b", "4", "-c", "4000",
            "--kit-name", "SQK-NBD114-24", "--sample-sheet", str(other),
            "-o", str(out2),
        )
        assert r.returncode == 0, r.stderr
        lines2 = rg_lines(out2)
        # barcode still permitted (filter is index-free) but no alias applies
        assert len(lines2) == 2
        assert not any("al:patient_7" in l for l in lines2)
        assert any("SM:barcode02" in l and "al:barcode02" in l for l in lines2)

    def test_read_ids_and_max_reads(self, model_dir, tmp_path):
        ids = tmp_path / "ids.txt"
        # one known fixture read id
        ids.write_text("c9d52049-ce91-491c-8b19-3ae940f9f020\n")
        out = tmp_path / "subset.bam"
        r = run_cli(
            "basecaller", str(model_dir), str(POD5_DIR),
            "--decoder", "viterbi", "-b", "4", "-c", "4000",
            "--read-ids", str(ids), "-o", str(out),
        )
        assert r.returncode == 0, r.stderr
        from dorado_tpu.io.bam_reader import read_bam

        recs = read_bam(out).records
        assert len(recs) == 1
        assert recs[0].qname.startswith("c9d52049")

        out2 = tmp_path / "max.bam"
        r = run_cli(
            "basecaller", str(model_dir), str(POD5_DIR),
            "--decoder", "viterbi", "-b", "4", "-c", "4000",
            "--max-reads", "2", "-o", str(out2),
        )
        assert r.returncode == 0, r.stderr
        assert len(read_bam(out2).records) == 2

    def test_inline_reference_alignment(self, model_dir, tmp_path):
        """--reference drives the inline AlignerNode stage: SQ header lines
        appear and every record passes the mapper (random-weight calls are
        1-base, so they come out flagged unmapped)."""
        import numpy as np

        rng = np.random.RandomState(0)
        ref = tmp_path / "ref.fasta"
        ref.write_text(">target\n" + "".join(rng.choice(list("ACGT"), 5000)) + "\n")
        out = tmp_path / "aligned.bam"
        r = run_cli(
            "basecaller", str(model_dir), str(POD5_DIR),
            "--decoder", "viterbi", "-b", "4", "-c", "4000",
            "--reference", str(ref), "-o", str(out),
        )
        assert r.returncode == 0, r.stderr
        from dorado_tpu.io.bam_reader import read_bam

        data = read_bam(out)
        assert "@SQ\tSN:target\tLN:5000" in data.header_text
        assert len(data.records) == 3
        assert all(x.flag & 4 for x in data.records)  # 1-base calls: unmapped

    def test_duplex_stereo(self, model_dir, tmp_path):
        """Full stereo duplex CLI over the reference's duplex POD5 fixture
        (pairing + stereo feature encode + stereo basecall)."""
        import shutil

        import jax

        from dorado_tpu.config import load_model_config
        from dorado_tpu.models.crf_model import init_lstm_crf_params
        from dorado_tpu.models.load import save_lstm_params

        # fabricate a stereo model: fast architecture with 13 input features
        # (the stereo CRF's feature encoder contract, stereo_features.cpp)
        stereo_dir = tmp_path / "dna_r10.4.1_e8.2_5khz_stereo@v1.3"
        stereo_dir.mkdir()
        toml_text = (REF_CONFIGS / FAST / "config.toml").read_text()
        toml_text = toml_text.replace("features = 1", "features = 13", 1)
        toml_text = toml_text.replace("insize = 1\n", "insize = 13\n", 1)
        (stereo_dir / "config.toml").write_text(toml_text)
        cfg = load_model_config(stereo_dir)
        assert cfg.num_features == 13
        save_lstm_params(
            cfg, init_lstm_crf_params(cfg, jax.random.PRNGKey(9)), stereo_dir
        )

        out = tmp_path / "duplex.bam"
        r = run_cli(
            "duplex", str(model_dir),
            "/root/reference/tests/data/duplex/pod5",
            "--stereo-model", str(stereo_dir),
            "-b", "4", "-c", "4000", "-o", str(out),
        )
        assert r.returncode == 0, r.stderr
        assert "Simplex reads basecalled: 4" in r.stderr
        assert "Duplex reads basecalled:" in r.stderr
        from dorado_tpu.io.bam_reader import read_bam

        recs = read_bam(out).records
        assert len(recs) >= 4

    def test_rna_basecalling(self, tmp_path):
        """RNA model end-to-end over the rna002 fixture: RNA scaling,
        signal-space splitting, 3'->5' reversal, pipeline orientation."""
        import shutil

        import jax

        from dorado_tpu.config import load_model_config
        from dorado_tpu.models.crf_model import init_lstm_crf_params
        from dorado_tpu.models.load import save_lstm_params

        d = tmp_path / "rna002_70bps_fast@v3"
        d.mkdir()
        shutil.copy(REF_CONFIGS / "rna002_70bps_fast@v3" / "config.toml", d / "config.toml")
        cfg = load_model_config(d)
        assert cfg.is_rna_model
        save_lstm_params(cfg, init_lstm_crf_params(cfg, jax.random.PRNGKey(4)), d)
        out = tmp_path / "rna.bam"
        r = run_cli(
            "basecaller", str(d),
            "/root/reference/tests/data/pod5/rna002_70bps",
            "--decoder", "viterbi", "-b", "4", "-c", "4000", "-o", str(out),
        )
        assert r.returncode == 0, r.stderr
        from dorado_tpu.io.bam_reader import read_bam

        assert len(read_bam(out).records) >= 3

    def test_degenerate_pod5_no_crash(self, model_dir, tmp_path):
        """The degenerate trimming fixtures must basecall without errors
        (test_simple_basecaller_execution.sh:227-228 error-condition runs)."""
        for name in ("trimming_bomb.pod5", "overtrim.pod5"):
            out = tmp_path / f"{name}.fq"
            r = run_cli(
                "basecaller", str(model_dir),
                f"/root/reference/tests/data/pod5/degenerate/{name}",
                "--decoder", "viterbi", "-b", "4", "-c", "4000",
                "--emit-fastq", "--kit-name", "EXP-NBD196",
                "-o", str(out),
            )
            assert r.returncode == 0, r.stderr

    def test_variant_gvcf(self, ref_and_reads, tmp_path):
        ref, reads = ref_and_reads
        r = run_cli(
            "variant", str(reads), str(ref), "--gvcf",
            "-o", str(tmp_path / "g.vcf"),
        )
        assert r.returncode == 0, r.stderr
        text = (tmp_path / "g.vcf").read_text()
        # per-position reference records (general_decode_variants return_all):
        # ALT '.', FILTER '.', GT 0 with a model-derived GQ
        ref_records = [
            l.split("\t") for l in text.splitlines()
            if not l.startswith("#") and l.split("\t")[4] == "."
        ]
        assert len(ref_records) > 1
        assert all(f[6] == "." for f in ref_records)
        assert all(f[9].startswith("0:") for f in ref_records)

    def test_polish_torchscript_model(self, ref_and_reads, tmp_path):
        """--model-params pointing at a TorchScript blob loads it as an
        opaque torch::jit module (model_factory.cpp:186-201 model.pt path)."""
        import torch

        class TinyConsensus(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.linear = torch.nn.Linear(10, 5)

            def forward(self, x):
                return self.linear(x)

        mdir = tmp_path / "tsmodel"
        mdir.mkdir()
        from dorado_tpu.utils.torchscript import script_and_save

        script_and_save(TinyConsensus(), mdir / "model.pt")

        ref, reads = ref_and_reads
        r = run_cli(
            "polish", str(reads), str(ref), "-o", str(tmp_path / "pt.fasta"),
            "--model-params", str(mdir), "--window-len", "8000",
        )
        assert r.returncode == 0, r.stderr
        assert "TorchScript" in r.stderr
        assert "Polished 1 contig(s)" in r.stderr
        assert (tmp_path / "pt.fasta").read_text().startswith(">")

    def test_polish_no_fill_gaps_and_read_groups(self, ref_and_reads, tmp_path):
        """--no-fill-gaps emits per-covered-run records with draft
        coordinates (polish.cpp:480-513); multiple read groups require --RG
        or --ignore-read-groups (bam_info.cpp:103-118)."""
        ref, reads = ref_and_reads
        r = run_cli(
            "polish", str(reads), str(ref), "-o", str(tmp_path / "g.fasta"),
            "--window-len", "8000", "--no-fill-gaps",
        )
        assert r.returncode == 0, r.stderr
        headers = [
            l for l in (tmp_path / "g.fasta").read_text().splitlines()
            if l.startswith(">")
        ]
        assert headers and all(
            "_" in h and "-" in h.split(" ")[-1] for h in headers
        ), headers

        # two @RG lines -> refused without --RG / --ignore-read-groups
        from dorado_tpu.io.sam import BamWriter, SamHeader, SamRecord, SamTag

        ref_seq = "".join(
            l.strip() for l in open(ref).read().splitlines() if not l.startswith(">")
        )
        header = SamHeader()
        header.references = [("ctg", len(ref_seq))]
        header.read_groups = [
            {"ID": "rg_a", "SM": "a"},
            {"ID": "rg_b", "SM": "b"},
        ]
        multi = tmp_path / "multi_rg.bam"
        with open(multi, "wb") as fh:
            w = BamWriter(fh, header)
            for i in range(4):
                pos = 1 + i * 3000
                seq = ref_seq[pos - 1 : pos - 1 + 1200]
                w.write(SamRecord(
                    qname=f"r{i}", flag=0, rname="ctg", pos=pos, mapq=60,
                    cigar=f"{len(seq)}M", seq=seq, qual="I" * len(seq),
                    tags=[SamTag("RG", "Z", "rg_a" if i % 2 == 0 else "rg_b")],
                ))
            w.close()
        r = run_cli("polish", str(multi), str(ref), "-o", str(tmp_path / "m.fasta"))
        assert r.returncode == 1
        assert "more than one read group" in r.stderr
        r = run_cli(
            "polish", str(multi), str(ref), "-o", str(tmp_path / "m2.fasta"),
            "--RG", "rg_a", "--window-len", "8000",
        )
        assert r.returncode == 0, r.stderr
        r = run_cli(
            "polish", str(multi), str(ref), "-o", str(tmp_path / "m3.fasta"),
            "--RG", "nope",
        )
        assert r.returncode == 1
        assert "not found" in r.stderr

    def test_aligner_folder_secondary_and_sec_supp(self, ref_and_reads, tmp_path):
        """Folder input (+ -r recursion), secondary-alignment emission
        (minimap2 --secondary/-N defaults) and the skip of input
        secondary/supplementary records without --allow-sec-supp
        (aligner.cpp:143,183)."""
        ref, reads = ref_and_reads
        sub = tmp_path / "reads" / "nested"
        sub.mkdir(parents=True)
        import shutil

        shutil.copy(reads, sub / "reads.fastq")
        out = tmp_path / "aln.sam"
        r = run_cli(
            "aligner", str(ref), str(tmp_path / "reads"), "-r",
            "--emit-sam", "-o", str(out),
        )
        assert r.returncode == 0, r.stderr
        recs = [l.split("\t") for l in out.read_text().splitlines()
                if l and not l.startswith("@")]
        assert recs, "no records from recursive folder input"
        # non-recursive: nothing found at the top level
        r = run_cli(
            "aligner", str(ref), str(tmp_path / "reads"),
            "--emit-sam", "-o", str(tmp_path / "none.sam"),
        )
        assert r.returncode == 1
        assert "No read files" in r.stderr

        # input secondary records are dropped by default, kept with the flag
        from dorado_tpu.io.sam import BamWriter, SamHeader, SamRecord

        header = SamHeader()
        bam = tmp_path / "in.bam"
        ref_seq = "".join(
            l.strip() for l in open(ref).read().splitlines() if not l.startswith(">")
        )
        with open(bam, "wb") as fh:
            w = BamWriter(fh, header)
            w.write(SamRecord(qname="p1", flag=0, seq=ref_seq[100:1300],
                              qual="I" * 1200))
            w.write(SamRecord(qname="s1", flag=0x100, seq=ref_seq[100:1300],
                              qual="I" * 1200))
            w.close()
        r = run_cli("aligner", str(ref), str(bam), "--emit-sam",
                    "-o", str(tmp_path / "skip.sam"))
        assert r.returncode == 0, r.stderr
        names = {l.split("\t")[0] for l in (tmp_path / "skip.sam").read_text().splitlines()
                 if l and not l.startswith("@")}
        assert "s1" not in names and "p1" in names
        r = run_cli("aligner", str(ref), str(bam), "--emit-sam", "--allow-sec-supp",
                    "-o", str(tmp_path / "keep.sam"))
        assert r.returncode == 0, r.stderr
        names = {l.split("\t")[0] for l in (tmp_path / "keep.sam").read_text().splitlines()
                 if l and not l.startswith("@")}
        assert "s1" in names and "p1" in names

    def test_basecaller_emit_summary(self, model_dir, tmp_path):
        """--emit-summary writes sequencing_summary.txt next to the output
        (basecall_output_args.cpp:35-37)."""
        out = tmp_path / "calls.bam"
        r = run_cli(
            "basecaller", str(model_dir), str(POD5_DIR),
            "-b", "4", "-c", "4000", "-o", str(out), "--emit-summary",
        )
        assert r.returncode == 0, r.stderr
        summary = tmp_path / "sequencing_summary.txt"
        assert summary.exists()
        lines = summary.read_text().splitlines()
        assert lines[0].startswith("input_filename\t")
        assert "sequence_length_template" in lines[0]
        assert len(lines) == 4  # header + 3 reads

    def test_correct_blocks_and_paf(self, tmp_path):
        """--compute-num-blocks / --run-block-id shard by --index-size
        (cram-correct-blocks-01.t semantics: blocks close when cumulative
        bases reach the limit), and --to-paf/--from-paf round-trip the
        overlap stage."""
        rng = np.random.RandomState(4)
        base = "".join(rng.choice(list("ACGT"), 3000))
        src = tmp_path / "r.fastq"
        with open(src, "w") as f:
            for i in range(6):
                s = base[i * 300 : i * 300 + 1500]
                f.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n")

        r = run_cli("correct", str(src), "--compute-num-blocks")
        assert r.returncode == 0, r.stderr
        assert r.stdout.strip() == "1"  # 9 kb input, default 8G index

        r = run_cli("correct", str(src), "--compute-num-blocks",
                    "--index-size", "3000")
        assert r.returncode == 0, r.stderr
        assert r.stdout.strip() == "3"  # 2 reads (3 kb) per block

        # block 1 corrects only r2/r3
        r = run_cli("correct", str(src), "--index-size", "3000",
                    "--run-block-id", "1", "-o", str(tmp_path / "b1.fasta"))
        assert r.returncode == 0, r.stderr
        names = [l[1:] for l in (tmp_path / "b1.fasta").read_text().splitlines()
                 if l.startswith(">")]
        assert names == ["r2", "r3"]
        r = run_cli("correct", str(src), "--index-size", "3000",
                    "--run-block-id", "9", "-o", str(tmp_path / "nope.fasta"))
        assert r.returncode == 1 and "out of range" in r.stderr

        # PAF round trip: --to-paf then --from-paf reproduces the direct run
        r = run_cli("correct", str(src), "--to-paf", "-o", str(tmp_path / "ovl.paf"))
        assert r.returncode == 0, r.stderr
        paf = (tmp_path / "ovl.paf").read_text().splitlines()
        assert paf and all(len(l.split("\t")) >= 13 for l in paf)
        assert all("cg:Z:" in l for l in paf)
        r = run_cli("correct", str(src), "--from-paf", str(tmp_path / "ovl.paf"),
                    "-o", str(tmp_path / "c_paf.fasta"))
        assert r.returncode == 0, r.stderr
        r = run_cli("correct", str(src), "-o", str(tmp_path / "c_direct.fasta"))
        assert r.returncode == 0, r.stderr
        assert (tmp_path / "c_paf.fasta").read_text() == (
            tmp_path / "c_direct.fasta"
        ).read_text()

    def test_polish_vcf_mode(self, ref_and_reads, tmp_path):
        """polish --vcf/--gvcf emits variants instead of FASTA
        (cram-polish-17-vcf.t)."""
        ref, reads = ref_and_reads
        r = run_cli("polish", str(reads), str(ref), "--vcf",
                    "-o", str(tmp_path / "p.vcf"))
        assert r.returncode == 0, r.stderr
        assert (tmp_path / "p.vcf").read_text().startswith("##fileformat=VCF")
        r = run_cli("polish", str(reads), str(ref), "--gvcf",
                    "-o", str(tmp_path / "p.gvcf"))
        assert r.returncode == 0, r.stderr
        body = (tmp_path / "p.gvcf").read_text()
        assert body.startswith("##fileformat=VCF")

    def test_variant_candidates(self, ref_and_reads, tmp_path):
        """--candidates seeds inference windows around listed sites and a
        processed_regions bed records the spans (variant.cpp:300,482)."""
        ref, reads = ref_and_reads
        cand = tmp_path / "cand.tsv"
        cand.write_text("ctg\t2000\t2\nctg\t2050\t1\nctg\t9000\t3\n")
        out = tmp_path / "v.vcf"
        r = run_cli(
            "variant", str(reads), str(ref), "-o", str(out),
            "--candidates", str(cand), "--variant-flanking-bases", "100",
        )
        assert r.returncode == 0, r.stderr
        assert "Candidate windows: 2 spans" in r.stderr  # 2000/2050 merge
        bed = tmp_path / "v.processed_regions.bed"
        assert bed.exists()
        lines = [l.split("\t") for l in bed.read_text().splitlines()]
        assert [(l[0], int(l[1]), int(l[2])) for l in lines] == [
            ("ctg", 1900, 2151), ("ctg", 8900, 9101),
        ]

    def test_polish_model_resolution(self, ref_and_reads, tmp_path):
        """-m/--model: directory with reference-schema config.toml +
        weights.pt (torch state dict) loads into the jax zoo; 'auto'
        resolves via the BAM header LUT (polish.cpp:515-640)."""
        import torch

        from dorado_tpu.secondary.model_resolver import (
            basecaller_model_from_header,
            resolve_polish_model_name,
        )

        ref, reads = ref_and_reads
        mdir = tmp_path / "gru_model"
        mdir.mkdir()
        (mdir / "config.toml").write_text(
            "[model]\n"
            'type = "GRUModel"\n'
            "[model.kwargs]\n"
            "num_features = 10\nnum_classes = 5\ngru_size = 16\n"
            "n_layers = 2\nbidirectional = true\n"
        )
        state = {}
        for layer in range(2):
            in_f = 10 if layer == 0 else 32
            for sfx in ("", "_reverse"):
                state[f"gru.weight_ih_l{layer}{sfx}"] = torch.randn(48, in_f)
                state[f"gru.weight_hh_l{layer}{sfx}"] = torch.randn(48, 16)
                state[f"gru.bias_ih_l{layer}{sfx}"] = torch.randn(48)
                state[f"gru.bias_hh_l{layer}{sfx}"] = torch.randn(48)
        state["linear.weight"] = torch.randn(5, 32)
        state["linear.bias"] = torch.randn(5)
        torch.save(state, mdir / "weights.pt")

        r = run_cli(
            "polish", str(reads), str(ref), "-m", str(mdir),
            "-o", str(tmp_path / "m.fasta"), "--window-len", "8000",
        )
        assert r.returncode == 0, r.stderr
        assert "gru_model (counts)" in r.stderr
        assert (tmp_path / "m.fasta").read_text().startswith(">")

        # auto-resolution LUT + header parsing (resolution only; weights
        # cannot be downloaded here)
        hdr = ("@RG\tID:x_dna_r10.4.1_e8.2_400bps_hac@v5.0.0\t"
               "DS:basecall_model=dna_r10.4.1_e8.2_400bps_hac@v5.0.0")
        assert basecaller_model_from_header(hdr) == (
            "dna_r10.4.1_e8.2_400bps_hac@v5.0.0"
        )
        assert resolve_polish_model_name(
            "dna_r10.4.1_e8.2_400bps_hac@v5.0.0"
        ) == "dna_r10.4.1_e8.2_400bps_hac@v5.0.0_polish_rl"
        assert resolve_polish_model_name(
            "dna_r10.4.1_e8.2_400bps_hac@v4.3.0", bacteria=True
        ) == "dna_r10.4.1_e8.2_400bps_polish_bacterial_methylation_v5.0.0"

    def test_demux_no_classify_without_kit(self, basecalled_bam, tmp_path):
        """--no-classify groups by existing BC tags with NO kit configured
        (was a crash: the classifier was built unconditionally)."""
        r = run_cli(
            "demux", str(basecalled_bam), "--no-classify",
            "--output-dir", str(tmp_path / "out"),
        )
        assert r.returncode == 0, r.stderr
        assert list((tmp_path / "out").glob("*.bam"))


class TestCramRansCli:
    def test_basecaller_emit_cram_rans(self, model_dir, tmp_path):
        """--emit-cram --cram-rans: output must decode via the repo's own
        CRAM reader and contain at least one rANS-method block."""
        out = tmp_path / "calls.cram"
        r = run_cli(
            "basecaller", str(model_dir), str(POD5_DIR),
            "--emit-cram", "--cram-rans", "-b", "4", "-c", "4000",
            "-o", str(out),
        )
        assert r.returncode == 0, r.stderr[-800:]
        from dorado_tpu.io.cram import CramReader

        recs = list(CramReader(str(out)).records())
        assert len(recs) == 3
        # one record per fixture read, with intact read-id qnames
        names = {r.qname for r in recs}
        assert len(names) == 3
        assert all(len(n) == 36 and n.count("-") == 4 for n in names), names
