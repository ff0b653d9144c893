"""CLI dispatch (parity: dorado/cli/main.cpp:91-102).

Subcommands mirror the reference binary: basecaller, download, summary, ...
(others are added as the corresponding subsystems land).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path


def _add_basecaller(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("basecaller", help="Run simplex basecalling")
    p.add_argument(
        "model",
        help="Model: directory path, model name, or {fast,hac,sup}[@version]",
    )
    p.add_argument("data", help="POD5 file or directory")
    p.add_argument(
        "--models-directory",
        default=".",
        help="Directory to search for / download models",
    )
    p.add_argument("-r", "--recursive", action="store_true")
    p.add_argument("-o", "--output", default="-", help="Output path (- = stdout)")
    p.add_argument(
        "--emit-sam", action="store_true", help="Emit SAM instead of BAM"
    )
    p.add_argument("--emit-fastq", action="store_true")
    p.add_argument(
        "--emit-cram",
        action="store_true",
        help="Emit CRAM (non-reference mode; also chosen by a .cram output "
        "path, matching the reference's extension-based selection)",
    )
    p.add_argument(
        "--cram-rans",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="Compress CRAM data-series blocks with rANS 4x8 (htslib's "
        "CRAM 3.0 default codec, on by default); --no-cram-rans falls "
        "back to gzip",
    )
    p.add_argument("--emit-moves", action="store_true")
    p.add_argument("--emit-summary", action="store_true",
                   help="Also write sequencing_summary.txt next to the "
                        "output (basecall_output_args.cpp:35-37)")
    p.add_argument("-c", "--chunksize", type=int, default=None)
    p.add_argument("-b", "--batchsize", type=int, default=None,
                   help="0 = auto (memory cap + benchmark sweep, cached)")
    p.add_argument("--overlap", type=int, default=None)
    p.add_argument(
        "--decoder",
        choices=["viterbi", "beam", "beam-host"],
        default="viterbi",
        help="viterbi = exact max-scoring path, the fast default (~7x beam "
             "on TPU, not less accurate on known-truth lattices — "
             "docs/decoder_choice.md); beam = reference-parity beam search "
             "(use for bit-for-bit parity runs vs dorado BAMs)",
    )
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default=None)
    p.add_argument(
        "--modified-bases",
        nargs="+",
        default=None,
        metavar="MOD",
        help="Modified base variants to call (e.g. 5mCG_5hmCG)",
    )
    p.add_argument(
        "--modified-bases-models",
        default=None,
        help="Comma-separated paths to modified-base model directories",
    )
    p.add_argument("--modified-bases-threshold", type=float, default=0.05)
    p.add_argument("--kit-name", default=None, help="Barcoding kit (e.g. SQK-NBD114-24)")
    p.add_argument("--sample-sheet", default=None,
                   help="MinKNOW sample sheet CSV (barcode aliasing + filtering)")
    p.add_argument("--barcode-both-ends", action="store_true")
    p.add_argument("--estimate-poly-a", action="store_true")
    p.add_argument("--min-qscore", type=float, default=0.0)
    p.add_argument("--resume-from", default=None, help="Resume from a partial BAM/SAM")
    p.add_argument("--read-ids", default=None,
                   help="File with one read id per line; only these are basecalled")
    p.add_argument("--max-reads", type=int, default=None)
    p.add_argument("--trim", choices=["all", "adapters", "primers", "none"],
                   default="none",
                   help="Trim adapters/primers from basecalls (TrimmerNode)")
    p.add_argument("--no-trim", action="store_true", help="Alias for --trim none")
    p.add_argument("--reference", default=None,
                   help="Align basecalls inline against this FASTA (AlignerNode)")
    p.add_argument("--bed-file", default=None,
                   help="BED regions for --reference alignments (bh tags)")
    p.add_argument("--barcode-arrangement", default=None,
                   help="Custom barcode arrangement TOML")
    p.add_argument("--barcode-sequences", default=None,
                   help="Custom barcode sequences FASTA")
    p.add_argument("--primer-sequences", default=None,
                   help="Custom primer sequences FASTA for trimming")
    p.add_argument("--poly-a-config", default=None,
                   help="Poly(A) estimation config TOML")
    p.add_argument("--disable-read-splitting", action="store_true")
    p.add_argument("--disable-variable-chunk-sizes", action="store_true",
                   help="No-op: chunk lanes replace VCS on TPU (see README)")
    p.add_argument("--rna-adapters", action="store_true",
                   help="Force RNA adapter trimming")
    p.add_argument("--skip-model-compatibility-check", action="store_true")
    p.add_argument("--modified-bases-batchsize", type=int, default=None)
    p.add_argument("--run-batchsize-benchmarks", action="store_true",
                   help="Force a fresh auto-batch-size sweep (ignore cache)")
    p.add_argument("--emit-batchsize-benchmarks", action="store_true",
                   help="Print the chosen batch sizes")
    p.add_argument("--run-for", type=int, default=None,
                   help="Stop basecalling after N seconds (BenchmarkTimer)")
    p.add_argument("-v", "--verbose", action="count", default=0)
    p.add_argument("-x", "--device", default="auto",
                   help="Compute device: 'auto', 'tpu', or 'cpu' (the "
                        "reference's -x cuda:all analogue)")
    p.add_argument("-t", "--threads", type=int, default=0,
                   help="Host worker threads (0 = auto)")
    p.add_argument("--dump-stats-file", default=None)
    p.add_argument("--dump-stats-filter", default="")
    p.add_argument("--profile-dir", default=None, help="Write a JAX profiler trace")
    p.set_defaults(func=_run_basecaller)


def _cl_line() -> str:
    """The @PG CL command line, shell-quoted so resume's shlex.split
    re-parse round-trips arguments containing spaces."""
    import shlex

    return shlex.join(sys.argv)


def _run_basecaller(args: argparse.Namespace) -> int:
    import jax.numpy as jnp

    from dorado_tpu.io.sam import BamWriter, FastqWriter, SamWriter
    from dorado_tpu.models.load import load_model
    from dorado_tpu.pipeline.basecaller import BasecallerPipeline

    model_dir = _resolve_model_arg(args)
    if model_dir is None:
        return 1
    config, params = load_model(model_dir)
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, None: None}[args.dtype]

    modbase_caller = None
    if args.modified_bases_models:
        from dorado_tpu.modbase.caller import ModBaseCaller
        from dorado_tpu.modbase.config import load_modbase_config

        mod_cfgs = [
            load_modbase_config(p) for p in args.modified_bases_models.split(",")
        ]
        modbase_caller = ModBaseCaller(
            mod_cfgs,
            canonical_stride=config.stride,
            is_rna=config.is_rna_model,
            **(
                {"batch_size": args.modified_bases_batchsize}
                if getattr(args, "modified_bases_batchsize", None)
                else {}
            ),
        )
    elif args.modified_bases:
        # resolve mod variants against the registry, matching the chosen
        # simplex model (models/model_complex.cpp variant grammar)
        from pathlib import Path as P

        from dorado_tpu.modbase.caller import ModBaseCaller
        from dorado_tpu.modbase.config import load_modbase_config
        from dorado_tpu.models.downloader import download_model_info
        from dorado_tpu.models.registry import get_model_info, resolve_mods_models

        simplex_info = get_model_info(model_dir.name)
        if simplex_info is None:
            print(
                f"> Cannot resolve --modified-bases against unknown simplex "
                f"model {model_dir.name!r}; use --modified-bases-models",
                file=sys.stderr,
            )
            return 1
        mods = resolve_mods_models(simplex_info, [(m, None) for m in args.modified_bases])
        mod_cfgs = []
        for info in mods:
            local = P(args.models_directory) / info.name
            if not local.is_dir():
                try:
                    local = download_model_info(info, P(args.models_directory))
                except RuntimeError as e:
                    print(f"> {e}", file=sys.stderr)
                    return 1
            mod_cfgs.append(load_modbase_config(local))
        modbase_caller = ModBaseCaller(
            mod_cfgs,
            canonical_stride=config.stride,
            is_rna=config.is_rna_model,
            **(
                {"batch_size": args.modified_bases_batchsize}
                if getattr(args, "modified_bases_batchsize", None)
                else {}
            ),
        )

    # --resume-from: replay completed records and skip their read ids
    # (resume_loader/ResumeLoader.cpp:16-60)
    skip_read_ids = set()
    resume_records = []
    if args.resume_from:
        from dorado_tpu.io.bam_reader import read_records

        header_text, resume_records = read_records(args.resume_from)
        err = _validate_resume_cl(header_text, args, model_dir)
        if err:
            print(f"> {err}", file=sys.stderr)
            return 1
        for rec in resume_records:
            pid = next((t.value for t in rec.tags if t.tag == "pi"), None)
            skip_read_ids.add(pid if pid else rec.qname)
        print(f"> Resuming: {len(skip_read_ids)} reads already basecalled", file=sys.stderr)

    if getattr(args, "primer_sequences", None):
        from dorado_tpu.demux.adapters import add_custom_primers
        from dorado_tpu.demux.custom_kit import parse_custom_sequences

        add_custom_primers(parse_custom_sequences(args.primer_sequences))

    only_read_ids = None
    if getattr(args, "read_ids", None):
        with open(args.read_ids) as fh:
            only_read_ids = {line.strip() for line in fh if line.strip()}

    barcode_classifier = None
    sample_sheet = None
    if getattr(args, "sample_sheet", None):
        from dorado_tpu.utils.sample_sheet import SampleSheet

        # POD5 input carries per-read run info, so aliases are matched
        # against flow_cell_id/position_id like the reference basecaller
        # (cli_lib/basecaller.cpp:865 constructs with
        # skip_index_matching=false; demux from BAM keeps the bare lookup)
        sample_sheet = SampleSheet(args.sample_sheet, skip_index_matching=False)
    custom_kit_info = None
    kit_name = args.kit_name
    if getattr(args, "barcode_arrangement", None):
        from dorado_tpu.demux import add_custom_barcodes, parse_custom_arrangement
        from dorado_tpu.demux.custom_kit import parse_custom_sequences

        kit_name, custom_kit_info = parse_custom_arrangement(args.barcode_arrangement)
        if args.barcode_sequences:
            add_custom_barcodes(parse_custom_sequences(args.barcode_sequences))
    if kit_name:
        from dorado_tpu.demux import BarcodeClassifier

        barcode_classifier = BarcodeClassifier(
            kit_name,
            allowed_barcodes=sample_sheet.get_barcode_values() if sample_sheet else None,
            kit_info=custom_kit_info,
        )

    poly_a_config = None
    if getattr(args, "poly_a_config", None):
        from dorado_tpu.polytail import load_poly_tail_configs

        # full {barcode_id: config} dict so per-barcode [[overrides]] reach
        # the pipeline's PolyTailCalculatorSelector
        poly_a_config = load_poly_tail_configs(args.poly_a_config)

    batchsize = args.batchsize
    if batchsize == 0:
        from dorado_tpu.basecall.batch_size import auto_batch_size

        chunk = args.chunksize or config.basecaller.chunk_size
        batchsize = auto_batch_size(
            config, params, chunk, compute_dtype=dtype,
            use_cache=not args.run_batchsize_benchmarks,
        )
        print(f"> Auto batch size: {batchsize}", file=sys.stderr)
    if args.emit_batchsize_benchmarks:
        print(f"> Batch size: {batchsize or 'model default'}", file=sys.stderr)

    pipeline = BasecallerPipeline(
        config,
        params,
        chunk_size=args.chunksize,
        batch_size=batchsize,
        overlap=args.overlap,
        decoder=args.decoder,
        emit_moves=args.emit_moves,
        compute_dtype=dtype,
        modbase_caller=modbase_caller,
        modbase_threshold=args.modified_bases_threshold,
        barcode_classifier=barcode_classifier,
        barcode_both_ends=args.barcode_both_ends,
        sample_sheet=sample_sheet,
        estimate_poly_a=args.estimate_poly_a,
        poly_a_config=poly_a_config,
        split_reads=not args.disable_read_splitting,
        min_qscore=args.min_qscore,
        skip_read_ids=skip_read_ids,
        only_read_ids=only_read_ids,
        max_reads=args.max_reads,
        force_rna_adapter_trim=args.rna_adapters,
    )

    from dorado_tpu.io.pod5 import find_pod5_files

    files = find_pod5_files(args.data, recursive=args.recursive)
    if not files:
        print(f"> No POD5 files found under {args.data}", file=sys.stderr)
        return 1
    header = pipeline.build_header(files, cli_line=_cl_line())

    # inline alignment (AlignerNode in the basecall pipeline,
    # pipeline_creation.cpp) — from-scratch mapper over the given reference
    aligner_mapper = None
    aligner_bed = None
    if args.reference:
        from dorado_tpu.alignment import Mapper, ReferenceIndex

        print(f"> Indexing {args.reference}", file=sys.stderr)
        aligner_index = ReferenceIndex.build(args.reference)
        aligner_mapper = Mapper(aligner_index)
        header.references = list(zip(aligner_index.names, aligner_index.lengths))
        if getattr(args, "bed_file", None):
            from dorado_tpu.alignment.bed_file import BedFile

            aligner_bed = BedFile.load(args.bed_file)

    out_is_stdout = args.output == "-"
    if not out_is_stdout and (
        Path(args.output).is_dir() or str(args.output).endswith(("/", os.sep))
    ):
        # directory output (an existing dir, or a trailing slash): write
        # calls_<timestamp>.<ext> inside, like the reference's
        # SingleFileStructure under --output-dir (hts_writer/Structure.cpp:44-55)
        Path(args.output).mkdir(parents=True, exist_ok=True)
        import datetime

        ts = datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%d_T%H-%M-%S"
        )
        ext = (
            ".fastq" if args.emit_fastq
            else ".sam" if args.emit_sam
            else ".cram" if args.emit_cram
            else ".bam"
        )
        args.output = str(Path(args.output) / f"calls_{ts}{ext}")
        print(f"> Output: {args.output}", file=sys.stderr)
    emit_cram = args.emit_cram or (
        not out_is_stdout and str(args.output).endswith(".cram")
    )
    if args.emit_fastq:
        fh = sys.stdout if out_is_stdout else open(args.output, "w")
        writer = FastqWriter(fh, header)
    elif args.emit_sam:
        fh = sys.stdout if out_is_stdout else open(args.output, "w")
        writer = SamWriter(fh, header)
    elif emit_cram:
        from dorado_tpu.io.cram import CramWriter

        fh = sys.stdout.buffer if out_is_stdout else open(args.output, "wb")
        writer = CramWriter(fh, header, rans=getattr(args, "cram_rans", True))
    else:
        fh = sys.stdout.buffer if out_is_stdout else open(args.output, "wb")
        writer = BamWriter(fh, header)

    from contextlib import nullcontext

    from dorado_tpu.utils.profiling import profiler_trace
    from dorado_tpu.utils.stats import ProgressTracker, StatsSampler

    sampler = None
    stats_fh = None
    if args.dump_stats_file:
        from dorado_tpu.utils.device_monitor import DeviceMonitor

        stats_fh = open(args.dump_stats_file, "w")
        sampler = StatsSampler(
            {
                "basecaller": pipeline.sample_stats,
                # HBM accounting per tick (gpu_monitor.h DeviceStatusInfo
                # role; NVML temp/power have no TPU-runtime equivalent)
                "device": DeviceMonitor().sample_stats,
            },
            dump_stream=stats_fh,
            dump_filter=args.dump_stats_filter,
        )
        sampler.start()

    trim_what = "none" if args.no_trim else args.trim

    class _FinishingWriter:
        """TrimmerNode + AlignerNode post-stages applied per record."""

        def __init__(self, inner):
            self.inner = inner

        def write(self, rec):
            if trim_what != "none" and rec.seq not in ("", "*"):
                from dorado_tpu.demux.adapters import (
                    determine_trim_interval,
                    find_adapters,
                    find_primers,
                )
                from dorado_tpu.demux.trimmer import trim_record

                if trim_what in ("all", "adapters"):
                    res = find_adapters(rec.seq, args.kit_name)
                    trim_record(rec, determine_trim_interval(res, len(rec.seq)))
                if trim_what in ("all", "primers") and rec.seq:
                    res = find_primers(rec.seq, args.kit_name)
                    trim_record(rec, determine_trim_interval(res, len(rec.seq)))
            if aligner_mapper is not None and rec.seq not in ("", "*"):
                from dorado_tpu.io.sam import SamTag
                from dorado_tpu.utils import reverse_complement

                alns = aligner_mapper.map(rec.seq)
                if alns:
                    a = alns[0]
                    rec.flag = 16 if a.is_reverse else 0
                    rec.rname = a.ref_name
                    rec.pos = a.ref_start + 1
                    rec.mapq = a.mapq
                    rec.cigar = a.cigar
                    if a.is_reverse:
                        rec.seq = reverse_complement(rec.seq)
                        if rec.qual != "*":
                            rec.qual = rec.qual[::-1]
                    rec.tags = [t for t in rec.tags if t.tag not in ("NM", "AS", "bh")]
                    rec.tags.append(SamTag("NM", "i", a.nm))
                    rec.tags.append(SamTag("AS", "i", a.score))
                    if aligner_bed is not None:
                        import re as _re

                        span = sum(
                            int(n) for n, op in _re.findall(r"(\d+)([MIDNSHP=X])", a.cigar)
                            if op in "MDN=X"
                        )
                        rec.tags.append(SamTag("bh", "i", aligner_bed.hits(
                            a.ref_name, a.ref_start, a.ref_start + span, a.is_reverse
                        )))
                else:
                    rec.flag |= 4
            self.inner.write(rec)

    sink = _FinishingWriter(writer) if (trim_what != "none" or aligner_mapper) else writer

    summary_writer = None
    summary_fh = None
    if getattr(args, "emit_summary", False):
        from dorado_tpu.io.summary import StreamingSummaryWriter, _parse_rg_run_ids

        summary_dir = Path(".") if out_is_stdout else Path(args.output).parent
        summary_fh = open(summary_dir / "sequencing_summary.txt", "w")
        summary_writer = StreamingSummaryWriter(
            summary_fh,
            has_barcodes=bool(args.kit_name or args.barcode_arrangement),
            has_alignment=aligner_mapper is not None,
            rg_runs=_parse_rg_run_ids(header.to_text()),
            model_stride=config.stride,
        )

        class _SummaryTee:
            def __init__(self, inner):
                self.inner = inner

            def write(self, rec):
                self.inner.write(rec)
                summary_writer.write(rec)

        sink = _SummaryTee(sink)

    t0 = time.perf_counter()
    for rec in resume_records:
        writer.write(rec)
    with profiler_trace(args.profile_dir) if args.profile_dir else nullcontext():
        stats = pipeline.run(
            args.data, sink, recursive=args.recursive, max_seconds=args.run_for
        )
    writer.close()
    if not out_is_stdout:
        fh.close()
    if summary_fh is not None:
        summary_fh.close()
        print(
            f"> Sequencing summary: {summary_writer.rows} rows", file=sys.stderr
        )
    elapsed = time.perf_counter() - t0
    if sampler is not None:
        sampler.stop()
        stats_fh.close()

    # throughput log line parity: dorado/cli/cli_lib/ProgressTracker.cpp:73-77
    ProgressTracker(sys.stderr).summarise(stats, elapsed)
    return 0


def _validate_resume_cl(header_text: str, args, model_dir) -> str | None:
    """Refuse resuming with different model arguments.

    Re-parses the --resume-from file's ``@PG ID:basecaller CL:`` header with
    the basecaller argument parser and compares the resolved simplex model +
    modified-bases selection against the current invocation — the reference's
    validation in cli/cli_lib/basecaller.cpp:636-693. Returns an error
    message, or None when consistent.
    """
    import shlex
    from pathlib import Path as P

    cl = None
    for line in header_text.splitlines():
        fields = line.split("\t")
        if line.startswith("@PG") and "ID:basecaller" in fields:
            for f in fields:
                if f.startswith("CL:"):
                    cl = f[3:]
    if cl is None:
        return (
            "Failed to parse resume parameters: the --resume-from file has no "
            "basecaller @PG 'CL' (Command Line) header. This can happen if "
            "the HTS file headers were dropped."
        )
    tokens = shlex.split(cl)
    if "basecaller" not in tokens:
        return "Failed to parse resume parameters from the @PG CL header."
    tokens = tokens[tokens.index("basecaller") + 1 :]

    parser = argparse.ArgumentParser(prog="dorado_tpu", exit_on_error=False)
    sub = parser.add_subparsers(dest="command")
    _add_basecaller(sub)
    try:
        resume_args, _ = parser.parse_known_args(["basecaller", *tokens])
    except (argparse.ArgumentError, SystemExit):
        return "Failed to parse resume parameters from the @PG CL header."

    # resolve the resumed model complex against the CURRENT run's data and
    # models directory — the old CL's paths may have moved, and the current
    # run already resolved/downloaded the model, so this never re-sniffs a
    # stale data path or triggers a fresh download
    resume_args.data = args.data
    resume_args.models_directory = args.models_directory

    def identity(ns, resolved_dir):
        from dorado_tpu.models.registry import parse_model_complex

        if resolved_dir is not None:
            name = resolved_dir.name
        else:
            mc = parse_model_complex(ns.model)
            if mc.is_path:
                name = P(ns.model).name
            else:
                d = _resolve_model_arg(ns)
                if d is None:
                    return None
                name = d.name
        mods: tuple = ()
        if getattr(ns, "modified_bases_models", None):
            mods = tuple(
                sorted(P(m).name for m in ns.modified_bases_models.split(","))
            )
        elif getattr(ns, "modified_bases", None):
            mods = tuple(sorted(ns.modified_bases))
        return (name, mods)

    current = identity(args, model_dir)
    resumed = identity(resume_args, None)
    if resumed is None:
        return (
            "Could not resolve the model recorded in the --resume-from file "
            "to validate resume parameters."
        )
    if current != resumed:
        return (
            "Inconsistent models used in this pipeline and those used in the "
            f"--resume-from file. Current: {current}; Resumed: {resumed}."
        )
    return None


def _resolve_model_arg(args: argparse.Namespace):
    """Model argument -> on-disk model directory.

    Handles the reference's three styles (model_resolver/ModelResolver.h):
    a path, an exact model name, or the {fast,hac,sup}[@version] complex
    resolved against the input data's chemistry.
    """
    from pathlib import Path as P

    from dorado_tpu.models.downloader import download_model_info
    from dorado_tpu.models.registry import (
        get_chemistry,
        parse_model_complex,
        resolve_simplex_model,
    )

    mc = parse_model_complex(args.model)
    if mc.is_path:
        if not P(args.model).is_dir():
            print(f"> Model directory not found: {args.model}", file=sys.stderr)
            return None
        return P(args.model)

    if mc.style == "named":
        info = mc.named_simplex
    else:
        from dorado_tpu.io.pod5 import Pod5File, find_pod5_files

        files = find_pod5_files(args.data, recursive=getattr(args, "recursive", False))
        if not files:
            print(f"> No POD5 files found under {args.data}", file=sys.stderr)
            return None
        ri = Pod5File(files[0]).run_infos[0]
        chemistry = get_chemistry(
            ri.flow_cell_product_code, ri.sequencing_kit, ri.sample_rate
        )
        if chemistry is None:
            print(
                f"> Could not determine chemistry from {files[0].name} "
                f"(flowcell={ri.flow_cell_product_code!r}, "
                f"kit={ri.sequencing_kit!r}, rate={ri.sample_rate})",
                file=sys.stderr,
            )
            return None
        info = resolve_simplex_model(chemistry, mc.simplex_variant, mc.simplex_version)
        print(f"> Auto-selected model: {info.name}", file=sys.stderr)

    models_dir = P(getattr(args, "models_directory", "."))
    local = models_dir / info.name
    if local.is_dir():
        return local
    try:
        return download_model_info(info, models_dir)
    except RuntimeError as e:
        print(f"> {e}", file=sys.stderr)
        return None



def _add_common_opts(p: argparse.ArgumentParser) -> None:
    """Flags every reference subcommand accepts: -v verbosity plus host
    resource knobs that have no XLA-side meaning (threads are managed by the
    runtime) but must parse."""
    p.add_argument("-v", "--verbose", action="count", default=0)
    p.add_argument("-t", "--threads", type=int, default=0,
                   help="Host worker threads (0 = auto)")
    p.add_argument("-x", "--device", default="auto",
                   help="Compute device: 'auto', 'tpu', or 'cpu' (the "
                        "reference's cuda:all analogue; sets JAX_PLATFORMS)")


def _add_duplex(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("duplex", help="Run duplex basecalling")
    p.add_argument("model", help="Simplex model directory")
    p.add_argument("data", help="POD5 file or directory")
    p.add_argument(
        "--stereo-model",
        default=None,
        help="Stereo model directory (required unless model is 'basespace')",
    )
    p.add_argument("--pairs", default=None, help="Pairs file for basespace mode")
    p.add_argument("-r", "--recursive", action="store_true")
    p.add_argument("-o", "--output", default="-")
    p.add_argument("--emit-sam", action="store_true")
    p.add_argument("--emit-fastq", action="store_true")
    p.add_argument("--modified-bases", nargs="+", default=None,
                   help="Modification names resolved against the simplex "
                        "model (e.g. 5mCG_5hmCG)")
    p.add_argument("--modified-bases-models", default=None,
                   help="Comma-separated modified-base model directories "
                        "(duplex mods, ModBaseCallerNode.cpp:155-300)")
    p.add_argument("--models-directory", default=".",
                   help="Where resolved mod models are found/downloaded")
    p.add_argument("--modified-bases-threshold", type=float, default=0.05)
    p.add_argument("-c", "--chunksize", type=int, default=None)
    p.add_argument("-b", "--batchsize", type=int, default=None)
    p.add_argument(
        "--decoder",
        choices=["viterbi", "beam", "beam-host"],
        default="viterbi",
        help="see basecaller --decoder / docs/decoder_choice.md",
    )
    p.add_argument("--overlap", type=int, default=None)
    p.add_argument("--min-qscore", type=float, default=0.0)
    p.add_argument("--read-ids", default=None)
    _add_common_opts(p)
    p.set_defaults(func=_run_duplex)


def _run_duplex(args: argparse.Namespace) -> int:
    if args.model == "basespace":
        return _run_basespace_duplex(args)
    from dorado_tpu.duplex.pipeline import DuplexPipeline
    from dorado_tpu.io.pod5 import find_pod5_files
    from dorado_tpu.io.sam import BamWriter, SamWriter
    from dorado_tpu.models.load import load_model
    from dorado_tpu.pipeline.basecaller import BasecallerPipeline

    if not args.stereo_model:
        print("> stereo duplex requires --stereo-model", file=sys.stderr)
        return 1
    config, params = load_model(args.model)
    stereo_config, stereo_params = load_model(args.stereo_model)
    duplex_kwargs = {}
    if args.overlap is not None:
        duplex_kwargs["overlap"] = args.overlap
    if args.modified_bases_models or args.modified_bases:
        from dorado_tpu.modbase.caller import ModBaseCaller
        from dorado_tpu.modbase.config import load_modbase_config
        from dorado_tpu.modbase.tags import modbase_threshold_uint8

        if args.modified_bases_models:
            mod_cfgs = [
                load_modbase_config(p)
                for p in args.modified_bases_models.split(",")
            ]
        else:
            # resolve named mods against the simplex model (the basecaller's
            # --modified-bases path, models/model_complex.cpp grammar)
            from dorado_tpu.models.downloader import download_model_info
            from dorado_tpu.models.registry import (
                get_model_info,
                resolve_mods_models,
            )

            simplex_info = get_model_info(Path(args.model).name)
            if simplex_info is None:
                print(
                    f"> Cannot resolve --modified-bases against unknown "
                    f"simplex model {Path(args.model).name!r}; use "
                    "--modified-bases-models",
                    file=sys.stderr,
                )
                return 1
            mods = resolve_mods_models(
                simplex_info, [(m, None) for m in args.modified_bases]
            )
            mod_cfgs = []
            for info in mods:
                local = Path(args.models_directory) / info.name
                if not local.is_dir():
                    try:
                        local = download_model_info(
                            info, Path(args.models_directory)
                        )
                    except RuntimeError as e:
                        print(f"> {e}", file=sys.stderr)
                        return 1
                mod_cfgs.append(load_modbase_config(local))
        duplex_kwargs["modbase_caller"] = ModBaseCaller(
            mod_cfgs,
            canonical_stride=config.stride,
            is_rna=config.is_rna_model,
        )
        duplex_kwargs["modbase_threshold"] = modbase_threshold_uint8(
            args.modified_bases_threshold
        )
    pipeline = DuplexPipeline(
        config,
        params,
        stereo_config,
        stereo_params,
        chunk_size=args.chunksize,
        batch_size=args.batchsize,
        decoder=args.decoder,
        **duplex_kwargs,
    )
    if args.min_qscore:
        pipeline.simplex.min_qscore = args.min_qscore
    if args.read_ids:
        with open(args.read_ids) as _fh:
            pipeline.simplex.only_read_ids = {l.strip() for l in _fh if l.strip()}

    files = find_pod5_files(args.data, recursive=args.recursive)
    if not files:
        print(f"> No POD5 files found under {args.data}", file=sys.stderr)
        return 1
    header = pipeline.simplex.build_header(files, cli_line=_cl_line())

    out_is_stdout = args.output == "-"
    if args.emit_fastq:
        from dorado_tpu.io.sam import FastqWriter

        fh = sys.stdout if out_is_stdout else open(args.output, "w")
        writer = FastqWriter(fh, header)
    elif args.emit_sam:
        fh = sys.stdout if out_is_stdout else open(args.output, "w")
        writer = SamWriter(fh, header)
    else:
        fh = sys.stdout.buffer if out_is_stdout else open(args.output, "wb")
        writer = BamWriter(fh, header)

    stats = pipeline.run(args.data, writer, recursive=args.recursive)
    writer.close()
    if not out_is_stdout:
        fh.close()
    print(f"> Simplex reads basecalled: {stats.simplex_reads}", file=sys.stderr)
    print(f"> Duplex reads basecalled: {stats.duplex_reads}", file=sys.stderr)
    if stats.simplex_reads:
        rate = 200.0 * stats.duplex_reads / stats.simplex_reads
        print(f"> Duplex rate: {rate:.2f}%", file=sys.stderr)
    return 0


def _run_basespace_duplex(args: argparse.Namespace) -> int:
    """Duplex consensus from basecalled reads + a pairs file
    (cli_lib/duplex.cpp:431-456 basespace mode)."""
    from dorado_tpu.duplex.basespace import basespace_duplex_call
    from dorado_tpu.io.bam_reader import read_records
    from dorado_tpu.io.sam import BamWriter, SamHeader, SamRecord, SamTag, SamWriter
    from dorado_tpu.utils import mean_qscore_from_qstring

    if not args.pairs:
        print("> basespace mode requires --pairs", file=sys.stderr)
        return 1
    _, records = read_records(args.data)
    by_id = {r.qname: r for r in records}
    pairs = []
    with open(args.pairs) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) >= 2:
                pairs.append((parts[0], parts[1]))

    out_is_stdout = args.output == "-"
    header = SamHeader()
    if getattr(args, "emit_fastq", False):
        from dorado_tpu.io.sam import FastqWriter

        fh = sys.stdout if out_is_stdout else open(args.output, "w")
        writer = FastqWriter(fh, header)
    elif args.emit_sam:
        fh = sys.stdout if out_is_stdout else open(args.output, "w")
        writer = SamWriter(fh, header)
    else:
        fh = sys.stdout.buffer if out_is_stdout else open(args.output, "wb")
        writer = BamWriter(fh, header)

    n = 0
    for t_id, c_id in pairs:
        t = by_id.get(t_id)
        c = by_id.get(c_id)
        if t is None or c is None:
            continue
        result = basespace_duplex_call(t.seq, t.qual, c.seq, c.qual)
        if result is None:
            continue
        seq, qstring = result
        writer.write(
            SamRecord(
                qname=f"{t_id};{c_id}",
                seq=seq,
                qual=qstring,
                tags=[
                    SamTag("qs", "f", mean_qscore_from_qstring(qstring)),
                    SamTag("dx", "i", 1),
                ],
            )
        )
        n += 1
    writer.close()
    if not out_is_stdout:
        fh.close()
    print(f"> Duplex reads basecalled: {n}", file=sys.stderr)
    return 0


def _add_download(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("download", help="Download basecalling models")
    p.add_argument("--model", default="all")
    p.add_argument("--list", action="store_true")
    p.add_argument("--list-yaml", action="store_true")
    p.add_argument("--list-structured", action="store_true",
                   help="List models grouped by chemistry/variant")
    p.add_argument("--directory", default=".")
    p.add_argument("--models-directory", default=None,
                   help="Alias for --directory (reference flag name)")
    p.add_argument("--data", default=None,
                   help="POD5 data to auto-select models for")
    p.add_argument("-r", "--recursive", action="store_true")
    _add_common_opts(p)
    p.set_defaults(func=_run_download)


def _run_download(args: argparse.Namespace) -> int:
    from dorado_tpu.models.registry import list_models

    if args.list_structured:
        from collections import defaultdict

        groups = defaultdict(list)
        for name in list_models():
            prefix = name.split("@")[0]
            groups[prefix].append(name)
        for prefix in sorted(groups):
            print(prefix)
            for name in sorted(groups[prefix]):
                print(f"  {name}")
        return 0
    if args.list or args.list_yaml:
        for name in list_models():
            print(name)
        return 0
    if args.data:
        # auto-select + download the models matching the input chemistry
        from dorado_tpu.io.pod5 import Pod5File, find_pod5_files
        from dorado_tpu.models.registry import get_chemistry, resolve_simplex_model

        files = find_pod5_files(args.data, recursive=args.recursive)
        if not files:
            print(f"> No POD5 files found under {args.data}", file=sys.stderr)
            return 1
        ri = Pod5File(files[0]).run_infos[0]
        chemistry = get_chemistry(
            ri.flow_cell_product_code, ri.sequencing_kit, ri.sample_rate
        )
        if chemistry is None:
            print("> Could not determine chemistry", file=sys.stderr)
            return 1
        from dorado_tpu.models.downloader import download_model

        rc = 0
        for variant in ("fast", "hac", "sup"):
            info = resolve_simplex_model(chemistry, variant, None)
            print(f"> {variant}: {info.name}", file=sys.stderr)
            rc |= download_model(info.name, Path(args.models_directory or args.directory))
        return rc
    from dorado_tpu.models.downloader import download_model

    return download_model(args.model, Path(args.models_directory or args.directory))


def _add_demux(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("demux", help="Demultiplex a basecalled BAM/SAM by barcode")
    p.add_argument("reads", help="Basecalled BAM or SAM file")
    p.add_argument("--kit-name", default=None,
                   help="Barcoding kit (or use --barcode-arrangement)")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--emit-summary", action="store_true")
    p.add_argument("--barcode-both-ends", action="store_true")
    p.add_argument("--sample-sheet", default=None,
                   help="MinKNOW sample sheet CSV (barcode aliasing + filtering)")
    p.add_argument("--barcode-arrangement", default=None,
                   help="Custom barcode arrangement TOML")
    p.add_argument("--barcode-sequences", default=None,
                   help="Custom barcode sequences FASTA")
    p.add_argument("--no-classify", action="store_true",
                   help="Group by existing BC tags instead of classifying")
    p.add_argument("--no-trim", action="store_true",
                   help="Keep barcode sequence on the reads (default: trim)")
    p.add_argument("--sort-bam", action="store_true")
    p.add_argument("--max-reads", type=int, default=None)
    p.add_argument("--read-ids", default=None)
    p.add_argument("-r", "--recursive", action="store_true",
                   help="Search the reads folder recursively")
    _add_common_opts(p)
    p.set_defaults(func=_run_demux)


def _run_demux(args: argparse.Namespace) -> int:
    from collections import defaultdict

    from dorado_tpu.demux import BarcodeClassifier
    from dorado_tpu.demux.barcoder import UNCLASSIFIED, normalize_barcode_name
    from dorado_tpu.io.bam_reader import read_records
    from dorado_tpu.io.sam import BamWriter, SamHeader, SamTag

    reads_path = Path(args.reads)
    if reads_path.is_dir():
        # folder input scans for BAM/SAM/FASTQ (recursively with -r),
        # like the reference's HtsReader loop (demux.cpp reads folder)
        pattern = "**/*" if args.recursive else "*"
        read_files = sorted(
            p for p in reads_path.glob(pattern)
            if p.suffix in (".bam", ".sam", ".cram", ".fastq", ".fq")
        )
        if not read_files:
            print(f"> No read files found in {args.reads}", file=sys.stderr)
            return 1
        header_text = ""
        records = []
        for rf in read_files:
            if rf.suffix in (".fastq", ".fq"):
                records.extend(_read_fastq(str(rf)))
                continue
            ht, recs = read_records(str(rf))
            header_text = header_text or ht
            records.extend(recs)
    elif str(reads_path).endswith((".fastq", ".fq")):
        header_text, records = "", _read_fastq(args.reads)
    else:
        header_text, records = read_records(args.reads)
    sample_sheet = None
    if args.sample_sheet:
        from dorado_tpu.utils.sample_sheet import SampleSheet

        sample_sheet = SampleSheet(args.sample_sheet, skip_index_matching=True)
    custom_kit_info = None
    kit_name = args.kit_name
    if args.barcode_arrangement:
        from dorado_tpu.demux import add_custom_barcodes, parse_custom_arrangement
        from dorado_tpu.demux.custom_kit import parse_custom_sequences

        kit_name, custom_kit_info = parse_custom_arrangement(args.barcode_arrangement)
        if args.barcode_sequences:
            add_custom_barcodes(parse_custom_sequences(args.barcode_sequences))
    classifier = None
    kit_display = kit_name or ""
    if not args.no_classify:
        if not kit_name:
            print(
                "> demux requires --kit-name (or --barcode-arrangement) "
                "unless --no-classify groups by existing BC tags.",
                file=sys.stderr,
            )
            return 1
        classifier = BarcodeClassifier(
            kit_name,
            allowed_barcodes=(
                sample_sheet.get_barcode_values() if sample_sheet else None
            ),
            kit_info=custom_kit_info,
        )
        kit_display = classifier.kit_info["name"]

    only_ids = None
    if args.read_ids:
        with open(args.read_ids) as _fh:
            only_ids = {l.strip() for l in _fh if l.strip()}

    by_barcode = defaultdict(list)
    original_barcode: dict[str, str] = {}
    n_done = 0
    for rec in records:
        if only_ids is not None and rec.qname not in only_ids:
            continue
        if args.max_reads is not None and n_done >= args.max_reads:
            break
        n_done += 1
        if args.no_classify:
            name = next((t.value for t in rec.tags if t.tag == "BC"), UNCLASSIFIED)
            by_barcode[name].append(rec)
            continue
        result = classifier.classify(
            rec.seq if rec.seq != "*" else "",
            barcode_both_ends=args.barcode_both_ends,
        )
        if result.barcode_name == UNCLASSIFIED:
            name = UNCLASSIFIED
        else:
            name = f"{kit_display}_{normalize_barcode_name(result.barcode_name)}"
            # sample-sheet alias replaces the barcode id in the BC tag and
            # output grouping (BarcodeClassifierNode.cpp:131-137); keep the
            # original id for the summary's barcode_arrangement column
            original_barcode[rec.qname] = name
            if sample_sheet is not None:
                alias = sample_sheet.get_alias(name)
                if alias:
                    name = alias
        rec.tags = [t for t in rec.tags if t.tag != "BC"] + [SamTag("BC", "Z", name)]
        if not args.no_trim and result.barcode_name != UNCLASSIFIED:
            # trim the detected barcode span off the read (TrimmerNode after
            # classification; reference default behaviour, Trimmer.cpp:40-91)
            from dorado_tpu.demux.barcoder import determine_barcode_trim_interval
            from dorado_tpu.demux.trimmer import trim_record

            interval = determine_barcode_trim_interval(result, len(rec.seq))
            if interval != (0, len(rec.seq)):
                trim_record(rec, interval)
        by_barcode[name].append(rec)

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    header = SamHeader()
    for line in header_text.splitlines():
        if line.startswith("@CO"):
            header.comments.append(line.split("\t", 1)[-1])
    for name, recs in sorted(by_barcode.items()):
        path = out_dir / f"{name}.bam"
        with open(path, "wb") as fh:
            if args.sort_bam:
                from dorado_tpu.io.sorted_bam import SortedBamWriter

                w = SortedBamWriter(fh, header, index_path=f"{path}.bai")
            else:
                w = BamWriter(fh, header)
            for rec in recs:
                w.write(rec)
            w.close()
        print(f"> {name}: {len(recs)} reads -> {path}", file=sys.stderr)
    if args.emit_summary:
        # barcoding summary TSV next to the demuxed files (the reference's
        # SummaryFileWriter in the demux output dir, demux.cpp:260-264)
        spath = out_dir / "barcoding_summary.txt"
        with open(spath, "w") as fh:
            fh.write("read_id\tbarcode_arrangement\tbarcode_kit\talias\n")
            for name, recs in sorted(by_barcode.items()):
                for rec in recs:
                    orig = original_barcode.get(rec.qname, name)
                    alias = name if name != orig else ""
                    fh.write(f"{rec.qname}\t{orig}\t{kit_display}\t{alias}\n")
        print(f"> Barcoding summary -> {spath}", file=sys.stderr)
    return 0


def _add_trim(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("trim", help="Trim adapters/primers from a basecalled BAM/SAM")
    p.add_argument("reads")
    p.add_argument("-o", "--output", default="-")
    p.add_argument("--emit-sam", action="store_true")
    p.add_argument("--kit-name", default=None)
    p.add_argument(
        "--primer-sequences", default=None,
        help="Custom primer sequences FASTA",
    )
    p.add_argument("--sequencing-kit", default=None,
                   help="Sequencing kit (alias used by the reference trim)")
    p.add_argument("--no-trim-primers", action="store_true")
    p.add_argument("--emit-fastq", action="store_true")
    p.add_argument("--max-reads", type=int, default=None)
    p.add_argument("--read-ids", default=None)
    p.add_argument("--rna", action="store_true",
                   help="Input is direct RNA (adapters trimmed from 3' end)")
    _add_common_opts(p)
    p.set_defaults(func=_run_trim)


def _run_trim(args: argparse.Namespace) -> int:
    from dorado_tpu.demux.adapters import (
        determine_trim_interval,
        find_adapters,
        find_primers,
    )
    from dorado_tpu.demux.trimmer import trim_record
    from dorado_tpu.io.bam_reader import read_records
    from dorado_tpu.io.sam import BamWriter, SamHeader, SamWriter

    if args.primer_sequences:
        from dorado_tpu.demux.adapters import add_custom_primers
        from dorado_tpu.demux.custom_kit import parse_custom_sequences

        add_custom_primers(parse_custom_sequences(args.primer_sequences))

    kit_name = args.kit_name or args.sequencing_kit
    only_ids = None
    if args.read_ids:
        with open(args.read_ids) as _fh:
            only_ids = {l.strip() for l in _fh if l.strip()}

    header_text, records = read_records(args.reads)
    if only_ids is not None:
        records = [r for r in records if r.qname in only_ids]
    if args.max_reads is not None:
        records = records[: args.max_reads]
    header = SamHeader()

    out_is_stdout = args.output == "-"
    if args.emit_fastq:
        from dorado_tpu.io.sam import FastqWriter

        fh = sys.stdout if out_is_stdout else open(args.output, "w")
        writer = FastqWriter(fh, header)
    elif args.emit_sam:
        fh = sys.stdout if out_is_stdout else open(args.output, "w")
        writer = SamWriter(fh, header)
    else:
        fh = sys.stdout.buffer if out_is_stdout else open(args.output, "wb")
        writer = BamWriter(fh, header)

    n_trimmed = 0
    for rec in records:
        seq = rec.seq if rec.seq != "*" else ""
        if seq:
            res = find_adapters(seq, kit_name)
            interval = determine_trim_interval(res, len(seq))
            trim_record(rec, interval)
            if not args.no_trim_primers:
                seq2 = rec.seq
                res2 = find_primers(seq2, kit_name)
                interval2 = determine_trim_interval(res2, len(seq2))
                trim_record(rec, interval2)
            if len(rec.seq) != len(seq):
                n_trimmed += 1
        writer.write(rec)
    writer.close()
    if not out_is_stdout:
        fh.close()
    print(f"> Trimmed {n_trimmed}/{len(records)} reads", file=sys.stderr)
    return 0


def _add_aligner(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("aligner", help="Align reads to a reference (from-scratch mapper)")
    p.add_argument("reference", help="Reference FASTA")
    p.add_argument("reads", help="Reads: BAM/SAM/FASTQ")
    p.add_argument("-o", "--output", default="-")
    p.add_argument("--emit-sam", action="store_true")
    p.add_argument("-k", type=int, default=15)
    p.add_argument("-w", type=int, default=10)
    p.add_argument("--bed-file", default=None,
                   help="BED regions; adds bh:i overlap-count tags")
    p.add_argument("--no-sort", action="store_true",
                   help="Skip coordinate sorting of BAM output")
    p.add_argument("--mm2-opts", default=None,
                   help="minimap2-style option string, e.g. '-k 15 -w 10'")
    p.add_argument("--max-reads", type=int, default=None)
    p.add_argument("-r", "--recursive", action="store_true",
                   help="Search the reads folder recursively (aligner.cpp)")
    p.add_argument("--allow-sec-supp", action="store_true",
                   help="Re-align input secondary/supplementary records "
                        "instead of skipping them (aligner.cpp:143,183)")
    _add_common_opts(p)
    p.set_defaults(func=_run_aligner)


def _read_fastq(path):
    from dorado_tpu.io.sam import SamRecord

    records = []
    with open(path) as fh:
        while True:
            h = fh.readline().strip()
            if not h:
                break
            seq = fh.readline().strip()
            fh.readline()
            qual = fh.readline().strip()
            records.append(SamRecord(qname=h[1:].split()[0], seq=seq, qual=qual))
    return records


def _run_aligner(args: argparse.Namespace) -> int:
    from dorado_tpu.alignment import Mapper, ReferenceIndex
    from dorado_tpu.io.bam_reader import read_records
    from dorado_tpu.io.sam import BamWriter, SamHeader, SamRecord, SamTag, SamWriter
    from dorado_tpu.utils import reverse_complement

    k, w = args.k, args.w
    # minimap2 defaults: up to 5 secondary alignments (--secondary=yes, -N 5)
    n_secondary = 5
    if args.mm2_opts:
        # minimap2-style option string (alignment/minimap2_args parity for
        # the supported subset)
        toks = args.mm2_opts.split()
        i = 0
        while i < len(toks):
            if toks[i] in ("-k", "-w") and i + 1 < len(toks):
                if toks[i] == "-k":
                    k = int(toks[i + 1])
                else:
                    w = int(toks[i + 1])
                i += 2
            elif toks[i].startswith("-k") and len(toks[i]) > 2:
                k = int(toks[i][2:]); i += 1
            elif toks[i].startswith("-w") and len(toks[i]) > 2:
                w = int(toks[i][2:]); i += 1
            elif toks[i] == "--secondary=no":
                n_secondary = 0; i += 1
            elif toks[i] == "--secondary=yes":
                i += 1
            elif toks[i] == "-N" and i + 1 < len(toks):
                n_secondary = int(toks[i + 1]); i += 2
            else:
                print(f"> Ignoring unsupported mm2 option {toks[i]!r}", file=sys.stderr)
                i += 1

    print(f"> Indexing {args.reference}", file=sys.stderr)
    index = ReferenceIndex.build(args.reference, k=k, w=w)
    mapper = Mapper(index, max_alignments=1 + n_secondary)

    bed = None
    if args.bed_file:
        from dorado_tpu.alignment.bed_file import BedFile

        bed = BedFile.load(args.bed_file)

    from pathlib import Path as P

    reads_path = P(args.reads)
    if reads_path.is_dir():
        # folder input like the reference's HtsReader loop (aligner.cpp)
        pattern = "**/*" if args.recursive else "*"
        read_files = sorted(
            p for p in reads_path.glob(pattern)
            if p.suffix in (".bam", ".sam", ".cram", ".fastq", ".fq")
        )
        if not read_files:
            print(f"> No read files found in {args.reads}", file=sys.stderr)
            return 1
    else:
        read_files = [reads_path]
    records = []
    for rf in read_files:
        if rf.suffix in (".fastq", ".fq"):
            records.extend(_read_fastq(str(rf)))
        else:
            records.extend(read_records(str(rf))[1])
    if not args.allow_sec_supp:
        # input secondary/supplementary records are dropped before
        # re-alignment by default (aligner.cpp:183 skip_sec_supp)
        records = [r for r in records if not (r.flag & 0x900)]
    if args.max_reads is not None:
        records = records[: args.max_reads]

    header = SamHeader()
    header.sort_order = "coordinate" if not args.no_sort else "unsorted"
    header.references = list(zip(index.names, index.lengths))
    header.programs.append(
        {"ID": "aligner", "PN": "dorado_tpu", "CL": _cl_line()}
    )

    out_is_stdout = args.output == "-"
    if args.emit_sam:
        fh = sys.stdout if out_is_stdout else open(args.output, "w")
        writer = SamWriter(fh, header)
    elif not out_is_stdout and str(args.output).endswith(".cram"):
        # extension-selected CRAM, as the reference's hts_file picks
        # OutputMode::CRAM from the path (hts_utils/sequence_file_format.cpp).
        # Aligned output is reference-based (RR=true, htslib's default for
        # CRAM with a reference): the aligner index already holds the
        # contig sequences
        from dorado_tpu.io.cram import CramWriter

        fh = open(args.output, "wb")
        writer = CramWriter(
            fh,
            header,
            rans=getattr(args, "cram_rans", True),
            ref_seqs=dict(zip(index.names, index.seqs)),
        )
    else:
        fh = sys.stdout.buffer if out_is_stdout else open(args.output, "wb")
        if args.no_sort:
            writer = BamWriter(fh, header)
        else:
            # bounded-memory coordinate sort with spill-to-disk merge
            # (hts_file.h sort_bam mode); sorted file output also gets a
            # .bai like the reference (hts_file.cpp:446-509)
            from dorado_tpu.io.sorted_bam import SortedBamWriter

            writer = SortedBamWriter(
                fh,
                header,
                index_path=None if out_is_stdout else f"{args.output}.bai",
            )

    n_mapped = 0
    ref_order = {name: i for i, name in enumerate(index.names)}
    aligned, unmapped = [], []
    for rec in records:
        seq = rec.seq if rec.seq != "*" else ""
        alns = mapper.map(seq) if seq else []
        if not alns:
            rec.flag |= 4
            unmapped.append(rec)
            continue
        a = alns[0]
        n_mapped += 1
        # lower-ranked chains become secondary records (flag 0x100) the way
        # minimap2 emits them (SEQ/QUAL omitted per the SAM spec convention)
        for sec in alns[1:]:
            aligned.append(SamRecord(
                qname=rec.qname,
                flag=(0x100 | (16 if sec.is_reverse else 0)),
                rname=sec.ref_name,
                pos=sec.ref_start + 1,
                mapq=0,
                cigar=sec.cigar,
                seq="*",
                qual="*",
                tags=[SamTag("NM", "i", sec.nm), SamTag("AS", "i", sec.score)],
            ))
        rec.flag = 16 if a.is_reverse else 0
        rec.rname = a.ref_name
        rec.pos = a.ref_start + 1
        rec.mapq = a.mapq
        rec.cigar = a.cigar
        if a.is_reverse:
            rec.seq = reverse_complement(seq)
            if rec.qual != "*":
                rec.qual = rec.qual[::-1]
        rec.tags = [t for t in rec.tags if t.tag not in ("NM", "AS", "bh")]
        rec.tags.append(SamTag("NM", "i", a.nm))
        rec.tags.append(SamTag("AS", "i", a.score))
        if bed is not None:
            # reference span from the CIGAR (AlignerNode.cpp:253-254)
            import re as _re

            span = sum(
                int(n) for n, op in _re.findall(r"(\d+)([MIDNSHP=X])", a.cigar)
                if op in "MDN=X"
            )
            rec.tags.append(
                SamTag("bh", "i", bed.hits(a.ref_name, a.ref_start, a.ref_start + span, a.is_reverse))
            )
        aligned.append(rec)
    # coordinate-sorted output (hts_file.h sorted-BAM mode)
    aligned.sort(key=lambda r: (ref_order.get(r.rname, 1 << 30), r.pos))
    for rec in aligned + unmapped:
        writer.write(rec)
    writer.close()
    if not out_is_stdout:
        fh.close()
    print(f"> Mapped {n_mapped}/{len(records)} reads", file=sys.stderr)
    return 0


def _add_polish(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("polish", help="Polish a draft assembly with aligned reads")
    p.add_argument("reads", help="Aligned BAM/SAM (or FASTQ to self-align)")
    p.add_argument("draft", help="Draft assembly FASTA")
    p.add_argument("--model-params", default=None, help="GRU model params dir (.tensor files); random init if omitted (testing only)")
    p.add_argument("--model-config", default=None,
                   help="Model config TOML selecting the architecture "
                        "(GRUModel/LatentSpaceLSTM/SlotAttentionConsensus/"
                        "VariantPerceiver) and its kwargs")
    p.add_argument("-o", "--output", default="-")
    p.add_argument("--window-len", type=int, default=10000)
    p.add_argument("--regions", default=None,
                   help="Comma-separated contig[:start-end] regions to polish")
    p.add_argument("--min-mapq", type=int, default=0)
    p.add_argument("--min-depth", type=int, default=0,
                   help="Below this coverage the draft base is kept")
    p.add_argument("--qualities", action="store_true",
                   help="Emit FASTQ with per-base consensus qualities")
    p.add_argument("--hp-tag", action="store_true",
                   help="Source the haplotag feature column from BAM HP tags "
                        "(default: unphased, matching the reference polish)")
    p.add_argument("--no-fill-gaps", action="store_true",
                   help="Do not fill uncovered spans from the draft; emit one "
                        "record per covered run (polish.cpp:213)")
    p.add_argument("--vcf", action="store_true",
                   help="Emit variants as VCF instead of polished FASTA "
                        "(polish.cpp:173)")
    p.add_argument("--gvcf", action="store_true",
                   help="Emit gVCF instead of polished FASTA (polish.cpp:177)")
    p.add_argument("--RG", dest="rg", default="",
                   help="Read group to select (polish.cpp:222)")
    p.add_argument("--ignore-read-groups", action="store_true",
                   help="Process all read groups (polish.cpp:223)")
    p.add_argument("--window-overlap", type=int, default=None,
                   help="Overlap between consensus windows (polish.cpp)")
    p.add_argument("--ambig-ref", dest="ambig_ref", action="store_true",
                   help="Call over ambiguous reference bases (--vcf mode)")
    p.add_argument("--fill-char", default=None,
                   help="Fill uncovered spans with this character instead "
                        "of the draft bases")
    # device-batching knobs are managed by the XLA runtime; accepted for
    # drop-in compatibility (polish.cpp:170-210)
    p.add_argument("-b", "--batchsize", type=int, default=None)
    p.add_argument("--draft-batchsize", default=None)
    p.add_argument("--encoding-batchsize", type=int, default=None)
    p.add_argument("--bam-chunk", type=int, default=None)
    p.add_argument("--bam-subchunk", type=int, default=None)
    p.add_argument("--bacteria", action="store_true",
                   help="Resolve a bacterial polishing model")
    p.add_argument("-m", "--model", default=None,
                   help="Polish model: 'auto' (resolve from the BAM's "
                        "basecall_model header), a model name, or a "
                        "directory (polish.cpp:515-640)")
    p.add_argument("--models-directory", default=".",
                   help="Where resolved models are found/downloaded")
    _add_common_opts(p)
    p.set_defaults(func=_run_polish)


def _run_polish(args: argparse.Namespace) -> int:
    import jax

    from dorado_tpu.secondary.model import init_gru_params
    from dorado_tpu.secondary.polish import PolishPipeline

    if args.vcf or args.gvcf:
        # polish --vcf/--gvcf is the variant-calling flow with the polish
        # model (cram-polish-17-vcf.t); delegate with variant defaults
        for name, default in (
            ("unphased", False),
            ("ambig_ref", False),
            ("pass_qual_filter", 3.0),
            ("candidates", None),
            ("variant_flanking_bases", 100),
        ):
            if not hasattr(args, name):
                setattr(args, name, default)
        return _run_variant(args)

    forward = None
    feature_kind = "counts"
    if getattr(args, "model", None):
        from dorado_tpu.io.bam_reader import read_records
        from dorado_tpu.secondary.model_resolver import (
            load_resolved_model,
            resolve_model_dir,
        )

        header_text = ""
        if args.model == "auto" and not args.reads.endswith((".fastq", ".fq")):
            header_text = read_records(args.reads)[0]
        try:
            mdir = resolve_model_dir(
                args.model, header_text, bacteria=args.bacteria,
                models_directory=args.models_directory,
            )
            params, forward, mc, feature_kind = load_resolved_model(mdir)
        except (ValueError, RuntimeError) as e:
            print(f"> {e}", file=sys.stderr)
            return 1
        print(f"> Model: {mdir.name} ({feature_kind})", file=sys.stderr)
    elif getattr(args, "model_config", None):
        from dorado_tpu.secondary.architectures import model_factory, parse_model_config

        mc = parse_model_config(args.model_config)
        params, forward, _ = model_factory(mc["model_type"], mc["model_kwargs"])
        if mc["model_type"] != "GRUModel":
            feature_kind = "read_level"
        print(f"> Model: {mc['model_type']}", file=sys.stderr)
    elif args.model_params and (
        str(args.model_params).endswith(".pt")
        or (Path(args.model_params) / "model.pt").exists()
    ):
        # TorchScript blob (reference: model_factory.cpp:186-201 loads
        # model.pt as an opaque torch::jit module via ModelTorchScript)
        from dorado_tpu.secondary.model import TorchScriptConsensusModel

        ts_path = Path(args.model_params)
        if ts_path.is_dir():
            ts_path = ts_path / "model.pt"
        forward = TorchScriptConsensusModel(ts_path)
        params = None
        print(f"> Model: TorchScript ({ts_path})", file=sys.stderr)
    elif args.model_params:
        from dorado_tpu.io.tensor_file import load_tensor
        from pathlib import Path as P

        d = P(args.model_params)
        params = {"layers": [], "linear": {}}
        l = 0
        while (d / f"gru.weight_ih_l{l}.tensor").exists():
            layer = {}
            for key, sfx in (("fwd", ""), ("rev", "_reverse")):
                if not (d / f"gru.weight_ih_l{l}{sfx}.tensor").exists():
                    continue
                layer[key] = {
                    "w_ih": load_tensor(d / f"gru.weight_ih_l{l}{sfx}.tensor"),
                    "w_hh": load_tensor(d / f"gru.weight_hh_l{l}{sfx}.tensor"),
                    "b_ih": load_tensor(d / f"gru.bias_ih_l{l}{sfx}.tensor"),
                    "b_hh": load_tensor(d / f"gru.bias_hh_l{l}{sfx}.tensor"),
                }
            params["layers"].append(layer)
            l += 1
        params["linear"] = {
            "w": load_tensor(d / "linear.weight.tensor"),
            "b": load_tensor(d / "linear.bias.tensor"),
        }
    else:
        print(
            "> WARNING: no --model-params given; using random weights "
            "(structural test mode only)",
            file=sys.stderr,
        )
        params = init_gru_params(jax.random.PRNGKey(0))

    by_contig = _collect_alignments(args)
    if by_contig is None:
        return 1

    pipeline_kwargs = {}
    if args.window_overlap is not None:
        pipeline_kwargs["window_overlap"] = args.window_overlap
    if args.fill_char:
        pipeline_kwargs["fill_char"] = args.fill_char[0]
    pipeline = PolishPipeline(
        params, window_len=args.window_len, forward=forward,
        feature_kind=feature_kind, min_depth=args.min_depth,
        feature_opts=_feature_opts(
            mc
            if (getattr(args, "model_config", None) or getattr(args, "model", None))
            else None,
            hap_source=("bam" if args.hp_tag else "unphased"),
        ),
        **pipeline_kwargs,
    )
    results = pipeline.run(
        args.draft, by_contig,
        regions=_parse_regions(args.regions),
        with_quals=args.qualities,
        fill_gaps=not args.no_fill_gaps,
    )

    fh = sys.stdout if args.output == "-" else open(args.output, "w")
    for name, result in results:
        if args.qualities:
            seq, qual = result
            fh.write(f"@{name}\n{seq}\n+\n{qual}\n")
            continue
        seq = result
        fh.write(f">{name}\n")
        for i in range(0, len(seq), 80):
            fh.write(seq[i : i + 80] + "\n")
    if args.output != "-":
        fh.close()
    print(
        f"> Polished {pipeline.stats.contigs} contig(s), "
        f"{pipeline.stats.windows} window(s)",
        file=sys.stderr,
    )
    return 0


def _add_variant(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("variant", help="Call variants against a draft reference")
    p.add_argument("reads", help="Aligned BAM/SAM (or FASTQ to self-align)")
    p.add_argument("draft", help="Reference FASTA")
    p.add_argument("--model-params", default=None)
    p.add_argument("--model-config", default=None,
                   help="Model config TOML (e.g. VariantPerceiver) — see polish")
    p.add_argument("-o", "--output", default="-")
    p.add_argument("--window-len", type=int, default=10000)
    p.add_argument("--regions", default=None,
                   help="Comma-separated contig[:start-end] regions to call")
    p.add_argument("--min-mapq", type=int, default=0)
    p.add_argument("--gvcf", action="store_true",
                   help="Emit a reference record for every position")
    p.add_argument("--ambig-ref", action="store_true",
                   help="Call variants over ambiguous reference bases")
    p.add_argument("--pass-qual-filter", type=float, default=3.0,
                   help="QUAL below this is marked LowQual (variant.cpp:105)")
    p.add_argument("--hp-tag", action="store_true",
                   help="Take haplotags from BAM HP tags instead of computing "
                        "local phasing (variant.cpp:492-495 BAM_HAP_TAG)")
    p.add_argument("--unphased", action="store_true",
                   help="Disable the haplotag feature column's phasing "
                        "(variant.cpp:492-495 UNPHASED)")
    p.add_argument("--RG", dest="rg", default="",
                   help="Read group to select (bam_info.cpp:115 semantics)")
    p.add_argument("--ignore-read-groups", action="store_true",
                   help="Process all read groups")
    p.add_argument("--candidates", default=None,
                   help="TSV of candidate variant sites (contig, pos) to "
                        "seed inference windows (variant.cpp:300)")
    p.add_argument("--variant-flanking-bases", type=int, default=100,
                   help="Window flank around each candidate site")
    p.add_argument("--window-overlap", type=int, default=None,
                   help="Overlap between calling windows")
    p.add_argument("-m", "--model", default=None,
                   help="Variant model: 'auto', a model name, or a directory")
    p.add_argument("--models-directory", default=".",
                   help="Where resolved models are found/downloaded")
    p.add_argument("--candidate-filtering", action="store_true",
                   help="Filter candidate sites before windowing (accepted "
                        "for compatibility; the merged-interval seeding "
                        "already restricts inference)")
    # device-batching knobs managed by the XLA runtime (variant.cpp:290-320)
    p.add_argument("-b", "--batchsize", type=int, default=None)
    p.add_argument("--ref-batchsize", default=None)
    p.add_argument("--encoding-batchsize", type=int, default=None)
    p.add_argument("--bam-chunk", type=int, default=None)
    p.add_argument("--bam-subchunk", type=int, default=None)
    _add_common_opts(p)
    p.set_defaults(func=_run_variant)


def _run_variant(args: argparse.Namespace) -> int:
    import jax
    import numpy as np

    from dorado_tpu.alignment.index import read_fasta
    from dorado_tpu.secondary.model import gru_forward, init_gru_params
    from dorado_tpu.secondary.pileup import build_pileup
    from dorado_tpu.secondary.variant import VcfWriter

    by_contig = _collect_alignments(args)
    if by_contig is None:
        return 1
    feature_kind = "counts"
    mc = None
    if getattr(args, "model", None):
        from dorado_tpu.io.bam_reader import read_records
        from dorado_tpu.secondary.model_resolver import (
            load_resolved_model,
            resolve_model_dir,
        )

        header_text = ""
        if args.model == "auto" and not args.reads.endswith((".fastq", ".fq")):
            header_text = read_records(args.reads)[0]
        try:
            mdir = resolve_model_dir(
                args.model, header_text,
                models_directory=args.models_directory,
            )
            params, fn, mc, feature_kind = load_resolved_model(mdir)
        except (ValueError, RuntimeError) as e:
            print(f"> {e}", file=sys.stderr)
            return 1
        print(f"> Model: {mdir.name} ({feature_kind})", file=sys.stderr)
    elif getattr(args, "model_config", None):
        from dorado_tpu.secondary.architectures import model_factory, parse_model_config

        mc = parse_model_config(args.model_config)
        params, fn, _ = model_factory(mc["model_type"], mc["model_kwargs"])
        if mc["model_type"] != "GRUModel":
            feature_kind = "read_level"
        print(f"> Model: {mc['model_type']}", file=sys.stderr)
    elif args.model_params and (
        str(args.model_params).endswith(".pt")
        or (Path(args.model_params) / "model.pt").exists()
    ):
        from dorado_tpu.secondary.model import TorchScriptConsensusModel

        ts_path = Path(args.model_params)
        if ts_path.is_dir():
            ts_path = ts_path / "model.pt"
        fn = TorchScriptConsensusModel(ts_path)
        params = None
        print(f"> Model: TorchScript ({ts_path})", file=sys.stderr)
    else:
        if args.model_params:
            print("> Custom model params loading shares the polish path", file=sys.stderr)
        params = init_gru_params(jax.random.PRNGKey(0))
        fn = jax.jit(gru_forward)

    # haplotag source precedence mirrors variant.cpp:492-495 (no bin-file
    # input here): --hp-tag -> BAM HP tags, --unphased -> none, default ->
    # local phasing computed per window
    hap_source = (
        "bam" if args.hp_tag else "unphased" if args.unphased else "compute"
    )
    feature_opts = _feature_opts(mc, hap_source=hap_source)

    contigs = read_fasta(args.draft)
    regions = _parse_regions(args.regions)

    # --candidates: merged flanked intervals around candidate sites replace
    # the whole-contig sweep (variant.cpp:300,482 candidate-seeded windows)
    candidate_spans = None
    if args.candidates:
        flank = max(0, args.variant_flanking_bases)
        per: dict[str, list[int]] = {}
        with open(args.candidates) as cf:
            for line in cf:
                f = line.split()
                if len(f) >= 2:
                    per.setdefault(f[0], []).append(int(f[1]))
        candidate_spans = {}
        for ctg, poss in per.items():
            poss.sort()
            spans: list[tuple[int, int]] = []
            for p in poss:
                lo, hi = max(0, p - flank), p + flank + 1
                if spans and lo <= spans[-1][1]:
                    spans[-1] = (spans[-1][0], max(spans[-1][1], hi))
                else:
                    spans.append((lo, hi))
            candidate_spans[ctg] = spans
        print(
            f"> Candidate windows: "
            f"{sum(len(s) for s in candidate_spans.values())} spans over "
            f"{len(candidate_spans)} contig(s)",
            file=sys.stderr,
        )
    processed_spans: list[tuple[str, int, int]] = []
    if args.output != "-" and Path(args.output).is_dir():
        # reference -o is an output dir holding variants.vcf (+ bed)
        args.output = str(Path(args.output) / "variants.vcf")
    fh = sys.stdout if args.output == "-" else open(args.output, "w")
    writer = VcfWriter(fh, [(n, len(s)) for n, s in contigs], gvcf=args.gvcf)
    n_var = 0
    for name, seq in contigs:
        if regions is not None and name not in regions:
            continue
        span = regions.get(name) if regions else None
        r_start, r_end = span if span else (0, len(seq))
        r_end = len(seq) if r_end is None else min(r_end, len(seq))
        reads = by_contig.get(name, [])
        # windows are processed with overlapping margins so events that
        # span a window boundary are called once, by the window that owns
        # their start position (trim_vc_samples / join_samples semantics,
        # polish_impl.cpp:2388-2392)
        if candidate_spans is not None:
            sub_spans = [
                (max(r_start, lo), min(r_end, hi))
                for lo, hi in candidate_spans.get(name, [])
                if lo < r_end and hi > r_start
            ]
        else:
            sub_spans = [(r_start, r_end)]
        processed_spans.extend((name, lo, hi) for lo, hi in sub_spans)
        margin = (
            args.window_overlap
            if getattr(args, "window_overlap", None) is not None
            else min(1000, args.window_len // 2)
        )
        # precompute reference ends once so window filters bound both sides
        # (ref_start-only filtering made late windows scan every read)
        import re as _re

        def _ref_end(r):
            span = sum(
                int(nn) for nn, op in _re.findall(r"(\d+)([MIDNSHP=X])", r.cigar)
                if op in "MDN=X"
            )
            return r.ref_start + max(span, 1)

        read_ends = [_ref_end(r) for r in reads]
        win_iter = [
            (start, lo, hi)
            for lo, hi in sub_spans
            for start in range(lo, hi, args.window_len)
        ]
        for start, s_lo, s_hi in win_iter:
            end = min(s_hi, start + args.window_len)
            w_start = max(s_lo, start - margin)
            w_end = min(s_hi, end + margin)
            window_reads = [
                r for r, e in zip(reads, read_ends)
                if r.ref_start < w_end and e > w_start
            ]
            pile = build_pileup(window_reads, w_start, w_end)
            if pile.depth.max(initial=0.0) == 0:
                continue
            if feature_kind == "read_level":
                from dorado_tpu.secondary.polish import _matrix_kwargs
                from dorado_tpu.secondary.read_matrix import build_read_matrix

                rm = build_read_matrix(
                    window_reads, w_start, w_end,
                    **_matrix_kwargs(feature_opts, window_reads, w_start, w_end),
                )
                logits = np.asarray(fn(params, rm.matrix[None]))[0]
            else:
                logits = np.asarray(fn(params, pile.counts[None]))[0]
            covered = pile.depth > 0
            from dorado_tpu.secondary.variant import decode_variants

            e = np.exp(logits - logits.max(-1, keepdims=True))
            probs = e / e.sum(-1, keepdims=True)
            vs = decode_variants(
                seq, name, probs[covered], pile.positions_major[covered],
                pile.positions_minor[covered],
                min_qual=args.pass_qual_filter,
                ambig_ref=args.ambig_ref,
                return_all=args.gvcf,
            )
            for v in vs:
                # only the owning window emits [start, end) records
                if start <= v.pos < end:
                    writer.write(v)
                    n_var += 1
    if args.output != "-":
        fh.close()
    if candidate_spans is not None and args.output != "-":
        # the regions actually processed, next to the VCF (the reference
        # writes processed_regions.bed into its output dir)
        bed_path = Path(args.output).with_suffix(".processed_regions.bed")
        with open(bed_path, "w") as bf:
            for ctg, lo, hi in processed_spans:
                bf.write(f"{ctg}\t{lo}\t{hi}\n")
        print(f"> Processed regions -> {bed_path}", file=sys.stderr)
    print(f"> Called {n_var} variant(s)", file=sys.stderr)
    return 0


def _collect_alignments(args):
    """reads (FASTQ self-aligned / BAM/SAM) -> {contig: [AlignedRead]} with
    the read-level feature inputs (qual, mapq, qname, mv/HP/NM tags) the
    secondary encoders consume (encoder_read_alignment.cpp:449-520)."""
    import numpy as np

    from dorado_tpu.io.bam_reader import read_records
    from dorado_tpu.secondary.pileup import AlignedRead

    min_mapq = getattr(args, "min_mapq", 0) or 0
    if args.reads.endswith((".fastq", ".fq")):
        from dorado_tpu.alignment import Mapper, ReferenceIndex
        from dorado_tpu.utils import reverse_complement

        index = ReferenceIndex.build(args.draft)
        mapper = Mapper(index)
        by_contig: dict[str, list[AlignedRead]] = {}
        for rec in _read_fastq(args.reads):
            qual = (
                np.frombuffer(rec.qual.encode(), dtype=np.uint8).astype(np.int16) - 33
                if rec.qual and rec.qual != "*"
                else None
            )
            for a in mapper.map(rec.seq):
                if a.mapq < min_mapq:
                    continue
                seq = reverse_complement(rec.seq) if a.is_reverse else rec.seq
                q = qual[::-1].copy() if (a.is_reverse and qual is not None) else qual
                by_contig.setdefault(a.ref_name, []).append(
                    AlignedRead(
                        a.ref_start, a.cigar, seq, a.is_reverse,
                        qual=q, mapq=a.mapq, qname=rec.qname,
                    )
                )
        return by_contig
    header_text, records = read_records(args.reads)
    # read-group selection (secondary/common/bam_info.cpp:103-118): multiple
    # RGs require --RG or --ignore-read-groups; --RG must name an existing one
    rg_ids = [
        f.split(":", 1)[1]
        for line in header_text.splitlines()
        if line.startswith("@RG")
        for f in line.split("\t")[1:]
        if f.startswith("ID:")
    ]
    want_rg = getattr(args, "rg", "") or ""
    if want_rg and rg_ids and want_rg not in rg_ids:
        print(
            f"> Read group '{want_rg}' not found in the input BAM.",
            file=sys.stderr,
        )
        return None
    if (
        not want_rg
        and len(rg_ids) > 1
        and not getattr(args, "ignore_read_groups", False)
    ):
        print(
            "> The input BAM contains more than one read group. Specify --RG "
            "to select one, or --ignore-read-groups to process all.",
            file=sys.stderr,
        )
        return None
    by_contig = {}
    for rec in records:
        # skip unmapped AND secondary/supplementary (0x900): secondaries
        # carry seq='*' and would corrupt the pileup (medaka_bamiter.cpp
        # filters them the same way)
        if rec.flag & (4 | 0x900) or rec.rname == "*" or rec.cigar == "*":
            continue
        if want_rg:
            rg = next((t.value for t in rec.tags if t.tag == "RG"), None)
            if rg != want_rg:
                continue
        if rec.mapq < min_mapq:
            continue
        tags = {t.tag: t for t in rec.tags}
        qual = (
            np.frombuffer(rec.qual.encode(), dtype=np.uint8).astype(np.int16) - 33
            if rec.qual and rec.qual != "*"
            else None
        )
        mv = tags.get("mv")
        hp = tags.get("HP")
        nm = tags.get("NM")
        by_contig.setdefault(rec.rname, []).append(
            AlignedRead(
                rec.pos - 1, rec.cigar, rec.seq, bool(rec.flag & 16),
                qual=qual, mapq=rec.mapq, qname=rec.qname,
                moves=(np.asarray(mv.value, dtype=np.int64) if mv is not None else None),
                haplotag=(int(hp.value) if hp is not None else 0),
                nm=(int(nm.value) if nm is not None else None),
            )
        )
    return by_contig


def _feature_opts(mc, hap_source: str = "unphased") -> dict:
    """Read-level encoder options from a parsed model config's
    [feature_encoder] kwargs (encoder_factory.cpp:96-118)."""
    kw = mc.get("feature_encoder_kwargs", {}) if mc else {}

    def b(name, default=False):
        v = kw.get(name, default)
        return v == "true" if isinstance(v, str) else bool(v)

    return {
        "include_dwells": b("include_dwells"),
        "include_haplotags": b("include_haplotype"),
        "include_snp_qv": b("include_snp_qv"),
        "hap_source": hap_source,
        "max_reads": int(kw.get("max_reads", 100)),
    }


def _parse_regions(spec: str | None):
    """"ctg" or "ctg:start-end" (1-based inclusive, the htslib convention)
    -> {ctg: (start0, end) or None}."""
    if not spec:
        return None
    out = {}
    for part in spec.split(","):
        part = part.strip()
        if ":" in part:
            name, rng = part.split(":", 1)
            lo, _, hi = rng.partition("-")
            out[name] = (int(lo) - 1, int(hi) if hi else None)
        else:
            out[part] = None
    return out


def _add_correct(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("correct", help="Error-correct reads via all-vs-all consensus")
    p.add_argument("reads", help="FASTQ of reads")
    p.add_argument("-o", "--output", default="-")
    p.add_argument("--min-depth", type=int, default=2)
    p.add_argument("--nn", action="store_true",
                   help="HERRO-style NN scorer at supported positions "
                        "(random weights unless --model-path)")
    p.add_argument("--model-path", default=None,
                   help="HERRO TorchScript model (e.g. herro-v1) run via "
                        "the torch-CPU fallback scorer")
    p.add_argument("--resume-from", default=None,
                   help="Skip-set file of already-corrected read names; "
                        "resumes after the furthest skipped read in input "
                        "order (cli_lib/correct.cpp find_furthest_skipped_read)")
    p.add_argument("-i", "--index-size", default="8G",
                   help="Bases per index block; decrease to shard runs "
                        "(correct.cpp:125-129)")
    p.add_argument("--compute-num-blocks", action="store_true",
                   help="Print the number of index blocks and exit")
    p.add_argument("--run-block-id", type=int, default=None,
                   help="Correct only the targets of this index block")
    p.add_argument("--to-paf", action="store_true",
                   help="Write all-vs-all overlaps as PAF and skip consensus")
    p.add_argument("-p", "--from-paf", default=None,
                   help="Consume overlaps from a PAF (from --to-paf) instead "
                        "of computing them")
    p.add_argument("--kmer-size", type=int, default=15,
                   help="Overlap-index k-mer size (correct.cpp:65)")
    p.add_argument("--ovl-window-size", type=int, default=10,
                   help="Overlap-index minimizer window (correct.cpp:66)")
    p.add_argument("--min-chain-score", type=int, default=None,
                   help="Minimum overlap chain score (correct.cpp:67)")
    _add_common_opts(p)
    p.set_defaults(func=_run_correct)


def _load_skip_set(path: str) -> set[str]:
    """First whitespace/':'-delimited token per non-blank line — ':' because
    correct can emit multiple outputs per input with a ':<num>' suffix
    (cli_lib/correct.cpp:253-277)."""
    out = set()
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            for i, ch in enumerate(line):
                if ch in ": \t":
                    line = line[:i]
                    break
            if line:
                out.add(line)
    return out


def _parse_size(s: str) -> int:
    """'8G'/'100000'-style sizes (utils::arg_parse::parse_string_to_size)."""
    s = str(s).strip().upper()
    mult = 1
    if s and s[-1] in "KMG":
        mult = {"K": 10**3, "M": 10**6, "G": 10**9}[s[-1]]
        s = s[:-1]
    return int(float(s) * mult)


def _run_correct(args: argparse.Namespace) -> int:
    from dorado_tpu.correct import ReadCorrector

    records = _read_fastq(args.reads)
    reads = [(r.qname, r.seq) for r in records]

    targets = None
    if args.resume_from:
        from pathlib import Path as P

        if not P(args.resume_from).exists():
            print(f"> Input resume index file {args.resume_from} does not exist!",
                  file=sys.stderr)
            return 1
        skip_set = _load_skip_set(args.resume_from)
        # everything up to and including the furthest skipped read in input
        # order is assumed complete (find_furthest_skipped_read semantics);
        # the remaining targets still overlap against the full read set
        furthest = -1
        for i, (name, _) in enumerate(reads):
            if name.split(":")[0] in skip_set:
                furthest = i
        if furthest >= 0:
            print(
                f"> Resuming after read {reads[furthest][0]} "
                f"({furthest + 1}/{len(reads)} inputs already corrected)",
                file=sys.stderr,
            )
            targets = {name for name, _ in reads[furthest + 1 :]}
    # index blocks: reads accumulate until the block reaches --index-size
    # bases (mm2 batch semantics; correct.cpp:125-129, cram-correct-blocks)
    index_size = _parse_size(args.index_size)
    blocks: list[list[str]] = []
    cur: list[str] = []
    cum = 0
    for name, seq in reads:
        cur.append(name)
        cum += len(seq)
        if cum >= index_size:
            blocks.append(cur)
            cur, cum = [], 0
    if cur:
        blocks.append(cur)
    if args.compute_num_blocks:
        print(len(blocks))
        return 0
    if args.run_block_id is not None:
        if not (0 <= args.run_block_id < len(blocks)):
            print(
                f"> --run-block-id {args.run_block_id} out of range "
                f"(0..{len(blocks) - 1})",
                file=sys.stderr,
            )
            return 1
        block = set(blocks[args.run_block_id])
        targets = block if targets is None else (targets & block)

    nn_scorer = None
    if args.model_path:
        from dorado_tpu.correct.nn_model import TorchScriptScorer

        nn_scorer = TorchScriptScorer(args.model_path)
        print(f"> Loaded TorchScript scorer from {args.model_path}", file=sys.stderr)
    corrector = ReadCorrector(
        min_depth=args.min_depth, use_nn=args.nn, nn_scorer=nn_scorer,
        kmer_size=args.kmer_size, ovl_window_size=args.ovl_window_size,
        min_chain_score=args.min_chain_score,
    )

    overlap_records = None
    if args.from_paf:
        overlap_records = []
        with open(args.from_paf) as pf:
            for line in pf:
                f = line.rstrip("\n").split("\t")
                if len(f) < 12:
                    continue
                cigar = ""
                for tag in f[12:]:
                    if tag.startswith("cg:Z:"):
                        cigar = tag[5:]
                if not cigar:
                    continue
                overlap_records.append((
                    f[0], int(f[1]), int(f[2]), int(f[3]), f[4],
                    f[5], int(f[6]), int(f[7]), int(f[8]),
                    int(f[9]), int(f[10]), int(f[11]), cigar,
                ))
        print(f"> Loaded {len(overlap_records)} PAF overlaps", file=sys.stderr)
    if args.to_paf:
        recs = corrector.compute_overlap_records(reads, targets)
        fh = sys.stdout if args.output == "-" else open(args.output, "w")
        for r in recs:
            fh.write("\t".join(str(v) for v in r[:12]) + f"\tcg:Z:{r[12]}\n")
        if args.output != "-":
            fh.close()
        print(f"> Wrote {len(recs)} PAF overlaps", file=sys.stderr)
        return 0
    corrected = corrector.correct(
        reads, targets=targets, overlap_records=overlap_records
    )

    fh = sys.stdout if args.output == "-" else open(args.output, "w")
    for name, seq in corrected:
        fh.write(f">{name}\n")
        for i in range(0, len(seq), 80):
            fh.write(seq[i : i + 80] + "\n")
    if args.output != "-":
        fh.close()
    print(
        f"> Corrected {corrector.stats.reads_corrected}/{corrector.stats.reads_total} "
        f"reads ({corrector.stats.overlaps} overlaps)",
        file=sys.stderr,
    )
    return 0


def _add_summary(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("summary", help="Create sequencing summary from a BAM/SAM")
    p.add_argument("reads", help="Basecalled BAM or SAM file")
    p.add_argument("-r", "--recursive", action="store_true")
    _add_common_opts(p)
    p.set_defaults(func=_run_summary)


def _run_summary(args: argparse.Namespace) -> int:
    from dorado_tpu.io.bam_reader import read_records
    from dorado_tpu.io.summary import write_summary

    reads_path = Path(args.reads)
    if reads_path.is_dir():
        pattern = "**/*" if getattr(args, "recursive", False) else "*"
        read_files = sorted(
            p for p in reads_path.glob(pattern)
            if p.suffix in (".bam", ".sam", ".cram")
        )
        if not read_files:
            print(f"> No read files found in {args.reads}", file=sys.stderr)
            return 1
        header, records = "", []
        for rf in read_files:
            ht, recs = read_records(str(rf))
            header = header or ht
            records.extend(recs)
    else:
        header, records = read_records(args.reads)
    n = write_summary(records, sys.stdout, header_text=header)
    print(f"> Summarised {n} reads", file=sys.stderr)
    return 0


def main(argv: list[str] | None = None) -> int:
    # The environment may pre-import jax (sitecustomize) before JAX_PLATFORMS
    # is read; re-apply it so `JAX_PLATFORMS=cpu dorado_tpu ...` works.
    import os

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    # persistent compilation cache: repeat runs skip the (slow) XLA compile
    cache_dir = os.environ.get(
        "DORADO_TPU_CACHE_DIR", os.path.expanduser("~/.cache/dorado_tpu/jax")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    # crash handlers (cli/main.cpp:84-87 analogue): native-fault tracebacks
    # via faulthandler; uncaught exceptions get a one-line summary + trace
    import faulthandler
    import traceback

    faulthandler.enable()

    def _excepthook(exc_type, exc, tb):
        print(f"[dorado_tpu] terminating with uncaught exception: {exc}", file=sys.stderr)
        traceback.print_exception(exc_type, exc, tb)
        # device state at crash time (gpu_monitor get_devices_status_info
        # role in the reference's crash reports)
        try:
            from dorado_tpu.utils.device_monitor import describe_devices

            for line in describe_devices():
                print(f"[dorado_tpu] {line}", file=sys.stderr)
        except Exception:
            pass

    sys.excepthook = _excepthook

    parser = argparse.ArgumentParser(prog="dorado_tpu")
    parser.add_argument(
        "--devopts",
        default=None,
        help="Internal developer options, 'k=v;k2=v2' (utils/dev_utils.h analogue)",
    )
    sub = parser.add_subparsers(dest="command", required=True)
    _add_basecaller(sub)
    _add_duplex(sub)
    _add_download(sub)
    _add_summary(sub)
    _add_demux(sub)
    _add_trim(sub)
    _add_aligner(sub)
    _add_polish(sub)
    _add_variant(sub)
    _add_correct(sub)
    args = parser.parse_args(argv)
    if args.devopts:
        from dorado_tpu.utils.dev_utils import set_dev_opts

        set_dev_opts(args.devopts)
    device = getattr(args, "device", "auto")
    if device and device != "auto":
        # -x/--device: the reference's device selector (-x cuda:all); here
        # it picks the JAX platform, with 'cpu' forcing the host backend
        platform = "cpu" if device.startswith("cpu") else device
        os.environ["JAX_PLATFORMS"] = platform
        jax.config.update("jax_platforms", platform)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
