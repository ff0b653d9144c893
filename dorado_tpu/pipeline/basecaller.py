"""Simplex basecalling pipeline: POD5 -> scaled chunks -> TPU engine -> BAM.

TPU-first re-architecture of the reference's thread/queue node graph
(dorado/api/pipeline_creation.cpp:46-120 and the nodes it wires): host code
here is a *feeder* (scale + chunk + batch-fill) and a *finisher* (stitch +
tags + write); all dense math runs inside the jitted `BasecallRunner`
program. Because the engine is a pure compiled function, "pipeline
parallelism" reduces to overlapping host feed/finish with device steps —
no AsyncQueues, no per-node worker threads.

Per-read semantics follow ScalerNode (dorado/read_pipeline/nodes/
ScalerNode.cpp:143-270), BasecallerNode chunking/stitch (BasecallerNode.cpp:
96-286) and ReadCommon tag generation (read_pipeline/base/messages.cpp:43-130).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from dorado_tpu.basecall.runner import BasecallRunner
from dorado_tpu.config import BasecallModelConfig
from dorado_tpu.io.pod5 import Pod5File, Pod5Read, find_pod5_files
from dorado_tpu.io.sam import SamHeader, SamRecord, SamTag
from dorado_tpu.signal.chunk import generate_chunks
from dorado_tpu.signal.scaling import Scaler
from dorado_tpu.signal.stitch import CalledChunk, stitch_chunks
from dorado_tpu.signal.trim import trim_signal
from dorado_tpu.utils import find_rna_polya, mean_qscore_from_qstring
from dorado_tpu.utils.time_utils import timestamp_from_unix_ms


@dataclass
class PipelineStats:
    reads_called: int = 0
    # reads whose POD5 row/signal failed to decode and were skipped
    # (DataLoader.cpp:76-93 logs-and-skips semantics)
    reads_skipped: int = 0
    samples_processed: int = 0  # real samples fed to the model (excl. padding)
    samples_incl_padding: int = 0
    bases_called: int = 0
    batches: int = 0
    elapsed_s: float = 0.0
    # wall time with NO batch in flight on the device while the run loop was
    # live — the host-starvation metric (the reference tracks the analogous
    # GPU idle via per-node thread saturation; MessageSink.h bounded queues)
    device_idle_s: float = 0.0
    # wall time the host spent blocked in runner.finish() waiting for the
    # device — large values mean the device, not the host, is the bottleneck
    finish_wait_s: float = 0.0
    # stage split (per-run deltas of RunnerStats timers + sink-thread time;
    # the per-range breakdown of the reference's gpu_profiling.h scopes):
    dispatch_wait_s: float = 0.0  # blocked in the async dispatch call
    device_fetch_s: float = 0.0  # blocked in jax.device_get (D2H)
    host_decode_s: float = 0.0  # numpy unpack + chunk materialisation
    # cumulative time inside _finish_read across sink worker threads
    # (thread-seconds: can exceed wall time)
    host_finish_s: float = 0.0

    @property
    def device_idle_frac(self) -> float:
        return self.device_idle_s / self.elapsed_s if self.elapsed_s else 0.0

    @property
    def samples_per_s(self) -> float:
        return self.samples_processed / self.elapsed_s if self.elapsed_s else 0.0

    @property
    def bases_per_s(self) -> float:
        return self.bases_called / self.elapsed_s if self.elapsed_s else 0.0


@dataclass
class _WorkingRead:
    read: Pod5Read
    scaled: np.ndarray
    num_trimmed: int
    shift_pa: float
    scale_pa: float
    scaling_method: str
    offsets: list[int]
    chunk_sizes: list[int]
    results: list = field(default_factory=list)
    pending: int = 0


class BasecallerPipeline:
    def __init__(
        self,
        config: BasecallModelConfig,
        params,
        chunk_size: int | None = None,
        batch_size: int | None = None,
        overlap: int | None = None,
        decoder: str = "viterbi",
        emit_moves: bool = False,
        compute_dtype=None,
        use_pallas: bool | None = None,
        modbase_caller=None,
        modbase_threshold: float = 0.05,
        barcode_classifier=None,
        barcode_both_ends: bool = False,
        sample_sheet=None,
        estimate_poly_a: bool = False,
        poly_a_config=None,
        split_reads: bool = True,
        min_qscore: float = 0.0,
        skip_read_ids: set | None = None,
        only_read_ids: set | None = None,
        max_reads: int | None = None,
        force_rna_adapter_trim: bool = False,
        mesh=None,
    ):
        import jax
        import jax.numpy as jnp

        self.config = config
        if not config.has_normalised_basecaller_params():
            config.normalise_basecaller_params()
        if compute_dtype is None:
            # bf16 is the production setting on TPU (docs/TUNING.md; the
            # reference runs f16 on GPU the same way) — the CLI's --dtype
            # overrides. CPU keeps f32 (bf16 emulation there is slow and
            # the tests compare against f32 torch).
            compute_dtype = (
                jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
            )
        self.runner = BasecallRunner(
            config,
            params,
            chunk_size=chunk_size,
            batch_size=batch_size,
            decoder=decoder,
            compute_dtype=compute_dtype,
            use_pallas=use_pallas,
            mesh=mesh,
        )
        self.overlap = int(
            overlap if overlap is not None else config.basecaller.overlap
        )
        self.overlap -= self.overlap % config.stride
        self.emit_moves = emit_moves
        self.modbase_caller = modbase_caller
        self.modbase_threshold = modbase_threshold
        self._modbase_scheduler = None  # created per-run when threaded
        self.barcode_classifier = barcode_classifier
        self.barcode_both_ends = barcode_both_ends
        self.sample_sheet = sample_sheet
        self.read_splitter = None
        self.rna_splitter = None
        if split_reads and config.is_rna_model:
            from dorado_tpu.splitter import RNAReadSplitter

            # RNA reads split in signal space BEFORE scaling/basecalling
            # (pipeline_creation.cpp:56-63 prepends the RNA ReadSplitNode)
            self.rna_splitter = RNAReadSplitter()
        if split_reads and not config.is_rna_model:
            from dorado_tpu.splitter import DuplexReadSplitter, DuplexSplitSettings

            pa = config.signal_norm_params.standardisation.standardise
            self.read_splitter = DuplexReadSplitter(
                DuplexSplitSettings.for_pa_scaling()
                if pa
                else DuplexSplitSettings()
            )
            # simplex pipeline uses the reduced finder set (ReadSplitNode in
            # simplex mode, pipeline_creation.cpp:84-99)
            self.read_splitter.settings.simplex_mode = True
        # per-barcode calculator selection (PolyTailCalculatorSelector keyed
        # on the read's classified barcode, PolyACalculatorNode.cpp:46);
        # poly_a_config may be a single PolyTailConfig or a {barcode: config}
        # dict from load_poly_tail_configs()
        self.poly_tail_selector = None
        if estimate_poly_a:
            from dorado_tpu.polytail import PolyTailCalculatorSelector

            self.poly_tail_selector = PolyTailCalculatorSelector(
                poly_a_config,
                is_rna=config.is_rna_model,
                speed=config.polya_speed_correction,
                offset=config.polya_offset_correction,
            )
        self.min_qscore = min_qscore
        self.skip_read_ids = skip_read_ids or set()
        self.only_read_ids = only_read_ids  # --read-ids allow-list
        self.max_reads = max_reads
        self._reads_fed = 0
        self.reads_filtered = 0
        self.scaler = Scaler(
            config.signal_norm_params,
            is_rna=config.is_rna_model or force_rna_adapter_trim,
        )
        self.stats = PipelineStats()
        self._stats_lock = threading.Lock()
        self._inflight_total = 0  # batches dispatched but not yet harvested
        self._idle_mark: float | None = None  # when inflight last hit zero

        # one batching lane per configured chunk size ({T, T/2})
        self._lanes = [
            {
                "buffer": self.runner.make_input_buffer(i),
                "spare": self.runner.make_input_buffer(i),
                "batch": [],  # (read, chunk index)
                "inflight": None,  # (device handle, batch)
            }
            for i in range(len(self.runner.chunk_sizes))
        ]

    def sample_stats(self) -> dict:
        rs = self.runner.stats
        return {
            "reads_called": self.stats.reads_called,
            "bases_called": self.stats.bases_called,
            "samples_processed": self.stats.samples_processed,
            "samples_incl_padding": self.stats.samples_incl_padding,
            "batches_called": rs.batches_called,
            "chunks_called": rs.chunks_called,
            "reads_filtered": self.reads_filtered,
            "batch_queue_depth": sum(len(l["batch"]) for l in self._lanes),
            "device_idle_s": round(self.stats.device_idle_s, 4),
            "finish_wait_s": round(self.stats.finish_wait_s, 4),
            "dispatch_wait_s": round(rs.dispatch_s, 4),
            "device_fetch_s": round(rs.fetch_s, 4),
            "host_decode_s": round(rs.host_decode_s, 4),
            "host_finish_s": round(self.stats.host_finish_s, 4),
        }

    # ------------------------------------------------------------------
    # header
    # ------------------------------------------------------------------

    def build_header(self, pod5_files: list[Path], cli_line: str = "") -> SamHeader:
        header = SamHeader()
        header.programs.append(
            {
                "ID": "basecaller",
                "PN": "dorado_tpu",
                "VN": "0.1.0",
                "CL": cli_line or "dorado_tpu basecaller",
            }
        )
        seen: dict[str, dict] = {}
        # per-RG sample-sheet index (flow_cell_id, position_id,
        # experiment_id) so aliases resolve per run for multi-run sheets
        # (bam_utils.cpp:103-112 uses the read group's own ids)
        self._rg_sheet_index: dict[str, tuple[str, str, str]] = {}
        for f in pod5_files:
            reader = Pod5File(f)
            for ri in reader.run_infos:
                rg_id = f"{ri.protocol_run_id}_{self.config.model_name}"
                # first entry wins so header aliasing stays stable across
                # file parse order (a shared protocol_run_id with differing
                # flow cells would otherwise alias per whichever parsed last)
                self._rg_sheet_index.setdefault(
                    rg_id,
                    (ri.flow_cell_id, ri.sequencer_position, ri.experiment_name),
                )
                if rg_id in seen:
                    continue
                seen[rg_id] = {
                    "ID": rg_id,
                    "PU": ri.flow_cell_id or "unknown",
                    "PM": ri.system_name or "unknown",
                    "DT": timestamp_from_unix_ms(ri.acquisition_start_time_ms),
                    "PL": "ONT",
                    "DS": (
                        f"runid={ri.protocol_run_id or 'unknown'}"
                        f" basecall_model={self.config.model_name}"
                        f" acquisition_start_time="
                        f"{timestamp_from_unix_ms(ri.acquisition_start_time_ms)}"
                        f" model_stride={self.config.stride}"
                    ),
                    "LB": ri.sample_id or "unknown",
                }
        header.read_groups = list(seen.values())

        # per-barcode read groups (bam_utils.cpp add_barcode_kit_rg_hdrs:
        # one RG per (base group, kit barcode) with BC/bk/SM/al tags; sample
        # sheets filter barcodes and substitute aliases)
        if self.barcode_classifier is not None:
            from dorado_tpu.demux import get_barcode_sequence
            from dorado_tpu.demux.barcoder import normalize_barcode_name

            info = self.barcode_classifier.kit_info
            kit_name = self.barcode_classifier.kit_name
            barcode_groups = []
            for barcode_name in info["barcodes"]:
                norm = normalize_barcode_name(barcode_name)
                if self.sample_sheet is not None and not (
                    self.sample_sheet.barcode_is_permitted(norm)
                    or self.sample_sheet.barcode_is_permitted(barcode_name)
                ):
                    continue
                for rg in header.read_groups:
                    fc, pos, exp = self._rg_sheet_index.get(rg["ID"], ("", "", ""))
                    alias = (
                        self.sample_sheet.get_alias(norm, fc, pos, exp)
                        if self.sample_sheet
                        else ""
                    )
                    new = dict(rg)
                    suffix = alias or f"{info['name']}_{norm}"
                    new["ID"] = f"{rg['ID']}_{suffix}"
                    new["BC"] = get_barcode_sequence(barcode_name)
                    new["bk"] = kit_name
                    new["SM"] = norm
                    new["al"] = alias or norm
                    barcode_groups.append(new)
            header.read_groups.extend(barcode_groups)
        return header

    # ------------------------------------------------------------------
    # per-read feed
    # ------------------------------------------------------------------

    def _scale_and_trim(self, read: Pod5Read) -> tuple[np.ndarray, int, float, float, str]:
        strategy = self.config.signal_norm_params.strategy
        scaled, rna_trim, result = self.scaler.scale_read(
            read.signal,
            read_scale=read.calibration_scale,
            read_offset=read.calibration_offset,
            open_pore_level=read.open_pore_level,
            flow_cell_product_code=read.run_info.flow_cell_product_code,
        )
        trim_start = rna_trim
        if not self.config.is_rna_model:
            if self.config.signal_norm_params.standardisation.standardise:
                # kit14 pA-standardised data: constant trim (ScalerNode.cpp:238-243)
                dna_trim = 10
            else:
                max_samples = min(8000, len(scaled) // 2)
                dna_trim = trim_signal(scaled[:max_samples])
            if dna_trim < len(scaled):
                scaled = scaled[dna_trim:]
            else:
                dna_trim = 0
            # rna_trim is nonzero only under force_rna_adapter_trim; both
            # trims count toward ts/ns (the scaler already dropped rna_trim)
            trim_start = rna_trim + dna_trim
        # tags report shift/scale in pA space (ScalerNode.cpp:231-234)
        shift_pa = read.calibration_scale * (result.shift + read.calibration_offset)
        scale_pa = read.calibration_scale * result.scale
        return scaled.astype(np.float32), trim_start, shift_pa, scale_pa, strategy.value

    def _gate_read(self, read: Pod5Read) -> bool:
        """--read-ids/--max-reads/resume-skip admission (main thread only)."""
        if read.read_id in self.skip_read_ids:
            return False
        if self.only_read_ids is not None and read.read_id not in self.only_read_ids:
            return False
        if self.max_reads is not None and self._reads_fed >= self.max_reads:
            return False
        self._reads_fed += 1
        return True

    def _prepare_read(self, read: Pod5Read) -> list[_WorkingRead]:
        """RNA signal-split + scale/trim + chunk layout. Thread-safe: touches
        no pipeline state, so the run loop fans it out on the scale pool
        (the reference's ScalerNode worker threads, ScalerNode.cpp:143)."""
        subreads = [read]
        if self.rna_splitter is not None:
            ranges = self.rna_splitter.split(read.signal)
            if len(ranges) > 1:
                import dataclasses

                subreads = [
                    dataclasses.replace(
                        read,
                        read_id=f"{read.read_id}:{i}",
                        signal=read.signal[s:e],
                        read_number=-1,
                        start_sample=read.start_sample + s,
                    )
                    for i, (s, e) in enumerate(ranges)
                ]
        out = []
        for sub in subreads:
            scaled, trimmed, shift_pa, scale_pa, method = self._scale_and_trim(sub)
            if len(scaled) == 0:
                continue
            offsets = generate_chunks(
                len(scaled), self.runner.chunk_size, self.config.stride, self.overlap
            )
            sizes = [min(self.runner.chunk_size, len(scaled) - off) for off in offsets]
            wr = _WorkingRead(
                read=sub,
                scaled=scaled,
                num_trimmed=trimmed,
                shift_pa=shift_pa,
                scale_pa=scale_pa,
                scaling_method=method,
                offsets=offsets,
                chunk_sizes=sizes,
            )
            wr.results = [None] * len(offsets)
            wr.pending = len(offsets)
            out.append(wr)
        return out

    def _feed_read(self, read: Pod5Read, flush_cb) -> None:
        """Inline (unthreaded) admission + prep + feed; duplex feeds here."""
        if not self._gate_read(read):
            return
        for wr in self._prepare_read(read):
            self._feed_prepared(wr, flush_cb)

    def _feed_prepared(self, wr: _WorkingRead, flush_cb) -> None:
        self.stats.samples_processed += len(wr.scaled)
        for ci, off in enumerate(wr.offsets):
            size = wr.chunk_sizes[ci]
            lane = self._lanes[self.runner.lane_for(size)]
            idx = len(lane["batch"])
            self.runner.accept_chunk(lane["buffer"], idx, wr.scaled[off : off + size])
            lane["batch"].append((wr, ci))
            if len(lane["batch"]) == lane["buffer"].shape[0]:
                flush_cb()

    def _flush_batch(self, finished: list[_WorkingRead], force: bool = False) -> None:
        """Dispatch full lanes (all lanes when ``force``) and harvest
        previously in-flight batches — the device computes batch k+1 while
        the host decodes batch k (the stream-overlap of CudaCaller.cpp:634
        re-expressed with JAX async dispatch)."""
        for lane in self._lanes:
            rows = lane["buffer"].shape[0]
            if lane["batch"] and (force or len(lane["batch"]) == rows):
                n = len(lane["batch"])
                if n < rows:
                    lane["buffer"][n:] = 0.0
                if self._inflight_total == 0 and self._idle_mark is not None:
                    self.stats.device_idle_s += time.perf_counter() - self._idle_mark
                handle = self.runner.dispatch(lane["buffer"], n)
                self._inflight_total += 1
                self.stats.batches += 1
                self.stats.samples_incl_padding += lane["buffer"][..., 0].size if lane["buffer"].ndim == 3 else lane["buffer"].size
                inflight = (handle, lane["batch"])
                lane["batch"] = []
                lane["buffer"], lane["spare"] = lane["spare"], lane["buffer"]
            else:
                inflight = None

            if lane["inflight"] is not None:
                handle, batch = lane["inflight"]
                t_wait = time.perf_counter()
                decoded = self.runner.finish(handle)
                self.stats.finish_wait_s += time.perf_counter() - t_wait
                self._inflight_total -= 1
                if self._inflight_total == 0:
                    self._idle_mark = time.perf_counter()
                for (wr, ci), chunk in zip(batch, decoded):
                    wr.results[ci] = chunk
                    wr.pending -= 1
                    if wr.pending == 0:
                        finished.append(wr)
            lane["inflight"] = inflight

    def _drain(self, finished: list[_WorkingRead]) -> None:
        """Flush any partial batches and harvest all in-flight work."""
        self._flush_batch(finished, force=True)
        self._flush_batch(finished, force=True)

    # ------------------------------------------------------------------
    # finish: stitch + record
    # ------------------------------------------------------------------

    def _finish_read(self, wr: _WorkingRead) -> list[SamRecord]:
        t_start = time.perf_counter()
        try:
            return self._finish_read_inner(wr)
        finally:
            dt = time.perf_counter() - t_start
            with self._stats_lock:
                self.stats.host_finish_s += dt

    def _finish_read_inner(self, wr: _WorkingRead) -> list[SamRecord]:
        called = [
            CalledChunk(
                seq=res.sequence,
                qstring=res.qstring,
                moves=np.asarray(res.moves, dtype=np.uint8),
                input_offset=off,
                raw_chunk_size=size,
            )
            for res, off, size in zip(wr.results, wr.offsets, wr.chunk_sizes)
        ]
        stitched = stitch_chunks(called, self.config.stride, len(wr.scaled))
        seq, qstring, moves = stitched.seq, stitched.qstring, stitched.moves

        # mux-change/unblock trimming runs before RNA reversal — the garbage
        # is at the pore-exit end (BasecallerNode.cpp:251-254)
        from dorado_tpu.utils.read_trim import mux_change_trim

        seq, qstring, moves, wr.scaled = mux_change_trim(
            seq, qstring, moves, wr.scaled, self.config.stride,
            getattr(wr.read, "end_reason", ""),
        )

        if self.config.is_rna_model:
            # RNA is sequenced 3'->5'; emit in standard orientation
            # (BasecallerNode.cpp:251-259)
            seq = seq[::-1]
            qstring = qstring[::-1]
            moves = np.ascontiguousarray(moves[::-1])

        parts = [(seq, qstring, moves, wr.scaled, None)]
        if self.read_splitter is not None and len(seq):
            subs = self.read_splitter.split(
                seq, qstring, moves, wr.scaled, self.config.stride
            )
            if len(subs) > 1:
                parts = [
                    (s.seq, s.qstring, s.moves, s.signal, s.signal_range[0])
                    for s in subs
                ]

        records = []
        for i, (s_seq, s_q, s_moves, s_signal, split_point) in enumerate(parts):
            rec = self._make_record(wr, s_seq, s_q, s_moves)
            if len(parts) > 1:
                # split subreads: derived id, pi parent tag, sp split point,
                # rn=-1, sample counts reflect the subread signal
                # (messages.cpp:95-108, splitter subread semantics)
                rec.qname = f"{wr.read.read_id}:{i}"
                rec.tags.append(SamTag("pi", "Z", wr.read.read_id))
                rec.tags.append(SamTag("sp", "i", int(split_point or 0)))
                sample_rate = wr.read.run_info.sample_rate or self.config.sample_rate
                for t in rec.tags:
                    if t.tag == "rn":
                        t.value = -1
                    elif t.tag == "ns":
                        t.value = len(s_signal)
                    elif t.tag == "ts":
                        t.value = 0
                    elif t.tag == "du":
                        t.value = len(s_signal) / float(max(1, sample_rate))
            barcode = None
            if self.barcode_classifier is not None and len(s_seq):
                barcode = self._add_barcode_tags(rec, s_seq, wr.read.run_info)
            if self.poly_tail_selector is not None and len(s_seq):
                calculator = self.poly_tail_selector.get_calculator(barcode)
                if calculator is not None:
                    self._add_poly_a_tags(calculator, rec, wr, s_seq, s_moves)
            # pore type / end reason / minknow event count close the read-tag
            # block, before any MN/MM/ML (messages.cpp:134-147 order, matches
            # the regression_test golden BAMs)
            if wr.read.pore_type:
                rec.tags.append(SamTag("po", "Z", wr.read.pore_type))
            if wr.read.end_reason:
                rec.tags.append(SamTag("er", "Z", wr.read.end_reason))
            rec.tags.append(
                SamTag("me", "I", wr.read.num_minknow_events & 0xFFFFFFFF)
            )
            if self.modbase_caller is not None and len(s_seq):
                self._add_modbase_tags(rec, s_seq, s_moves, s_signal)
            if self.min_qscore > 0:
                qs = next((t.value for t in rec.tags if t.tag == "qs"), 0.0)
                if qs < self.min_qscore:
                    with self._stats_lock:
                        self.reads_filtered += 1
                    continue
            # counted only for reads that survive the qscore filter, so
            # reads_called + reads_filtered never double-counts
            with self._stats_lock:
                self.stats.reads_called += 1
                self.stats.bases_called += len(s_seq)
            records.append(rec)
        return records

    def _add_poly_a_tags(self, calculator, rec, wr, seq, moves) -> None:
        from dorado_tpu.polytail.calculator import ReadContext

        result = calculator.calculate_num_bases(
            ReadContext(
                seq=seq,
                moves=np.asarray(moves),
                signal=wr.scaled,
                stride=self.config.stride,
                num_trimmed_samples=wr.num_trimmed,
                flow_cell_product_code=wr.read.run_info.flow_cell_product_code,
            )
        )
        # pt:i tail length (-1 = estimation failed), pa:B:i signal ranges
        rec.tags.append(SamTag("pt", "i", result.num_bases if result.num_bases >= 0 else -1))
        pa = np.array(
            [
                result.signal_anchor,
                result.signal_range[0],
                result.signal_range[1],
                result.split_signal_range[0],
                result.split_signal_range[1],
            ],
            dtype=np.int32,
        )
        rec.tags.append(SamTag("pa", "B", pa, subtype="i"))

    def _add_barcode_tags(self, rec, seq, run_info=None) -> str:
        from dorado_tpu.demux.barcoder import UNCLASSIFIED, normalize_barcode_name

        result = self.barcode_classifier.classify(
            seq, barcode_both_ends=self.barcode_both_ends
        )
        if result.barcode_name == UNCLASSIFIED:
            bc = UNCLASSIFIED
        else:
            bc = (
                f"{self.barcode_classifier.kit_info['name']}_"
                f"{normalize_barcode_name(result.barcode_name)}"
            )
            # sample-sheet alias replaces the barcode id in the BC tag,
            # matched against the read's own run index so multi-run sheets
            # resolve per flowcell/position (BarcodeClassifierNode.cpp:212-221)
            if self.sample_sheet is not None:
                alias = self.sample_sheet.get_alias(
                    bc,
                    run_info.flow_cell_id if run_info else "",
                    run_info.sequencer_position if run_info else "",
                    run_info.experiment_name if run_info else "",
                )
                if alias:
                    bc = alias
            # classified reads get the barcode appended to their read group
            # (ReadCommon::generate_read_group, messages.cpp:27-40)
            for t in rec.tags:
                if t.tag == "RG":
                    t.value = f"{t.value}_{bc}"
        rec.tags.append(SamTag("BC", "Z", bc))
        return bc

    def _add_modbase_tags(self, rec, seq, moves, scaled_signal) -> None:
        from dorado_tpu.modbase.tags import (
            generate_modbase_tags,
            modbase_threshold_uint8,
        )

        if self._modbase_scheduler is not None:
            # cross-read chunk batching: finisher threads share device batches
            prepared = self.modbase_caller.prepare_read(
                seq, np.asarray(moves), scaled_signal
            )
            result = self._modbase_scheduler.call(prepared)
        else:
            result = self.modbase_caller.call_read(
                seq, np.asarray(moves), scaled_signal
            )
        mm, ml, mn = generate_modbase_tags(
            seq,
            result.base_mod_probs,
            result.info,
            result.motif_hits,
            modbase_threshold_uint8(self.modbase_threshold),
        )
        rec.tags.append(SamTag("MN", "i", mn))
        rec.tags.append(SamTag("MM", "Z", mm))
        rec.tags.append(SamTag("ML", "B", ml, subtype="C"))

    def _mean_qscore(self, seq: str, qstring: str) -> float:
        if self.config.is_rna_model:
            polya = find_rna_polya(seq)
            return mean_qscore_from_qstring(qstring[:polya] if polya else qstring)
        start = self.config.mean_qscore_start_pos
        if start < 0:
            start = 60
        if len(qstring) <= start:
            return mean_qscore_from_qstring(qstring)
        return mean_qscore_from_qstring(qstring[start:])

    def _make_record(
        self, wr: _WorkingRead, seq: str, qstring: str, moves: np.ndarray
    ) -> SamRecord:
        read = wr.read
        ri = read.run_info
        sample_rate = ri.sample_rate or self.config.sample_rate
        num_samples = len(wr.scaled)
        start_ms = ri.acquisition_start_time_ms + (
            read.start_sample * 1000
        ) // max(1, sample_rate)

        tags = [
            SamTag("qs", "f", self._mean_qscore(seq, qstring)),
            SamTag(
                "du", "f", (num_samples + wr.num_trimmed) / float(max(1, sample_rate))
            ),
            SamTag("ns", "i", num_samples + wr.num_trimmed),
            SamTag("ts", "i", wr.num_trimmed),
            SamTag("mx", "i", read.well),
            SamTag("ch", "i", read.channel),
            SamTag("st", "Z", timestamp_from_unix_ms(start_ms)),
            SamTag("rn", "i", read.read_number),
            SamTag("fn", "Z", read.filename),
            SamTag("sm", "f", wr.shift_pa),
            SamTag("sd", "f", wr.scale_pa),
            SamTag("sv", "Z", wr.scaling_method),
            SamTag("dx", "i", 0),
            SamTag("RG", "Z", f"{ri.protocol_run_id}_{self.config.model_name}"),
        ]
        if self.emit_moves:
            mv = np.concatenate(
                [[np.uint8(self.config.stride)], moves.astype(np.uint8)]
            )
            tags.append(SamTag("mv", "B", mv, subtype="c"))

        return SamRecord(qname=read.read_id, seq=seq, qual=qstring, tags=tags)

    # ------------------------------------------------------------------
    # run
    # ------------------------------------------------------------------

    def run(
        self,
        input_path: Path | str,
        writer,
        recursive: bool = False,
        max_seconds: float | None = None,
    ) -> PipelineStats:
        """Basecall every read in every POD5 under ``input_path``.
        ``max_seconds`` time-boxes the run (the reference's BenchmarkTimer +
        fast terminate, cli_lib/basecaller.cpp:708-716): no new reads are fed
        after the deadline; in-flight reads still finish."""
        from dorado_tpu.pipeline.host import (
            OrderedPool,
            OrderedSink,
            default_host_threads,
        )

        t0 = time.perf_counter()
        # fresh metrics per run: cumulative idle/wait across runs would
        # break derived rates (idle fraction could exceed 1.0)
        self.stats = PipelineStats()
        rs_before = self.runner.stats.snapshot()
        self._idle_mark = t0  # initial fill counts as device idle
        self._inflight_total = 0
        deadline = t0 + max_seconds if max_seconds is not None else None
        files = find_pod5_files(input_path, recursive=recursive)
        finished: list[_WorkingRead] = []
        workers = default_host_threads()
        if workers > 0 and self.modbase_caller is not None:
            from dorado_tpu.modbase.caller import ModBaseBatchScheduler

            self._modbase_scheduler = ModBaseBatchScheduler(self.modbase_caller)

        # scale pool ahead of the feed loop; finish pool behind the device
        # step; records written on this thread in submission order
        scale_pool = OrderedPool(self._prepare_read, workers)
        finish_sink = OrderedSink(
            self._finish_read,
            lambda recs: [writer.write(r) for r in recs],
            workers,
        )

        def flush():
            self._flush_batch(finished)
            # submit in completion order (pop() reversed every flush group,
            # breaking the deterministic single-threaded output order)
            for wr in finished:
                finish_sink.submit(wr)
            finished.clear()
            finish_sink.drain_ready()

        def gated_reads():
            for f in files:
                reader = Pod5File(f)
                try:
                    for read in reader.reads():
                        if deadline is not None and time.perf_counter() > deadline:
                            return
                        if (
                            self.max_reads is not None
                            and self._reads_fed >= self.max_reads
                        ):
                            # stop decoding entirely — without this every
                            # remaining read still paid full VBZ decode
                            return
                        read.filename = f.name
                        if self._gate_read(read):
                            yield read
                finally:
                    self.stats.reads_skipped += reader.reads_skipped

        try:
            for prepared in scale_pool.map(gated_reads()):
                for wr in prepared:
                    self._feed_prepared(wr, flush)
            # drain: dispatch the partial batch, harvest everything in flight.
            # Submit in completion order (popping reversed the final flush
            # group, breaking the ordered-sink determinism guarantee).
            self._drain(finished)
            for wr in finished:
                finish_sink.submit(wr)
            finished.clear()
        finally:
            finish_sink.shutdown()
            scale_pool.shutdown()
            if self._modbase_scheduler is not None:
                self._modbase_scheduler.close()
                self._modbase_scheduler = None
        self.stats.elapsed_s = time.perf_counter() - t0
        rs_after = self.runner.stats.snapshot()
        self.stats.dispatch_wait_s = rs_after[3] - rs_before[3]
        self.stats.device_fetch_s = rs_after[4] - rs_before[4]
        self.stats.host_decode_s = rs_after[5] - rs_before[5]
        return self.stats
