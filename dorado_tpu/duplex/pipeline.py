"""Stereo duplex basecalling pipeline.

Parity with the reference stereo path (dorado/api/pipeline_creation.cpp:
122-201, dorado/cli/cli_lib/duplex.cpp:472-620): simplex-call reads in
channel order, detect template/complement pairs, align the calls, build the
13-feature stereo tensor, basecall it with the stereo CRF model, and emit
duplex records (dx:1) alongside the simplex calls (dx:-1 for duplex parents,
dx:0 otherwise — DuplexReadTaggingNode semantics).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from dorado_tpu.basecall.runner import BasecallRunner
from dorado_tpu.config import BasecallModelConfig
from dorado_tpu.duplex.pairing import CandidateRead, DuplexPairer, PairingResult
from dorado_tpu.duplex.stereo import StereoFeatureInputs, generate_stereo_features
from dorado_tpu.io.pod5 import find_pod5_files, iter_reads
from dorado_tpu.io.sam import SamRecord, SamTag
from dorado_tpu.pipeline.basecaller import BasecallerPipeline
from dorado_tpu.signal.chunk import generate_chunks
from dorado_tpu.signal.stitch import CalledChunk, stitch_chunks
from dorado_tpu.utils import mean_qscore_from_qstring, reverse_complement


@dataclass
class DuplexStats:
    simplex_reads: int = 0
    pairs: int = 0
    duplex_reads: int = 0
    elapsed_s: float = 0.0


class DuplexPipeline:
    def __init__(
        self,
        simplex_config: BasecallModelConfig,
        simplex_params,
        stereo_config: BasecallModelConfig,
        stereo_params,
        chunk_size: int | None = None,
        batch_size: int | None = None,
        decoder: str = "viterbi",
        compute_dtype=None,
        overlap: int | None = None,
        modbase_caller=None,
        modbase_threshold: int = 12,
    ):
        import jax.numpy as jnp

        dtype = compute_dtype or jnp.float32
        self.simplex = BasecallerPipeline(
            simplex_config,
            simplex_params,
            chunk_size=chunk_size,
            batch_size=batch_size,
            decoder=decoder,
            emit_moves=True,
            compute_dtype=dtype,
            overlap=overlap,
        )
        if not stereo_config.has_normalised_basecaller_params():
            stereo_config.normalise_basecaller_params()
        self.stereo_config = stereo_config
        self.stereo_runner = BasecallRunner(
            stereo_config,
            stereo_params,
            chunk_size=chunk_size,
            batch_size=max(4, (batch_size or 16) // 4),
            decoder=decoder,
            compute_dtype=dtype,
        )
        self.pairer = DuplexPairer()
        self.stats = DuplexStats()
        self.modbase_caller = modbase_caller
        self.modbase_threshold = modbase_threshold

    # ------------------------------------------------------------------

    def _simplex_to_candidate(self, rec: SamRecord, wr) -> CandidateRead:
        read = wr.read
        sample_rate = read.run_info.sample_rate or self.simplex.config.sample_rate
        mv = next(t for t in rec.tags if t.tag == "mv")
        moves = np.asarray(mv.value[1:], dtype=np.uint8)
        start_ms = (read.start_sample * 1000) // max(1, sample_rate)
        duration_ms = (len(read.signal) * 1000) // max(1, sample_rate)
        return CandidateRead(
            read_id=rec.qname,
            channel=read.channel,
            mux=read.well,
            start_time_ms=start_ms,
            duration_ms=duration_ms,
            seq=rec.seq,
            qstring=rec.qual,
            moves=moves,
            signal=wr.scaled,
            payload=rec,
        )

    def _call_stereo(self, pair: PairingResult) -> SamRecord | None:
        from dorado_tpu.native import align

        temp, comp = pair.template, pair.complement
        rc_comp = reverse_complement(comp.seq)
        res = align(
            temp.seq[pair.template_seq_start : pair.template_seq_end + 1],
            rc_comp[pair.complement_seq_start : pair.complement_seq_end + 1],
        )

        features = generate_stereo_features(
            StereoFeatureInputs(
                alignment=res.ops,
                template_seq=temp.seq,
                template_qstring=temp.qstring,
                template_moves=temp.moves,
                template_signal=temp.signal,
                complement_seq=rc_comp,
                complement_qstring=comp.qstring,
                complement_moves=comp.moves,
                complement_signal=np.ascontiguousarray(comp.signal[::-1]),
                signal_stride=self.simplex.config.stride,
                template_seq_start=pair.template_seq_start,
                complement_seq_start=pair.complement_seq_start,
            )
        ).T  # [T, 13]

        runner = self.stereo_runner
        stride = self.stereo_config.stride
        t_len = len(features)
        overlap = self.stereo_config.basecaller.overlap
        overlap -= overlap % stride
        offsets = generate_chunks(t_len, runner.chunk_size, stride, overlap)
        sizes = [min(runner.chunk_size, t_len - off) for off in offsets]

        buffer = runner.make_input_buffer()
        called: list[CalledChunk] = []
        for batch_start in range(0, len(offsets), runner.batch_size):
            batch = list(
                zip(offsets[batch_start:], sizes[batch_start:])
            )[: runner.batch_size]
            for i, (off, size) in enumerate(batch):
                runner.accept_chunk(buffer, i, features[off : off + size])
            decoded = runner.call_chunks(buffer, len(batch))
            for (off, size), chunk in zip(batch, decoded):
                called.append(
                    CalledChunk(
                        seq=chunk.sequence,
                        qstring=chunk.qstring,
                        moves=np.asarray(chunk.moves, dtype=np.uint8),
                        input_offset=off,
                        raw_chunk_size=size,
                    )
                )
        stitched = stitch_chunks(called, stride, t_len)
        if not stitched.seq:
            return None

        self.stats.duplex_reads += 1
        qs = mean_qscore_from_qstring(stitched.qstring)
        tags = [
            SamTag("qs", "f", qs),
            SamTag("dx", "i", 1),
            SamTag("ch", "i", temp.channel),
            SamTag("mx", "i", temp.mux),
        ]
        if self.modbase_caller is not None:
            # duplex mods: realign each strand's move table onto the duplex
            # consensus and run the mod models over the simplex signals
            # (ModBaseCallerNode.cpp:155-300)
            from dorado_tpu.duplex.modbase import call_duplex_mods
            from dorado_tpu.modbase.tags import generate_modbase_tags

            probs = call_duplex_mods(
                self.modbase_caller,
                stitched.seq,
                self.simplex.config.stride,
                temp.seq,
                temp.moves,
                temp.signal,
                comp.seq,
                comp.moves,
                comp.signal,
            )
            mm, ml, mn = generate_modbase_tags(
                stitched.seq,
                probs,
                self.modbase_caller.info,
                None,
                self.modbase_threshold,
                is_duplex=True,
            )
            # the reference tags every duplex read once mod models are
            # loaded, even with zero called sites (empty channel lists)
            tags.append(SamTag("MM", "Z", mm))
            tags.append(SamTag("ML", "B", ml, subtype="C"))
            tags.append(SamTag("MN", "i", mn))
        return SamRecord(
            qname=f"{temp.read_id};{comp.read_id}",
            seq=stitched.seq,
            qual=stitched.qstring,
            tags=tags,
        )

    # ------------------------------------------------------------------

    def run(self, input_path: Path | str, writer, recursive: bool = False) -> DuplexStats:
        t0 = time.perf_counter()
        files = find_pod5_files(input_path, recursive=recursive)

        finished = []
        duplex_parent_ids: set[str] = set()
        simplex_records: list[SamRecord] = []

        def flush():
            self.simplex._flush_batch(finished)
            while finished:
                wr = finished.pop()
                recs = self.simplex._finish_read(wr)
                rec = recs[0]
                self.stats.simplex_reads += len(recs)
                simplex_records.extend(recs)
                cand = self._simplex_to_candidate(rec, wr)
                pair = self.pairer.push(cand)
                if pair is not None:
                    self.stats.pairs += 1
                    duplex_rec = self._call_stereo(pair)
                    if duplex_rec is not None:
                        duplex_parent_ids.add(pair.template.read_id)
                        duplex_parent_ids.add(pair.complement.read_id)
                        writer.write(duplex_rec)

        for read in iter_reads(files, by_channel=True):
            self.simplex._feed_read(read, flush)
        flush()
        flush()  # second pass harvests the batch left in flight

        # emit simplex reads with duplex-parent tagging
        for rec in simplex_records:
            dx = -1 if rec.qname in duplex_parent_ids else 0
            for t in rec.tags:
                if t.tag == "dx":
                    t.value = dx
            writer.write(rec)

        self.stats.elapsed_s = time.perf_counter() - t0
        return self.stats
