"""Per-read modified-base calling orchestration.

Chunked-model flow (parity: dorado/read_pipeline/nodes/
ModBaseChunkCallerNode.cpp): motif hits in sequence space -> signal space via
the move table -> chunk windows guaranteeing context around each hit ->
batched (signal, encoded-kmer) inference -> per-hit probabilities merged into
``base_mod_probs`` (uint8, one row per sequence position over the full
modbase alphabet).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np

from dorado_tpu.modbase.config import ModBaseModelConfig
from dorado_tpu.modbase.encode import (
    encode_kmer_chunk,
    moves_to_map,
    reverse_seq_to_sig_map,
    sequence_to_ints,
)
from dorado_tpu.modbase.model import (
    load_modbase_params,
    load_refine_levels,
    make_modbase_forward_fn,
)
from dorado_tpu.modbase.motif import MotifMatcher
from dorado_tpu.modbase.scaler import ModBaseScaler

CARDINAL_BASES = "ACGT"


@dataclass
class ModBaseInfo:
    alphabet: list[str]  # e.g. ["A", "C", "h", "m", "G", "T"]
    long_names: str
    context: str
    base_counts: list[int]

    @property
    def num_states(self) -> int:
        return len(self.alphabet)


def get_modbase_info(configs: list[ModBaseModelConfig]) -> ModBaseInfo:
    """Combined alphabet over all modbase models
    (config/ModBaseModelConfig.cpp get_modbase_info)."""
    per_base_alphabet = [[b] for b in CARDINAL_BASES]
    per_base_longnames = [[] for _ in range(4)]
    per_base_counts = [1, 1, 1, 1]
    motifs = ["", "", "", ""]
    for cfg in configs:
        bid = cfg.mods.base_id
        per_base_alphabet[bid] = [CARDINAL_BASES[bid]] + list(cfg.mods.codes)
        per_base_longnames[bid] = list(cfg.mods.long_names)
        per_base_counts[bid] = cfg.mods.count + 1
        if len(cfg.mods.motif) > 1:
            motifs[bid] = cfg.mods.motif

    alphabet: list[str] = []
    long_names: list[str] = []
    for b in range(4):
        alphabet.extend(per_base_alphabet[b])
        long_names.extend(per_base_longnames[b])

    context_parts = []
    for b in range(4):
        if motifs[b]:
            cfg_b = next(c for c in configs if c.mods.base_id == b)
            m = list(motifs[b])
            m[cfg_b.mods.motif_offset] = "X"
            context_parts.append("".join(m))
        else:
            context_parts.append("_")

    return ModBaseInfo(
        alphabet=alphabet,
        long_names=" ".join(long_names),
        context=":".join(context_parts),
        base_counts=per_base_counts,
    )


def base_prob_offsets(info: ModBaseInfo) -> list[int]:
    offsets = [0, 0, 0, 0]
    acc = 0
    for b in range(4):
        offsets[b] = acc
        acc += info.base_counts[b]
    return offsets


@dataclass
class ModBaseCallResult:
    base_mod_probs: np.ndarray  # uint8 [seq_len * num_states]
    info: ModBaseInfo
    motif_hits: np.ndarray  # bool [seq_len]


def get_chunk_starts(
    signal_len: int,
    hits_to_sig: np.ndarray,
    chunk_size: int,
    samples_before: int,
    samples_after: int,
    end_align_last_chunk: bool = True,
) -> list[tuple[int, int]]:
    """(chunk signal start, first-hit index) pairs
    (ModBaseChunkCallerNode.cpp:616-659)."""
    chunks: list[tuple[int, int]] = []
    chunk_st = 0
    while chunk_st < signal_len:
        idx = int(np.searchsorted(hits_to_sig, chunk_st, side="left"))
        if idx >= len(hits_to_sig):
            break
        hit_sig = int(hits_to_sig[idx])
        chunk_st = max(0, hit_sig - samples_before)
        chunks.append((chunk_st, idx))
        chunk_st += chunk_size - samples_after + 1
        if chunk_st <= hit_sig:
            chunk_st = hit_sig + 1
    if len(chunks) > 1 and end_align_last_chunk:
        aligned = int(hits_to_sig[-1]) + samples_after - chunk_size
        if aligned > 0:
            chunks[-1] = (aligned, chunks[-1][1])
    return chunks


def resolve_score_index(
    hit_sig_abs: int,
    chunk_start: int,
    scores_states: int,
    chunk_size: int,
    samples_before: int,
    samples_after: int,
    stride: int,
) -> int:
    """-2: stop (hit handled by a later chunk); -1: skip (handled earlier);
    else flat score index (ModBaseChunkCallerNode.cpp:1034-1080)."""
    hit_rel = hit_sig_abs - chunk_start
    if hit_rel < 0:
        raise ValueError("modbase hit before chunk start")
    if hit_rel > chunk_size - samples_after:
        return -2
    if hit_sig_abs > samples_before and hit_rel < samples_before:
        return -1
    if hit_rel % stride != 0:
        raise ValueError("modbase score did not align to canonical base")
    return hit_rel // stride * scores_states


class ModBaseCaller:
    """Owns one or more modbase models sharing a canonical basecall model."""

    def __init__(
        self,
        configs: list[ModBaseModelConfig],
        params_list: list | None = None,
        canonical_stride: int = 1,
        is_rna: bool = False,
        batch_size: int = 128,
    ):
        self.configs = [
            # normalise context sample counts to the canonical stride
            _with_normalised_context(cfg, canonical_stride)
            for cfg in configs
        ]
        self.canonical_stride = canonical_stride
        self.is_rna = is_rna
        self.batch_size = batch_size
        self.info = get_modbase_info(self.configs)
        self.offsets = base_prob_offsets(self.info)

        self.params = (
            params_list
            if params_list is not None
            else [load_modbase_params(c) for c in configs]
        )
        self.matchers = [
            MotifMatcher(c.mods.motif, c.mods.motif_offset) for c in self.configs
        ]
        self.scalers = []
        for c in configs:
            levels = load_refine_levels(c) if params_list is None else None
            self.scalers.append(
                ModBaseScaler(levels, c.kmer_len, c.refine.center_idx)
                if levels is not None
                else None
            )
        self._fns = [
            jax.jit(make_modbase_forward_fn(c)) for c in self.configs
        ]

    def call_read(
        self, seq: str, moves: np.ndarray, signal: np.ndarray
    ) -> ModBaseCallResult:
        """seq/moves from basecall, signal = scaled (model-input) signal."""
        num_states = self.info.num_states
        seq_len = len(seq)
        int_seq = sequence_to_ints(seq)

        # one-hot canonical initialisation (ModBaseChunkCallerNode.cpp:310-327)
        probs = np.zeros(seq_len * num_states, dtype=np.uint8)
        base_ids = int_seq
        pos_off = np.array([self.offsets[b] for b in base_ids])
        probs[np.arange(seq_len) * num_states + pos_off] = 1

        motif_hits_mask = np.zeros(seq_len, dtype=bool)

        if self.is_rna:
            pad = (-len(signal)) % self.canonical_stride
            if pad:
                signal = np.concatenate([signal[len(signal) - pad :], signal[::-1]])
            else:
                signal = signal[::-1]
        signal_len = len(signal)

        seq_to_sig = moves_to_map(moves, self.canonical_stride, signal_len)
        if self.is_rna:
            seq_to_sig = reverse_seq_to_sig_map(seq_to_sig, signal_len)

        for model_id, cfg in enumerate(self.configs):
            hits_seq = np.asarray(self.matchers[model_id].get_motif_hits(seq), dtype=np.int64)
            if len(hits_seq) == 0:
                continue
            motif_hits_mask[hits_seq] = True
            hits_sig = seq_to_sig[hits_seq].astype(np.int64)

            scaler = self.scalers[model_id]
            sig = (
                scaler.scale_signal(signal, int_seq, seq_to_sig)
                if scaler is not None
                else signal
            ).astype(np.float32)

            from dorado_tpu.modbase.model import stride_ratio

            ssr = stride_ratio(cfg)
            s2s = seq_to_sig // ssr if ssr > 1 else seq_to_sig
            kmers = encode_kmer_chunk(
                int_seq, s2s, cfg.kmer_len, signal_len // ssr, kmer_centered=True
            )

            ctx = cfg.context
            chunk_list = get_chunk_starts(
                signal_len, hits_sig, ctx.chunk_size, ctx.samples_before, ctx.samples_after
            )
            if not chunk_list:
                continue

            scores = self._call_chunks(model_id, cfg, sig, kmers, chunk_list, ssr)
            self._merge_scores(
                probs, cfg, scores, chunk_list, hits_seq, hits_sig, int_seq
            )

        return ModBaseCallResult(
            base_mod_probs=probs, info=self.info, motif_hits=motif_hits_mask
        )

    # ------------------------------------------------------------------

    def _call_chunks(self, model_id, cfg, sig, kmers, chunk_list, ssr):
        chunk_size = cfg.context.chunk_size
        kmer_dim = cfg.kmer_len * 4
        n = len(chunk_list)
        out_scores = []
        for batch_start in range(0, n, self.batch_size):
            batch = chunk_list[batch_start : batch_start + self.batch_size]
            bn = len(batch)
            sig_in = np.zeros((self.batch_size, chunk_size), dtype=np.float32)
            seq_in = np.zeros(
                (self.batch_size, chunk_size // ssr, kmer_dim), dtype=np.int8
            )
            for i, (start, _hit) in enumerate(batch):
                end = min(start + chunk_size, len(sig))
                piece = sig[start:end]
                if len(piece) < chunk_size:
                    reps = -(-chunk_size // len(piece))
                    piece = np.tile(piece, reps)[:chunk_size]
                sig_in[i] = piece
                ks, ke = start // ssr, min((start + chunk_size) // ssr, len(kmers))
                kpiece = kmers[ks:ke]
                want = chunk_size // ssr
                if len(kpiece) < want:
                    reps = -(-want // max(1, len(kpiece)))
                    kpiece = np.tile(kpiece, (reps, 1))[:want]
                seq_in[i] = kpiece
            res = np.asarray(self._fns[model_id](self.params[model_id], sig_in, seq_in))
            out_scores.extend(res[:bn])
        return out_scores

    def _merge_scores(self, probs, cfg, scores, chunk_list, hits_seq, hits_sig, int_seq):
        num_states_model = cfg.num_states
        num_states = self.info.num_states
        ctx = cfg.context
        base_offset = self.offsets[cfg.mods.base_id]
        stride = cfg.stride

        for (chunk_start, hit_start), chunk_scores in zip(chunk_list, scores):
            for h in range(hit_start, len(hits_sig)):
                idx = resolve_score_index(
                    int(hits_sig[h]),
                    chunk_start,
                    num_states_model,
                    ctx.chunk_size,
                    ctx.samples_before,
                    ctx.samples_after,
                    stride,
                )
                if idx <= -2:
                    break
                if idx == -1:
                    continue
                hseq = int(hits_seq[h])
                for mod_offset in range(num_states_model):
                    score = chunk_scores[idx + mod_offset]
                    val = min(int(np.floor(score * 256)), 255)
                    probs[hseq * num_states + base_offset + mod_offset] = val


def _with_normalised_context(cfg: ModBaseModelConfig, canonical_stride: int):
    import dataclasses

    return dataclasses.replace(cfg, context=cfg.context.normalised(canonical_stride))
