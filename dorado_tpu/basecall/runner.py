"""Batched basecall engine: one jitted XLA program per (batch, chunk) shape.

Replaces the reference's `ModelRunnerBase`/`CudaCaller` stack
(dorado/basecall/include/basecall/ModelRunnerBase.h:20-38,
dorado/basecall/CudaCaller.cpp): on TPU a runner is not a thread + stream but
a compiled function. The whole device path — forward pass, CRF
forward/backward log-sum-exp scans, posterior softmax and (in viterbi mode)
the exact best-path traceback — is one XLA program over static `[N, T]`
shapes, so XLA fuses scan steps and keeps intermediates in VMEM.

Host-side work mirrors the reference's decode part 2
(dorado/basecall/decode/CUDADecoder.cpp:115): sequence/qstring
materialisation, and batched on-device beam search (ops/beam.py).
"""

from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from dorado_tpu.config import BasecallModelConfig
from dorado_tpu.decode.beam_search import beam_search
from dorado_tpu.decode.common import DecodedChunk, DecoderOptions, generate_sequence
from dorado_tpu.models.crf_model import lstm_crf_forward
from dorado_tpu.ops.crf_scan import (
    backward_scores,
    forward_scores,
    viterbi_path,
)


def _decode_scan_fns(num_transitions: int):
    """Pick the CRF scan implementations for the decode path.

    On real TPUs with a VMEM-resident lattice (state_len <= 4) the fused
    Pallas streaming kernels (ops/crf_pallas.py) replace the XLA lax.scans —
    ~2.2x faster at hac shapes; the TPU analogue of the reference decoding in
    four fused CUDA kernels (decode/CUDADecoder.cpp:77-106).
    DORADO_TPU_PALLAS_DECODE=0 forces the XLA scans.
    """
    from dorado_tpu.ops.crf_pallas import (
        backward_scores_pallas,
        forward_scores_pallas,
        supports_pallas_decode,
        viterbi_path_pallas,
    )

    enabled = os.environ.get("DORADO_TPU_PALLAS_DECODE", "1") != "0"
    if (
        enabled
        and jax.default_backend() == "tpu"
        and supports_pallas_decode(num_transitions)
    ):
        return forward_scores_pallas, backward_scores_pallas, viterbi_path_pallas
    return forward_scores, backward_scores, viterbi_path


def _use_fused_decode(num_transitions: int) -> bool:
    """The viterbi fast path can run alpha/posts/choices in one fused Pallas
    pass over the score stream (crf_pallas.fused_forward_decode_pallas) for
    dense-lattice spaces on real TPUs."""
    from dorado_tpu.ops.crf_pallas import supports_fused_decode

    enabled = os.environ.get("DORADO_TPU_PALLAS_DECODE", "1") != "0"
    return (
        enabled
        and jax.default_backend() == "tpu"
        and supports_fused_decode(num_transitions)
    )


def _qual_data_from_posts_batch(
    states: np.ndarray, posts: np.ndarray, num_states: int
) -> np.ndarray:
    """Vectorised per-block base probabilities for a whole batch.

    states: [N, T]; posts: [N, T+1, S]. Mirrors the per-chunk logic of
    decode/beam_search.py::_qual_data_from_posts (beam_search.cpp:411-470).
    """
    n, t = states.shape
    msb = num_states >> 2
    state = states.astype(np.int64)
    base = (state & 3).astype(np.int64)

    l_shift = state >> 2
    r_shift = (state << 2) % num_states
    shift_base = np.arange(4, dtype=np.int64)
    shifted = np.empty((n, t, 8), dtype=np.int64)
    shifted[..., 0::2] = l_shift[..., None] + msb * shift_base
    shifted[..., 1::2] = r_shift[..., None] + shift_base

    t_posts = posts[:, 1 : t + 1]  # [N, T, S]
    block_prob = np.take_along_axis(t_posts, state[..., None], axis=2)[..., 0].astype(
        np.float32
    )

    not_self = shifted != state[..., None]
    first = np.ones_like(not_self)
    for j in range(1, 8):
        dup = (shifted[..., :j] == shifted[..., j : j + 1]).any(axis=-1)
        first[..., j] = ~dup
    count = not_self & first
    gathered = np.take_along_axis(t_posts, shifted, axis=2).astype(np.float32)
    block_prob = block_prob + (gathered * count).sum(axis=-1)

    block_prob = np.clip(block_prob, 0.0, 1.0) ** 0.4
    wrong = (1.0 - block_prob) / 3.0

    qual = np.repeat(wrong[..., None], 4, axis=-1)
    np.put_along_axis(qual, base[..., None], block_prob[..., None], axis=-1)
    return qual


@functools.lru_cache(maxsize=None)
def _qual_weight_table(num_states: int) -> np.ndarray:
    """Constant [S, S] candidate-weight table for the per-block posterior sum.

    Row s holds the weight of each posterior state for a Viterbi call in
    state s: 1.0 for s itself plus 1.0 for every *distinct* left/right
    k-mer shift of s that differs from s — the same candidate set and
    dedup order as the reference qual calc (beam_search.cpp:411-470) and
    _qual_data_from_posts_batch above, folded into a lookup so the device
    path is one exact one-hot MXU matmul instead of 9 masked VPU passes.
    """
    msb = num_states >> 2
    table = np.zeros((num_states, num_states), np.float32)
    for s in range(num_states):
        table[s, s] = 1.0
        shifted = []
        for b in range(4):
            shifted.append((s >> 2) + msb * b)  # interleaved [l0, r0, ...]
            shifted.append(((s << 2) % num_states) + b)
        seen = []
        for cand in shifted:
            if cand != s and cand not in seen:
                table[s, cand] += 1.0
            seen.append(cand)
    return table


# int8 signal-transfer mode: round(scaled_signal * 24) — the med_mad/
# quantile-normalised signal is ~N(0,1)-ranged, so +-5.3 sigma fits int8
# with ~0.01 sigma quantisation noise
_SIGNAL_INT8_SCALE = 24.0


@dataclass
class RunnerStats:
    batches_called: int = 0
    chunks_called: int = 0
    samples_called: int = 0  # incl. padding
    # stage timers (the per-range split of the reference's gpu_profiling.h
    # ProfilerRange scopes): dispatch_s = host blocked inside the async
    # dispatch call (H2D enqueue + trace); fetch_s = blocked in
    # jax.device_get (device compute drain + D2H transfer); host_decode_s =
    # numpy unpack + per-chunk materialisation after the fetch
    dispatch_s: float = 0.0
    fetch_s: float = 0.0
    host_decode_s: float = 0.0

    def snapshot(self) -> tuple:
        return (
            self.batches_called,
            self.chunks_called,
            self.samples_called,
            self.dispatch_s,
            self.fetch_s,
            self.host_decode_s,
        )


class BasecallRunner:
    """Owns model params + the compiled device program for one (N, T) shape.

    decoder:
      - "viterbi": exact best path, fully on device (fast path);
      - "beam":    reference-algorithm beam search, fully on device
      - "beam-host": device scans + exact C++ beam search on host (oracle)
                   (parity path, matches dorado's default decode).
    """

    def __init__(
        self,
        config: BasecallModelConfig,
        params,
        chunk_size: int | None = None,
        batch_size: int | None = None,
        decoder: str = "viterbi",
        compute_dtype=jnp.float32,
        use_pallas: bool | None = None,
        mesh=None,
    ):
        self.config = config
        self.chunk_size = int(chunk_size or config.basecaller.chunk_size)
        granularity = config.chunk_size_granularity
        self.chunk_size -= self.chunk_size % granularity
        # A geometric ladder of chunk lengths {T, 3T/4, (3/4)^2 T, ...}:
        # short reads route to the smallest program that holds them, bounding
        # padding waste at 25% per chunk. This generalises the reference's
        # {T, T/2} dual-batch-dims (CudaCaller.cpp:391-415) and is the
        # TPU-native answer to its ragged variable-chunk-size packing
        # (nn/AuxiliaryData.cpp:19-40): XLA needs static shapes, and packing
        # unequal segments per row would put a traced reset on every timestep
        # of every scan kernel, so raggedness is bucketed into lanes instead.
        # Each lane's batch is scaled inversely to its length, keeping
        # samples/dispatch constant. DORADO_TPU_CHUNK_LANES overrides the
        # lane count (compile time is per-lane, so tests and CPU runs default
        # to the reference's 2).
        overlap = config.basecaller.overlap
        default_lanes = 6 if jax.default_backend() == "tpu" else 2
        max_lanes = int(os.environ.get("DORADO_TPU_CHUNK_LANES", default_lanes))
        self.chunk_sizes = [self.chunk_size]
        while len(self.chunk_sizes) < max_lanes:
            nxt = self.chunk_sizes[-1] * 3 // 4
            nxt -= nxt % granularity
            if nxt <= overlap or nxt < granularity or nxt == self.chunk_sizes[-1]:
                break
            self.chunk_sizes.append(nxt)
        self.batch_size = int(batch_size or config.basecaller.batch_size or 128)
        self.decoder = decoder
        self.options = DecoderOptions(
            blank_score=config.blank_score if config.blank_score is not None else 2.0,
            q_shift=config.qbias,
            q_scale=config.qscale,
        )
        if use_pallas is None:
            # the fused Pallas LSTM scan is the fast path on real TPUs
            use_pallas = jax.default_backend() == "tpu" and config.is_lstm_model
        # multi-chip: shard the chunk batch over a data-parallel mesh
        # (chunks are independent -> linear scaling, no hot-loop collectives;
        # SURVEY §2.4's TPU-native answer to dorado's per-GPU runners)
        if mesh is None and len(jax.devices()) > 1:
            from jax.sharding import Mesh

            devices = np.asarray(jax.devices())
            mesh = Mesh(devices.reshape(len(devices), 1), axis_names=("data", "model"))
        self.mesh = mesh
        if mesh is not None:
            n_data = mesh.shape["data"]
            # round the batch up to a multiple of the data axis
            self.batch_size = -(-self.batch_size // n_data) * n_data
        self.stats = RunnerStats()
        self._pool = None
        self.params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype=compute_dtype), params
        )
        self._compute_dtype = compute_dtype
        self._use_pallas = use_pallas
        # opt-in int8 signal transfer (halves H2D on bandwidth-constrained
        # links; the reference feeds f16, so f16 stays the default).
        # Single-feature signal only: the ~N(0,1) range analysis does not
        # cover multi-feature inputs (the 13-channel stereo features carry
        # [0,1] q-score channels that 1/24 steps would coarsen).
        self._signal_int8 = (
            os.environ.get("DORADO_TPU_SIGNAL_DTYPE", "f16") == "int8"
            and config.num_features == 1
        )

        def prep_sig(sig):
            # dequant keyed on the ACTUAL input dtype (not the env flag), so
            # a caller handing call_chunks its own f16 buffer under the int8
            # env cannot be silently mis-scaled
            s = sig.astype(compute_dtype)
            if jnp.issubdtype(sig.dtype, jnp.signedinteger):
                # the dequant multiply fuses into the first conv
                s = s * (1.0 / _SIGNAL_INT8_SCALE)
            return s

        if config.is_tx_model:
            from dorado_tpu.models.tx_model import (
                quantize_tx_params,
                quantize_tx_params_w8a8,
                tx_forward,
            )

            # W8A8 encoder matmuls on the Pallas int8 MXU kernels
            # (ops/int8_matmul.py) are the default on TPU — the analogue of
            # the reference's quantised Koi Tx tiles (nn/TxModules.h:95-117).
            # Round 4 concluded int8 was not worth it from a chained-matmul
            # harness whose dependent requants stalled the MXU; with a real
            # batched grid the int8 rate is ~2x bf16 (measured 210 TOP/s at
            # fc1 shapes vs 144 TF/s bf16) and sup e2e improves. "bf16"
            # forces full precision; "int8" keeps the legacy XLA dot path.
            default_precision = (
                "w8a8" if jax.default_backend() == "tpu" else "bf16"
            )
            tx_precision = os.environ.get(
                "DORADO_TPU_TX_PRECISION", default_precision
            )
            if tx_precision == "w8a8":
                self.params = quantize_tx_params_w8a8(self.params)
            elif tx_precision == "int8":
                self.params = quantize_tx_params(self.params)

            def fwd_tm(p, sig):
                return jnp.swapaxes(tx_forward(p, prep_sig(sig), config), 0, 1)

        else:
            # W8A8 input projections on the Pallas LSTM path (the
            # compute-bound matmuls of the step; the analogue of the
            # reference's quantised Koi LSTM kernels). bf16 via
            # DORADO_TPU_LSTM_PRECISION=bf16; widths that don't tile the
            # MXU (fast's H=96) stay bf16 automatically.
            lstm_precision = os.environ.get(
                "DORADO_TPU_LSTM_PRECISION",
                "w8a8" if use_pallas else "bf16",
            )
            if lstm_precision == "w8a8" and not use_pallas:
                # only the Pallas stack has the quantised-projection branch
                import sys

                print(
                    "DORADO_TPU_LSTM_PRECISION=w8a8 requires the Pallas "
                    "LSTM path (TPU); running full precision",
                    file=sys.stderr,
                )
            if lstm_precision == "w8a8" and use_pallas:
                from dorado_tpu.models.crf_model import (
                    quantize_lstm_crf_params_w8a8,
                )

                self.params = quantize_lstm_crf_params_w8a8(self.params)

            def fwd_tm(p, sig):
                # scores come out time-major straight off the Pallas stack —
                # no [N,T,C]<->[T,N,C] score-tensor transposes in the step
                return lstm_crf_forward(
                    p,
                    prep_sig(sig),
                    config,
                    use_pallas=use_pallas,
                    time_major=True,
                )

        blank = float(self.options.blank_score)
        num_states = config.num_states

        def device_qual(states_nt, t_posts):
            """Per-block base probabilities fully on device — the jnp
            counterpart of _qual_data_from_posts_batch.

            Gather-free: TPU data-dependent lane gathers run ~1 elem/cycle
            (take_along_axis here measured ~57 ms of the hac device step).
            The candidate-state weight row depends only on the Viterbi state
            value, so the whole 9-candidate dedup logic collapses into a
            constant [S, S] table applied as an exact one-hot f32 MXU matmul
            (each one-hot row has a single 1.0, so accumulation adds only
            zeros). Returns (qual [N, T, 4], block_prob [N, T]) so the
            sequence materialisation never re-gathers qual at the base.
            t_posts: [N, T, S] posterior rows 1..T of the [T+1] history.
            """
            n, t = states_nt.shape
            state = states_nt.astype(jnp.int32)
            base = state & 3

            # exact at default (bf16-truncating) MXU precision: table entries
            # are small integers and each output has a single nonzero product
            table = jnp.asarray(_qual_weight_table(num_states))  # [S, S]
            one_hot_state = jax.nn.one_hot(state, num_states, dtype=jnp.float32)
            weights = jax.lax.dot_general(
                one_hot_state, table, (((2,), (0,)), ((), ()))
            )
            block_prob = (weights * t_posts).sum(axis=-1)

            block_prob = jnp.clip(block_prob, 0.0, 1.0) ** 0.4
            wrong = (1.0 - block_prob) / 3.0
            qual = jnp.repeat(wrong[..., None], 4, axis=-1)
            qual = jnp.where(
                jax.nn.one_hot(base, 4, dtype=bool), block_prob[..., None], qual
            )
            # bf16 keeps these [N, T, 4]/[N, T] intermediates small in HBM;
            # they are consumed on-device by device_sequence (only ASCII
            # bytes leave the chip) and only feed the phred calc, well
            # within bf16 precision
            return qual.astype(jnp.bfloat16), block_prob.astype(jnp.bfloat16)

        q_shift = float(self.options.q_shift)
        q_scale = float(self.options.q_scale)

        def device_sequence(states_nt, moves_nt, qual, block_prob):
            """Full sequence/qstring materialisation on device (the role of
            Koi's host_run_decode byte outputs, CUDADecoder.cpp:100-113):
            ASCII bases + phred chars in *emit-position layout* plus the
            bit-packed move table leave the chip; the host compacts by the
            move mask (runner._decode). Deliberately gather- and
            scatter-free: TPU scatter/segment-sum lowerings serialise per
            segment, and data-dependent lane gathers run ~1 elem/cycle
            (four take_along_axis here measured ~18 ms of the hac device
            step), so per-base block sums come out of cumsum differences
            broadcast to segment boundaries with *monotone* cummax/cummin
            scans — exact, because a cumsum of non-negative values is
            non-decreasing, so the scan picks the identical f32 value a
            gather at the boundary index would."""
            n, t = states_nt.shape
            bases = (states_nt & 3).astype(jnp.int32)
            moves_i = moves_nt.astype(jnp.int32)

            base_prob_blk = block_prob.astype(jnp.float32)
            total_blk = qual.astype(jnp.float32).sum(axis=-1)

            # segment boundaries replicate the seq_pos = clip(cumsum-1, 0)
            # bucketing: a segment starts at position 0 and at every emit
            # except the first (pre-first-emit positions fold into base 0)
            tidx = jnp.arange(t, dtype=jnp.int32)
            cum = jnp.cumsum(moves_i, axis=1)
            is_start = (tidx[None, :] == 0) | ((moves_i == 1) & (cum > 1))
            is_end = jnp.concatenate(
                [is_start[:, 1:], jnp.ones((n, 1), bool)], axis=1
            )
            neg_inf = jnp.float32(-jnp.inf)
            pos_inf = jnp.float32(jnp.inf)

            def seg_sums(vals):
                c = jnp.cumsum(vals, axis=1)  # inclusive, non-decreasing
                # exclusive prefix via a static shift (NOT c - vals, which
                # differs from the true prefix sum by f32 rounding)
                e = jnp.concatenate(
                    [jnp.zeros((n, 1), jnp.float32), c[:, :-1]], axis=1
                )
                # sum at the segment's start, broadcast forward
                lo = jax.lax.cummax(jnp.where(is_start, e, neg_inf), axis=1)
                # inclusive sum at the segment's end, broadcast backward
                hi = jnp.flip(
                    jax.lax.cummin(
                        jnp.flip(jnp.where(is_end, c, pos_inf), axis=1), axis=1
                    ),
                    axis=1,
                )
                return hi - lo

            base_probs = seg_sums(base_prob_blk)
            total_probs = seg_sums(total_blk)

            err = 1.0 - base_probs / jnp.maximum(total_probs, 1e-30)
            phred = -10.0 * jnp.log10(jnp.maximum(err, 1e-30))
            qscore = jnp.clip(phred * q_scale + q_shift, 1.0, 50.0)
            qchar = (33.5 + qscore).astype(jnp.uint8)  # valid at emit positions
            # 6-bit-pack the phred stream (4 chars -> 3 bytes): qscore is
            # clipped to [1, 50] above, so qchar-33 in [1, 50] < 64 by
            # construction. The qual stream is the largest device->host
            # transfer after 2-bit base packing; this trims another 25%.
            q6 = (qchar - jnp.uint8(33)) & jnp.uint8(0x3F)  # [N, T]
            padq = (-t) % 4
            q6p = jnp.pad(q6, ((0, 0), (0, padq))).reshape(n, -1, 4)
            q0, q1, q2, q3 = (q6p[:, :, i] for i in range(4))
            qual_packed = jnp.stack(
                [
                    (q0 | (q1 << 6)).astype(jnp.uint8),
                    ((q1 >> 2) | (q2 << 4)).astype(jnp.uint8),
                    ((q2 >> 4) | (q3 << 2)).astype(jnp.uint8),
                ],
                axis=-1,
            ).reshape(n, -1)  # [N, 3*ceil(T/4)]

            # emit-position layout, 2-bit packed (4 bases/byte): the host
            # maps to ASCII after the move-mask compaction. Quarters the
            # sequence bytes leaving the chip — on the tunnelled dev link
            # the device->host fetch is the pipeline bottleneck
            # (docs/TUNING.md), and on PCIe it is still free bandwidth.
            padb = (-t) % 4
            bb = jnp.pad(bases.astype(jnp.uint8), ((0, 0), (0, padb)))
            bb = bb.reshape(n, -1, 4)
            bshift = (jnp.uint8(1) << (2 * jnp.arange(4, dtype=jnp.uint8)))
            seq_packed = (bb * bshift).sum(axis=-1).astype(jnp.uint8)

            # lengths doubles as the tiny [N] i32 sync handle the host
            # fetches to drain the dispatch queue (block_until_ready is
            # unreliable through tunnelled links)
            lengths = moves_i.sum(axis=1).astype(jnp.int32)
            # bit-pack the move table
            pad = (-t) % 8
            mv = jnp.pad(moves_nt.astype(jnp.uint8), ((0, 0), (0, pad)))
            mv = mv.reshape(n, -1, 8)
            weights = (1 << jnp.arange(8, dtype=jnp.uint8)).astype(jnp.uint8)
            mv_packed = (mv * weights).sum(axis=-1).astype(jnp.uint8)
            return seq_packed, qual_packed, mv_packed, lengths

        fwd_scan, bwd_scan, vit_path = _decode_scan_fns(num_states * 4)
        use_fused = _use_fused_decode(num_states * 4)
        if use_fused and decoder == "viterbi":
            # bake the block-layout permutation into the CRF head so the
            # model emits block-layout scores directly: the fused decode
            # kernels consume c' = r*S + s, and permuting on device is a
            # full [T, N, C] HBM lane gather (~43 ms at hac batch 512)
            from dorado_tpu.models.crf_model import permute_head_params
            from dorado_tpu.ops.crf_pallas import block_permutation

            self.params = permute_head_params(
                self.params, block_permutation(num_states)
            )

        # the decode kernels stream scores twice (backward scan + fused
        # forward); bf16 storage halves that dominant HBM traffic. The
        # reference decodes half-precision scores on GPU the same way
        # (CudaCaller converts model output to F16 for the Koi decoders);
        # DORADO_TPU_DECODE_SCORES=f32 forces full precision.
        score_dtype = (
            jnp.bfloat16
            if os.environ.get("DORADO_TPU_DECODE_SCORES", "bf16") != "f32"
            else jnp.float32
        )

        @jax.jit
        def device_viterbi(p, sig):
            scores_tnc = fwd_tm(p, sig)  # [T_out, N, C] f32 (block layout
            # on the fused path: the head permutation above)
            if use_fused:
                # one fused pass over the score stream does the alpha LSE
                # recursion, the posterior rows, and the Viterbi choices —
                # the separate kernels each re-stream the full score tensor
                from dorado_tpu.ops.crf_pallas import (
                    fused_viterbi_decode,
                    viterbi_traceback_pallas,
                )

                t_posts, choices, final = fused_viterbi_decode(
                    scores_tnc.astype(score_dtype), blank, prepermuted=True
                )
                last_state = jnp.argmax(final, axis=-1).astype(jnp.int32)
                states, moves = viterbi_traceback_pallas(choices, last_state)
                t_posts_nt = jnp.swapaxes(t_posts, 0, 1)
            else:
                alpha = fwd_scan(scores_tnc, blank)
                beta = bwd_scan(scores_tnc, blank)
                posts = jax.nn.softmax(alpha + beta, axis=-1)
                states, moves = vit_path(scores_tnc, blank)
                t = scores_tnc.shape[0]
                t_posts_nt = jnp.swapaxes(posts, 0, 1)[:, 1 : t + 1]
            states_nt = jnp.swapaxes(states, 0, 1)
            moves_nt = jnp.swapaxes(moves, 0, 1)
            qual, block_prob = device_qual(states_nt, t_posts_nt)
            return device_sequence(states_nt, moves_nt, qual, block_prob)

        beam_width = int(self.options.beam_width)
        beam_cut = float(self.options.beam_cut)

        from dorado_tpu.ops.beam import beam_search_device

        # experimental Mosaic beam step kernel; measured slower than the
        # XLA scan on the current v5e toolchain (docs/beam_bound.md), so
        # opt-in only
        if os.environ.get("DORADO_TPU_PALLAS_BEAM", "0") == "1":
            from dorado_tpu.ops.beam_pallas import beam_search_pallas as _beam_fn
        else:
            _beam_fn = beam_search_device

        @jax.jit
        def device_beam(p, sig):
            """Fully on-device beam decode (ops/beam.py batched beam search)
            with byte outputs — the TPU answer to Koi's GPU beam kernels."""
            scores_tnc = fwd_tm(p, sig)  # [T_out, N, C] f32
            alpha = fwd_scan(scores_tnc, blank)
            beta = bwd_scan(scores_tnc, blank)
            posts = jax.nn.softmax(alpha + beta, axis=-1)
            states_nt, moves_nt = _beam_fn(
                scores_tnc, beta, beam_width, beam_cut, blank
            )
            t = scores_tnc.shape[0]
            t_posts_nt = jnp.swapaxes(posts, 0, 1)[:, 1 : t + 1]
            qual, block_prob = device_qual(states_nt, t_posts_nt)
            return device_sequence(states_nt, moves_nt, qual, block_prob)

        @jax.jit
        def device_beam_host(p, sig):
            """Host-decode variant: ships scores/back-guides/posteriors for
            the exact C++ oracle (large transfers; debugging/verification)."""
            scores_tnc = fwd_tm(p, sig)  # [T_out, N, C] f32
            alpha = fwd_scan(scores_tnc, blank)
            beta = bwd_scan(scores_tnc, blank)
            posts = jax.nn.softmax(alpha + beta, axis=-1)
            return (
                jnp.swapaxes(scores_tnc, 0, 1),  # [N, T_out, C]
                jnp.swapaxes(beta, 0, 1),  # [N, T_out+1, S] back guides
                jnp.swapaxes(posts, 0, 1),
            )

        base_fn = {
            "viterbi": device_viterbi,
            "beam": device_beam,
            "beam-host": device_beam_host,
        }[decoder]

        # no-fetch probe (DORADO_TPU_FETCH_MODE=checksum): reduce every
        # output to one device-side scalar so only 4 bytes leave the chip —
        # measures whether the feeder alone sustains the device e2e rate
        # with the D2H transport taken out of the loop
        self.fetch_mode = os.environ.get("DORADO_TPU_FETCH_MODE", "full")
        if self.fetch_mode == "checksum":
            # also mesh-safe: under shard_map each shard reduces to its own
            # [1, 1] scalar and the data axis concatenates them
            inner_fn = base_fn

            @jax.jit
            def base_fn(p, sig):
                outs = inner_fn(p, sig)
                return sum(
                    jnp.sum(o.astype(jnp.float32)) for o in outs
                ).reshape(1, 1)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # shard_map, not bare in_shardings: the program contains Mosaic
            # pallas_call kernels that GSPMD cannot partition — under
            # shard_map each chip runs the FULL program on its batch shard
            # (chunks are independent, so this is exactly data parallelism)
            replicated = NamedSharding(mesh, P())
            self.params = jax.device_put(self.params, replicated)
            sharded = jax.shard_map(
                base_fn,
                mesh=mesh,
                in_specs=(P(), P("data")),
                out_specs=P("data"),
                check_vma=False,
            )
            self._device_fn = jax.jit(sharded)
        else:
            self._device_fn = base_fn

    @property
    def t_out(self) -> int:
        return self.chunk_size // self.config.stride

    def lane_for(self, raw_size: int) -> int:
        """Smallest configured chunk size that holds a chunk of raw_size."""
        for i in range(len(self.chunk_sizes) - 1, 0, -1):
            if raw_size <= self.chunk_sizes[i]:
                return i
        return 0

    def lane_batch_size(self, lane: int = 0) -> int:
        """Batch rows for a lane, scaled inversely to its chunk length so
        every lane dispatches roughly the same samples (and HBM) per batch.
        Rounded up to a Pallas-friendly granule (128 when the base batch is,
        else the base batch) so the kernels keep full-width batch tiles."""
        raw = self.batch_size * self.chunk_size / self.chunk_sizes[lane]
        g = 128 if self.batch_size % 128 == 0 else self.batch_size
        n = min(-(-int(raw) // g) * g, 2048)
        if self.mesh is not None:
            n_data = self.mesh.shape["data"]
            n = -(-n // n_data) * n_data
        return n

    def make_input_buffer(self, lane: int = 0) -> np.ndarray:
        # float16 halves the host->device transfer; the reference feeds f16
        # signal too (ScalerNode.cpp:227-229). DORADO_TPU_SIGNAL_DTYPE=int8
        # (opt-in) halves it again for bandwidth-constrained links: the
        # scaled signal is ~N(0,1)-ranged, so round(x * 24) clipped to
        # int8 carries it with ~0.01 sigma quantisation noise; the device
        # step dequantises with the same constant.
        size = self.chunk_sizes[lane]
        dtype = np.int8 if self._signal_int8 else np.float16
        rows = self.lane_batch_size(lane)
        if self.config.num_features > 1:
            return np.zeros((rows, size, self.config.num_features), dtype=dtype)
        return np.zeros((rows, size), dtype=dtype)

    def accept_chunk(self, buffer: np.ndarray, idx: int, signal: np.ndarray) -> None:
        """Copy one (possibly short) chunk into the batch, repeat-padding to
        the buffer's chunk size (BasecallerNode.cpp:431-440)."""
        size = buffer.shape[1]
        n = len(signal)
        if buffer.dtype == np.int8:
            signal = np.clip(
                np.rint(np.asarray(signal, np.float32) * _SIGNAL_INT8_SCALE),
                -127,
                127,
            )
        if n == size:
            buffer[idx] = signal
        else:
            reps = -(-size // n)
            tiled = np.tile(signal, (reps, 1) if signal.ndim == 2 else reps)
            buffer[idx] = tiled[:size]

    def dispatch(self, buffer: np.ndarray, num_chunks: int):
        """Launch the device program asynchronously; returns an opaque handle
        for `finish`. JAX dispatch is async, so the host can keep feeding /
        decoding while the device computes (the reference overlaps the same
        way with its per-caller CUDA stream, CudaCaller.cpp:634)."""
        self.stats.batches_called += 1
        self.stats.chunks_called += num_chunks
        self.stats.samples_called += buffer.shape[0] * buffer.shape[1]
        t_out = buffer.shape[1] // self.config.stride
        t0 = time.perf_counter()
        handle = (self._device_fn(self.params, jnp.asarray(buffer)), num_chunks, t_out)
        self.stats.dispatch_s += time.perf_counter() - t0
        return handle

    def finish(self, handle) -> list[DecodedChunk]:
        """Block on a dispatched batch and materialise per-chunk calls."""
        out, num_chunks, t_out = handle
        return self._decode(out, num_chunks, t_out)

    def _pool_map(self, fn, n):
        if n > 1:
            from concurrent.futures import ThreadPoolExecutor

            if self._pool is None:
                self._pool = ThreadPoolExecutor(max_workers=min(16, os.cpu_count() or 4))
            return list(self._pool.map(fn, range(n)))
        return [fn(i) for i in range(n)]

    def call_chunks(self, buffer: np.ndarray, num_chunks: int) -> list[DecodedChunk]:
        """Run the device program and materialise per-chunk calls."""
        return self.finish(self.dispatch(buffer, num_chunks))

    def _decode(self, out, num_chunks: int, t_out: int) -> list[DecodedChunk]:
        if self.fetch_mode == "checksum":
            t0 = time.perf_counter()
            jax.device_get(out)  # 4-byte scalar: drains the dispatch queue
            self.stats.fetch_s += time.perf_counter() - t0
            zero = np.zeros(t_out, np.uint8)
            return [
                DecodedChunk(sequence="", qstring="", moves=zero)
                for _ in range(num_chunks)
            ]
        if self.decoder in ("viterbi", "beam"):
            # one batched fetch: per-array np.asarray pays the link's
            # ~120 ms RPC latency 4x (196 vs 110 ms/batch measured through
            # the tunnel; on PCIe hosts the difference is noise)
            t0 = time.perf_counter()
            seq_packed, qual_packed, mv_packed, lengths = jax.device_get(out)
            t1 = time.perf_counter()
            self.stats.fetch_s += t1 - t0
            t_len = t_out
            moves_all = np.unpackbits(
                mv_packed, axis=1, bitorder="little", count=t_len
            )
            # unpack the 2-bit base stream and map to ASCII (one vectorised
            # pass; the device ships 4 bases/byte)
            shifts = 2 * np.arange(4, dtype=np.uint8)
            bases_all = (
                (seq_packed[:, :, None] >> shifts) & 3
            ).reshape(seq_packed.shape[0], -1)[:, :t_len]
            seq_chars = np.frombuffer(b"ACGT", np.uint8)[bases_all]
            # unpack the 6-bit phred stream (3 bytes -> 4 chars) and
            # re-add the +33 ASCII offset
            qb = qual_packed.reshape(qual_packed.shape[0], -1, 3).astype(np.uint16)
            q0 = qb[:, :, 0] & 63
            q1 = ((qb[:, :, 0] >> 6) | (qb[:, :, 1] << 2)) & 63
            q2 = ((qb[:, :, 1] >> 4) | (qb[:, :, 2] << 4)) & 63
            q3 = qb[:, :, 2] >> 2
            qchars = (
                np.stack([q0, q1, q2, q3], axis=-1).reshape(
                    qual_packed.shape[0], -1
                )[:, :t_len]
                + 33
            ).astype(np.uint8)

            def materialise(i: int) -> DecodedChunk:
                # device arrays are in emit-position layout; compact by the
                # move mask (one vectorised numpy index per chunk)
                mask = moves_all[i].astype(bool)
                seq = seq_chars[i][mask].tobytes().decode()
                qstring = qchars[i][mask].tobytes().decode()
                return DecodedChunk(sequence=seq, qstring=qstring, moves=moves_all[i])

            res = self._pool_map(materialise, num_chunks)
            self.stats.host_decode_s += time.perf_counter() - t1
            return res

        t0 = time.perf_counter()
        scores, back_guides, posts = jax.device_get(out)
        t1 = time.perf_counter()
        self.stats.fetch_s += t1 - t0

        def decode_one(i: int) -> DecodedChunk:
            # decode part 2 on host (CUDADecoder.cpp:115 analogue): the C++
            # beam search releases the GIL, so chunks decode in parallel
            from dorado_tpu.native import beam_search_native

            states, moves, qual_data, _ = beam_search_native(
                scores[i],
                back_guides[i],
                posts[i],
                self.options.beam_width,
                self.options.beam_cut,
                self.options.blank_score,
            )
            seq, qstring = generate_sequence(
                moves, states, qual_data, self.options.q_shift, self.options.q_scale
            )
            return DecodedChunk(sequence=seq, qstring=qstring, moves=moves)

        res = self._pool_map(decode_one, num_chunks)
        self.stats.host_decode_s += time.perf_counter() - t1
        return res
