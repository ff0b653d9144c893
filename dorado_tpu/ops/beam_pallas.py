"""Mosaic (Pallas TPU) CRF beam-search step kernel.

The XLA beam step (ops/beam.py) is correct but op-dispatch-bound: ~60-100
small ops per timestep x 1666 timesteps put the hac e2e beam path at 0.16x
the A100 table (BENCH_r03). This kernel runs the whole per-timestep beam
body — score/back-guide lookups, stay/step CRC merge, beam-cut binary
search, order-preserving cutoff selection — inside one VMEM-resident
time-tiled kernel, the same treatment that took the LSE/Viterbi scans to
>1x A100 (ops/crf_pallas.py). Reference algorithm:
dorado/basecall/decode/beam_search.cpp:126-520; the fused-kernel structure
mirrors Koi's GPU beam (CUDADecoder.cpp:77-106).

Semantics are kept structurally identical to ops/beam.py (itself
near-bit-parity with the C++ host oracle), including candidate index
order; the only numeric divergence is the hi/lo bf16 limb split noted
below (~2^-17 relative, so near-tie merge/cutoff decisions CAN differ
from the XLA beam on adversarial inputs — this path is env-gated off by
default):

  - lookups: the [r]-row one-hot einsums become lane-masked reductions
    over a prepacked [T, N, 20, r] stream (16 score columns + 4 back-guide
    columns per row; r = S/4);
  - the w -> 4w step-candidate expansion (each beam element spawns 4 step
    candidates at slots w*4+base) is a one-hot repeat-4 matmul: f32
    payloads go hi/lo bf16 2-pass (each product against a one-hot 1.0 is
    exact per limb, but two bf16 limbs recover only ~16 of 24 mantissa
    bits -- near-exact at ~2^-17 relative, like crf_pallas._dot2), integer
    payloads <= 2^24 go single-pass, the u32 CRC hash splits into two
    f32-exact u16 halves;
  - merge / cutoff / rank-compaction selection run as [bn, W, 5W] masked
    reductions exactly as in ops/beam.py, with the candidate rank computed
    by an exclusive lower-triangular ones matmul (counts <= 160 are
    bf16-exact);
  - the per-step history (state, parent|stay<<8) streams to HBM; the
    traceback reuses ops/beam.py's reverse XLA scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = float(np.finfo(np.float32).min)  # python float: Mosaic kernels must
# not close over traced array constants


@functools.lru_cache(maxsize=None)
def _rep4_matrix(w: int) -> np.ndarray:
    """[W, 4W] one-hot with R[w, s] = 1 iff w == s >> 2."""
    r = np.zeros((w, 4 * w), np.float32)
    s = np.arange(4 * w)
    r[s >> 2, s] = 1.0
    return r


@functools.lru_cache(maxsize=None)
def _rank_matrix(m: int) -> np.ndarray:
    """[M, M] strictly-upper-triangular ones U (U[j, i] = 1 iff j < i):
    (keep @ U)[i] counts the kept candidates at strictly smaller index —
    the exclusive running count XLA's cumsum(keep) - 1 yields on kept
    positions."""
    return np.triu(np.ones((m, m), np.float32), k=1)


def _expand_f32(x, rep_ref):
    """f32 [bn, W] -> [bn, 4W] repeat-4 via hi/lo bf16 2-pass (near-exact:
    two bf16 limbs keep ~16 of 24 mantissa bits, ~2^-17 relative)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.dot(hi, rep_ref[:], preferred_element_type=jnp.float32) + jnp.dot(
        lo, rep_ref[:], preferred_element_type=jnp.float32
    )


def _expand_int(x, rep_ref):
    """int [bn, W] (values < 2^24) -> [bn, 4W] repeat-4 via one f32 pass."""
    e = jnp.dot(
        x.astype(jnp.float32), rep_ref[:], preferred_element_type=jnp.float32
    )
    return e.astype(jnp.int32)


def _expand_u32(x, rep_ref):
    """u32 [bn, W] -> [bn, 4W] repeat-4 via two f32-exact u16 halves."""
    hi = _expand_int((x >> jnp.uint32(16)).astype(jnp.int32), rep_ref)
    lo = _expand_int((x & jnp.uint32(0xFFFF)).astype(jnp.int32), rep_ref)
    return (hi.astype(jnp.uint32) << jnp.uint32(16)) | lo.astype(jnp.uint32)


def _crc2_const() -> np.ndarray:
    poly = 0x82F63B78
    table = np.zeros(4, dtype=np.uint32)
    for v in range(4):
        crc = v
        for _ in range(2):
            b = crc & 1
            crc >>= 1
            if b:
                crc ^= poly
        table[v] = crc
    return table


_CRC2_TAB = _crc2_const()


def _crc2(crc, bits):
    """CRC32C fold of 2 bits, table lookup as a 4-way select."""
    folded = crc ^ (bits.astype(jnp.uint32) & jnp.uint32(3))
    low = folded & jnp.uint32(3)
    tab = jnp.where(
        low == 0,
        jnp.uint32(_CRC2_TAB[0]),
        jnp.where(
            low == 1,
            jnp.uint32(_CRC2_TAB[1]),
            jnp.where(low == 2, jnp.uint32(_CRC2_TAB[2]), jnp.uint32(_CRC2_TAB[3])),
        ),
    )
    return (folded >> jnp.uint32(2)) ^ tab


def _lse(x, y):
    d = jnp.abs(x - y)
    return jnp.maximum(x, y) + jnp.where(d < 17.0, jnp.log1p(jnp.exp(-d)), 0.0)


def _beam_kernel(
    pack_ref,  # [bt, bn, 20, r] f32: 16 score cols + 4 back cols per row
    init_state_ref,  # [bn, W] i32
    init_hash_ref,  # [bn, W] i32 (u32 bits)
    rep_ref,  # [W, 4W] f32 one-hot repeat-4
    rank_ref,  # [5W, 5W] f32 strictly-lower-tri ones
    hist_state_ref,  # [bt, bn, W] i32 out
    hist_ps_ref,  # [bt, bn, W] i32 out: parent | stay << 8
    final_ref,  # [bn, W] f32 out (raw scores after the last step)
    state_s,  # scratch [bn, W] i32
    hash_s,  # scratch [bn, W] i32
    score_s,  # scratch [bn, W] f32
    raw_s,  # scratch [bn, W] f32
    *,
    bt: int,
    w: int,
    r: int,
    num_state_bits: int,
    stay_score: float,
    log_beam_cut: float,
):
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        state_s[:] = init_state_ref[:]
        hash_s[:] = init_hash_ref[:]
        score_s[:] = jnp.zeros_like(score_s)
        raw_s[:] = jnp.zeros_like(raw_s)

    bn = state_s.shape[0]
    states_mask = jnp.uint32(4 * r - 1)
    min_width = (w * 8) // 10

    beam_state = state_s[:]
    beam_hash = hash_s[:].astype(jnp.uint32)
    beam_score = score_s[:]

    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (bn, 4 * w), 1)
    slot_base = slot_iota & 3
    cand_iota = jax.lax.broadcasted_iota(jnp.int32, (bn, 5 * w), 1)
    kept_rank = jax.lax.broadcasted_iota(jnp.int32, (bn, w, 1), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (bn, w, r), 2)

    for i in range(bt):
        prev = beam_state.astype(jnp.uint32)
        shifted = (prev << 2) & states_mask
        dropped = ((prev << 2) & jnp.uint32(0xFFFF)) >> jnp.uint32(num_state_bits)
        row_step = (prev & jnp.uint32(r - 1)).astype(jnp.int32)
        row_stay = (prev >> jnp.uint32(2)).astype(jnp.int32)

        # ---- lane-masked lookups over the r rows (exact: one row matches)
        m_step = row_iota == row_step[:, :, None]  # [bn, W, r]
        m_stay = row_iota == row_stay[:, :, None]

        def look(mask, k):
            # static ref slice: mixed int/slice indexing on a 3D *value*
            # lowers to an unsupported 3D gather in Mosaic
            vals = pack_ref[i, :, k, :][:, None, :]  # [bn, 1, r]
            return jnp.where(mask, vals, 0.0).sum(axis=-1)  # [bn, W]

        # per-base transition + step back-guide, folded over `dropped`
        drop_i = dropped.astype(jnp.int32)
        tb = []  # 4x [bn, W]: trans(base) + back(base)
        for b in range(4):
            t_b = jnp.zeros((bn, w), jnp.float32)
            for d in range(4):
                g = look(m_step, b * 4 + d)
                t_b = t_b + jnp.where(drop_i == d, g, 0.0)
            tb.append(t_b + look(m_step, 16 + b))

        prev_base = (prev & jnp.uint32(3)).astype(jnp.int32)
        stay_back = jnp.zeros((bn, w), jnp.float32)
        for b in range(4):
            stay_back = stay_back + jnp.where(
                prev_base == b, look(m_stay, 16 + b), 0.0
            )
        stay_score_v = beam_score + stay_score + stay_back

        # ---- step candidates at slots w*4+base ([bn, 4W]) via repeat-4
        shifted_e = _expand_int(
            (prev & jnp.uint32(r * 4 - 1)).astype(jnp.int32), rep_ref
        )
        step_state = ((shifted_e << 2) & (4 * r - 1)) | slot_base
        hash_e = _expand_u32(beam_hash, rep_ref)
        step_hash = _crc2(hash_e, slot_base)
        # dead slots carry score == NEG, which overflows the hi/lo bf16
        # split (bf16 max < |f32 min| -> inf -> NaN); expand a clamped copy
        # and restore NEG exactly via the expanded dead mask. XLA's dead
        # step_score is NEG + finite == NEG bit-exactly (f32 quantum at
        # 3.4e38 is ~4e31), so this reproduces it.
        dead = beam_score <= NEG / 2
        dead_e = _expand_int(dead.astype(jnp.int32), rep_ref) > 0
        score_e = _expand_f32(jnp.maximum(beam_score, -1e37), rep_ref)
        step_score = score_e
        for b in range(4):
            step_score = step_score + jnp.where(
                slot_base == b, _expand_f32(tb[b], rep_ref), 0.0
            )
        step_score = jnp.where(dead_e, NEG, step_score)
        back_e = jnp.zeros((bn, 4 * w), jnp.float32)
        for b in range(4):
            back_e = back_e + jnp.where(
                slot_base == b, _expand_f32(look(m_step, 16 + b), rep_ref), 0.0
            )

        # ---- stay/step merge (beam_search.cpp:303-340), vectorised
        match = (
            (step_hash[:, None, :] == beam_hash[:, :, None])
            & (slot_base[:, None, :] == (beam_state[:, :, None] & 3))
            & (step_score[:, None, :] > NEG / 2)
            & (stay_score_v[:, :, None] > NEG / 2)
        )  # [bn, W_stay, 4W_step]
        folded = _lse(stay_score_v[:, :, None], step_score[:, None, :])
        stay_wins = stay_score_v[:, :, None] > step_score[:, None, :]

        step_killed = (match & stay_wins).any(axis=1)  # [bn, 4W]
        step_folded = (match & ~stay_wins).any(axis=1)
        step_fold_val = jnp.max(jnp.where(match & ~stay_wins, folded, NEG), axis=1)
        new_step = jnp.where(
            step_killed, NEG, jnp.where(step_folded, step_fold_val, step_score)
        )

        stay_loses = (match & ~stay_wins).any(axis=2)  # [bn, W]
        stay_folds = (match & stay_wins).any(axis=2)
        stay_fold_val = jnp.max(jnp.where(match & stay_wins, folded, NEG), axis=2)
        new_stay = jnp.where(
            stay_loses, NEG, jnp.where(stay_folds, stay_fold_val, stay_score_v)
        )

        cand_score = jnp.concatenate([new_step, new_stay], axis=1)  # [bn, 5W]

        # ---- beam-cut binary search (reference caps guesses at 10)
        max_score = cand_score.max(axis=1, keepdims=True)  # [bn, 1]
        cutoff0 = max_score - log_beam_cut

        def count_ge(cut):
            return (cand_score >= cut).sum(axis=1, keepdims=True)

        cnt0 = count_ge(cutoff0)
        needs_search = cnt0 > w
        cutoff, lo, hi, done = cutoff0, cutoff0, max_score, ~needs_search
        for _ in range(9):
            cnt = count_ge(cutoff)
            too_many = cnt > w
            too_few = cnt < min_width
            need = (too_many | too_few) & ~done
            new_lo = jnp.where(too_many & need, cutoff, lo)
            new_hi = jnp.where(~too_many & need, cutoff, hi)
            cutoff = jnp.where(
                need,
                jnp.where(too_many, (cutoff + hi) / 2.0, (cutoff + lo) / 2.0),
                cutoff,
            )
            lo, hi, done = new_lo, new_hi, done | ~need
        cutoff = jnp.where(done, cutoff, hi)
        elem_count = jnp.minimum(count_ge(cutoff), w)  # [bn, 1]

        # ---- order-preserving rank-compaction selection
        keep = cand_score >= cutoff  # [bn, 5W]
        rank = jnp.dot(
            keep.astype(jnp.bfloat16), rank_ref[:],
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # exclusive running count, exact (<= 160)
        n_kept = jnp.minimum(keep.sum(axis=1, keepdims=True), w)
        alive = kept_rank[..., 0] < jnp.minimum(elem_count, n_kept)  # [bn, W]

        cand_state = jnp.concatenate([step_state, beam_state], axis=1)
        cand_hash = jnp.concatenate([step_hash, beam_hash], axis=1)
        cand_parent = jnp.concatenate(
            [slot_iota >> 2, jax.lax.broadcasted_iota(jnp.int32, (bn, w), 1)],
            axis=1,
        )
        cand_stay = cand_iota >= 4 * w
        cand_back = jnp.concatenate([back_e, stay_back], axis=1)

        selm = keep[:, None, :] & (rank[:, None, :] == kept_rank)  # [bn, W, 5W]
        k_state = jnp.max(jnp.where(selm, cand_state[:, None, :], 0), axis=2)
        # u32 reductions aren't lowered by Mosaic; reduce the two u16
        # halves as i32 (exact: at most one selm element per row is True,
        # so each half's max IS that element's half)
        ch = cand_hash[:, None, :]
        k_hash_hi = jnp.max(
            jnp.where(selm, (ch >> jnp.uint32(16)).astype(jnp.int32), 0), axis=2
        )
        k_hash_lo = jnp.max(
            jnp.where(selm, (ch & jnp.uint32(0xFFFF)).astype(jnp.int32), 0), axis=2
        )
        k_hash = (
            k_hash_hi.astype(jnp.uint32) << jnp.uint32(16)
        ) | k_hash_lo.astype(jnp.uint32)
        k_parent = jnp.max(jnp.where(selm, cand_parent[:, None, :], 0), axis=2)
        k_score = jnp.max(jnp.where(selm, cand_score[:, None, :], NEG), axis=2)
        k_stay = (selm & cand_stay[:, None, :]).any(axis=2)
        k_back = jnp.max(jnp.where(selm, cand_back[:, None, :], NEG), axis=2)

        beam_state = k_state.astype(jnp.int32)
        beam_hash = k_hash
        beam_score = jnp.where(alive, k_score - k_back, NEG)
        raw = jnp.where(alive, k_score, NEG)

        hist_state_ref[i] = beam_state
        hist_ps_ref[i] = k_parent | (k_stay.astype(jnp.int32) << 8)
        if i == bt - 1:
            raw_s[:] = raw

    state_s[:] = beam_state
    hash_s[:] = beam_hash.astype(jnp.int32)
    score_s[:] = beam_score
    final_ref[:] = raw_s[:]


@functools.partial(
    jax.jit, static_argnames=("beam_width", "beam_cut", "fixed_stay_score", "interpret")
)
def beam_forward_pallas(
    scores_tnc: jnp.ndarray,  # [T, N, C] f32
    back_guide: jnp.ndarray,  # [T+1, N, S] f32
    beam_width: int = 32,
    beam_cut: float = 100.0,
    fixed_stay_score: float = 2.0,
    interpret: bool | None = None,
):
    """Forward beam pass: (hist_state [T,N,W] i32, hist_parent [T,N,W] i32,
    hist_stay [T,N,W] bool, final_score [N,W] f32). Same semantics as the
    scan in ops/beam.py::beam_search_device."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t_len, n, c = scores_tnc.shape
    num_states = c // 4
    num_state_bits = int(num_states).bit_length() - 1
    w = beam_width
    r = num_states // 4
    log_beam_cut = (
        float(np.log(beam_cut)) if beam_cut > 0 else float(np.finfo(np.float32).max)
    )

    # ---- init from top back-guide states, in state order (as ops/beam.py)
    from dorado_tpu.ops.beam import _CRC_SEED, _crc32

    bg0 = back_guide[0]
    kth = -jnp.sort(-bg0, axis=1)[:, w - 1 : w]
    sel = bg0 >= kth
    order_key = jnp.where(sel, 0, 1) * num_states + jnp.arange(num_states)[None, :]
    init_states = (jnp.sort(order_key, axis=1)[:, :w] % num_states).astype(jnp.int32)
    init_hash = _crc32(jnp.full((n, w), _CRC_SEED, jnp.uint32), init_states)

    # ---- pack the lookup stream: [T, N, 20, r]
    # cols 0..15: scores c = row*16 + k (k = base*4 + dropped);
    # cols 16..19: back-guide rows t+1, c = row*4 + b.
    sc = scores_tnc.reshape(t_len, n, r, 16).transpose(0, 1, 3, 2)
    bg = back_guide[1:].reshape(t_len, n, r, 4).transpose(0, 1, 3, 2)
    pack = jnp.concatenate([sc, bg], axis=2)  # [T, N, 20, r]

    bn = n
    while bn > 64 and n % (bn // 2) == 0 and bn > 8:
        bn //= 2
    # time tile: VMEM budget for the pack blocks + history blocks
    per_t = bn * (20 * r * 4 + 2 * w * 4) * 2
    bt = max(1, int((4 * 1024 * 1024) // per_t))
    while t_len % bt:
        bt -= 1
    n_tiles, t_tiles = n // bn, t_len // bt

    kernel = functools.partial(
        _beam_kernel,
        bt=bt,
        w=w,
        r=r,
        num_state_bits=num_state_bits,
        stay_score=float(fixed_stay_score),
        log_beam_cut=log_beam_cut,
    )
    t_map = lambda b, t: (t, b, 0, 0)  # noqa: E731
    o_map = lambda b, t: (t, b, 0)  # noqa: E731

    f = pl.pallas_call(
        kernel,
        grid=(n_tiles, t_tiles),
        in_specs=[
            pl.BlockSpec((bt, bn, 20, r), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, w), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, w), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, 4 * w), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (5 * w, 5 * w), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((bt, bn, w), o_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, bn, w), o_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, w), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, n, w), jnp.int32),
            jax.ShapeDtypeStruct((t_len, n, w), jnp.int32),
            jax.ShapeDtypeStruct((n, w), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, w), jnp.int32),
            pltpu.VMEM((bn, w), jnp.int32),
            pltpu.VMEM((bn, w), jnp.float32),
            pltpu.VMEM((bn, w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=interpret,
    )
    hist_state, hist_ps, final = f(
        pack,
        init_states,
        init_hash.astype(jnp.int32),
        jnp.asarray(_rep4_matrix(w), jnp.bfloat16),
        jnp.asarray(_rank_matrix(5 * w), jnp.bfloat16),
    )
    hist_parent = hist_ps & 0xFF
    hist_stay = (hist_ps >> 8).astype(jnp.bool_)
    return hist_state, hist_parent, hist_stay, final


@functools.partial(
    jax.jit, static_argnames=("beam_width", "beam_cut", "fixed_stay_score", "interpret")
)
def beam_search_pallas(
    scores_tnc: jnp.ndarray,
    back_guide: jnp.ndarray,
    beam_width: int = 32,
    beam_cut: float = 100.0,
    fixed_stay_score: float = 2.0,
    interpret: bool | None = None,
):
    """(states [N, T] i32, moves [N, T] u8) — drop-in for
    ops/beam.py::beam_search_device with the step body in Mosaic."""
    from dorado_tpu.ops.beam import _traceback

    hist_state, hist_parent, hist_stay, final = beam_forward_pallas(
        scores_tnc,
        back_guide,
        beam_width,
        beam_cut,
        fixed_stay_score,
        interpret,
    )
    return _traceback(hist_state, hist_parent, hist_stay, final)
