"""Pallas TPU kernels for the CRF lattice scans.

The XLA `lax.scan` decode path (ops/crf_scan.py) costs ~16-25us per timestep
at hac shapes — body-bound on HBM round-trips between the fused loops of
each step. These kernels keep the carry in VMEM across a time-tiled grid and
stream raw score blocks through, cutting the per-step cost to ~8us at hac
shapes (measured v5e, batch 256). This is the TPU analogue of the reference
running its whole decode in four fused CUDA kernels
(dorado/basecall/decode/CUDADecoder.cpp:77-106).

Kernel structure (constraints measured on v5e Mosaic — lane-dim interleaved
repeats, strided slices, lane-splitting reshapes, sorts and cumsum do NOT
lower; sub-128-lane slice/repeat tricks lower but run slower than full-shape
MXU matmuls):

- the carry expansion state->transition space and the transition->state
  reduction both ride the MXU as *exact* one-hot f32 matmuls (each row/
  column has a single 1.0, so the f32 accumulation adds only zeros):
      red = ((exp(carry - m) @ P) * exp(scores_t)) @ G
  with per-direction constant P [S, C] / G [C, S] encoding the lattice
  wiring in the *raw* score layout — no score permutation pass outside.
- LSE runs in exp space with a per-row max shift (states >87 nats below
  the row max underflow to -inf, harmless downstream; see crf_scan.py).
- VMEM budget: P+G (2*S*C*4 bytes) + double-buffered in/out blocks must
  fit ~16 MB/core, which holds for state_len 4 (hac/fast, C=1024). The
  transformer-sup space (C=4096) exceeds the dense matrices, so sup routes
  through the block-layout kernels below (pre-permuted scores + the
  [S/4, S] repeat matrix); see supports_pallas_decode for the envelope.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM working-set budget for choosing the time-tile (bytes); leaves room
# for Pallas' double-buffered in/out blocks inside the ~16 MB/core VMEM.
_VMEM_BUDGET = 9 * 1024 * 1024


def _pick_bn(n: int) -> int:
    """Batch tile: largest power-of-two divisor of n, at most 128."""
    bn = 1
    while bn < 128 and n % (bn * 2) == 0:
        bn *= 2
    return bn


def _pick_bt_for(t_len: int, per_t: int) -> int:
    """Largest divisor of t_len whose per-timestep block bytes fit VMEM."""
    best = 1
    for bt in range(1, t_len + 1):
        if t_len % bt:
            continue
        if bt * per_t > _VMEM_BUDGET:
            break
        best = bt
    return best


def _pick_bt(t_len: int, bn: int, c: int) -> int:
    """Largest divisor of t_len whose double-buffered blocks fit VMEM."""
    s = c // 4
    return _pick_bt_for(t_len, bn * c * 4 * 2 + bn * s * 4 * 2)


def _pick_tiles(t_len: int, n: int, row_bytes) -> tuple[int, int]:
    """(bn, bt) with the batch tile as wide as VMEM allows (wider rows give
    the VPU more ILP per op along the serial carry chain — the scans are
    latency-bound on that chain, not on FLOPs), then the largest time tile
    that fits. row_bytes(bn) -> double-buffered VMEM bytes per time-row."""
    bn = 1
    while bn < 512 and n % (bn * 2) == 0:
        bn *= 2
    while bn > 128 and row_bytes(bn) > _VMEM_BUDGET:
        bn //= 2
    return bn, max(_pick_bt_for(t_len, row_bytes(bn)), 1)


@functools.lru_cache(maxsize=None)
def _lattice_matrices(num_states: int, reverse: bool) -> tuple[np.ndarray, np.ndarray]:
    """One-hot (P [S, C], G [C, S]) pair for a scan direction.

    Forward (crf_scan.predecessor_index semantics): transition c = s*4 + r
    steps pred(c) = r*(S/4) + (s>>2) -> s, so
        P[p, c] = 1  iff  p == (c&3)*(S/4) + (c>>4)      (expand alpha)
        G[c, s] = 1  iff  s == c>>2                       (reduce over r)

    Backward: transition c = s'*4 + r carries beta[s'] into s =
    (r << 2*(state_len-1)) | (s'>>2) (crf_scan.backward_scores), so
        P[p, c] = 1  iff  p == c>>2                       (expand beta)
        G[c, s] = 1  iff  s == ((c&3) << shift) | (c>>4)  (reduce over b)
    """
    c_len = num_states * 4
    c_arr = np.arange(c_len)
    p_mat = np.zeros((num_states, c_len), np.float32)
    g_mat = np.zeros((c_len, num_states), np.float32)
    if reverse:
        shift = 2 * (int(round(np.log(num_states) / np.log(4))) - 1)
        p_mat[c_arr >> 2, c_arr] = 1.0
        g_mat[c_arr, ((c_arr & 3) << shift) | (c_arr >> 4)] = 1.0
    else:
        p_mat[(c_arr & 3) * (num_states // 4) + (c_arr >> 4), c_arr] = 1.0
        g_mat[c_arr, c_arr >> 2] = 1.0
    return p_mat, g_mat


def _dot2(x, m_bf16):
    """Near-exact f32 one-hot copy matmul in two MXU passes.

    DEFAULT precision truncates f32 operands to bf16 on the MXU (one pass,
    0.4% rel error — too coarse for a 1666-step recursion). HIGHEST is exact
    but costs 6 passes. A hi/lo bf16 split costs 2: x = hi + lo with
    hi = bf16(x), lo = bf16(x - hi); each product against a one-hot 1.0 is
    exact, so the copy is recovered to ~2^-17 relative.
    """
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.dot(hi, m_bf16, preferred_element_type=jnp.float32) + jnp.dot(
        lo, m_bf16, preferred_element_type=jnp.float32
    )


def _lse_kernel(sc_ref, p_ref, g_ref, out_ref, carry_ref, *, bt, stay_factor, rev):
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    # static unroll over the (small) time tile: Mosaic handles constant
    # leading-dim block indices far more reliably than dynamic ones
    carry = carry_ref[:]
    for i in range(bt):
        j = (bt - 1 - i) if rev else i
        m = jnp.max(carry, axis=-1, keepdims=True)
        ec = jnp.exp(carry - m)
        ecp = _dot2(ec, p_ref[:])
        prod = ecp * jnp.exp(sc_ref[j])
        red = _dot2(prod, g_ref[:])
        carry = m + jnp.log(red + ec * stay_factor)
        out_ref[j] = carry
    carry_ref[:] = carry


@functools.partial(jax.jit, static_argnames=("stay_score", "reverse", "interpret"))
def _lse_scan_pallas(scores_tnc, stay_score: float, reverse: bool, interpret: bool):
    t_len, n, c = scores_tnc.shape
    s = c // 4
    bn = _pick_bn(n)
    bt = _pick_bt(t_len, bn, c)
    n_tiles, t_tiles = n // bn, t_len // bt
    stay_factor = float(np.exp(stay_score))

    p_mat, g_mat = _lattice_matrices(s, reverse)
    kernel = functools.partial(
        _lse_kernel, bt=bt, stay_factor=stay_factor, rev=reverse
    )
    if reverse:
        t_map = lambda b, t: (t_tiles - 1 - t, b, 0)  # noqa: E731
    else:
        t_map = lambda b, t: (t, b, 0)  # noqa: E731

    f = pl.pallas_call(
        kernel,
        grid=(n_tiles, t_tiles),
        in_specs=[
            pl.BlockSpec((bt, bn, c), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((s, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, s), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, bn, s), t_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len, n, s), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bn, s), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=interpret,
    )
    hist = f(
        scores_tnc.astype(jnp.float32),
        jnp.asarray(p_mat, jnp.bfloat16),
        jnp.asarray(g_mat, jnp.bfloat16),
    )
    init = jnp.zeros((1, n, s), jnp.float32)
    # match crf_scan history convention: [T+1, N, S] including the init row
    if reverse:
        return jnp.concatenate([hist, init], axis=0)
    return jnp.concatenate([init, hist], axis=0)


@functools.lru_cache(maxsize=None)
def _select_matrices(num_states: int) -> np.ndarray:
    """G_r [4, C, S]: G_r[c, s] = 1 iff c == s*4 + r — per-slot transition
    selection for the Viterbi max over the 4 step predecessors."""
    c_len = num_states * 4
    out = np.zeros((4, c_len, num_states), np.float32)
    s_arr = np.arange(num_states)
    for r in range(4):
        out[r, s_arr * 4 + r, s_arr] = 1.0
    return out


def _viterbi_kernel(
    sc_ref, p_ref, gs_ref, out_ref, final_ref, carry_ref, *, bt, stay_score
):
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    carry = carry_ref[:]
    for i in range(bt):
        # per-step row-max normalisation keeps the carry near zero so the
        # hi/lo bf16 split in _dot2 stays accurate on the states that matter
        # (argmax decisions are shift-invariant)
        carry = carry - jnp.max(carry, axis=-1, keepdims=True)
        avp = _dot2(carry, p_ref[:])
        stepped = avp + sc_ref[i]  # [bn, C] candidate path scores
        red = [_dot2(stepped, gs_ref[r]) for r in range(4)]
        best = jnp.maximum(jnp.maximum(red[0], red[1]), jnp.maximum(red[2], red[3]))
        best_r = jnp.where(
            jnp.maximum(red[0], red[1]) >= jnp.maximum(red[2], red[3]),
            jnp.where(red[0] >= red[1], 0, 1),
            jnp.where(red[2] >= red[3], 2, 3),
        )
        stay = carry + stay_score
        is_stay = stay >= best
        carry = jnp.where(is_stay, stay, best)
        out_ref[i] = jnp.where(is_stay, 4, best_r).astype(jnp.int8)
    carry_ref[:] = carry
    final_ref[:] = carry  # only the last time tile's write survives


@functools.partial(jax.jit, static_argnames=("stay_score", "interpret"))
def _viterbi_fwd_pallas(scores_tnc, stay_score: float, interpret: bool):
    """Max-plus forward pass: (choices [T, N, S] int8 with 4 = stay and
    0..3 = predecessor slot r, final alpha_v [N, S]) — the forward half of
    crf_scan.viterbi_path as one fused streaming kernel."""
    t_len, n, c = scores_tnc.shape
    s = c // 4
    bn = _pick_bn(n)
    bt = _pick_bt(t_len, bn, c)
    n_tiles, t_tiles = n // bn, t_len // bt

    p_mat, _ = _lattice_matrices(s, False)
    gs = _select_matrices(s)
    kernel = functools.partial(_viterbi_kernel, bt=bt, stay_score=float(stay_score))
    t_map = lambda b, t: (t, b, 0)  # noqa: E731

    f = pl.pallas_call(
        kernel,
        grid=(n_tiles, t_tiles),
        in_specs=[
            pl.BlockSpec((bt, bn, c), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((s, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, c, s), lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, bn, s), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, s), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, n, s), jnp.int8),
            jax.ShapeDtypeStruct((n, s), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bn, s), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=interpret,
    )
    choices, final = f(
        scores_tnc.astype(jnp.float32),
        jnp.asarray(p_mat, jnp.bfloat16),
        jnp.asarray(gs, jnp.bfloat16),
    )
    return choices, final


def viterbi_path_pallas(scores_tnc, fixed_stay_score: float, interpret: bool = False):
    """Exact Viterbi path via the Pallas forward kernel + the XLA traceback.

    Matches crf_scan.viterbi_path: returns (states [T, N] i32, moves [T, N]
    u8). The forward max-scan (the expensive [T, N, C] streaming pass) runs
    in the fused kernel; the [N]-wide traceback stays a lax.scan.
    """
    from dorado_tpu.ops.crf_scan import viterbi_traceback

    if _use_block_layout(scores_tnc.shape[-1]):
        choices, final = _viterbi_fwd_pallas_blk(
            scores_tnc, float(fixed_stay_score), interpret
        )
    else:
        choices, final = _viterbi_fwd_pallas(
            scores_tnc, float(fixed_stay_score), interpret
        )
    last_state = jnp.argmax(final, axis=-1).astype(jnp.int32)
    return viterbi_traceback(choices, last_state)


def supports_pallas_decode(num_transitions: int) -> bool:
    """Dense [S, C] lattice matrices (small spaces) or the block-layout
    kernels (sup's state_len 5, S=1024) — both stream through VMEM. S=1024
    is the cap: the traceback's [S, 4S] predecessor matrix grows as 4*S^2
    (8 MB bf16 at S=1024) and larger spaces would blow VMEM."""
    s = num_transitions // 4
    if 2 * s * num_transitions * 4 <= 4 * 1024 * 1024:
        return True
    return s <= 1024


def _use_block_layout(c: int) -> bool:
    s = c // 4
    return 2 * s * c * 4 > 4 * 1024 * 1024


# ----------------------------------------------------------------------
# block-layout kernels (large state spaces, e.g. sup state_len 5)
#
# Scores are pre-permuted (one constant-index XLA gather pass) from the raw
# flat layout c = s*4 + r to the *block* layout c' = r*S + s. In that
# layout the lattice wiring needs no dense [S, C] matrices:
#   - forward expansion per slot r is `repeat4(ec[rS/4:(r+1)S/4])`
#     = slice @ R4 with R4 [S/4, S] one-hot — 4x fewer MXU FLOPs;
#   - forward reduction is an elementwise sum over the 4 r-planes;
#   - backward expansion is a broadcast of beta over r (free), and the
#     reduction per slot is a contiguous 4-segment sum = plane @ R4^T.
# ----------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _repeat_matrices(num_states: int) -> tuple[np.ndarray, np.ndarray]:
    """R4 [S/4, S] with R4[u, s] = 1 iff u == s>>2, and its transpose."""
    s4 = num_states // 4
    r4 = np.zeros((s4, num_states), np.float32)
    r4[np.arange(num_states) >> 2, np.arange(num_states)] = 1.0
    return r4, r4.T.copy()


@functools.lru_cache(maxsize=None)
def _combined_matrices(num_states: int) -> tuple[np.ndarray, np.ndarray]:
    """R [S, C] one-hot with R[u, r*S + s] = 1 iff u == r*(S/4) + (s>>2):
    the four per-slot repeat matrices stacked along columns, so all four
    slot expansions run as ONE MXU matmul per time-row. At hac shapes the
    per-slot [bn, S/4] @ [S/4, S] matmuls are issue-latency-bound (8-16
    tiny matmuls per row); one [bn, S] @ [S, C] pass is ~1.5x faster
    end-to-end (measured v5e, batch 512). Same exact-copy semantics: each
    column has a single 1.0. Used when S <= 256 (bf16 R is 512 KB of VMEM;
    sup's S=1024 would need 8 MB, so sup stays on the per-slot matrices)."""
    s4 = num_states // 4
    c = num_states * 4
    cp = np.arange(c)
    r = np.zeros((num_states, c), np.float32)
    r[(cp // num_states) * s4 + ((cp % num_states) >> 2), cp] = 1.0
    return r, r.T.copy()


def _use_combined(num_states: int) -> bool:
    return num_states <= 256


def block_permutation(num_states: int) -> np.ndarray:
    """perm with scores_blk[..., r*S + s] = scores_raw[..., s*4 + r]."""
    c = num_states * 4
    cp = np.arange(c)
    return ((cp % num_states) * 4 + (cp // num_states)).astype(np.int32)


def _alpha_step(ec, sc, mat_ref, stay_factor, s4, combined):
    """One forward-LSE lattice step in exp space: exp-carry ec [bn, S] and
    block-layout score row sc [bn, C] -> reduced exp sums [bn, S]."""
    s = 4 * s4
    red = ec * stay_factor
    if combined:
        ecp = _dot2(ec, mat_ref[:])  # [bn, C], one MXU pass (x2 hi/lo)
        prod = ecp * jnp.exp(sc)
        for r in range(4):
            red = red + prod[:, r * s : (r + 1) * s]
    else:
        for r in range(4):
            ecp = _dot2(ec[:, r * s4 : (r + 1) * s4], mat_ref[:])
            red = red + ecp * jnp.exp(sc[:, r * s : (r + 1) * s])
    return red


def _lse_fwd_blk_kernel(
    sc_ref, r4_ref, out_ref, carry_ref, *, bt, stay_factor, s4, combined
):
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    carry = carry_ref[:]
    for i in range(bt):
        m = jnp.max(carry, axis=-1, keepdims=True)
        ec = jnp.exp(carry - m)
        sc = sc_ref[i].astype(jnp.float32)
        red = _alpha_step(ec, sc, r4_ref, stay_factor, s4, combined)
        carry = m + jnp.log(red)
        out_ref[i] = carry
    carry_ref[:] = carry


def _lse_bwd_blk_kernel(
    sc_ref, r4t_ref, out_ref, carry_ref, *, bt, stay_factor, s4, combined, shifted
):
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    s = 4 * s4
    carry = carry_ref[:]
    for i in range(bt):
        j = bt - 1 - i
        m = jnp.max(carry, axis=-1, keepdims=True)
        if shifted:
            # row j of the shifted stream is beta[j+1]: the carry BEFORE
            # consuming score row j. Writing it here hands the fused
            # forward kernel exactly the rows it needs — no [T+1] concat +
            # [1:] slice pass over the full beta tensor outside. The row is
            # stored max-NORMALISED (softmax-shift-invariant for the posts
            # it feeds) so a bf16 out dtype stays accurate: raw beta grows
            # ~stay*T (quantum ~16 in bf16 at sup depth), normalised rows
            # sit near 0 (quantum 2^-8 on the dominant states).
            out_ref[j] = (carry - m).astype(out_ref.dtype)
        eb = jnp.exp(carry - m)
        sc = sc_ref[j].astype(jnp.float32)
        if combined:
            # prod[c'=r*S+s] = eb[s] * exp(sc[c']); R^T folds the four
            # slot reductions into one [bn, C] @ [C, S] pass
            ebt = jnp.concatenate([eb, eb, eb, eb], axis=-1)  # [bn, C]
            prod = ebt * jnp.exp(sc)
            red = _dot2(prod, r4t_ref[:]) + eb * stay_factor
        else:
            parts = []
            for r in range(4):
                prod = eb * jnp.exp(sc[:, r * s : (r + 1) * s])
                parts.append(_dot2(prod, r4t_ref[:]))  # [bn, S/4]
            red = jnp.concatenate(parts, axis=-1) + eb * stay_factor
        carry = m + jnp.log(red)
        if not shifted:
            out_ref[j] = carry
    carry_ref[:] = carry


@functools.partial(
    jax.jit,
    static_argnames=("stay_score", "reverse", "interpret", "prepermuted", "shifted"),
)
def _lse_scan_pallas_blk(
    scores_tnc, stay_score: float, reverse: bool, interpret: bool,
    prepermuted: bool = False, shifted: bool = False,
):
    """LSE scan via the block-layout kernel; ``prepermuted`` skips the
    raw->block gather when the caller already holds block-layout scores
    (one shared permute instead of one per kernel on the sup path) and
    keeps the caller's score dtype (bf16 stream halves the dominant HBM
    read). ``shifted`` (reverse only) returns the [T, N, S] stream with
    row j = beta[j+1] — what the fused forward kernel consumes — written
    directly by the kernel instead of a concat+slice pass outside."""
    t_len, n, c = scores_tnc.shape
    s = c // 4
    s4 = s // 4
    stay_factor = float(np.exp(stay_score))

    if prepermuted:
        blk = scores_tnc
    else:
        perm = jnp.asarray(block_permutation(s))
        blk = scores_tnc.astype(jnp.float32)[..., perm]
    esz = blk.dtype.itemsize
    bn, bt = _pick_tiles(t_len, n, lambda b: b * (c * esz + s * 4) * 2)
    n_tiles, t_tiles = n // bn, t_len // bt

    combined = _use_combined(s)
    if combined:
        r16, r16t = _combined_matrices(s)
        mat = r16t if reverse else r16
    else:
        r4, r4t = _repeat_matrices(s)
        mat = r4t if reverse else r4
    kwargs = dict(bt=bt, stay_factor=stay_factor, s4=s4, combined=combined)
    if reverse:
        kwargs["shifted"] = shifted
    kernel = functools.partial(
        _lse_bwd_blk_kernel if reverse else _lse_fwd_blk_kernel, **kwargs
    )
    if reverse:
        t_map = lambda b, t: (t_tiles - 1 - t, b, 0)  # noqa: E731
    else:
        t_map = lambda b, t: (t, b, 0)  # noqa: E731

    f = pl.pallas_call(
        kernel,
        grid=(n_tiles, t_tiles),
        in_specs=[
            pl.BlockSpec((bt, bn, c), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(mat.shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, bn, s), t_map, memory_space=pltpu.VMEM),
        # the shifted (fused-decode) stream is max-normalised per row, so a
        # bf16 score stream also gets a bf16 beta stream — it halves the
        # dominant beta write + re-read HBM traffic of the decode
        out_shape=jax.ShapeDtypeStruct(
            (t_len, n, s),
            blk.dtype if (shifted and blk.dtype == jnp.bfloat16) else jnp.float32,
        ),
        scratch_shapes=[pltpu.VMEM((bn, s), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=interpret,
    )
    hist = f(blk, jnp.asarray(mat, jnp.bfloat16))
    if shifted:
        assert reverse
        return hist
    init = jnp.zeros((1, n, s), jnp.float32)
    if reverse:
        return jnp.concatenate([hist, init], axis=0)
    return jnp.concatenate([init, hist], axis=0)


def _viterbi_expand(vc, sc, mat_ref, s4, combined):
    """Max-plus lattice expansion: carry vc [bn, S], block-layout score row
    sc [bn, C] -> the four per-slot candidate planes [bn, S] each."""
    s = 4 * s4
    if combined:
        stepped = _dot2(vc, mat_ref[:]) + sc  # [bn, C]
        return [stepped[:, r * s : (r + 1) * s] for r in range(4)]
    return [
        _dot2(vc[:, r * s4 : (r + 1) * s4], mat_ref[:]) + sc[:, r * s : (r + 1) * s]
        for r in range(4)
    ]


def _viterbi_blk_kernel(
    sc_ref, r4_ref, out_ref, final_ref, carry_ref, *, bt, stay_score, s4, combined
):
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    carry = carry_ref[:]
    for i in range(bt):
        carry = carry - jnp.max(carry, axis=-1, keepdims=True)
        red = _viterbi_expand(carry, sc_ref[i], r4_ref, s4, combined)
        best = jnp.maximum(jnp.maximum(red[0], red[1]), jnp.maximum(red[2], red[3]))
        best_r = jnp.where(
            jnp.maximum(red[0], red[1]) >= jnp.maximum(red[2], red[3]),
            jnp.where(red[0] >= red[1], 0, 1),
            jnp.where(red[2] >= red[3], 2, 3),
        )
        stay = carry + stay_score
        is_stay = stay >= best
        carry = jnp.where(is_stay, stay, best)
        out_ref[i] = jnp.where(is_stay, 4, best_r).astype(jnp.int8)
    carry_ref[:] = carry
    final_ref[:] = carry


@functools.partial(jax.jit, static_argnames=("stay_score", "interpret"))
def _viterbi_fwd_pallas_blk(scores_tnc, stay_score: float, interpret: bool):
    t_len, n, c = scores_tnc.shape
    s = c // 4
    s4 = s // 4
    bn = _pick_bn(n)
    bt = _pick_bt(t_len, bn, c)
    n_tiles, t_tiles = n // bn, t_len // bt

    perm = jnp.asarray(block_permutation(s))
    blk = scores_tnc.astype(jnp.float32)[..., perm]
    combined = _use_combined(s)
    r4 = _combined_matrices(s)[0] if combined else _repeat_matrices(s)[0]
    kernel = functools.partial(
        _viterbi_blk_kernel,
        bt=bt,
        stay_score=float(stay_score),
        s4=s4,
        combined=combined,
    )
    t_map = lambda b, t: (t, b, 0)  # noqa: E731

    f = pl.pallas_call(
        kernel,
        grid=(n_tiles, t_tiles),
        in_specs=[
            pl.BlockSpec((bt, bn, c), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(r4.shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, bn, s), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, s), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, n, s), jnp.int8),
            jax.ShapeDtypeStruct((n, s), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bn, s), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=interpret,
    )
    return f(blk, jnp.asarray(r4, jnp.bfloat16))


def _fused_fwd_kernel(
    sc_ref,
    beta_ref,
    p_ref,
    g_ref,
    gs_ref,
    posts_ref,
    choices_ref,
    final_ref,
    acarry_ref,
    vcarry_ref,
    *,
    bt,
    stay_factor,
    stay_score,
):
    """One pass over the score stream doing all three forward-direction jobs:
    the alpha LSE recursion, the posterior softmax rows (consuming the
    pre-shifted beta stream), and the Viterbi max-plus choices. Sharing the
    [bt, bn, C] block DMA is the point — the separate kernels each re-stream
    the full 1.7 GB score tensor at hac batch 256."""
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        acarry_ref[:] = jnp.zeros_like(acarry_ref)
        vcarry_ref[:] = jnp.zeros_like(vcarry_ref)

    ac = acarry_ref[:]
    vc = vcarry_ref[:]
    for i in range(bt):
        sc = sc_ref[i]
        # alpha LSE step (identical numerics to _lse_kernel)
        m = jnp.max(ac, axis=-1, keepdims=True)
        ec = jnp.exp(ac - m)
        ecp = _dot2(ec, p_ref[:])
        prod = ecp * jnp.exp(sc)
        red = _dot2(prod, g_ref[:])
        ac = m + jnp.log(red + ec * stay_factor)
        # posterior row t+1: softmax(alpha_after + beta_full[t+1])
        pb = ac + beta_ref[i]
        pm = jnp.max(pb, axis=-1, keepdims=True)
        pe = jnp.exp(pb - pm)
        posts_ref[i] = pe / jnp.sum(pe, axis=-1, keepdims=True)
        # Viterbi max-plus step (identical numerics to _viterbi_kernel)
        vc = vc - jnp.max(vc, axis=-1, keepdims=True)
        avp = _dot2(vc, p_ref[:])
        stepped = avp + sc
        red4 = [_dot2(stepped, gs_ref[r]) for r in range(4)]
        best = jnp.maximum(
            jnp.maximum(red4[0], red4[1]), jnp.maximum(red4[2], red4[3])
        )
        best_r = jnp.where(
            jnp.maximum(red4[0], red4[1]) >= jnp.maximum(red4[2], red4[3]),
            jnp.where(red4[0] >= red4[1], 0, 1),
            jnp.where(red4[2] >= red4[3], 2, 3),
        )
        stay = vc + stay_score
        is_stay = stay >= best
        vc = jnp.where(is_stay, stay, best)
        choices_ref[i] = jnp.where(is_stay, 4, best_r).astype(jnp.int8)
    acarry_ref[:] = ac
    vcarry_ref[:] = vc
    final_ref[:] = vc  # only the last time tile's write survives


@functools.partial(jax.jit, static_argnames=("stay_score", "interpret"))
def fused_forward_decode_pallas(
    scores_tnc, beta_full, stay_score: float, interpret: bool = False
):
    """(posts rows 1..T [T, N, S], choices [T, N, S] i8, final [N, S]).

    posts[t-1] == softmax(alpha_full[t] + beta_full[t]) for t in 1..T — the
    rows device_qual consumes (row 0 of the [T+1] posterior history is never
    used). choices/final match the standalone Viterbi kernels exactly.
    Dense-lattice spaces use the dense kernel; sup-sized spaces route
    through the block-layout variant.
    """
    if _use_block_layout(scores_tnc.shape[-1]):
        return _fused_forward_decode_blk(
            scores_tnc, beta_full, float(stay_score), interpret
        )
    t_len, n, c = scores_tnc.shape
    s = c // 4
    bn = _pick_bn(n)
    # fused blocks are wider (scores in + beta in + posts/choices out)
    bt = _pick_bt_for(t_len, bn * (c * 4 * 2 + s * 4 * 2 + s * 4 * 2 + s * 2))
    n_tiles, t_tiles = n // bn, t_len // bt
    stay_factor = float(np.exp(stay_score))

    p_mat, g_mat = _lattice_matrices(s, False)
    gs = _select_matrices(s)
    kernel = functools.partial(
        _fused_fwd_kernel,
        bt=bt,
        stay_factor=stay_factor,
        stay_score=float(stay_score),
    )
    t_map = lambda b, t: (t, b, 0)  # noqa: E731

    beta_shift = beta_full[1:]  # row i == beta_full[i+1]
    f = pl.pallas_call(
        kernel,
        grid=(n_tiles, t_tiles),
        in_specs=[
            pl.BlockSpec((bt, bn, c), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, bn, s), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((s, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, s), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, c, s), lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, bn, s), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, bn, s), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, s), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, n, s), jnp.float32),
            jax.ShapeDtypeStruct((t_len, n, s), jnp.int8),
            jax.ShapeDtypeStruct((n, s), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, s), jnp.float32),
            pltpu.VMEM((bn, s), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=interpret,
    )
    posts, choices, final = f(
        scores_tnc.astype(jnp.float32),
        beta_shift.astype(jnp.float32),
        jnp.asarray(p_mat, jnp.bfloat16),
        jnp.asarray(g_mat, jnp.bfloat16),
        jnp.asarray(gs, jnp.bfloat16),
    )
    return posts, choices, final


@functools.partial(jax.jit, static_argnames=("interpret",))
def viterbi_traceback_pallas(choices, last_state, interpret: bool = False):
    """(states [T, N] i32, moves [T, N] u8) — the [N]-wide reverse traceback
    as a streaming kernel. The XLA lax.scan costs ~4.4 us/step at hac batch
    256 (~7 ms/stage); here the state rides as a one-hot [bn, S] plane in
    VMEM. The data-dependent choice lookup is a mult-reduce against that
    plane, and the predecessor step is *arithmetic* — pred(s, r) =
    r*(S/4) + (s>>2) (see _lattice_matrices) — so the new one-hot is a
    single iota compare. All VPU, no per-row matmul: ~0.5 us/row vs ~76
    us/row for the earlier one-hot @ preds [S, 4S] design."""
    t_len, n, s = choices.shape
    # wide batch tiles: the traceback is latency-bound on its serial
    # one-hot-plane chain, so give each row as much VPU width as fits
    # st/mv outputs are 2-D [T, N] blocks of (bt, bn): the LAST block
    # dim must be a multiple of 128 or equal to N, so batches not
    # divisible by 128 (sweep points like 96/192) take the whole batch
    # as one tile (the one-hot plane is only [N, S] f32 of VMEM)
    if n % 128 == 0:
        bn = 128
        while bn < 512 and n % (bn * 2) == 0:
            bn *= 2
    else:
        bn = n
    # The st/mv outputs are 2-D [T, N] blocks of (bt, bn): Mosaic requires
    # the second-to-last block dim divisible by 8 for i32. T rarely has a
    # multiple-of-8 divisor, so pick bt = the largest multiple of 8 within
    # the VMEM budget and stay-pad the choice stream up to bt | T. Padding
    # appends choice==4 (stay) steps which the reverse walk crosses first
    # without moving the state — exact, and the pad rows are sliced off.
    choices = choices.astype(jnp.int8)
    # i8 blocks allocate relayout scratch beyond the double buffer (a
    # 9 MB-budget pick measured 24.9 MB of scoped VMEM at bn=512), so this
    # kernel budgets conservatively — per-row work is tiny and grid-step
    # count is not the bottleneck here.
    per_t = bn * s * 2  # double-buffered i8 choice blocks
    bt = max(8, ((3 * 1024 * 1024) // per_t) // 8 * 8)
    # cap the unrolled time tile: small state spaces (fast, S=64) would
    # otherwise pick bt=48, and the 48-way unrolled one-hot-plane chain
    # sends the Mosaic backend compile into a multi-minute stall
    bt = min(bt, 16, -(-t_len // 8) * 8)
    t_pad = -(-t_len // bt) * bt
    if t_pad != t_len:
        choices = jnp.pad(
            choices, ((0, t_pad - t_len), (0, 0), (0, 0)), constant_values=4
        )
    n_tiles, t_tiles = n // bn, t_pad // bt

    t_map = lambda b, t: (t_tiles - 1 - t, b, 0)  # noqa: E731
    t_map2 = lambda b, t: (t_tiles - 1 - t, b)  # noqa: E731

    oh0 = jax.nn.one_hot(last_state, s, dtype=jnp.float32)  # [N, S]

    def kernel(ch_ref, oh0_ref, st_ref, mv_ref, oh_scr, *, bt, s):
        t_idx = pl.program_id(1)

        @pl.when(t_idx == 0)
        def _():
            oh_scr[:] = oh0_ref[:]

        _traceback_body(ch_ref, st_ref, mv_ref, oh_scr, bt, s)

    f = pl.pallas_call(
        functools.partial(kernel, bt=bt, s=s),
        grid=(n_tiles, t_tiles),
        in_specs=[
            pl.BlockSpec((bt, bn, s), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, s), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, bn), t_map2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, bn), t_map2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # moves ride as i32 too: a u8 [T, N] output would need bt % 32
            jax.ShapeDtypeStruct((t_pad, n), jnp.int32),
            jax.ShapeDtypeStruct((t_pad, n), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((bn, s), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=interpret,
    )
    states, moves = f(choices, oh0)
    states = states[:t_len]
    moves = moves[:t_len].astype(jnp.uint8)
    moves = moves.at[0].set(1)
    return states, moves


def _traceback_body(ch_ref, st_ref, mv_ref, oh_ref, bt, s):
    bn = oh_ref.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (bn, s), 1).astype(jnp.float32)
    oh = oh_ref[:]
    for i in range(bt):
        j = bt - 1 - i  # walk time backwards within the block
        choice_f = ch_ref[j].astype(jnp.float32)  # [bn, S]
        ch = jnp.sum(oh * choice_f, axis=-1, keepdims=True)  # [bn, 1]
        st = jnp.sum(oh * iota, axis=-1, keepdims=True)  # [bn, 1] exact int
        st_ref[j] = st[:, 0].astype(jnp.int32)
        stayed = ch == 4.0
        mv_ref[j] = jnp.where(stayed[:, 0], 0, 1).astype(jnp.int32)
        # pred(s, r) = r*(S/4) + (s>>2); all values < 2^24 so f32 is exact
        pred = ch * (s // 4) + jnp.floor(st * 0.25)
        new_oh = (iota == pred).astype(jnp.float32)
        oh = jnp.where(stayed, oh, new_oh)
    oh_ref[:] = oh


def _fused_fwd_blk_kernel(
    sc_ref,
    beta_ref,
    r4_ref,
    posts_ref,
    choices_ref,
    final_ref,
    acarry_ref,
    vcarry_ref,
    *,
    bt,
    stay_factor,
    stay_score,
    s4,
    combined,
):
    """Block-layout variant of _fused_fwd_kernel for large state spaces
    (sup, S=1024): scores arrive pre-permuted to c' = r*S + s, wiring via
    the [S/4, S] repeat matrix (see the block-layout section above), or the
    combined [S, C] matrix for S <= 256 (hac/fast)."""
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        acarry_ref[:] = jnp.zeros_like(acarry_ref)
        vcarry_ref[:] = jnp.zeros_like(vcarry_ref)

    ac = acarry_ref[:]
    vc = vcarry_ref[:]
    for i in range(bt):
        sc = sc_ref[i].astype(jnp.float32)
        # alpha LSE step (identical numerics to _lse_fwd_blk_kernel)
        m = jnp.max(ac, axis=-1, keepdims=True)
        ec = jnp.exp(ac - m)
        red = _alpha_step(ec, sc, r4_ref, stay_factor, s4, combined)
        ac = m + jnp.log(red)
        # posterior row t+1
        pb = ac + beta_ref[i]
        pm = jnp.max(pb, axis=-1, keepdims=True)
        pe = jnp.exp(pb - pm)
        posts_ref[i] = (pe / jnp.sum(pe, axis=-1, keepdims=True)).astype(
            posts_ref.dtype
        )
        # Viterbi max-plus step (identical numerics to _viterbi_blk_kernel)
        vc = vc - jnp.max(vc, axis=-1, keepdims=True)
        red4 = _viterbi_expand(vc, sc, r4_ref, s4, combined)
        best = jnp.maximum(
            jnp.maximum(red4[0], red4[1]), jnp.maximum(red4[2], red4[3])
        )
        best_r = jnp.where(
            jnp.maximum(red4[0], red4[1]) >= jnp.maximum(red4[2], red4[3]),
            jnp.where(red4[0] >= red4[1], 0, 1),
            jnp.where(red4[2] >= red4[3], 2, 3),
        )
        stay = vc + stay_score
        is_stay = stay >= best
        vc = jnp.where(is_stay, stay, best)
        choices_ref[i] = jnp.where(is_stay, 4, best_r).astype(jnp.int8)
    acarry_ref[:] = ac
    vcarry_ref[:] = vc
    final_ref[:] = vc


@functools.partial(
    jax.jit,
    static_argnames=("stay_score", "interpret", "prepermuted", "beta_shifted"),
)
def _fused_forward_decode_blk(
    scores_tnc, beta_full, stay_score: float, interpret: bool,
    prepermuted: bool = False, beta_shifted: bool = False,
):
    """``beta_shifted`` means beta_full is already the [T, N, S] shifted
    stream (row i = beta[i+1]) from _lse_scan_pallas_blk(shifted=True).
    Posts come out in the score dtype: a bf16 score stream (the runner's
    TPU fast path) also writes bf16 posts — they only feed the qscore
    calc, well within bf16, and it halves the posts HBM write + re-read."""
    t_len, n, c = scores_tnc.shape
    s = c // 4
    s4 = s // 4
    stay_factor = float(np.exp(stay_score))

    if prepermuted:
        blk = scores_tnc
    else:
        perm = jnp.asarray(block_permutation(s))
        blk = scores_tnc.astype(jnp.float32)[..., perm]
    posts_dtype = blk.dtype if blk.dtype == jnp.bfloat16 else jnp.float32
    esz = blk.dtype.itemsize
    psz = jnp.dtype(posts_dtype).itemsize
    bn, bt = _pick_tiles(
        t_len, n, lambda b: b * (c * esz + s * 4 + s * psz + s) * 2
    )
    n_tiles, t_tiles = n // bn, t_len // bt
    combined = _use_combined(s)
    r4 = _combined_matrices(s)[0] if combined else _repeat_matrices(s)[0]
    kernel = functools.partial(
        _fused_fwd_blk_kernel,
        bt=bt,
        stay_factor=stay_factor,
        stay_score=float(stay_score),
        s4=s4,
        combined=combined,
    )
    t_map = lambda b, t: (t, b, 0)  # noqa: E731
    beta_shift = beta_full if beta_shifted else beta_full[1:]
    f = pl.pallas_call(
        kernel,
        grid=(n_tiles, t_tiles),
        in_specs=[
            pl.BlockSpec((bt, bn, c), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, bn, s), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(r4.shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, bn, s), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, bn, s), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, s), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, n, s), posts_dtype),
            jax.ShapeDtypeStruct((t_len, n, s), jnp.int8),
            jax.ShapeDtypeStruct((n, s), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, s), jnp.float32),
            pltpu.VMEM((bn, s), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=interpret,
    )
    # a bf16 normalised beta stream (from the shifted scan) is consumed
    # as-is — upcasting here would materialise a f32 copy of the stream
    if beta_shift.dtype != jnp.bfloat16:
        beta_shift = beta_shift.astype(jnp.float32)
    return f(blk, beta_shift, jnp.asarray(r4, jnp.bfloat16))


def supports_fused_decode(num_transitions: int) -> bool:
    """Same capacity envelope as the scan kernels (one predicate so the
    runner's scan and fused routing can never disagree)."""
    return supports_pallas_decode(num_transitions)


def fused_viterbi_decode(
    scores_tnc, stay_score: float, interpret: bool = False,
    prepermuted: bool = False,
):
    """(posts rows 1..T, choices, final) for the viterbi fast path: the
    backward LSE scan + the fused forward kernel.

    ``prepermuted`` means the caller already holds block-layout scores
    (c' = r*S + s) — the fast path: the runner bakes the permutation into
    the CRF head's output columns (runner._permute_head), so no score
    permutation pass runs on device at all (an XLA lane gather of the
    [T, N, C] tensor measured ~43 ms at hac batch 512). Raw-layout input
    routes small lattices through the dense kernels and sup through a
    one-time on-device permute shared by both kernels."""
    stay = float(stay_score)
    if prepermuted:
        beta = _lse_scan_pallas_blk(
            scores_tnc, stay, True, interpret, prepermuted=True, shifted=True
        )
        return _fused_forward_decode_blk(
            scores_tnc, beta, stay, interpret, prepermuted=True,
            beta_shifted=True,
        )
    if _use_block_layout(scores_tnc.shape[-1]):
        s = scores_tnc.shape[-1] // 4
        perm = jnp.asarray(block_permutation(s))
        blk = scores_tnc.astype(jnp.float32)[..., perm]
        beta = _lse_scan_pallas_blk(
            blk, stay, True, interpret, prepermuted=True, shifted=True
        )
        return _fused_forward_decode_blk(
            blk, beta, stay, interpret, prepermuted=True, beta_shifted=True
        )
    beta = _lse_scan_pallas(scores_tnc, stay, True, interpret)
    return fused_forward_decode_pallas(scores_tnc, beta, stay, interpret)


def use_pallas_decode() -> bool:
    return jax.default_backend() == "tpu"


def forward_scores_pallas(scores_tnc, fixed_stay_score: float, interpret: bool = False):
    """alpha [T+1, N, S]; drop-in for crf_scan.forward_scores on TPU."""
    if _use_block_layout(scores_tnc.shape[-1]):
        return _lse_scan_pallas_blk(
            scores_tnc, float(fixed_stay_score), False, interpret
        )
    return _lse_scan_pallas(scores_tnc, float(fixed_stay_score), False, interpret)


def backward_scores_pallas(scores_tnc, fixed_stay_score: float, interpret: bool = False):
    """beta [T+1, N, S]; drop-in for crf_scan.backward_scores on TPU."""
    if _use_block_layout(scores_tnc.shape[-1]):
        return _lse_scan_pallas_blk(
            scores_tnc, float(fixed_stay_score), True, interpret
        )
    return _lse_scan_pallas(scores_tnc, float(fixed_stay_score), True, interpret)
