"""Fused banded (windowed) attention for the sup transformer.

Replaces the strip-loop attention (models/tx_model.py::windowed_attention,
mirroring MultiHeadAttentionImpl's MEA split loop, nn/TxModules.cpp) with a
Pallas kernel over 256-query strips (BQ below). `windowed_attention_fused`
(separate q/k/v, prev/centre/next 256-row blocks) is the simple form;
`windowed_attention_qkv_rope` is the production form: RoPE runs as one fused
full-width XLA pass on the q/k channel halves (per-head rotates inside the
kernel are 32-lane Mosaic relayouts that measured ~3x the whole kernel
body), then each grid cell loads its 256-query strip plus four 128-row
key/value blocks through channel-sliced BlockSpecs (only the k or v channels
move per operand) and computes logits, band mask, softmax and the value
matmul entirely in VMEM per 128-query sub-block over its exact 384-key span.
The XLA strip path materialises [N, H, T, 343] f32 logits twice in HBM
(~0.7 GB round-trip per layer at sup shapes); here they never leave VMEM.

The band of any 128 queries must be covered by its 3 neighbouring 128-row kv
blocks, i.e. window <= 128 per side (sup uses [127, 128]); the fused q/k/v
form allows <= 256. The reference's 12-strip loop also TRUNCATES each band
at its strip's key range [qb - win_lower, qe + win_upper) — with the sup
window that clips exactly one key for each strip's final query — so the
kernel mask recomputes the reference strip of every query (ref_elems from
num_splits=12) and applies the same truncation bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 256


def _band_bias(s, t: int, win_upper: int, win_lower: int, ref_elems: int):
    """[BQ, 3*BQ] additive mask for strip s: the attention band, the
    reference 12-strip key-range truncation (the subtle bit-parity part),
    and validity of the clamped edge blocks — shared by both kernels so the
    truncation semantics cannot desynchronise."""
    q_global = s * BQ + jax.lax.broadcasted_iota(jnp.int32, (BQ, 3 * BQ), 0)
    k_global = (s - 1) * BQ + jax.lax.broadcasted_iota(jnp.int32, (BQ, 3 * BQ), 1)
    diff = k_global - q_global
    band = (diff >= -win_upper) & (diff <= win_lower)
    # reference-strip truncation: each query's keys are clipped to its
    # 12-strip key range [ref_qb - win_lower, ref_qe + win_upper)
    ref_qb = (q_global // ref_elems) * ref_elems
    ref_qe = jnp.minimum(ref_qb + ref_elems, t)
    band &= (k_global >= ref_qb - win_lower) & (k_global < ref_qe + win_upper)
    # edge blocks: when s == 0 the "previous" spec clamps to block 0 and when
    # s == S-1 the "next" clamps to S-1 — those duplicated blocks are outside
    # [0, t) in global coordinates, so the k_global bounds mask handles them
    valid = band & (k_global >= 0) & (k_global < t)
    return jnp.where(valid, 0.0, -1e30)


def _attn_kernel(
    q_ref, kp_ref, kc_ref, kn_ref, vp_ref, vc_ref, vn_ref, o_ref,
    *, h: int, t: int, win_upper: int, win_lower: int, ref_elems: int,
):
    s = pl.program_id(1)
    scale = 1.0 / np.sqrt(q_ref.shape[-1])
    bias = _band_bias(s, t, win_upper, win_lower, ref_elems)

    # all heads per cell (static leading-dim head indexing keeps Mosaic
    # happy; a [1, BQ, h_i, D]-style mid-dim slice does not lower)
    for h_i in range(h):
        q = q_ref[0, h_i].astype(jnp.float32)  # [BQ, D]
        k = jnp.concatenate(
            [kp_ref[0, h_i], kc_ref[0, h_i], kn_ref[0, h_i]], axis=0
        ).astype(jnp.float32)  # [3*BQ, D]
        v = jnp.concatenate(
            [vp_ref[0, h_i], vc_ref[0, h_i], vn_ref[0, h_i]], axis=0
        ).astype(jnp.float32)
        logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale + bias
        m = logits.max(axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        out = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, h_i] = (out / p.sum(axis=-1, keepdims=True)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("win_upper", "win_lower", "num_splits", "interpret")
)
def windowed_attention_fused(
    q: jnp.ndarray,  # [N, T, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    win_upper: int,
    win_lower: int,
    num_splits: int = 12,
    interpret: bool | None = None,
) -> jnp.ndarray:
    n, t, h, d = q.shape
    if win_lower > BQ or win_upper > BQ:
        raise ValueError("windowed_attention_fused requires window <= BQ per side")
    ref_elems = -(-t // num_splits)
    ref_elems += (-ref_elems) % 4
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    num_strips = -(-t // BQ)
    t_pad = num_strips * BQ
    if t_pad != t:
        pad = ((0, 0), (0, t_pad - t), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    # [N, H, S*BQ, D] head-major layout (one cheap transpose per tensor)
    qm = q.transpose(0, 2, 1, 3)
    km = k.transpose(0, 2, 1, 3)
    vm = v.transpose(0, 2, 1, 3)

    def centre(b, s):
        return (b, 0, s, 0)

    def prev(b, s):
        return (b, 0, jnp.maximum(s - 1, 0), 0)

    def nxt(b, s):
        return (b, 0, jnp.minimum(s + 1, num_strips - 1), 0)

    kernel = functools.partial(
        _attn_kernel, h=h, t=t, win_upper=win_upper, win_lower=win_lower,
        ref_elems=ref_elems,
    )
    block = (1, h, BQ, d)
    out = pl.pallas_call(
        kernel,
        grid=(n, num_strips),
        in_specs=[
            pl.BlockSpec(block, centre, memory_space=pltpu.VMEM),
            pl.BlockSpec(block, prev, memory_space=pltpu.VMEM),
            pl.BlockSpec(block, centre, memory_space=pltpu.VMEM),
            pl.BlockSpec(block, nxt, memory_space=pltpu.VMEM),
            pl.BlockSpec(block, prev, memory_space=pltpu.VMEM),
            pl.BlockSpec(block, centre, memory_space=pltpu.VMEM),
            pl.BlockSpec(block, nxt, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(block, centre, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, t_pad, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qm, km, km, km, vm, vm, vm)
    return out[:, :, :t].transpose(0, 2, 1, 3)


BK = 128  # kv block rows for the qkv_rope kernel


def _band_bias_at(
    q_start, k_start, q_rows: int, k_cols: int,
    t: int, win_upper: int, win_lower: int, ref_elems: int,
):
    """[q_rows, k_cols] additive mask at global offsets (q_start, k_start):
    the attention band, the reference 12-strip key-range truncation, and
    [0, t) key validity (kills clamped edge blocks + tail padding)."""
    q_global = q_start + jax.lax.broadcasted_iota(jnp.int32, (q_rows, k_cols), 0)
    k_global = k_start + jax.lax.broadcasted_iota(jnp.int32, (q_rows, k_cols), 1)
    diff = k_global - q_global
    band = (diff >= -win_upper) & (diff <= win_lower)
    ref_qb = (q_global // ref_elems) * ref_elems
    ref_qe = jnp.minimum(ref_qb + ref_elems, t)
    band &= (k_global >= ref_qb - win_lower) & (k_global < ref_qe + win_upper)
    valid = band & (k_global >= 0) & (k_global < t)
    return jnp.where(valid, 0.0, -1e30)


def _attn_banded_kernel(
    q_ref, k0_ref, k1_ref, k2_ref, k3_ref, v0_ref, v1_ref, v2_ref, v3_ref,
    o_ref, bias_ref,
    *, h: int, d: int, t: int, win_upper: int, win_lower: int, ref_elems: int,
):
    """Banded attention over pre-rotated q/k (RoPE runs as one fused
    full-width XLA pass outside — per-head 32-lane rotate ops inside the
    kernel measured ~0.9 ms/layer of Mosaic relayouts, ~3x the rest of the
    kernel body).

    Geometry: each grid cell owns a BQ=256 query strip and loads four BK=128
    k/v blocks (global rows [(2s-1)*BK, (2s+3)*BK)) — via channel-sliced
    BlockSpecs, so only the k (or v) slice of the channels moves per operand.
    Compute runs per 128-row query sub-block over its exact 3-block 384-key
    span: the window (<= 128 per side) of any 128 queries is fully covered,
    and no wider logits are ever formed. Versus the naive full-channel
    prev/centre/next form this is ~3x less HBM traffic and ~2x fewer
    logit/exp FLOPs.

    The grid is (strips, batch) with batch innermost, so the strip's band
    bias (identical for every batch row) is built once into VMEM scratch at
    b == 0 and reused for the whole batch sweep — the per-cell iota/compare
    bias construction measured ~25% of the kernel at sup shapes."""
    s = pl.program_id(0)
    b = pl.program_id(1)
    scale = 1.0 / np.sqrt(d)

    k_refs = (k0_ref, k1_ref, k2_ref, k3_ref)
    v_refs = (v0_ref, v1_ref, v2_ref, v3_ref)

    # one bias for the whole strip (shared across heads AND batch rows).
    # One fat [BQ, 4*BK] matmul per head beats two half-strip [BK, 3*BK]
    # ones (fewer, larger MXU ops win over the ~33% extra masked band
    # compute — 0.57 vs 0.71 ms/layer measured at sup shapes).
    @pl.when(b == 0)
    def _():
        bias_ref[:] = _band_bias_at(
            s * BQ, (2 * s - 1) * BK, BQ, 4 * BK,
            t, win_upper, win_lower, ref_elems,
        )

    bias = bias_ref[:]
    # concatenate the kv blocks once across all heads ([4*BK, H*D]); the
    # per-head [4*BK, d] operands below are then free channel slices
    # instead of 2*h separate 4-way sublane concats
    k_all = jnp.concatenate([k_refs[i][0] for i in range(4)], axis=0)
    v_all = jnp.concatenate([v_refs[i][0] for i in range(4)], axis=0)

    for h_i in range(h):
        sl = slice(h_i * d, (h_i + 1) * d)
        q = q_ref[0][:, sl].astype(jnp.float32)
        k = k_all[:, sl].astype(jnp.float32)  # [4*BK, D]
        v = v_all[:, sl].astype(jnp.float32)
        logits = (
            jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale + bias
        )
        m = logits.max(axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        out = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (out / p.sum(axis=-1, keepdims=True)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("nhead", "win_upper", "win_lower", "num_splits", "interpret"),
)
def windowed_attention_qkv_rope(
    qkv: jnp.ndarray,  # [N, T, 3*H*D] straight from the wqkv matmul
    cos: jnp.ndarray,  # [T, D/2]
    sin: jnp.ndarray,
    nhead: int,
    win_upper: int,
    win_lower: int,
    num_splits: int = 12,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fully fused attention input stage: consumes the raw qkv projection
    (no reshape/slice/transpose materialisation), applies RoPE in VMEM,
    computes the banded softmax-attention, and returns [N, T, H*D] in the
    layout the output projection consumes. Band semantics identical to
    windowed_attention_fused (incl. the 12-strip truncation)."""
    n, t, g = qkv.shape
    hd = g // 3
    d = hd // nhead
    if win_lower > BK or win_upper > BK:
        raise ValueError("window <= 128 per side required")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    num_strips = -(-t // BQ)
    t_pad = num_strips * BQ
    if t_pad != t:
        qkv = jnp.pad(qkv, ((0, 0), (0, t_pad - t), (0, 0)))
        cos = jnp.pad(cos, ((0, t_pad - t), (0, 0)))
        sin = jnp.pad(sin, ((0, t_pad - t), (0, 0)))

    # RoPE on the q and k thirds as one full-width XLA pass (treating q||k
    # as 2*nhead heads with shared tables). f32 rotation arithmetic, back to
    # the input dtype — bit-identical placement to the reference's
    # RotaryEmbeddingImpl::forward non-interleaved halves.
    qk = qkv[..., : 2 * hd].reshape(n, t_pad, 2 * nhead, d)
    cosf = cos.astype(jnp.float32)[None, :, None, :]
    sinf = sin.astype(jnp.float32)[None, :, None, :]
    e = qk[..., : d // 2].astype(jnp.float32)
    o = qk[..., d // 2 :].astype(jnp.float32)
    qk_rot = jnp.concatenate(
        [cosf * e - sinf * o, sinf * e + cosf * o], axis=-1
    ).astype(qkv.dtype).reshape(n, t_pad, 2 * hd)

    return _banded_attention_call(
        qk_rot, qkv, 3, nhead, d, t, win_upper, win_lower,
        num_splits, interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("nhead", "win_upper", "win_lower", "num_splits", "interpret"),
)
def windowed_attention_ext(
    qkv_ext: jnp.ndarray,  # [N, T, 5*H*D]: q | k | v | q_swapped | k_swapped
    ct: jnp.ndarray,  # [T, 2*H*D] full-width cos table
    st: jnp.ndarray,  # [T, 2*H*D] full-width signed sin table
    nhead: int,
    win_upper: int,
    win_lower: int,
    num_splits: int = 12,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Banded attention over the *extended* qkv projection: the wqkv weight
    rows are extended with their RoPE-swap permutation (rope_ext from
    models/tx_model.py), so the rotation is a pure full-width FMA over
    contiguous channel slices — qk_rot = qkv_ext[:2hd]*Ct +
    qkv_ext[3hd:]*St — with no channel shuffles anywhere. The per-head
    half-swap expressed as slices/reshapes cost ~0.7 ms/layer of copy ops in
    the device trace; the weight-row permutation is free (done once at
    trace time on the params)."""
    n, t, g = qkv_ext.shape
    hd = g // 5
    d = hd // nhead
    if win_lower > BK or win_upper > BK:
        raise ValueError("window <= 128 per side required")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    num_strips = -(-t // BQ)
    t_pad = num_strips * BQ
    if t_pad != t:
        qkv_ext = jnp.pad(qkv_ext, ((0, 0), (0, t_pad - t), (0, 0)))
        ct = jnp.pad(ct, ((0, t_pad - t), (0, 0)))
        st = jnp.pad(st, ((0, t_pad - t), (0, 0)))

    qk_rot = (
        qkv_ext[..., : 2 * hd].astype(jnp.float32) * ct.astype(jnp.float32)[None]
        + qkv_ext[..., 3 * hd :].astype(jnp.float32) * st.astype(jnp.float32)[None]
    ).astype(qkv_ext.dtype)

    return _banded_attention_call(
        qk_rot, qkv_ext, 5, nhead, d, t, win_upper, win_lower,
        num_splits, interpret,
    )


def _attn_ext_fused_kernel(
    q_ref, qsw_ref,
    k0_ref, k1_ref, k2_ref, k3_ref,
    ksw0_ref, ksw1_ref, ksw2_ref, ksw3_ref,
    v0_ref, v1_ref, v2_ref, v3_ref,
    ctq_ref, stq_ref,
    ctk0_ref, stk0_ref, ctk1_ref, stk1_ref,
    ctk2_ref, stk2_ref, ctk3_ref, stk3_ref,
    o_ref, bias_ref,
    *, h: int, d: int, t: int, win_upper: int, win_lower: int, ref_elems: int,
):
    """_attn_banded_kernel with the RoPE FMA moved INSIDE: consumes the raw
    extended projection (q | k | v | q_swap | k_swap channel blocks) plus
    the (ct, st) tables and rotates on the VMEM tiles — qk_rot never
    round-trips HBM (the external FMA pass read 268 MB + wrote 134 MB per
    sup layer). Bit-identical rotation: same full-width f32 FMA, same bf16
    cast. Table blocks are indexed by the strip only, so with the batch
    dimension innermost Pallas re-fetches them just once per strip."""
    s = pl.program_id(0)
    b = pl.program_id(1)
    scale = 1.0 / np.sqrt(d)

    @pl.when(b == 0)
    def _():
        bias_ref[:] = _band_bias_at(
            s * BQ, (2 * s - 1) * BK, BQ, 4 * BK,
            t, win_upper, win_lower, ref_elems,
        )

    bias = bias_ref[:]

    def rot(x_ref, sw_ref, ct_ref, st_ref):
        x = x_ref[0].astype(jnp.float32)
        sw = sw_ref[0].astype(jnp.float32)
        return (ct_ref[0] * x + st_ref[0] * sw).astype(x_ref.dtype)

    q_all = rot(q_ref, qsw_ref, ctq_ref, stq_ref)  # [BQ, hd]
    k_refs = (k0_ref, k1_ref, k2_ref, k3_ref)
    ksw_refs = (ksw0_ref, ksw1_ref, ksw2_ref, ksw3_ref)
    ctk = (ctk0_ref, ctk1_ref, ctk2_ref, ctk3_ref)
    stk = (stk0_ref, stk1_ref, stk2_ref, stk3_ref)
    k_all = jnp.concatenate(
        [rot(k_refs[i], ksw_refs[i], ctk[i], stk[i]) for i in range(4)], axis=0
    )  # [4*BK, hd]
    v_refs = (v0_ref, v1_ref, v2_ref, v3_ref)
    v_all = jnp.concatenate([v_refs[i][0] for i in range(4)], axis=0)

    for h_i in range(h):
        sl = slice(h_i * d, (h_i + 1) * d)
        q = q_all[:, sl].astype(jnp.float32)
        k = k_all[:, sl].astype(jnp.float32)
        v = v_all[:, sl].astype(jnp.float32)
        logits = (
            jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale + bias
        )
        m = logits.max(axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        out = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (out / p.sum(axis=-1, keepdims=True)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("nhead", "win_upper", "win_lower", "num_splits", "interpret"),
)
def windowed_attention_ext_fused(
    qkv_ext: jnp.ndarray,  # [N, T, 5*H*D]: q | k | v | q_swapped | k_swapped
    tabs: jnp.ndarray,  # [2, T, 2*H*D] stacked (ct, st) full-width tables
    nhead: int,
    win_upper: int,
    win_lower: int,
    num_splits: int = 12,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """windowed_attention_ext with RoPE fused into the kernel (see
    _attn_ext_fused_kernel). Numerically identical output."""
    n, t, g = qkv_ext.shape
    hd = g // 5
    d = hd // nhead
    if win_lower > BK or win_upper > BK:
        raise ValueError("window <= 128 per side required")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    num_strips = -(-t // BQ)
    t_pad = num_strips * BQ
    if t_pad != t:
        qkv_ext = jnp.pad(qkv_ext, ((0, 0), (0, t_pad - t), (0, 0)))
        tabs = jnp.pad(tabs, ((0, 0), (0, t_pad - t), (0, 0)))
    num_kv = t_pad // BK
    ref_elems = -(-t // num_splits)
    ref_elems += (-ref_elems) % 4

    def q_map(which):
        return lambda s, b: (b, s, which)

    def kv_map(i, which):
        def f(s, b):
            return (b, jnp.clip(2 * s - 1 + i, 0, num_kv - 1), which)

        return f

    def tab_q(which, part):
        return lambda s, b: (which, s, part)

    def tab_k(i, which, part):
        return lambda s, b: (
            which,
            jnp.clip(2 * s - 1 + i, 0, num_kv - 1),
            part,
        )

    kernel = functools.partial(
        _attn_ext_fused_kernel,
        h=nhead, d=d, t=t, win_upper=win_upper, win_lower=win_lower,
        ref_elems=ref_elems,
    )
    qblock = (1, BQ, hd)
    kvblock = (1, BK, hd)
    in_specs = [
        pl.BlockSpec(qblock, q_map(0), memory_space=pltpu.VMEM),  # q
        pl.BlockSpec(qblock, q_map(3), memory_space=pltpu.VMEM),  # q_swap
    ]
    in_specs += [
        pl.BlockSpec(kvblock, kv_map(i, 1), memory_space=pltpu.VMEM)  # k
        for i in range(4)
    ]
    in_specs += [
        pl.BlockSpec(kvblock, kv_map(i, 4), memory_space=pltpu.VMEM)  # k_swap
        for i in range(4)
    ]
    in_specs += [
        pl.BlockSpec(kvblock, kv_map(i, 2), memory_space=pltpu.VMEM)  # v
        for i in range(4)
    ]
    in_specs += [
        pl.BlockSpec((1, BQ, hd), tab_q(0, 0), memory_space=pltpu.VMEM),  # ct q
        pl.BlockSpec((1, BQ, hd), tab_q(1, 0), memory_space=pltpu.VMEM),  # st q
    ]
    for i in range(4):
        in_specs += [
            pl.BlockSpec((1, BK, hd), tab_k(i, 0, 1), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, hd), tab_k(i, 1, 1), memory_space=pltpu.VMEM),
        ]
    out = pl.pallas_call(
        kernel,
        grid=(num_strips, n),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(qblock, q_map(0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t_pad, hd), qkv_ext.dtype),
        scratch_shapes=[pltpu.VMEM((BQ, 4 * BK), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        qkv_ext, qkv_ext,
        qkv_ext, qkv_ext, qkv_ext, qkv_ext,
        qkv_ext, qkv_ext, qkv_ext, qkv_ext,
        qkv_ext, qkv_ext, qkv_ext, qkv_ext,
        tabs, tabs,
        tabs, tabs, tabs, tabs, tabs, tabs, tabs, tabs,
    )
    return out[:, :t]


def rope_halfperm(nhead: int, head_dim: int) -> np.ndarray:
    """Row permutation taking a natural [H*D]-ordered q (or k) projection to
    *halves-major* order: [e(h0)|e(h1)|...|e(h7) | o(h0)|...|o(h7)], where
    e/o are the first/second halves of each head's channels (the
    non-interleaved RoPE halves of RotaryEmbeddingImpl::forward). In this
    order the RoPE swap partner of every channel lives exactly H*D/2
    channels away, so the in-kernel swap is one full-width 256-lane block
    concat instead of per-head 32-lane shuffles."""
    d2 = head_dim // 2
    idx = []
    for half in (0, 1):
        for h in range(nhead):
            base = h * head_dim + half * d2
            idx.extend(range(base, base + d2))
    return np.asarray(idx, np.int32)


def rope_half_tables(t_len: int, head_dim: int, nhead: int, theta: float):
    """[2, T, H*D] f32 stacked (ct, st) tables for halves-major q/k:
    rot(x) = ct * x + st * swap256(x) with swap256 the half-block swap."""
    d2 = head_dim // 2
    hd = nhead * head_dim
    inv_freq = 1.0 / (
        theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    )
    freqs = np.arange(t_len, dtype=np.float64)[:, None] * inv_freq[None, :]
    cos = np.cos(freqs).astype(np.float32)  # [T, d2]
    sin = np.sin(freqs).astype(np.float32)
    p = np.arange(hd)
    i = p % d2
    ct = cos[:, i]
    st = np.where(p[None, :] < hd // 2, -sin[:, i], sin[:, i])
    return jnp.asarray(np.stack([ct, st]))


def _attn_rope_kernel(
    q_ref, k0_ref, k1_ref, k2_ref, k3_ref, v0_ref, v1_ref, v2_ref, v3_ref,
    ctq_ref, stq_ref,
    ctk0_ref, stk0_ref, ctk1_ref, stk1_ref,
    ctk2_ref, stk2_ref, ctk3_ref, stk3_ref,
    o_ref, bias_ref,
    *, h: int, d: int, t: int, win_upper: int, win_lower: int, ref_elems: int,
):
    """Banded attention with RoPE *inside* the kernel over halves-major
    q/k (see rope_halfperm): the rotation is a full-width f32 FMA with a
    256-lane block swap, computed on the VMEM-resident strip/blocks, so no
    rotated copy of q/k ever round-trips HBM and the qkv projection carries
    no duplicated swap rows (the ext design paid +2*H*D matmul channels,
    ~67 GFLOP/layer at sup shapes, for the same effect).

    Per head the logits split into the e/o half contributions —
    q_e @ k_e^T + q_o @ k_o^T over two contiguous 32-channel slices —
    which equals the natural-order 64-channel dot exactly."""
    s = pl.program_id(0)
    b = pl.program_id(1)
    scale = 1.0 / np.sqrt(d)
    d2 = d // 2
    hd = h * d
    hd2 = hd // 2

    @pl.when(b == 0)
    def _():
        bias_ref[:] = _band_bias_at(
            s * BQ, (2 * s - 1) * BK, BQ, 4 * BK,
            t, win_upper, win_lower, ref_elems,
        )

    bias = bias_ref[:]

    def rot(x, ct, st):
        xf = x.astype(jnp.float32)
        sw = jnp.concatenate([xf[:, hd2:], xf[:, :hd2]], axis=1)
        return (ct * xf + st * sw).astype(x.dtype)

    q = rot(q_ref[0], ctq_ref[0], stq_ref[0])  # [BQ, hd] halves-major
    k_refs = (k0_ref, k1_ref, k2_ref, k3_ref)
    ctk = (ctk0_ref, ctk1_ref, ctk2_ref, ctk3_ref)
    stk = (stk0_ref, stk1_ref, stk2_ref, stk3_ref)
    k = jnp.concatenate(
        [rot(k_refs[i][0], ctk[i][0], stk[i][0]) for i in range(4)], axis=0
    )  # [4*BK, hd] halves-major
    v_refs = (v0_ref, v1_ref, v2_ref, v3_ref)
    v_all = jnp.concatenate([v_refs[i][0] for i in range(4)], axis=0)

    for h_i in range(h):
        e = slice(h_i * d2, (h_i + 1) * d2)
        o = slice(hd2 + h_i * d2, hd2 + (h_i + 1) * d2)
        logits = (
            jnp.dot(
                q[:, e].astype(jnp.float32), k[:, e].T.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            + jnp.dot(
                q[:, o].astype(jnp.float32), k[:, o].T.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
        ) * scale + bias
        m = logits.max(axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        vh = v_all[:, h_i * d : (h_i + 1) * d].astype(jnp.float32)
        out = jnp.dot(p, vh, preferred_element_type=jnp.float32)
        o_ref[0, :, h_i * d : (h_i + 1) * d] = (
            out / p.sum(axis=-1, keepdims=True)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("nhead", "win_upper", "win_lower", "num_splits", "interpret"),
)
def windowed_attention_halfperm(
    qkv: jnp.ndarray,  # [N, T, 3*H*D], q/k rows in halves-major order
    tabs: jnp.ndarray,  # [2, T, H*D] stacked (ct, st) from rope_half_tables
    nhead: int,
    win_upper: int,
    win_lower: int,
    num_splits: int = 12,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Production attention input stage: consumes the plain-width qkv
    projection with halves-major q/k rows (rope_halfperm applied to the
    weight rows at trace time — free), rotates q/k in VMEM, and computes
    the banded softmax-attention. Output is [N, T, H*D] in natural head
    order (v and the output layout are untouched by the permutation).
    Band semantics identical to windowed_attention_fused (incl. the
    reference 12-strip truncation)."""
    n, t, g = qkv.shape
    hd = g // 3
    d = hd // nhead
    if win_lower > BK or win_upper > BK:
        raise ValueError("window <= 128 per side required")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    num_strips = -(-t // BQ)
    t_pad = num_strips * BQ
    if t_pad != t:
        qkv = jnp.pad(qkv, ((0, 0), (0, t_pad - t), (0, 0)))
        tabs = jnp.pad(tabs, ((0, 0), (0, t_pad - t), (0, 0)))
    num_kv = t_pad // BK
    ref_elems = -(-t // num_splits)
    ref_elems += (-ref_elems) % 4

    def q_map(s, b):
        return (b, s, 0)

    def kv_map(i, which):
        def f(s, b):
            return (b, jnp.clip(2 * s - 1 + i, 0, num_kv - 1), which)

        return f

    def tab_q(which):
        return lambda s, b: (which, s, 0)

    def tab_k(i, which):
        return lambda s, b: (which, jnp.clip(2 * s - 1 + i, 0, num_kv - 1), 0)

    kernel = functools.partial(
        _attn_rope_kernel,
        h=nhead, d=d, t=t, win_upper=win_upper, win_lower=win_lower,
        ref_elems=ref_elems,
    )
    qblock = (1, BQ, hd)
    kvblock = (1, BK, hd)
    in_specs = [pl.BlockSpec(qblock, q_map, memory_space=pltpu.VMEM)]
    in_specs += [
        pl.BlockSpec(kvblock, kv_map(i, 1), memory_space=pltpu.VMEM)
        for i in range(4)
    ]
    in_specs += [
        pl.BlockSpec(kvblock, kv_map(i, 2), memory_space=pltpu.VMEM)
        for i in range(4)
    ]
    in_specs += [
        pl.BlockSpec((1, BQ, hd), tab_q(0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BQ, hd), tab_q(1), memory_space=pltpu.VMEM),
    ]
    for i in range(4):
        in_specs += [
            pl.BlockSpec((1, BK, hd), tab_k(i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, hd), tab_k(i, 1), memory_space=pltpu.VMEM),
        ]
    out = pl.pallas_call(
        kernel,
        grid=(num_strips, n),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(qblock, q_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t_pad, hd), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((BQ, 4 * BK), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        qkv, qkv, qkv, qkv, qkv,
        qkv, qkv, qkv, qkv,
        tabs, tabs,
        tabs, tabs, tabs, tabs, tabs, tabs, tabs, tabs,
    )
    return out[:, :t]


def _banded_attention_call(
    qk_rot: jnp.ndarray,  # [N, T_pad, 2*H*D] rotated q | k
    v_src: jnp.ndarray,  # [N, T_pad, v_nblocks*H*D]; v at channel block 2
    v_nblocks: int,
    nhead: int,
    d: int,
    t: int,
    win_upper: int,
    win_lower: int,
    num_splits: int,
    interpret: bool,
) -> jnp.ndarray:
    n, t_pad, _ = qk_rot.shape
    hd = nhead * d
    num_strips = t_pad // BQ
    num_kv = t_pad // BK  # = 2 * num_strips
    ref_elems = -(-t // num_splits)
    ref_elems += (-ref_elems) % 4

    def q_map(s, b):
        return (b, s, 0)

    def kv_map(i, which):
        # block i of strip s: global kv-block 2s-1+i, clamped; the channel
        # block picks k (1 of qk_rot) or v (2 of v_src)
        def f(s, b):
            return (b, jnp.clip(2 * s - 1 + i, 0, num_kv - 1), which)

        return f

    kernel = functools.partial(
        _attn_banded_kernel,
        h=nhead, d=d, t=t, win_upper=win_upper, win_lower=win_lower,
        ref_elems=ref_elems,
    )
    qblock = (1, BQ, hd)
    kvblock = (1, BK, hd)
    in_specs = [pl.BlockSpec(qblock, q_map, memory_space=pltpu.VMEM)]
    in_specs += [
        pl.BlockSpec(kvblock, kv_map(i, 1), memory_space=pltpu.VMEM)
        for i in range(4)
    ]
    in_specs += [
        pl.BlockSpec(kvblock, kv_map(i, 2), memory_space=pltpu.VMEM)
        for i in range(4)
    ]
    out = pl.pallas_call(
        kernel,
        grid=(num_strips, n),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(qblock, q_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t_pad, hd), qk_rot.dtype),
        scratch_shapes=[pltpu.VMEM((BQ, 4 * BK), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        qk_rot, qk_rot, qk_rot, qk_rot, qk_rot,
        v_src, v_src, v_src, v_src,
    )
    return out[:, :t]
