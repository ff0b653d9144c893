"""Fused banded (windowed) attention for the sup transformer.

Replaces the strip-loop attention (models/tx_model.py::windowed_attention,
mirroring MultiHeadAttentionImpl's MEA split loop, nn/TxModules.cpp) with a
Pallas kernel over 256-query strips (BQ below): each grid cell loads its
strip's queries plus the three neighbouring key/value blocks straight from the
[N, T, H, D] layout (BlockSpec neighbours — no gather, no transpose), and
computes logits, band mask, softmax and the value matmul entirely in VMEM.
The XLA strip path materialises [N, H, T, 343] f32 logits twice in HBM
(~0.7 GB round-trip per layer at sup shapes); here they never leave VMEM.

Requires win_lower <= BQ and win_upper <= BQ (sup uses [127, 128]) so the
band of any query is covered by blocks {s-1, s, s+1}. The reference's
12-strip loop also TRUNCATES each band at its strip's key range
[qb - win_lower, qe + win_upper) — with the sup window that clips exactly
one key for each strip's final query — so the kernel mask recomputes the
reference strip of every query (ref_elems from num_splits=12) and applies
the same truncation bit-for-bit.
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


def _attn_qkv_rope_kernel(
    qc_ref, kp_ref, kc_ref, kn_ref, vp_ref, vc_ref, vn_ref,
    cq_ref, sq_ref, cp_ref, sp_ref, cc_ref, sc_ref, cn_ref, sn_ref,
    o_ref,
    *, h: int, d: int, t: int, win_upper: int, win_lower: int, ref_elems: int,
):
    """Banded attention on the raw [N, T, 3*H*D] qkv projection with RoPE
    applied in VMEM. Channel layout matches wqkv row order
    (models/tx_model.py: g = (which*H + head)*D + d_i)."""
    s = pl.program_id(1)
    scale = 1.0 / np.sqrt(d)
    hd = h * d
    bias = _band_bias(s, t, win_upper, win_lower, ref_elems)

    def rope(x, c_ref, s_ref):
        # non-interleaved halves (RotaryEmbeddingImpl::forward)
        c = c_ref[:].astype(jnp.float32)
        sn = s_ref[:].astype(jnp.float32)
        e, o = x[:, : d // 2], x[:, d // 2 :]
        return jnp.concatenate([c * e - sn * o, sn * e + c * o], axis=1)

    for h_i in range(h):
        q = qc_ref[0][:, h_i * d : (h_i + 1) * d].astype(jnp.float32)
        q = rope(q, cq_ref, sq_ref)
        ks = []
        for ref, c_r, s_r in ((kp_ref, cp_ref, sp_ref),
                              (kc_ref, cc_ref, sc_ref),
                              (kn_ref, cn_ref, sn_ref)):
            kk = ref[0][:, hd + h_i * d : hd + (h_i + 1) * d].astype(jnp.float32)
            ks.append(rope(kk, c_r, s_r))
        k = jnp.concatenate(ks, axis=0)  # [3*BQ, D]
        v = jnp.concatenate(
            [vp_ref[0][:, 2 * hd + h_i * d : 2 * hd + (h_i + 1) * d],
             vc_ref[0][:, 2 * hd + h_i * d : 2 * hd + (h_i + 1) * d],
             vn_ref[0][:, 2 * hd + h_i * d : 2 * hd + (h_i + 1) * d]],
            axis=0,
        ).astype(jnp.float32)
        logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale + bias
        m = logits.max(axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        out = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, :, h_i * d : (h_i + 1) * d] = (
            out / p.sum(axis=-1, keepdims=True)
        ).astype(o_ref.dtype)


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
    if win_lower > BQ or win_upper > BQ:
        raise ValueError("window <= BQ per side required")
    ref_elems = -(-t // num_splits)
    ref_elems += (-ref_elems) % 4
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    num_strips = -(-t // BQ)
    t_pad = num_strips * BQ
    if t_pad != t:
        qkv = jnp.pad(qkv, ((0, 0), (0, t_pad - t), (0, 0)))
        cos = jnp.pad(cos, ((0, t_pad - t), (0, 0)))
        sin = jnp.pad(sin, ((0, t_pad - t), (0, 0)))
    cos = cos.astype(jnp.float32)
    sin = sin.astype(jnp.float32)

    def centre(b, s):
        return (b, s, 0)

    def prev(b, s):
        return (b, jnp.maximum(s - 1, 0), 0)

    def nxt(b, s):
        return (b, jnp.minimum(s + 1, num_strips - 1), 0)

    def t_centre(b, s):
        return (s, 0)

    def t_prev(b, s):
        return (jnp.maximum(s - 1, 0), 0)

    def t_nxt(b, s):
        return (jnp.minimum(s + 1, num_strips - 1), 0)

    kernel = functools.partial(
        _attn_qkv_rope_kernel,
        h=nhead, d=d, t=t, win_upper=win_upper, win_lower=win_lower,
        ref_elems=ref_elems,
    )
    block = (1, BQ, g)
    tblock = (BQ, d // 2)
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
            pl.BlockSpec(tblock, t_centre, memory_space=pltpu.VMEM),
            pl.BlockSpec(tblock, t_centre, memory_space=pltpu.VMEM),
            pl.BlockSpec(tblock, t_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec(tblock, t_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec(tblock, t_centre, memory_space=pltpu.VMEM),
            pl.BlockSpec(tblock, t_centre, memory_space=pltpu.VMEM),
            pl.BlockSpec(tblock, t_nxt, memory_space=pltpu.VMEM),
            pl.BlockSpec(tblock, t_nxt, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, hd), centre, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t_pad, hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qkv, qkv, qkv, qkv, qkv, qkv, qkv, cos, sin, cos, sin, cos, sin, cos, sin)
    return out[:, :t]
