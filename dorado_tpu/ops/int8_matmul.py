"""W8A8 int8 matmul Pallas kernels for the models' fat matmuls: the Tx
encoder (QKV / SwiGLU feed-forward) and the LSTM input projections.

The TPU-native counterpart of the reference's quantised Koi tile paths
(dorado/nn/TxModules.h:95-117 for the transformer,
LSTMStack.cpp:213-240 for the LSTM rescale path): weights are
pre-quantised symmetric int8 per output channel, activations dynamically
quantised symmetric int8 per token (row), and the MXU runs the int8
systolic contraction at its doubled int8 issue rate (v5e: 394 TOP/s vs
197 TF/s bf16).

Measured on v5e (2026-08-20, M=196608 tokens, this module's kernels):

  shape (KxO)     XLA bf16   this kernel
  512 x 4096      5.72 ms    3.93 ms  (210 TOP/s)
  2048 x 512      3.35 ms    1.5-2.8 ms
  512 x 2560      ~2.6 ms    ~1.6 ms

Round 4 concluded the int8 MXU rate was "not exposed" — that measurement
chained *dependent* matmuls (each dot consumed the previous requantised
output), so the MXU stalled on the VPU requant between issues and both
precisions saturated at the same dependency-bound rate. With independent
tiles (a real batched matmul grid) int8 runs ~2x bf16 FLOP rate, matching
the datasheet.

Two entry points:

- ``w8a8_matmul(xq, xs, wq_t, ws)``: activations already int8 (the quant
  pass fuses into the producing elementwise op — an RMSNorm or the SwiGLU
  product — so it costs one extra int8 write, not a full HBM round trip).
- ``w8a8_matmul_fq(x, wq_t, ws)``: bf16 activations, per-row quant runs
  inside the kernel on the VMEM tile (for producers that cannot fuse).

Both fall back to an XLA ``dot_general`` path off-TPU so CPU tests
exercise identical semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# fp32 accumulate epilogue: out = acc_i32 * row_scale * col_scale


def quantize_weight_rows(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[O, K] float weight -> ([O, K] int8, [O] f32 scale), symmetric
    per-output-channel amax/127 quantisation. The single canonical
    weight-quant recipe (tx_model._quantize_rows delegates here)."""
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-1)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(wf / scale[:, None]), -127, 127).astype(jnp.int8)
    return wq, scale


def quantize_weight(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[O, K] float weight -> ([K, O] int8, [1, O] f32 scale): the
    contraction-major layout the kernels consume."""
    wq, scale = quantize_weight_rows(w)
    return wq.T, scale[None, :]


def quantize_rows(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[..., K] activations -> (int8 [..., K], f32 scale [..., 1]).

    Plain XLA so the amax reduce + divide fuse into whatever elementwise
    op produced ``x`` (RMSNorm, SwiGLU product)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.round(xf / scale).astype(jnp.int8)
    return xq, scale


def _a8_kernel(xq_ref, xs_ref, w_ref, ws_ref, o_ref, *, out_dtype):
    acc = jnp.dot(xq_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * xs_ref[:] * ws_ref[:]).astype(out_dtype)


def _fq_kernel(x_ref, w_ref, ws_ref, b_ref, o_ref, *, out_dtype):
    """Per-row activation quant + int8 dot + dequant, with a fused f32
    bias add (a separate XLA bias pass over a pallas_call output would
    re-stream the full output through HBM; callers without a bias pass
    zeros — one (1, bn) VMEM block, negligible)."""
    xf = x_ref[:].astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    s = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    xq = jnp.round(xf * (1.0 / s)).astype(jnp.int8)
    acc = jnp.dot(xq, w_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * s * ws_ref[:] + b_ref[:]).astype(
        out_dtype
    )


def _swiglu_kernel(xq_ref, xs_ref, wy_ref, wys_ref, wg_ref, wgs_ref, tq_ref, ts_ref):
    """fc1 (both SwiGLU halves) + silu(gate)*y + per-row requant in one
    pass: the bf16 [M, 2*ffn] feed-forward intermediate never touches HBM
    (XLA's bf16 path achieves the same by fusing the silu into the matmul
    epilogue; a separate Pallas matmul would break that fusion and pay
    ~3.2 GB/layer of extra HBM traffic at sup batch 96)."""
    row = xs_ref[:]
    y = jnp.dot(xq_ref[:], wy_ref[:], preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * row * wys_ref[:]
    g = jnp.dot(xq_ref[:], wg_ref[:], preferred_element_type=jnp.int32)
    g = g.astype(jnp.float32) * row * wgs_ref[:]
    t = y * (g * jax.nn.sigmoid(g))
    amax = jnp.max(jnp.abs(t), axis=1, keepdims=True)
    s = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    tq_ref[:] = jnp.round(t * (1.0 / s)).astype(jnp.int8)
    ts_ref[:] = s


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def swiglu_w8a8(
    xq: jnp.ndarray,
    xs: jnp.ndarray,
    wy_t: jnp.ndarray,
    wys: jnp.ndarray,
    wg_t: jnp.ndarray,
    wgs: jnp.ndarray,
    block_m: int = 512,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """int8 activations [..., K] -> (int8 silu(x@Wg)*(x@Wy) [..., F],
    f32 row scales [..., 1]).

    The full feed-forward row (F = ffn width) lives in one VMEM tile so the
    per-row requant amax is exact; block_m is kept small because the two
    f32 [bm, F] accumulators dominate VMEM."""
    k, f = wy_t.shape
    lead = xq.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    xq2 = xq.reshape(m, k)
    xs2 = xs.reshape(m, 1)
    if jax.default_backend() != "tpu" and not interpret:
        y = jax.lax.dot_general(
            xq2, wy_t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32) * xs2 * wys
        g = jax.lax.dot_general(
            xq2, wg_t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32) * xs2 * wgs
        t = y * (g * jax.nn.sigmoid(g))
        amax = jnp.max(jnp.abs(t), axis=-1, keepdims=True)
        s = jnp.maximum(amax, 1e-12) / 127.0
        tq = jnp.round(t / s).astype(jnp.int8)
        return tq.reshape(*lead, f), s.reshape(*lead, 1)
    bm = min(block_m, -(-m // 8) * 8)
    xq2 = _pad_rows(xq2, bm)
    xs2 = _pad_rows(xs2, bm)
    mp = xq2.shape[0]
    tq, ts = pl.pallas_call(
        _swiglu_kernel,
        grid=(mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
            pl.BlockSpec((k, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((k, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, f), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, f), jnp.int8),
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(xq2, xs2, wy_t, wys, wg_t, wgs)
    return tq[:m].reshape(*lead, f), ts[:m].reshape(*lead, 1)


def _pick_block_n(o: int) -> int:
    # full-width output tiles when they fit in VMEM: a single n-tile means
    # the activation block is read (and, in the fq kernel, quantised) once.
    # Measured at the sup QKV-ext shape (K=512, O=2560): bn=2560 3.35 ms vs
    # bn=1280 3.88 ms at M=196608
    if o <= 2560 and o % 128 == 0:
        return o
    for bn in (2048, 1536, 1280, 1024, 640, 512, 384, 256, 128):
        if o % bn == 0:
            return bn
    return o


def _pad_rows(x2d: jnp.ndarray, bm: int) -> jnp.ndarray:
    m = x2d.shape[0]
    pad = (-m) % bm
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    return x2d


def _clamp_block_m(bm: int, k: int, bn: int, in_bytes: int, out_bytes: int) -> int:
    """Largest block_m <= bm whose double-buffered working set fits the
    ~16 MB scoped VMEM (f32 outputs at wide bn otherwise blow the limit).
    Halved values are rounded down to a multiple of 32 so the block always
    tiles the sublane dimension for every dtype (f32 8, bf16 16, int8 32)."""
    budget = 12 * (1 << 20)
    while bm > 32:
        need = 2 * (bm * k * in_bytes + bm * bn * out_bytes) + 2 * k * bn
        if need <= budget:
            break
        bm = (bm // 2) // 32 * 32
    return max(bm, 8 if bm < 32 else 32)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "out_dtype", "interpret")
)
def w8a8_matmul(
    xq: jnp.ndarray,
    xs: jnp.ndarray,
    wq_t: jnp.ndarray,
    ws: jnp.ndarray,
    block_m: int = 1024,
    block_n: int = 0,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """int8 activations [..., K] @ int8 weights [K, O] -> [..., O].

    xs: per-row f32 scales [..., 1]; ws: per-channel f32 scales [1, O]."""
    k, o = wq_t.shape
    lead = xq.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    xq2 = xq.reshape(m, k)
    xs2 = xs.reshape(m, 1)
    if jax.default_backend() != "tpu" and not interpret:
        acc = jax.lax.dot_general(
            xq2, wq_t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        out = (acc.astype(jnp.float32) * xs2 * ws).astype(out_dtype)
        return out.reshape(*lead, o)
    bn = block_n or _pick_block_n(o)
    bm = min(block_m, -(-m // 8) * 8)
    bm = _clamp_block_m(bm, k, bn, 1, jnp.dtype(out_dtype).itemsize)
    xq2 = _pad_rows(xq2, bm)
    xs2 = _pad_rows(xs2, bm)
    mp = xq2.shape[0]
    out = pl.pallas_call(
        functools.partial(_a8_kernel, out_dtype=out_dtype),
        grid=(mp // bm, o // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, o), out_dtype),
        interpret=interpret,
    )(xq2, xs2, wq_t, ws)
    return out[:m].reshape(*lead, o)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "out_dtype", "interpret")
)
def w8a8_matmul_fq(
    x: jnp.ndarray,
    wq_t: jnp.ndarray,
    ws: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    block_m: int = 512,
    block_n: int = 0,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """bf16/f32 activations [..., K] @ int8 weights [K, O] -> [..., O] with
    per-row activation quantisation fused into the kernel. ``bias``
    ([O] f32) is added inside the kernel (fused epilogue)."""
    k, o = wq_t.shape
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(m, k)
    if jax.default_backend() != "tpu" and not interpret:
        xq2, xs2 = quantize_rows(x2)
        acc = jax.lax.dot_general(
            xq2, wq_t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        out = acc.astype(jnp.float32) * xs2 * ws
        if bias is not None:
            out = out + bias.astype(jnp.float32)[None, :]
        return out.astype(out_dtype).reshape(*lead, o)
    bn = block_n or _pick_block_n(o)
    bm = min(block_m, -(-m // 8) * 8)
    bm = _clamp_block_m(bm, k, bn, x2.dtype.itemsize, jnp.dtype(out_dtype).itemsize)
    x2 = _pad_rows(x2, bm)
    mp = x2.shape[0]
    b2 = (
        bias.astype(jnp.float32).reshape(1, o)
        if bias is not None
        else jnp.zeros((1, o), jnp.float32)
    )
    out = pl.pallas_call(
        functools.partial(_fq_kernel, out_dtype=out_dtype),
        grid=(mp // bm, o // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, o), out_dtype),
        interpret=interpret,
    )(x2, wq_t, ws, b2)
    return out[:m].reshape(*lead, o)
