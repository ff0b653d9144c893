"""Fused matmul + bias + scaled-residual + RMSNorm Pallas kernel.

In the sup encoder every sub-block ends with
``rms_norm(matmul_out [+ bias] + alpha * residual)`` (deepnorm post-norm,
nn/TxModules.cpp + nn/RMSNorm.cpp:11-15). XLA runs the matmul near peak
but cannot fuse the norm into its epilogue (the rsqrt needs a full-row
reduction), so each norm costs an extra elementwise pass over ~3 row-sized
tensors per layer (~0.6 ms/layer at sup batch-64 shapes, the
add_convert_fusion lines in the trace). This kernel does
matmul -> +bias -> +alpha*residual -> RMSNorm -> *weight in one pass with
the accumulator still in VMEM.

Measured on v5e at sup shapes (batch 64): 131.2 ms/step vs 116.9 for
XLA-matmul + separate norm pass — the single-block kernel's matmul
underperforms XLA's by more than the fused norm saves, so the runner
keeps this OPT-IN (DORADO_TPU_TX_FUSED_NORM=1). Kept, tested and
parity-exact for toolchains/shapes where the balance flips.

Numerics match models/tx_model.py exactly: the matmul accumulates f32,
(acc + bias) casts to the compute dtype BEFORE the residual add (as the
einsum epilogue did), the norm statistics run in f32 on that sum, and the
normalised rows cast to the compute dtype before multiplying by the
(compute-dtype) norm weight.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BM = 512  # row tile


def _kernel(x_ref, w_ref, b_ref, res_ref, nw_ref, o_ref, *, alpha, eps, has_bias):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BM, O]
    if has_bias:
        acc = acc + b_ref[0].astype(jnp.float32)
    h = acc.astype(o_ref.dtype) + res_ref[:] * jnp.asarray(alpha, o_ref.dtype)
    hf = h.astype(jnp.float32)
    rstd = jax.lax.rsqrt(jnp.mean(hf * hf, axis=-1, keepdims=True) + eps)
    o_ref[:] = (hf * rstd).astype(o_ref.dtype) * nw_ref[0].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("alpha", "eps", "interpret")
)
def matmul_residual_rmsnorm(
    x: jnp.ndarray,  # [N, T, K]
    w: jnp.ndarray,  # [O, K]
    bias: jnp.ndarray | None,  # [O] or None
    residual: jnp.ndarray,  # [N, T, O]
    norm_w: jnp.ndarray,  # [O]
    alpha: float,
    eps: float = 1e-5,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """rms_norm((x @ w.T + bias).astype(dtype) + alpha*residual) * norm_w."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, t, k = x.shape
    o = w.shape[0]
    m = n * t
    x2 = x.reshape(m, k)
    r2 = residual.reshape(m, o)
    m_pad = -(-m // BM) * BM
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
        r2 = jnp.pad(r2, ((0, m_pad - m), (0, 0)))
    has_bias = bias is not None
    b = bias if has_bias else jnp.zeros((o,), jnp.float32)
    kernel = functools.partial(
        _kernel, alpha=float(alpha), eps=float(eps), has_bias=has_bias
    )
    out = pl.pallas_call(
        kernel,
        grid=(m_pad // BM,),
        in_specs=[
            pl.BlockSpec((BM, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((o, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, o), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, o), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, o), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(x2, w, jnp.asarray(b, jnp.float32)[None], r2, norm_w[None])
    return out[:m].reshape(n, t, o)
