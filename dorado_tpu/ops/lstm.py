"""Pallas fused LSTM recurrence for TPU.

Replaces the Koi LSTM kernels (`host_lstm_step_f16` / `host_cutlass_lstm`,
reference dorado/nn/LSTMStack.cpp:77-240). Design:

  - The input projection (x @ W_ih + b) is NOT here — it is one large
    time-parallel matmul the caller runs in XLA (MXU-friendly), exactly like
    the reference's single-matmul TN2C trick.
  - This kernel runs only the serial part: for each timestep,
    ``gates = xproj[t] + h @ W_hh^T`` followed by the fused gate math.
  - Layout is time-major ``[T, N, 4H]``; the grid is
    ``(batch_tiles, T/BT)`` with time innermost, so Pallas double-buffers the
    xproj block DMAs while the MXU runs the step matmul. (h, c) live in VMEM
    scratch and persist across the time-grid; c is kept in f32.
  - ``reverse=True`` walks the time grid backwards via the index maps —
    alternating-direction stacks need no data flips at all.

Gate order follows torch/dorado: i, f, g, o.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_kernel(xp_ref, whh_ref, out_ref, h_ref, c_ref, *, bt: int, reverse: bool):
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    hidden = h_ref.shape[-1]

    def step(i, _):
        # walk the block backwards in reverse mode
        j = (bt - 1 - i) if reverse else i
        h = h_ref[:]
        gates = xp_ref[j].astype(jnp.float32) + jnp.dot(
            h, whh_ref[:], preferred_element_type=jnp.float32
        )
        ig = jax.nn.sigmoid(gates[:, :hidden])
        fg = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
        gg = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
        og = jax.nn.sigmoid(gates[:, 3 * hidden :])
        c = fg * c_ref[:] + ig * gg
        h_new = og * jnp.tanh(c)
        c_ref[:] = c
        h_ref[:] = h_new.astype(h_ref.dtype)
        out_ref[j] = h_new.astype(out_ref.dtype)
        return ()

    jax.lax.fori_loop(0, bt, step, (), unroll=True)


@functools.partial(
    jax.jit, static_argnames=("reverse", "block_n", "block_t", "interpret")
)
def lstm_scan_time_major(
    xproj: jnp.ndarray,
    w_hh_t: jnp.ndarray,
    reverse: bool = False,
    block_n: int = 128,
    block_t: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """[T, N, 4H] pre-projected gates + [H, 4H] recurrent weights -> [T, N, H].

    N must be a multiple of block_n (callers pad the batch); T a multiple of
    block_t (chunk sizes are stride-aligned, so this holds for real configs).
    """
    t_len, n, g4 = xproj.shape
    hidden = g4 // 4
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    # VMEM-aware batch tile: the double-buffered xproj + out blocks are
    # block_t * block_n * (4H + H) * itemsize * 2 buffers; wide LSTMs
    # (sup-class H=768) overflow VMEM at the default block_n=128 and fail
    # the backend compile, so shrink the tile to an ~8 MB block budget
    # (hac H=384 bf16 keeps block_n=128; sup-class H=768 drops to 64).
    # itemsize matters: modbase feeds f32 (4 B/elem, half the tile rows)
    itemsize = jnp.dtype(xproj.dtype).itemsize
    while (
        block_n > 32
        and block_t * block_n * (g4 + hidden) * itemsize * 2 > 8 * 1024 * 1024
    ):
        block_n //= 2
    block_n = min(block_n, n)
    while n % block_n:
        block_n //= 2
    block_t = min(block_t, t_len)
    while t_len % block_t:
        block_t //= 2

    n_tiles = n // block_n
    t_tiles = t_len // block_t

    def t_map(b, t):
        return ((t_tiles - 1 - t) if reverse else t, b, 0)

    kernel = functools.partial(_lstm_kernel, bt=block_t, reverse=reverse)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles, t_tiles),
        in_specs=[
            pl.BlockSpec((block_t, block_n, g4), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, g4), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, block_n, hidden), t_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len, n, hidden), xproj.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_n, hidden), xproj.dtype),
            pltpu.VMEM((block_n, hidden), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xproj, w_hh_t)


def lstm_scan_pallas(xproj: jnp.ndarray, w_hh: jnp.ndarray) -> jnp.ndarray:
    """Batch-major convenience wrapper: [N, T, 4H] x [4H, H] -> [N, T, H].

    (Used by models/crf_model.py when use_pallas=True; direction flips are
    done by the caller.)
    """
    xt = jnp.swapaxes(xproj, 0, 1)
    out = lstm_scan_time_major(xt.astype(w_hh.dtype), w_hh.T.astype(w_hh.dtype))
    return jnp.swapaxes(out, 0, 1)


def _lstm_fused_kernel(
    x_ref, wih_ref, whh_ref, bias_ref, out_ref, h_ref, c_ref, *, bt: int, reverse: bool
):
    """Fused variant: the input projection runs inside the kernel, so only
    the H-wide activations stream from HBM instead of the 4H-wide
    pre-projected gates.

    Measured on v5e at hac shapes this is ~6% SLOWER than the split design
    (7.9 vs 7.4 ms/layer): the stack is compute-bound and the hoisted
    time-parallel xproj einsum uses the MXU better than per-step projection.
    Kept for HBM-bound configurations (very large batch or narrow layers)."""
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    hidden = h_ref.shape[-1]

    def step(i, _):
        j = (bt - 1 - i) if reverse else i
        h = h_ref[:]
        gates = (
            jnp.dot(x_ref[j], wih_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32)
            + bias_ref[:]
        )
        ig = jax.nn.sigmoid(gates[:, :hidden])
        fg = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
        gg = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
        og = jax.nn.sigmoid(gates[:, 3 * hidden :])
        c = fg * c_ref[:] + ig * gg
        h_new = og * jnp.tanh(c)
        c_ref[:] = c
        h_ref[:] = h_new.astype(h_ref.dtype)
        out_ref[j] = h_new.astype(out_ref.dtype)
        return ()

    jax.lax.fori_loop(0, bt, step, (), unroll=True)


@functools.partial(
    jax.jit, static_argnames=("reverse", "block_n", "block_t", "interpret")
)
def lstm_fused_time_major(
    x: jnp.ndarray,
    w_ih_t: jnp.ndarray,
    w_hh_t: jnp.ndarray,
    bias: jnp.ndarray,
    reverse: bool = False,
    block_n: int = 128,
    block_t: int = 16,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """[T, N, H] activations + [H, 4H] weights + [4H] bias -> [T, N, H]."""
    t_len, n, hidden = x.shape
    g4 = 4 * hidden
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    block_n = min(block_n, n)
    while n % block_n:
        block_n //= 2
    block_t = min(block_t, t_len)
    while t_len % block_t:
        block_t //= 2
    n_tiles = n // block_n
    t_tiles = t_len // block_t

    def t_map(b, t):
        return ((t_tiles - 1 - t) if reverse else t, b, 0)

    kernel = functools.partial(_lstm_fused_kernel, bt=block_t, reverse=reverse)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles, t_tiles),
        in_specs=[
            pl.BlockSpec((block_t, block_n, hidden), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, g4), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, g4), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g4), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_t, block_n, hidden), t_map, memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t_len, n, hidden), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_n, hidden), x.dtype),
            pltpu.VMEM((block_n, hidden), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x, w_ih_t, w_hh_t, bias.reshape(1, -1))


def quantize_lstm_weights(w_hh_t: jnp.ndarray):
    """Per-output-channel symmetric int8 quantisation of the recurrent
    weights (the role of Koi's quantised-LSTM rescale, LSTMStack.cpp:213-240).
    Returns (w_i8 [H, 4H], combined_scale [4H]) where
    ``h_i8 @ w_i8 * combined_scale ~= h @ w`` for h in [-1, 1] quantised as
    round(h * 127).

    Measured on v5e at hac shapes the int8 kernel runs at bf16 speed
    (8.4 vs 8.5 ms/layer): the recurrence is bound by the VPU gate math,
    not the MXU matmul, so int8's 2x MXU peak doesn't show. It still cuts
    recurrent-weight VMEM 2-4x (useful headroom for bigger batch blocks)
    with max output error ~4e-3 on tanh-bounded activations."""
    w = jnp.asarray(w_hh_t, jnp.float32)
    col_max = jnp.maximum(jnp.abs(w).max(axis=0), 1e-8)
    w_i8 = jnp.round(w / col_max * 127.0).astype(jnp.int8)
    combined_scale = (col_max / 127.0) / 127.0
    return w_i8, combined_scale


def _lstm_int8_kernel(
    xp_ref, whh_ref, scale_ref, out_ref, h_ref, c_ref, *, bt: int, reverse: bool
):
    """int8 recurrent matmul on the MXU (2x the bf16 peak): h is tanh-bounded
    in [-1, 1], so a static 127 activation scale is exact to ~0.4%."""
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    hidden = h_ref.shape[-1]

    def step(i, _):
        j = (bt - 1 - i) if reverse else i
        h_i8 = h_ref[:]
        acc = jnp.dot(h_i8, whh_ref[:], preferred_element_type=jnp.int32)
        gates = xp_ref[j].astype(jnp.float32) + acc.astype(jnp.float32) * scale_ref[:]
        ig = jax.nn.sigmoid(gates[:, :hidden])
        fg = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
        gg = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
        og = jax.nn.sigmoid(gates[:, 3 * hidden :])
        c = fg * c_ref[:] + ig * gg
        h_new = og * jnp.tanh(c)
        c_ref[:] = c
        h_ref[:] = jnp.round(h_new * 127.0).astype(jnp.int8)
        out_ref[j] = h_new.astype(out_ref.dtype)
        return ()

    jax.lax.fori_loop(0, bt, step, (), unroll=True)


@functools.partial(
    jax.jit, static_argnames=("reverse", "block_n", "block_t", "interpret")
)
def lstm_scan_time_major_int8(
    xproj: jnp.ndarray,
    w_hh_i8: jnp.ndarray,
    combined_scale: jnp.ndarray,
    reverse: bool = False,
    block_n: int = 128,
    block_t: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Quantised variant of `lstm_scan_time_major`: [T, N, 4H] pre-projected
    gates + int8 [H, 4H] recurrent weights (+ per-column scale) -> [T, N, H]."""
    t_len, n, g4 = xproj.shape
    hidden = g4 // 4
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    block_n = min(block_n, n)
    while n % block_n:
        block_n //= 2
    block_t = min(block_t, t_len)
    while t_len % block_t:
        block_t //= 2
    n_tiles = n // block_n
    t_tiles = t_len // block_t

    def t_map(b, t):
        return ((t_tiles - 1 - t) if reverse else t, b, 0)

    kernel = functools.partial(_lstm_int8_kernel, bt=block_t, reverse=reverse)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles, t_tiles),
        in_specs=[
            pl.BlockSpec((block_t, block_n, g4), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, g4), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g4), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_t, block_n, hidden), t_map, memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t_len, n, hidden), xproj.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_n, hidden), jnp.int8),
            pltpu.VMEM((block_n, hidden), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xproj, w_hh_i8, combined_scale.reshape(1, -1))
