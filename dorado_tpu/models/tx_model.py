"""Transformer (sup) basecalling model, TPU-first.

Architecture parity with the reference TxModel
(dorado/basecall/model/TxModel.cpp:10-42, dorado/nn/TxModules.cpp):

  signal [N, T] -> conv stack (stride 12) -> [N, T', 512]
  -> 18x TxEncoder (post-norm deepnorm):
       attn = WindowedMHA(x)          # RoPE q/k, window [i-127, i+128]
       x = RMSNorm1(attn + alpha*x)
       f = SwiGLU-MLP(x)              # silu(gate) * y, fc1 -> 2*2048 -> fc2
       x = RMSNorm2(f + alpha*x)
  -> LinearUpsample x2 (T' -> 2T')
  -> LinearScaledCRF (weights pre-scaled by crf.scale)
  -> scores [N, T/stride, 4096] f32

TPU-first choices:
  - windowed attention runs as `num_splits` static query strips, each
    attending only its [qb-win_lower, qe+win_upper] key strip (the
    reference's MEA split loop, TxModules.cpp:259-286) — O(T*W) work with
    static shapes XLA can fuse, no dynamic control flow;
  - RoPE cos/sin tables are closed over as constants; rotation is
    slice/concat on the last dim (non-interleaved halves, matching
    RotaryEmbeddingImpl::forward);
  - everything keeps the caller's compute dtype (bf16 on TPU) with f32
    softmax/normalisation statistics.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from dorado_tpu.config import BasecallModelConfig
from dorado_tpu.models.crf_model import conv_stack

Params = dict


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_tx_params(config: BasecallModelConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    tx = config.tx.tx
    d, ff = tx.d_model, tx.dim_feedforward
    params: Params = {"convs": [], "layers": []}
    keys = jax.random.split(key, len(config.convs) + tx.depth + 2)
    k_iter = iter(keys)

    for cv in config.convs:
        k = next(k_iter)
        fan_in = cv.insize * cv.winlen
        params["convs"].append(
            {
                "w": jax.random.normal(k, (cv.winlen, cv.insize, cv.size), dtype)
                / np.sqrt(fan_in),
                "b": jnp.zeros((cv.size,), dtype),
            }
        )

    for _ in range(tx.depth):
        k1, k2, k3, k4 = jax.random.split(next(k_iter), 4)
        params["layers"].append(
            {
                "wqkv": jax.random.normal(k1, (3 * d, d), dtype) / np.sqrt(d),
                "out_proj_w": jax.random.normal(k2, (d, d), dtype) / np.sqrt(d),
                "out_proj_b": jnp.zeros((d,), dtype),
                "fc1": jax.random.normal(k3, (2 * ff, d), dtype) / np.sqrt(d),
                "fc2": jax.random.normal(k4, (d, ff), dtype) / np.sqrt(ff),
                "norm1": jnp.ones((d,), dtype),
                "norm2": jnp.ones((d,), dtype),
            }
        )

    k = next(k_iter)
    scale_factor = config.tx.upsample.scale_factor
    params["upsample"] = {
        "w": jax.random.normal(k, (scale_factor * d, d), dtype) / np.sqrt(d),
        "b": jnp.zeros((scale_factor * d,), dtype),
    }
    k = next(k_iter)
    params["crf"] = {
        "w": jax.random.normal(k, (config.tx.crf.outsize, d), dtype) / np.sqrt(d)
    }
    return params


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _quantize_rows(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 per-output-channel weight quantisation.

    w [O, K] -> (w_q int8 [O, K], w_scale f32 [O]) with
    w ~= w_q * w_scale[:, None]. The row-wise amax/127 scale keeps each
    output channel's dynamic range independent (the standard W8 recipe;
    the reference ships int8 Koi kernels for its LSTM models the same
    way, CudaCaller.cpp precision selection)."""
    from dorado_tpu.ops.int8_matmul import quantize_weight_rows

    return quantize_weight_rows(w)


def quantize_tx_params(params: Params) -> Params:
    """Return a copy of the tx params with each encoder layer's three fat
    matmuls (wqkv/wqkv_ext, fc1, fc2) replaced by int8 weights + f32
    per-channel scales. The residual stream, norms, attention, output
    projection, upsample and CRF head stay in the compute dtype.

    The v5e datasheet rates int8 at 2x bf16 (394 vs 197 TOPS), but the
    current XLA does not expose that rate (measured ~179 TOPS int8 vs
    118-179 TF/s bf16, and slower end-to-end with the dynamic
    activation-quant pass), so this path is OPT-IN
    (DORADO_TPU_TX_PRECISION=int8) — the TPU analogue of the reference's
    quantised Koi LSTM kernels, held for a toolchain that delivers the
    MXU int8 rate. Accuracy vs fp is covered by
    tests/test_tx_model.py::TestQuantizedTx (relative Frobenius < 5%,
    argmax-transition agreement > 95% at 2-layer depth)."""
    out = dict(params)
    layers = []
    for p in params["layers"]:
        q = {k: v for k, v in p.items() if k not in ("wqkv", "fc1", "fc2")}
        for name in ("wqkv", "fc1", "fc2"):
            wq, ws = _quantize_rows(p[name])
            q[name + "_q"] = wq
            q[name + "_s"] = ws
        layers.append(q)
    out["layers"] = layers
    return out


def quantize_tx_params_w8a8(params: Params) -> Params:
    """W8A8 precision for the encoder's fat matmuls (wqkv, fc1, fc2),
    consumed by the Pallas int8 MXU kernels (ops/int8_matmul.py) with
    dynamic per-token activation quantisation at the use sites.

    Weights stay row-major [O, K] (`_w8` int8 + `_w8s` f32 scales) so the
    RoPE row permutations in tx_forward commute with quantisation; the
    contraction-major transpose happens trace-time (to_qt in tx_forward).
    The residual stream, norms, attention, out_proj, upsample and CRF head
    stay in the compute dtype — the precision split of the reference's
    quantised Koi Tx path (dorado/nn/TxModules.h:95-117)."""
    out = dict(params)
    layers = []
    for p in params["layers"]:
        q = {k: v for k, v in p.items() if k not in ("wqkv", "fc1", "fc2")}
        # fc1 is stored split into its SwiGLU halves (value rows then gate
        # rows, the jnp.split order below) for the fused fc1+silu+requant
        # kernel (ops/int8_matmul.py::swiglu_w8a8)
        ffn = p["fc1"].shape[0] // 2
        for name, w in (
            ("wqkv", p["wqkv"]),
            ("fc1_y", p["fc1"][:ffn]),
            ("fc1_g", p["fc1"][ffn:]),
            ("fc2", p["fc2"]),
        ):
            wq, ws = _quantize_rows(w)
            q[name + "_w8"] = wq
            q[name + "_w8s"] = ws
        layers.append(q)
    out["layers"] = layers
    # The upsample + CRF head stay bf16 — NOT for accuracy (head W8
    # measured argmax agreement 97.75% vs f32, statistically identical to
    # bf16's own 97.86%) but for speed: quantising them measured SLOWER
    # end-to-end (head-only 148.0 vs 145.5 ms/step at sup batch 96 on
    # v5e). The bf16 einsum's consumers (downcast, bias add, the
    # [N,T,C]->[T,N,C] transpose into the decode kernels) fuse into the
    # XLA matmul epilogue; a pallas_call output is a fusion barrier, so
    # each becomes a separate multi-GB HBM pass that costs more than the
    # int8 MXU saves. quantize_tx_head_w8a8 below re-enables the
    # experiment.
    return out


def quantize_tx_head_w8a8(params: Params) -> Params:
    """Additionally quantise the upsample + CRF head (measured SLOWER
    end-to-end on v5e — see the note in quantize_tx_params_w8a8 — kept
    for re-running the experiment on other toolchains). NOTE: the
    quantised head emits scores in the COMPUTE dtype (bf16 on TPU; what
    the decode path stores anyway) while the einsum head returns f32."""
    out = dict(params)
    uw, us = _quantize_rows(params["upsample"]["w"])
    out["upsample"] = {"w8": uw, "w8s": us, "b": params["upsample"]["b"]}
    cw, cs = _quantize_rows(params["crf"]["w"])
    out["crf"] = {"w8": cw, "w8s": cs}
    return out


def _q8_act(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic symmetric per-token int8 activation quantisation:
    [N, T, K] -> (int8 [N, T, K], f32 scale [N, T, 1])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.round(xf / scale).astype(jnp.int8)
    return xq, scale


def _mm_q8(
    xq: jnp.ndarray, x_scale: jnp.ndarray, wq: jnp.ndarray, w_scale: jnp.ndarray
) -> jnp.ndarray:
    """int8 x int8 -> int32 matmul with f32 dequant epilogue.
    xq [N, T, K], wq [O, K] -> f32 [N, T, O]."""
    acc = jax.lax.dot_general(
        xq, wq, (((2,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    return acc.astype(jnp.float32) * x_scale * w_scale[None, None, :]


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """x * rsqrt(mean(x^2) + eps) * weight (nn/RMSNorm.cpp:11-15)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    rstd = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * rstd).astype(dtype) * weight.astype(dtype)


def rope_tables(t_len: int, head_dim: int, theta: float, dtype=jnp.float32):
    """cos/sin [T, D/2] (RotaryEmbeddingImpl ctor, TxModules.cpp:184-197)."""
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    freqs = np.arange(t_len, dtype=np.float64)[:, None] * inv_freq[None, :]
    return (
        jnp.asarray(np.cos(freqs), dtype),
        jnp.asarray(np.sin(freqs), dtype),
    )


def apply_rope(q_or_k: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """[N, T, H, D] -> rotated; halves are non-interleaved
    (RotaryEmbeddingImpl::forward slices [0:D/2], [D/2:D])."""
    d2 = q_or_k.shape[-1] // 2
    evens = q_or_k[..., :d2]
    odds = q_or_k[..., d2:]
    c = cos[None, :, None, :].astype(q_or_k.dtype)
    s = sin[None, :, None, :].astype(q_or_k.dtype)
    return jnp.concatenate([c * evens - s * odds, s * evens + c * odds], axis=-1)


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def rope_ext_tables(t_len: int, head_dim: int, nhead: int, theta: float):
    """Full-width RoPE tables + swap row-permutation for the extended-wqkv
    attention path (ops/attention.py::windowed_attention_ext).

    Returns (ct [T, 2*H*D] f32, st [T, 2*H*D] f32, perm [2*H*D] int):
    rope(qk)[c] = ct[t, c] * qk[c] + st[t, c] * qk[perm[c]] — numerically
    identical to apply_rope's non-interleaved-halves form, but expressed so
    the swap can be baked into the wqkv weight ROWS (free at trace time)
    and the rotation becomes a contiguous-slice FMA with no channel
    shuffles in the compiled step."""
    d = head_dim
    hd2 = 2 * nhead * d
    inv_freq = 1.0 / (theta ** (np.arange(0, d, 2, dtype=np.float64) / d))
    freqs = np.arange(t_len, dtype=np.float64)[:, None] * inv_freq[None, :]
    cos = np.cos(freqs).astype(np.float32)
    sin = np.sin(freqs).astype(np.float32)
    c = np.arange(hd2)
    within = c % d
    cidx = within % (d // 2)
    sign = np.where(within < d // 2, -1.0, 1.0).astype(np.float32)
    ct = cos[:, cidx]
    st = sin[:, cidx] * sign[None, :]
    perm = np.where(within < d // 2, c + d // 2, c - d // 2).astype(np.int32)
    return jnp.asarray(ct), jnp.asarray(st), perm


def windowed_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    win_upper: int,
    win_lower: int,
    num_splits: int = 12,
) -> jnp.ndarray:
    """[N, T, H, D] q/k/v -> [N, T, H, D]; query strip i attends keys
    [qb - win_lower, qe + win_upper] with the exact band mask
    (MultiHeadAttentionImpl::forward MEA split loop)."""
    n, t, h, d = q.shape
    scale = 1.0 / np.sqrt(d)
    elems = _pad_to(-(-t // num_splits), 4)
    outs = []
    for i in range(num_splits):
        qb = i * elems
        if qb >= t:
            break
        qe = min(t, qb + elems)
        kvb = max(0, qb - win_lower)
        kve = min(t, qe + win_upper)
        qs = q[:, qb:qe]
        ks = k[:, kvb:kve]
        vs = v[:, kvb:kve]
        logits = jnp.einsum(
            "nqhd,nkhd->nhqk", qs, ks, preferred_element_type=jnp.float32
        ) * scale
        qi = np.arange(qb, qe)[:, None]
        kj = np.arange(kvb, kve)[None, :]
        band = (kj - qi >= -win_upper) & (kj - qi <= win_lower)
        logits = jnp.where(jnp.asarray(band)[None, None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        outs.append(jnp.einsum("nhqk,nkhd->nqhd", probs, vs))
    return jnp.concatenate(outs, axis=1)


def tx_encoder_layer(
    p: Params,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    nhead: int,
    alpha: float,
    win: tuple[int, int],
    rope_ext: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    rope_hp: jnp.ndarray | None = None,
) -> jnp.ndarray:
    n, t, c = x.shape
    dtype = x.dtype
    head_dim = c // nhead

    # the fused kernel is Mosaic (TPU-only); its kv blocks cover windows up
    # to 128 keys each side (sup uses [127, 128])
    if jax.default_backend() != "tpu" or max(win) > 128:
        if "wqkv_qt" in p:
            from dorado_tpu.ops.int8_matmul import w8a8_matmul_fq

            qkv = w8a8_matmul_fq(x, p["wqkv_qt"], p["wqkv_qs"], out_dtype=dtype)
        elif "wqkv_q" in p:
            xq, xs = _q8_act(x)
            qkv = _mm_q8(xq, xs, p["wqkv_q"], p["wqkv_s"]).astype(dtype)
        else:
            qkv = jnp.einsum(
                "ntc,gc->ntg", x, p["wqkv"].astype(dtype),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
        qkv4 = qkv.reshape(n, t, 3, nhead, head_dim)
        q = apply_rope(qkv4[:, :, 0], cos, sin)
        k = apply_rope(qkv4[:, :, 1], cos, sin)
        v = qkv4[:, :, 2]
        attn = windowed_attention(q, k, v, win[0], win[1]).reshape(n, t, c)
    elif "wqkv_hp" in p or "wqkv_hp_q" in p or "wqkv_hp_qt" in p:
        # plain-width qkv with halves-major q/k rows: RoPE runs inside the
        # banded kernel on VMEM tiles (ops/attention.py
        # windowed_attention_halfperm); no rotated q/k copy in HBM and no
        # duplicated swap rows in the projection
        from dorado_tpu.ops.attention import windowed_attention_halfperm

        if "wqkv_hp_qt" in p:
            from dorado_tpu.ops.int8_matmul import w8a8_matmul_fq

            qkv = w8a8_matmul_fq(
                x, p["wqkv_hp_qt"], p["wqkv_hp_qs"], out_dtype=dtype
            )
        elif "wqkv_hp_q" in p:
            xq, xs = _q8_act(x)
            qkv = _mm_q8(xq, xs, p["wqkv_hp_q"], p["wqkv_hp_s"]).astype(dtype)
        else:
            qkv = jnp.einsum(
                "ntc,gc->ntg", x, p["wqkv_hp"].astype(dtype),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
        attn = windowed_attention_halfperm(
            qkv, rope_hp, nhead, win[0], win[1]
        )
    elif rope_ext is not None and (
        "wqkv_ext" in p or "wqkv_ext_q" in p or "wqkv_ext_qt" in p
    ):
        # extended projection [q|k|v|q_swap|k_swap]: RoPE is a contiguous
        # full-width FMA, banded attention in Pallas
        # (ops/attention.py windowed_attention_ext)
        from dorado_tpu.ops.attention import windowed_attention_ext

        if "wqkv_ext_qt" in p:
            # W8A8 MXU kernel with in-kernel activation quant: the residual
            # stream enters as bf16 (same HBM read as the bf16 path) and
            # the int8 systolic contraction runs at the doubled issue rate
            from dorado_tpu.ops.int8_matmul import w8a8_matmul_fq

            qkv_ext = w8a8_matmul_fq(
                x, p["wqkv_ext_qt"], p["wqkv_ext_qs"], out_dtype=dtype
            )
        elif "wqkv_ext_q" in p:
            xq, xs = _q8_act(x)
            qkv_ext = _mm_q8(
                xq, xs, p["wqkv_ext_q"], p["wqkv_ext_s"]
            ).astype(dtype)
        else:
            qkv_ext = jnp.einsum(
                "ntc,gc->ntg", x, p["wqkv_ext"].astype(dtype),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
        ct, st = rope_ext
        if rope_hp is not None and qkv_ext.dtype == jnp.bfloat16:
            # rope_hp doubles as the stacked-tables slot for the fused-RoPE
            # ext kernel (no rotated qk copy in HBM); selected by
            # DORADO_TPU_TX_ATTN=extf in tx_forward. f32 compute falls back
            # to the plain ext kernel: extf's 24 VMEM blocks exceed the
            # 16 MB scoped limit at f32 tile sizes (measured: 17.21 MB).
            from dorado_tpu.ops.attention import windowed_attention_ext_fused

            attn = windowed_attention_ext_fused(
                qkv_ext, rope_hp, nhead, win[0], win[1]
            )
        else:
            attn = windowed_attention_ext(qkv_ext, ct, st, nhead, win[0], win[1])
    else:
        # fused Pallas banded attention on the plain qkv projection; RoPE
        # as an XLA pre-pass (ops/attention.py windowed_attention_qkv_rope)
        from dorado_tpu.ops.attention import windowed_attention_qkv_rope

        if "wqkv_qt" in p:
            from dorado_tpu.ops.int8_matmul import w8a8_matmul_fq

            qkv = w8a8_matmul_fq(x, p["wqkv_qt"], p["wqkv_qs"], out_dtype=dtype)
        else:
            qkv = jnp.einsum(
                "ntc,gc->ntg", x, p["wqkv"].astype(dtype),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
        attn = windowed_attention_qkv_rope(qkv, cos, sin, nhead, win[0], win[1])
    import os

    fused_norm = (
        jax.default_backend() == "tpu"
        and os.environ.get("DORADO_TPU_TX_FUSED_NORM", "0") == "1"
    )
    if fused_norm:
        # matmul + bias + alpha*residual + RMSNorm in one Pallas pass
        # (ops/fused_norm.py). A/B on v5e at sup batch 64: 131.2 vs
        # 116.9 ms/step — the single-block Pallas matmul loses more than
        # the fused norm saves, so this stays opt-in (XLA's matmul +
        # separate norm pass wins on this toolchain)
        from dorado_tpu.ops.fused_norm import matmul_residual_rmsnorm

        x = matmul_residual_rmsnorm(
            attn, p["out_proj_w"].astype(dtype), p["out_proj_b"], x,
            p["norm1"], alpha,
        )
    else:
        attn = (
            jnp.einsum(
                "ntc,dc->ntd",
                attn,
                p["out_proj_w"].astype(dtype),
                preferred_element_type=jnp.float32,
            )
            + p["out_proj_b"].astype(jnp.float32)
        ).astype(dtype)

        x = rms_norm(attn + x * jnp.asarray(alpha, dtype), p["norm1"])

    if "fc1_y_qt" in p:
        # W8A8 feed-forward: activation quant as plain XLA (quantize_rows,
        # fuses into the RMSNorm that produced x), then the fused
        # fc1+SwiGLU+requant kernel — the [M, 2*ffn] intermediate never
        # touches HBM — and the int8 fc2 matmul
        from dorado_tpu.ops.int8_matmul import (
            quantize_rows,
            swiglu_w8a8,
            w8a8_matmul,
        )

        xq8, xs8 = quantize_rows(x)
        tq8, ts8 = swiglu_w8a8(
            xq8, xs8,
            p["fc1_y_qt"], p["fc1_y_qs"],
            p["fc1_g_qt"], p["fc1_g_qs"],
        )
        f = w8a8_matmul(tq8, ts8, p["fc2_qt"], p["fc2_qs"], out_dtype=dtype)
        return rms_norm(f + x * jnp.asarray(alpha, dtype), p["norm2"])
    if "fc1_q" in p:
        xq, xs = _q8_act(x)
        ff = _mm_q8(xq, xs, p["fc1_q"], p["fc1_s"]).astype(dtype)
    else:
        ff = jnp.einsum(
            "ntc,fc->ntf", x, p["fc1"].astype(dtype),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
    y, gate = jnp.split(ff, 2, axis=-1)
    t_act = jax.nn.silu(gate.astype(jnp.float32)).astype(dtype) * y
    if "fc2_q" in p:
        tq, ts = _q8_act(t_act)
        f = _mm_q8(tq, ts, p["fc2_q"], p["fc2_s"]).astype(dtype)
    elif fused_norm:
        from dorado_tpu.ops.fused_norm import matmul_residual_rmsnorm

        return matmul_residual_rmsnorm(
            t_act, p["fc2"].astype(dtype), None, x, p["norm2"], alpha
        )
    else:
        f = jnp.einsum(
            "ntf,cf->ntc", t_act, p["fc2"].astype(dtype),
            preferred_element_type=jnp.float32,
        ).astype(dtype)

    return rms_norm(f + x * jnp.asarray(alpha, dtype), p["norm2"])


def tx_forward(
    params: Params, signal: jnp.ndarray, config: BasecallModelConfig
) -> jnp.ndarray:
    """[N, T] (or [N, T, F]) -> [N, T/stride, outsize] f32 CRF scores.

    The 18 encoder layers run as one `lax.scan` over stacked layer params —
    an 18x smaller graph than unrolling, which keeps XLA compile times sane
    at production chunk sizes without changing the math."""
    tx = config.tx.tx
    if signal.ndim == 2:
        signal = signal[..., None]
    x = conv_stack(params, signal, config)  # [N, T', d_model]
    dtype = x.dtype

    t_len = x.shape[1]
    cos, sin = rope_tables(t_len, tx.d_model // tx.nhead, tx.theta)

    layers = params["layers"]
    rope_ext = None
    rope_hp = None
    import os

    # extf (RoPE fused into the banded kernel, numerically identical to
    # ext) measured 120.8 vs 124.5 ms/step at sup batch 64 on v5e — the
    # external rotation pass's 402 MB/layer HBM round-trip removed
    attn_variant = os.environ.get("DORADO_TPU_TX_ATTN", "extf")
    if (
        jax.default_backend() == "tpu"
        and max(tx.attn_window) <= 128
        and attn_variant == "hp"
    ):
        # A/B variant (measured SLOWER than ext on v5e: the in-kernel
        # rotation + per-half K=32 logits matmuls cost 2.48 ms/layer vs
        # ext's 1.02, more than the 67 GFLOP/layer the plain-width
        # projection saves): halves-major q/k rows with RoPE inside the
        # banded kernel (ops/attention.py windowed_attention_halfperm).
        from dorado_tpu.ops.attention import rope_half_tables, rope_halfperm

        head_dim = tx.d_model // tx.nhead
        rope_hp = rope_half_tables(t_len, head_dim, tx.nhead, tx.theta)
        hp = rope_halfperm(tx.nhead, head_dim)
        hd = tx.d_model
        rows = np.concatenate([hp, hd + hp, 2 * hd + np.arange(hd)])

        def to_hp(p):
            # the row permutation commutes with per-row int8 quantisation
            if "wqkv_w8" in p and p["wqkv_w8"].shape[0] == 3 * hd:
                return {
                    **p,
                    "wqkv_hp_w8": p["wqkv_w8"][rows],
                    "wqkv_hp_w8s": p["wqkv_w8s"][rows],
                }
            if "wqkv_q" in p and p["wqkv_q"].shape[0] == 3 * hd:
                return {
                    **p,
                    "wqkv_hp_q": p["wqkv_q"][rows],
                    "wqkv_hp_s": p["wqkv_s"][rows],
                }
            if "wqkv" in p and p["wqkv"].shape[0] == 3 * hd:
                return {**p, "wqkv_hp": p["wqkv"][rows]}
            return p

        layers = [to_hp(p) for p in layers]
    elif jax.default_backend() == "tpu" and max(tx.attn_window) <= 128:
        # extend each layer's wqkv with the RoPE-swap row permutation of its
        # q/k rows (free: a static row gather of the params, hoisted out of
        # the layer scan) so the per-layer rotation is shuffle-free
        ct, st, perm = rope_ext_tables(
            t_len, tx.d_model // tx.nhead, tx.nhead, tx.theta
        )
        rope_ext = (ct, st)
        if attn_variant == "extf":
            # fused-RoPE ext kernel: pass the stacked tables; rotation
            # happens on VMEM tiles inside the attention kernel
            rope_hp = jnp.stack([ct, st])
        hd2 = 2 * tx.d_model

        def extend(p):
            # the RoPE-swap row permutation commutes with per-row int8
            # quantisation, so the quantised path permutes rows + scales
            if "wqkv_w8" in p and p["wqkv_w8"].shape[0] >= hd2:
                return {
                    **p,
                    "wqkv_ext_w8": jnp.concatenate(
                        [p["wqkv_w8"], p["wqkv_w8"][perm]], axis=0
                    ),
                    "wqkv_ext_w8s": jnp.concatenate(
                        [p["wqkv_w8s"], p["wqkv_w8s"][perm]], axis=0
                    ),
                }
            if "wqkv_q" in p and p["wqkv_q"].shape[0] >= hd2:
                return {
                    **p,
                    "wqkv_ext_q": jnp.concatenate(
                        [p["wqkv_q"], p["wqkv_q"][perm]], axis=0
                    ),
                    "wqkv_ext_s": jnp.concatenate(
                        [p["wqkv_s"], p["wqkv_s"][perm]], axis=0
                    ),
                }
            if "wqkv" in p and p["wqkv"].shape[0] >= hd2:
                return {
                    **p,
                    "wqkv_ext": jnp.concatenate(
                        [p["wqkv"], p["wqkv"][perm]], axis=0
                    ),
                }
            return p

        layers = [extend(p) for p in layers]

    if any("_w8" in k for k in layers[0]):
        # contraction-major transpose for the W8A8 kernels, trace-time
        # (outside the layer scan, so the transposes run once per step, not
        # per layer iteration). The un-permuted wqkv is dropped when an
        # ext/hp variant replaced it.
        def to_qt(p):
            q = {
                k: v
                for k, v in p.items()
                if not (k.endswith("_w8") or k.endswith("_w8s"))
            }
            skip_base = "wqkv_ext_w8" in p or "wqkv_hp_w8" in p
            for key, v in p.items():
                if not key.endswith("_w8"):
                    continue
                name = key[:-3]
                if name == "wqkv" and skip_base:
                    continue
                q[name + "_qt"] = v.T
                q[name + "_qs"] = p[name + "_w8s"][None, :]
            return q

        layers = [to_qt(p) for p in layers]

    same_structure = len({tuple(sorted(p.keys())) for p in layers}) == 1
    if same_structure and len(layers) > 1:
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)

        def body(carry, layer_p):
            out = tx_encoder_layer(
                layer_p, carry, cos, sin, tx.nhead, tx.deepnorm_alpha,
                tx.attn_window, rope_ext=rope_ext, rope_hp=rope_hp,
            )
            return out, None

        x, _ = jax.lax.scan(body, x, stacked)
    else:
        for p in layers:
            x = tx_encoder_layer(
                p, x, cos, sin, tx.nhead, tx.deepnorm_alpha, tx.attn_window,
                rope_ext=rope_ext, rope_hp=rope_hp,
            )

    # LinearUpsample: [N, T', C] -> [N, scale*T', C] (nn/LinearUpsample.cpp)
    ups = params["upsample"]
    n, t, c = x.shape
    scale_factor = config.tx.upsample.scale_factor
    if "w8" in ups:
        from dorado_tpu.ops.int8_matmul import w8a8_matmul_fq

        # emit the compute dtype straight from the kernel with the bias
        # fused in (an f32 output or a separate bias add would each force
        # an extra multi-GB HBM pass — the einsum path fuses both into
        # its matmul epilogue)
        x = w8a8_matmul_fq(
            x, ups["w8"].T, ups["w8s"][None, :], bias=ups["b"], out_dtype=dtype
        )
    else:
        x = (
            jnp.einsum(
                "ntc,uc->ntu", x, ups["w"].astype(dtype),
                preferred_element_type=jnp.float32,
            )
            + ups["b"].astype(jnp.float32)
        ).astype(dtype)
    x = x.reshape(n, scale_factor * t, c)

    # LinearScaledCRF: weights scaled by crf.scale (TxModules.cpp:330-339)
    crf = params["crf"]
    if "w8" in crf:
        from dorado_tpu.ops.int8_matmul import w8a8_matmul_fq

        # the static crf.scale folds into the per-channel dequant scales;
        # scores leave in the compute dtype (the decode path stores them
        # bf16 anyway — DORADO_TPU_DECODE_SCORES)
        return w8a8_matmul_fq(
            x,
            crf["w8"].T,
            (crf["w8s"] * config.tx.crf.scale)[None, :],
            out_dtype=dtype,
        )
    w = (crf["w"].astype(jnp.float32) * config.tx.crf.scale).astype(dtype)
    scores = jnp.einsum("ntc,oc->nto", x, w, preferred_element_type=jnp.float32)
    return scores


def make_tx_forward_fn(config: BasecallModelConfig, compute_dtype=jnp.float32):
    def forward(params, signal):
        return tx_forward(params, signal.astype(compute_dtype), config)

    return forward
