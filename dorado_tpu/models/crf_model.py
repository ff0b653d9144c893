"""Conv + LSTM + LinearCRF basecalling model (fast/hac families), TPU-first.

Architecture parity with the reference CRF models
(dorado/basecall/model/CRFModel.cpp:29-62, dorado/nn/ConvStack.cpp,
dorado/nn/LSTMStack.cpp, dorado/nn/CRFModules.cpp), re-expressed as pure
functional JAX:

  raw signal [N, T] -> conv stack (stride product S) -> [N, T/S, H]
  -> 5 alternating-direction LSTM layers -> LinearCRF (+ optional tanh*5,
  optional decomposition, optional clamp +-5) -> transition scores
  [N, T/S, 4^(state_len+1)]

TPU-first design choices:
  - the per-layer input projection (x @ W_ih) is hoisted out of the recurrence
    into ONE large [N*T, C] x [C, 4H] matmul that XLA tiles onto the MXU;
  - the recurrence itself is a `lax.scan` over time-major activations with a
    single [N, H] x [H, 4H] matmul per step (see ops/lstm.py for the Pallas
    fused variant);
  - alternating layer direction is a time flip, fused by XLA into the scan's
    gather order.

Parameters are a plain pytree (nested dicts of jnp arrays); all static shape
information comes from `BasecallModelConfig`.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from dorado_tpu.config import Activation, BasecallModelConfig

Params = dict[str, Any]


def _activation_fn(act: Activation):
    if act is Activation.SWISH:
        return jax.nn.silu
    if act is Activation.SWISH_CLAMP:
        # silu clamped from above at 3.5 (reference: nn/ConvStack.cpp:154)
        return lambda x: jnp.minimum(jax.nn.silu(x), 3.5)
    if act is Activation.TANH:
        return jnp.tanh
    raise ValueError(f"unknown activation {act}")


# ---------------------------------------------------------------------------
# Initialisation
# ---------------------------------------------------------------------------


def init_lstm_crf_params(
    config: BasecallModelConfig, key: jax.Array, dtype=jnp.float32
) -> Params:
    """Random-init parameters with the exact shapes of the reference weights.

    Conv weights are stored [K, C_in, C_out] (HIO); LSTM weights follow the
    torch layout [4H, C] with gate order (i, f, g, o) so imported dorado
    weights drop straight in.
    """
    params: Params = {"convs": [], "lstms": []}
    keys = jax.random.split(key, len(config.convs) + config.lstm_layers + 2)
    k_iter = iter(keys)

    for cv in config.convs:
        k = next(k_iter)
        fan_in = cv.insize * cv.winlen
        w = jax.random.normal(k, (cv.winlen, cv.insize, cv.size), dtype) / np.sqrt(fan_in)
        b = jnp.zeros((cv.size,), dtype)
        params["convs"].append({"w": w, "b": b})

    hidden = config.lstm_size
    for _ in range(config.lstm_layers):
        k = next(k_iter)
        k1, k2, k3, k4 = jax.random.split(k, 4)
        scale = 1.0 / np.sqrt(hidden)
        params["lstms"].append(
            {
                "w_ih": jax.random.uniform(k1, (4 * hidden, hidden), dtype, -scale, scale),
                "w_hh": jax.random.uniform(k2, (4 * hidden, hidden), dtype, -scale, scale),
                "b_ih": jax.random.uniform(k3, (4 * hidden,), dtype, -scale, scale),
                "b_hh": jax.random.uniform(k4, (4 * hidden,), dtype, -scale, scale),
            }
        )

    k = next(k_iter)
    if config.out_features is not None:
        # decomposed linear layer: hidden -> out_features -> outsize
        k1, k2 = jax.random.split(k)
        params["linear1"] = {
            "w": jax.random.normal(k1, (config.out_features, hidden), dtype)
            / np.sqrt(hidden)
        }
        if config.bias:
            params["linear1"]["b"] = jnp.zeros((config.out_features,), dtype)
        params["linear2"] = {
            "w": jax.random.normal(k2, (config.outsize, config.out_features), dtype)
            / np.sqrt(config.out_features)
        }
    else:
        pre_v4 = config.convs[0].size <= 4 or config.num_features != 1
        params["linear1"] = {
            "w": jax.random.normal(k, (config.outsize, hidden), dtype) / np.sqrt(hidden)
        }
        if config.bias or pre_v4:
            params["linear1"]["b"] = jnp.zeros((config.outsize,), dtype)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def conv_stack(params: Params, x: jnp.ndarray, config: BasecallModelConfig) -> jnp.ndarray:
    """[N, T, C_in] -> [N, T/stride, C_out] feature-last 1D convolutions."""
    dtype = x.dtype
    for cv, p in zip(config.convs, params["convs"]):
        x = jax.lax.conv_general_dilated(
            x,
            p["w"].astype(dtype),
            window_strides=(cv.stride,),
            padding=[(cv.padding, cv.padding)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32,
        )
        x = (x + p["b"].astype(jnp.float32)).astype(dtype)
        x = _activation_fn(cv.activation)(x)
    return x


def lstm_layer(
    p: Params, x: jnp.ndarray, reverse: bool, use_pallas: bool = False
) -> jnp.ndarray:
    """One LSTM layer over [N, T, H] (torch gate order i,f,g,o).

    The input projection runs as one big matmul outside the scan; the scan
    carries (h, c) and does a single [N,H]x[H,4H] matmul per step.
    """
    dtype = x.dtype
    w_ih = p["w_ih"].astype(dtype)
    w_hh = p["w_hh"].astype(dtype)
    bias = (p["b_ih"] + p["b_hh"]).astype(jnp.float32)

    n, t, h = x.shape
    xproj = jnp.einsum(
        "nth,gh->ntg", x, w_ih, preferred_element_type=jnp.float32
    ) + bias  # [N, T, 4H] f32

    if reverse:
        xproj = jnp.flip(xproj, axis=1)

    xproj_t = jnp.swapaxes(xproj, 0, 1)  # [T, N, 4H]

    if use_pallas:
        from dorado_tpu.ops.lstm import lstm_scan_time_major

        out_t = lstm_scan_time_major(xproj_t.astype(dtype), w_hh.T)
    else:

        def step(carry, xp):
            h_prev, c_prev = carry
            gates = xp + jnp.dot(
                h_prev, w_hh.T, preferred_element_type=jnp.float32
            )
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h_new.astype(dtype), c), h_new.astype(dtype)

        init = (
            jnp.zeros((n, h), dtype),
            jnp.zeros((n, h), jnp.float32),
        )
        _, out_t = jax.lax.scan(step, init, xproj_t)
    out = jnp.swapaxes(out_t, 0, 1)  # [N, T, H]

    if reverse:
        out = jnp.flip(out, axis=1)
    return out


def _lstm_stack_pallas(
    params: Params, x: jnp.ndarray, reverse_first: bool, keep_time_major: bool = False
) -> jnp.ndarray:
    """Time-major fused-LSTM stack: one transpose in, one out, zero flips —
    alternating direction is handled by the kernel's reversed grid walk.
    ``keep_time_major`` skips the final transpose and returns [T, N, H] so a
    time-major consumer (the decode scans) avoids a [N,T,C]->[T,N,C]
    round trip of the score tensor through HBM."""
    from dorado_tpu.ops.lstm import lstm_scan_time_major

    dtype = x.dtype
    xt = jnp.swapaxes(x, 0, 1)  # [T, N, H]
    for i, p in enumerate(params["lstms"]):
        reverse = (i % 2 == 0) if reverse_first else (i % 2 == 1)
        bias = (p["b_ih"] + p["b_hh"]).astype(jnp.float32)
        if "w_ih_q" in p:
            # W8A8 input projection on the int8 MXU (the recurrent matmul
            # stays bf16 — it is VPU-gate-bound, ops/lstm.py): this is the
            # compute-bound matmul of the hac step (~10.5 ms/layer bf16 at
            # batch 1024, at the bf16 MXU peak). Bias is fused in-kernel.
            # (Also tried: emitting int8 gates + per-row scales to halve
            # the [T, N, 4H] output write, with in-scan dequant — measured
            # SLOWER end-to-end, 181.2 vs 174.5 ms/step: the scan's int8
            # load + upconvert costs more VPU than the HBM it saves.)
            from dorado_tpu.ops.int8_matmul import w8a8_matmul_fq

            xproj = w8a8_matmul_fq(
                xt,
                p["w_ih_q"].T,
                p["w_ih_s"][None, :],
                bias=bias,
                out_dtype=dtype,
            )
        else:
            xproj = (
                jnp.einsum(
                    "tnh,gh->tng",
                    xt,
                    p["w_ih"].astype(dtype),
                    preferred_element_type=jnp.float32,
                )
                + bias
            ).astype(dtype)
        xt = lstm_scan_time_major(xproj, p["w_hh"].T.astype(dtype), reverse=reverse)
    return xt if keep_time_major else jnp.swapaxes(xt, 0, 1)


def flstm_layer(p: Params, x: jnp.ndarray, reverse: bool) -> jnp.ndarray:
    """Factorised LSTM layer (dorado/nn/FLSTMStack.cpp:95-127): inputs and
    hidden state are down-projected to K dims, concatenated, and up-projected
    to the 4C gates (bias = up_bias_ih only, matching forward_cublas)."""
    dtype = x.dtype
    dn_ih = p["dn_w_ih"].astype(dtype)  # [K, C]
    dn_hh = p["dn_w_hh"].astype(dtype)  # [K, C]
    up_ih = p["up_w_ih"].astype(dtype)  # [4C, K]
    up_hh = p["up_w_hh"].astype(dtype)  # [4C, K]
    bias = p["up_b_ih"].astype(jnp.float32)

    n, t, c = x.shape
    # hoist the input half out of the recurrence:
    # gates_x = (x @ dn_ih^T) @ up_ih^T
    x_dn = jnp.einsum("ntc,kc->ntk", x, dn_ih, preferred_element_type=jnp.float32)
    gates_x = (
        jnp.einsum(
            "ntk,gk->ntg", x_dn.astype(dtype), up_ih, preferred_element_type=jnp.float32
        )
        + bias
    )
    if reverse:
        gates_x = jnp.flip(gates_x, axis=1)
    gates_x = jnp.swapaxes(gates_x, 0, 1)  # [T, N, 4C]

    def step(carry, gx):
        h_prev, c_prev = carry
        h_dn = jnp.einsum("nc,kc->nk", h_prev, dn_hh, preferred_element_type=jnp.float32)
        gates = gx + jnp.einsum(
            "nk,gk->ng", h_dn.astype(dtype), up_hh, preferred_element_type=jnp.float32
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return (h_new.astype(dtype), c_new), h_new.astype(dtype)

    init = (jnp.zeros((n, c), dtype), jnp.zeros((n, c), jnp.float32))
    _, out_t = jax.lax.scan(step, init, gates_x)
    out = jnp.swapaxes(out_t, 0, 1)
    if reverse:
        out = jnp.flip(out, axis=1)
    return out


def lstm_stack(
    params: Params,
    x: jnp.ndarray,
    reverse_first: bool = True,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Alternating-direction LSTM layers (first layer reversed for v4 models,
    matching dorado/nn/LSTMStack.cpp:29-41). Factorised layers (FLSTM) are
    detected by their parameter names."""
    if params["lstms"] and "dn_w_ih" in params["lstms"][0]:
        for i, p in enumerate(params["lstms"]):
            reverse = (i % 2 == 0) if reverse_first else (i % 2 == 1)
            x = flstm_layer(p, x, reverse=reverse)
        return x
    if use_pallas:
        return _lstm_stack_pallas(params, x, reverse_first)
    for i, p in enumerate(params["lstms"]):
        reverse = (i % 2 == 0) if reverse_first else (i % 2 == 1)
        x = lstm_layer(p, x, reverse=reverse, use_pallas=use_pallas)
    return x


def quantize_lstm_crf_params_w8a8(params: Params) -> Params:
    """int8 input-projection weights for the Pallas LSTM stack.

    Only `w_ih` is quantised (per-output-channel symmetric int8, the same
    recipe as the Tx encoder) — the x-projections are the compute-bound
    matmuls of the LSTM step, already at the bf16 MXU peak; the recurrent
    matmul stays bf16 because the recurrence is VPU-gate-bound (int8 there
    measured no faster, ops/lstm.py::quantize_lstm_weights). The conv
    stack, recurrent weights, biases and CRF head keep full precision —
    the precision split of the reference's quantised Koi LSTM kernels
    (LSTMStack.cpp:213-240 rescale path).

    Layers whose widths don't tile the 128-lane MXU (fast's H=96) and
    FLSTM layers are left untouched."""
    from dorado_tpu.ops.int8_matmul import quantize_weight_rows

    out = dict(params)
    lstms = []
    for p in params["lstms"]:
        w = p.get("w_ih")
        if w is None or w.shape[0] % 128 or w.shape[1] % 128:
            lstms.append(p)
            continue
        q = {k: v for k, v in p.items() if k != "w_ih"}
        wq, ws = quantize_weight_rows(w)
        q["w_ih_q"] = wq
        q["w_ih_s"] = ws
        lstms.append(q)
    out["lstms"] = lstms
    return out


def linear_crf_head(
    params: Params, x: jnp.ndarray, config: BasecallModelConfig
) -> jnp.ndarray:
    """LinearCRF (+ optional decomposition / tanh*5 / clamp) -> scores f32."""
    tanh_x5 = config.scale == 5.0
    pre_v4 = config.convs[0].size <= 4 or config.num_features != 1

    def linear(p, y):
        out = jnp.einsum(
            "nth,ch->ntc", y, p["w"].astype(y.dtype), preferred_element_type=jnp.float32
        )
        if "b" in p:
            out = out + p["b"].astype(jnp.float32)
        return out

    if config.out_features is not None:
        y = linear(params["linear1"], x).astype(x.dtype)
        scores = linear(params["linear2"], y)
        if tanh_x5:
            scores = 5.0 * jnp.tanh(scores)
        if config.clamp:
            scores = jnp.clip(scores, -5.0, 5.0)
    elif not pre_v4:
        scores = linear(params["linear1"], x)
        if tanh_x5:
            scores = 5.0 * jnp.tanh(scores)
        if config.clamp:
            scores = jnp.clip(scores, -5.0, 5.0)
    else:
        # pre-v4: bias + tanh * 5 always
        scores = linear(params["linear1"], x)
        scores = 5.0 * jnp.tanh(scores)
    return scores


def permute_head_params(params: Params, perm) -> Params:
    """Return params with the CRF head's output channels permuted.

    Used by the runner's fused viterbi path: baking the block-layout
    permutation (ops/crf_pallas.block_permutation) into the final linear's
    output rows makes the model emit block-layout scores directly — the
    lattice permute costs nothing instead of a full [T, N, C] HBM lane
    gather on device. The permutation commutes with the tanh*5 / clamp
    elementwise tail of linear_crf_head. Handles the LSTM head (linear1 /
    decomposed linear1+linear2) and the Tx LinearScaledCRF head ("crf")."""
    perm = np.asarray(perm)
    head = "crf" if "crf" in params else (
        "linear2" if "linear2" in params else "linear1"
    )
    out = dict(params)
    layer = dict(out[head])
    if "w" in layer:
        layer["w"] = jnp.asarray(layer["w"])[perm, :]
    if "w8" in layer:
        # quantised Tx head: permutation commutes with per-row quantisation
        layer["w8"] = jnp.asarray(layer["w8"])[perm, :]
        layer["w8s"] = jnp.asarray(layer["w8s"])[perm]
    if "b" in layer:
        layer["b"] = jnp.asarray(layer["b"])[perm]
    out[head] = layer
    return out


def lstm_crf_forward(
    params: Params,
    signal: jnp.ndarray,
    config: BasecallModelConfig,
    use_pallas: bool = False,
    time_major: bool = False,
) -> jnp.ndarray:
    """[N, T] (or [N, T, F]) normalised signal -> [N, T/stride, outsize]
    scores ([T/stride, N, outsize] with ``time_major`` — what the decode
    scans consume; on the Pallas path the stack is already time-major, so
    this removes two full score-tensor transposes from the device step)."""
    if signal.ndim == 2:
        signal = signal[..., None]
    x = conv_stack(params, signal, config)
    is_flstm = bool(params["lstms"]) and "dn_w_ih" in params["lstms"][0]
    if use_pallas and not is_flstm:
        x = _lstm_stack_pallas(params, x, reverse_first=True, keep_time_major=time_major)
        scores = linear_crf_head(params, x, config)
        return scores
    x = lstm_stack(params, x, reverse_first=True, use_pallas=use_pallas)
    scores = linear_crf_head(params, x, config)
    return jnp.swapaxes(scores, 0, 1) if time_major else scores


def make_crf_forward_fn(
    config: BasecallModelConfig, use_pallas: bool = False, compute_dtype=jnp.float32
):
    """Build a jittable forward closure over the static model config."""

    def forward(params, signal):
        return lstm_crf_forward(
            params, signal.astype(compute_dtype), config, use_pallas=use_pallas
        )

    return forward
