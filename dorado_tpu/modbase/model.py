"""Modified-base calling models in JAX.

Parity with dorado/modbase/nn/ModBaseModel.cpp:
  - ModBaseConvLSTM (v1 context / v2 chunked): three signal convs, two
    sequence convs, merge conv (all SiLU), two LSTMs (fwd + bwd via flips,
    SiLU after each), linear head; v2 emits per-stride softmax probs
    flattened, v1 emits final-timestep softmax.
  - ModBaseConvLSTMV3: sublayer shapes/activations from config, no LSTM
    activations, optional LinearUpsample.

Weight file names follow load_modbase_conv_lstm_weights
(ModBaseModel.cpp:49-76): sig_conv1..3, seq_conv1..2, merge_conv1,
lstm1/lstm2, fc, optional linear_up.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from dorado_tpu.io.tensor_file import load_tensor
from dorado_tpu.modbase.config import ModBaseModelConfig, ModBaseModelType

Params = dict


def _act(name: str):
    if name in ("swish", "silu"):
        return jax.nn.silu
    if name == "tanh":
        return jnp.tanh
    raise ValueError(f"unsupported modbase activation {name}")


def _conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, stride: int, padding: int):
    """[N, T, C_in] x [K, C_in, C_out] -> [N, T', C_out] (+bias, f32 accum)."""
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    return (out + b.astype(jnp.float32)).astype(x.dtype)


def _lstm(p: Params, x: jnp.ndarray, reverse: bool) -> jnp.ndarray:
    """Torch-layout LSTM over [N, T, H]; biases summed, gate order i,f,g,o.

    On TPU the recurrence runs in the fused Pallas scan (ops/lstm.py) —
    measured 1.19x the lax.scan step at the hac-5mCG_5hmCG v3 geometry
    (6.43 vs 7.65 ms at batch 2048). DORADO_TPU_MODBASE_PALLAS=0 falls
    back to the lax.scan recurrence."""
    import os

    from dorado_tpu.models.crf_model import lstm_layer

    use_pallas = (
        jax.default_backend() == "tpu"
        and os.environ.get("DORADO_TPU_MODBASE_PALLAS", "1") != "0"
    )
    return lstm_layer(p, x, reverse=reverse, use_pallas=use_pallas)


# ---------------------------------------------------------------------------
# Architecture description derived from config
# ---------------------------------------------------------------------------


def _conv_specs(config: ModBaseModelConfig):
    """(signal convs, sequence convs, merge conv) as (cin, cout, k, stride,
    pad, act) tuples."""
    t = config.model_type
    if t in (ModBaseModelType.CONV_LSTM_V1, ModBaseModelType.CONV_LSTM_V2):
        v2 = t is ModBaseModelType.CONV_LSTM_V2
        size, stride = config.size, config.stride
        kmer = config.kmer_len * 4
        sig = [
            (1, 4, 5, 1, 2 if v2 else 0, "swish"),
            (4, 16, 5, 1, 2 if v2 else 0, "swish"),
            (16, size, 9, stride, 4 if v2 else 0, "swish"),
        ]
        seq = [
            (kmer, 16, 5, 1, 2 if v2 else 0, "swish"),
            (16, size, 13, stride, 6 if v2 else 0, "swish"),
        ]
        merge = (size * 2, size, 5, 1, 2 if v2 else 0, "swish")
        return sig, seq, merge
    if t is ModBaseModelType.CONV_LSTM_V3:
        def spec(d):
            return (
                int(d["insize"]),
                int(d["size"]),
                int(d["winlen"]),
                int(d["stride"]),
                int(d.get("padding", d["winlen"] // 2)),
                d.get("activation", "swish"),
            )

        sig = [spec(d) for d in config.signal_encoder if d["type"] == "convolution"]
        seq = [spec(d) for d in config.sequence_encoder if d["type"] == "convolution"]
        enc_convs = [spec(d) for d in config.encoder if d["type"] == "convolution"]
        if len(enc_convs) != 1:
            raise ValueError("expected one merge convolution in v3 encoder")
        return sig, seq, enc_convs[0]
    raise ValueError(f"unsupported modbase model type {t}")


# ---------------------------------------------------------------------------
# Init / load
# ---------------------------------------------------------------------------


def stride_ratio(config: ModBaseModelConfig) -> int:
    """signal-conv stride product / sequence-conv stride product
    (ModBaseModelConfig.cpp:189-205); 1 for v1/v2 models whose sequence convs
    downsample to the same rate as the signal convs."""
    sig, seq, _merge = _conv_specs(config)
    sig_stride = int(np.prod([s[3] for s in sig]))
    seq_stride = int(np.prod([s[3] for s in seq]))
    if sig_stride % seq_stride:
        raise ValueError("modbase signal stride must be divisible by sequence stride")
    return sig_stride // seq_stride


def init_modbase_params(
    config: ModBaseModelConfig, key: jax.Array, dtype=jnp.float32
) -> Params:
    sig, seq, merge = _conv_specs(config)
    size = config.size
    keys = iter(jax.random.split(key, 16))

    def conv_p(spec):
        cin, cout, k, _s, _p, _a = spec
        w = jax.random.normal(next(keys), (k, cin, cout), dtype) / np.sqrt(cin * k)
        return {"w": w, "b": jnp.zeros((cout,), dtype)}

    def lstm_p(h):
        scale = 1.0 / np.sqrt(h)
        return {
            "w_ih": jax.random.uniform(next(keys), (4 * h, h), dtype, -scale, scale),
            "w_hh": jax.random.uniform(next(keys), (4 * h, h), dtype, -scale, scale),
            "b_ih": jax.random.uniform(next(keys), (4 * h,), dtype, -scale, scale),
            "b_hh": jax.random.uniform(next(keys), (4 * h,), dtype, -scale, scale),
        }

    params: Params = {
        "sig_convs": [conv_p(s) for s in sig],
        "seq_convs": [conv_p(s) for s in seq],
        "merge_conv": conv_p(merge),
        "lstm1": lstm_p(size),
        "lstm2": lstm_p(size),
        "fc": {
            "w": jax.random.normal(next(keys), (config.num_out, size), dtype)
            / np.sqrt(size),
            "b": jnp.zeros((config.num_out,), dtype),
        },
    }
    return params


def _conv_in(w: np.ndarray) -> np.ndarray:
    # torch conv1d [C_out, C_in, K] -> ours [K, C_in, C_out]
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def load_modbase_params(config: ModBaseModelConfig) -> Params:
    d = Path(config.model_path)

    def conv(name):
        return {
            "w": _conv_in(load_tensor(d / f"{name}.weight.tensor")),
            "b": load_tensor(d / f"{name}.bias.tensor"),
        }

    def lstm(name):
        return {
            "w_ih": load_tensor(d / f"{name}.weight_ih_l0.tensor"),
            "w_hh": load_tensor(d / f"{name}.weight_hh_l0.tensor"),
            "b_ih": load_tensor(d / f"{name}.bias_ih_l0.tensor"),
            "b_hh": load_tensor(d / f"{name}.bias_hh_l0.tensor"),
        }

    params: Params = {
        "sig_convs": [conv(f"sig_conv{i}") for i in (1, 2, 3)],
        "seq_convs": [conv(f"seq_conv{i}") for i in (1, 2)],
        "merge_conv": conv("merge_conv1"),
        "lstm1": lstm("lstm1"),
        "lstm2": lstm("lstm2"),
        "fc": {
            "w": load_tensor(d / "fc.weight.tensor"),
            "b": load_tensor(d / "fc.bias.tensor"),
        },
    }
    return params


def load_refine_levels(config: ModBaseModelConfig) -> np.ndarray | None:
    path = Path(config.model_path) / "refine_kmer_levels.tensor"
    if not config.refine.do_rough_rescale or not path.exists():
        return None
    return load_tensor(path).astype(np.float32)


def save_modbase_params(config: ModBaseModelConfig, params: Params, path) -> None:
    """Write a pytree out in the dorado modbase on-disk layout (tests)."""
    from dorado_tpu.io.tensor_file import save_tensor_file

    d = Path(path)
    d.mkdir(parents=True, exist_ok=True)

    def conv_out(w):
        return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 1, 0)))

    for i, cv in enumerate(params["sig_convs"]):
        save_tensor_file(d / f"sig_conv{i+1}.weight.tensor", [conv_out(cv["w"])])
        save_tensor_file(d / f"sig_conv{i+1}.bias.tensor", [np.asarray(cv["b"])])
    for i, cv in enumerate(params["seq_convs"]):
        save_tensor_file(d / f"seq_conv{i+1}.weight.tensor", [conv_out(cv["w"])])
        save_tensor_file(d / f"seq_conv{i+1}.bias.tensor", [np.asarray(cv["b"])])
    save_tensor_file(d / "merge_conv1.weight.tensor", [conv_out(params["merge_conv"]["w"])])
    save_tensor_file(d / "merge_conv1.bias.tensor", [np.asarray(params["merge_conv"]["b"])])
    for name in ("lstm1", "lstm2"):
        p = params[name]
        save_tensor_file(d / f"{name}.weight_ih_l0.tensor", [np.asarray(p["w_ih"])])
        save_tensor_file(d / f"{name}.weight_hh_l0.tensor", [np.asarray(p["w_hh"])])
        save_tensor_file(d / f"{name}.bias_ih_l0.tensor", [np.asarray(p["b_ih"])])
        save_tensor_file(d / f"{name}.bias_hh_l0.tensor", [np.asarray(p["b_hh"])])
    save_tensor_file(d / "fc.weight.tensor", [np.asarray(params["fc"]["w"])])
    save_tensor_file(d / "fc.bias.tensor", [np.asarray(params["fc"]["b"])])


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def modbase_forward(
    params: Params,
    sigs: jnp.ndarray,  # [N, T] float
    seqs: jnp.ndarray,  # [N, T_seq, kmer_len*4] int8/float
    config: ModBaseModelConfig,
) -> jnp.ndarray:
    """Returns flattened per-position probs [N, T_out*num_out] for chunked
    models, or [N, num_out] for context models."""
    sig_specs, seq_specs, merge_spec = _conv_specs(config)
    dtype = sigs.dtype if jnp.issubdtype(sigs.dtype, jnp.floating) else jnp.float32

    x = sigs.astype(dtype)[..., None]  # [N, T, 1]
    for spec, p in zip(sig_specs, params["sig_convs"]):
        x = _act(spec[5])(_conv1d(x, p["w"], p["b"], spec[3], spec[4]))

    s = seqs.astype(dtype)
    for spec, p in zip(seq_specs, params["seq_convs"]):
        s = _act(spec[5])(_conv1d(s, p["w"], p["b"], spec[3], spec[4]))

    z = jnp.concatenate([x, s], axis=-1)
    z = _act(merge_spec[5])(
        _conv1d(z, params["merge_conv"]["w"], params["merge_conv"]["b"], merge_spec[3], merge_spec[4])
    )

    if config.model_type is ModBaseModelType.CONV_LSTM_V3:
        # lstm1 fwd, flip; lstm2 on flipped; linear then flip back
        z = _lstm(params["lstm1"], z, reverse=False)
        z = jnp.flip(z, axis=1)
        z = _lstm(params["lstm2"], z, reverse=False)
        logits = (
            jnp.einsum(
                "nth,oh->nto",
                z,
                params["fc"]["w"].astype(z.dtype),
                preferred_element_type=jnp.float32,
            )
            + params["fc"]["b"].astype(jnp.float32)
        )
        logits = jnp.flip(logits, axis=1)
        probs = jax.nn.softmax(logits, axis=-1)
        return probs.reshape(probs.shape[0], -1)

    # v1 / v2: act(lstm1) flipped, act(lstm2) flipped
    z = jax.nn.silu(_lstm(params["lstm1"], z, reverse=False))
    z = jnp.flip(z, axis=1)
    z = jax.nn.silu(_lstm(params["lstm2"], z, reverse=False))
    z = jnp.flip(z, axis=1)

    logits = (
        jnp.einsum(
            "nth,oh->nto",
            z,
            params["fc"]["w"].astype(z.dtype),
            preferred_element_type=jnp.float32,
        )
        + params["fc"]["b"].astype(jnp.float32)
    )
    if config.model_type is ModBaseModelType.CONV_LSTM_V2:
        probs = jax.nn.softmax(logits, axis=-1)
        return probs.reshape(probs.shape[0], -1)
    # context model: final timestep only
    probs = jax.nn.softmax(logits[:, -1, :], axis=-1)
    return probs


def make_modbase_forward_fn(config: ModBaseModelConfig, compute_dtype=jnp.float32):
    def forward(params, sigs, seqs):
        return modbase_forward(params, sigs.astype(compute_dtype), seqs, config)

    return forward
