"""TPU-native correction scorer with the HERRO inference contract.

The reference ships the HERRO model as an opaque TorchScript blob and only
defines its interface (CorrectionInferenceNode.cpp:247-283): inputs
(bases [B, R, L] int32 padded with 11, quals [B, R, L] float, lengths,
supported-position indices per window), output tuple whose element [1] is
base logits over the 5 classes "ACGT*" at the supported positions.

This module implements that contract as a JAX model designed for the MXU:
a per-column read-set encoder (base embedding + qual, masked mean + max
over the read axis) feeding a RoPE transformer over the window length, with
a 5-class head gathered at the supported indices. Weights are trainable /
loadable from .tensor dumps; herro-v1 TorchScript weights can be executed
via the torch CPU fallback in `caller.py` instead.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PAD_ENC = 11  # collate pad value (CorrectionInferenceNode.cpp:230)
NUM_SYMBOLS = 12  # "ACGT*acgt#." + pad
NUM_CLASSES = 5  # "ACGT*"


@dataclass
class CorrectionModelConfig:
    dim: int = 128
    depth: int = 4
    heads: int = 4
    ff_mult: int = 4
    emb_dim: int = 8


def init_correction_model(key, cfg: CorrectionModelConfig | None = None):
    cfg = cfg or CorrectionModelConfig()
    keys = jax.random.split(key, 4 + 4 * cfg.depth)
    d = cfg.dim

    def lin(k, i, o):
        return {
            "w": jax.random.normal(k, (o, i), jnp.float32) / np.sqrt(i),
            "b": jnp.zeros((o,)),
        }

    params = {
        "embed": jax.random.normal(keys[0], (NUM_SYMBOLS, cfg.emb_dim)) * 0.1,
        "col_in": lin(keys[1], 2 * (cfg.emb_dim + 1), d),
        "head": lin(keys[2], d, NUM_CLASSES),
        "layers": [],
    }
    for i in range(cfg.depth):
        k1, k2, k3, k4 = keys[3 + 4 * i : 7 + 4 * i]
        params["layers"].append(
            {
                "qkv": lin(k1, d, 3 * d),
                "proj": lin(k2, d, d),
                "ff1": lin(k3, d, cfg.ff_mult * d),
                "ff2": lin(k4, cfg.ff_mult * d, d),
                "ln1": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
                "ln2": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
            }
        )
    return params


def _ln(p, x, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["g"] + p["b"]


def _lin(p, x):
    return x @ p["w"].T + p["b"]


def _rope(x):
    """[..., T, H, D] rotary over T (non-interleaved halves)."""
    d = x.shape[-1]
    t = x.shape[-3]
    inv = 1.0 / (10000.0 ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    freqs = jnp.outer(jnp.arange(t, dtype=jnp.float32), inv)
    emb = jnp.concatenate([freqs, freqs], -1)[:, None, :]
    a, b = jnp.split(x, 2, axis=-1)
    rot = jnp.concatenate([-b, a], -1)
    return x * jnp.cos(emb) + rot * jnp.sin(emb)


@partial(jax.jit, static_argnames=("heads",))
def correction_forward(params, bases, quals, heads: int = 4):
    """bases [B, R, L] int32, quals [B, R, L] f32 -> logits [B, L, 5]."""
    mask = bases != PAD_ENC  # [B, R, L]
    emb = params["embed"][jnp.clip(bases, 0, NUM_SYMBOLS - 1)]  # [B, R, L, E]
    feat = jnp.concatenate([emb, quals[..., None]], -1)  # [B, R, L, E+1]
    m = mask[..., None].astype(jnp.float32)
    denom = jnp.maximum(m.sum(1), 1.0)
    mean = (feat * m).sum(1) / denom  # [B, L, E+1]
    mx = jnp.where(m > 0, feat, -1e9).max(1)
    mx = jnp.where(denom > 0, mx, 0.0)
    x = _lin(params["col_in"], jnp.concatenate([mean, mx], -1))  # [B, L, D]

    b, l, d = x.shape
    hd = d // heads
    for layer in params["layers"]:
        h = _ln(layer["ln1"], x)
        qkv = _lin(layer["qkv"], h).reshape(b, l, 3, heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q, k = _rope(q), _rope(k)
        logits = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(hd)
        attn = jax.nn.softmax(logits, -1)
        o = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(b, l, d)
        x = x + _lin(layer["proj"], o)
        h = _ln(layer["ln2"], x)
        x = x + _lin(layer["ff2"], jax.nn.gelu(_lin(layer["ff1"], h)))
    return _lin(params["head"], x)


def predict_supported(params, wf, heads: int = 4) -> str:
    """Run the scorer on one WindowFeatures; returns the predicted base
    (from "ACGT*") per supported position, matching decode_preds
    (CorrectionInferenceNode.cpp:278-283)."""
    if not len(wf.indices):
        return ""
    logits = correction_forward(
        params, jnp.asarray(wf.bases[None]), jnp.asarray(wf.quals[None]), heads
    )[0]
    at = np.asarray(logits)[wf.indices]  # [S, 5]
    return "".join("ACGT*"[int(i)] for i in at.argmax(-1))


class TorchScriptScorer:
    """Executes an ONT-shipped HERRO TorchScript model (e.g. herro-v1) on
    CPU torch, with the exact input contract of
    CorrectionInferenceNode.cpp:247-283: (bases i32 [B, R, L] padded with
    11, quals f32, lengths i32, list of per-window supported-index tensors);
    output tuple element [1] holds the base logits at supported positions."""

    def __init__(self, model_path: str):
        import torch

        from dorado_tpu.utils.torchscript import load_torchscript

        self._torch = torch
        self.module = load_torchscript(model_path)

    def predict(self, wf) -> str:
        torch = self._torch
        if not len(wf.indices):
            return ""
        bases = torch.from_numpy(wf.bases[None].astype("int32"))
        quals = torch.from_numpy(wf.quals[None].astype("float32"))
        lengths = torch.tensor([wf.bases.shape[1]], dtype=torch.int32)
        indices = [torch.from_numpy(wf.indices.astype("int32"))]
        with torch.no_grad():
            out = self.module(bases, quals, lengths, indices)
        logits = out[1] if isinstance(out, tuple) else out.toTuple()[1]
        preds = logits.argmax(-1).cpu().numpy().reshape(-1)
        return "".join("ACGT*"[int(i)] for i in preds[: len(wf.indices)])
