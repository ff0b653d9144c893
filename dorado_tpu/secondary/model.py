"""Polishing models in JAX: bidirectional GRU -> linear classifier
(parity: dorado/secondary/architectures/model_gru.cpp — torch GRU with
batch_first, num_layers deep, bidirectional, linear head to `num_classes`
symbols "*ACGT").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Params = dict

SYMBOLS = "*ACGT"


def init_gru_params(
    key: jax.Array,
    num_features: int = 10,
    num_classes: int = 5,
    gru_size: int = 128,
    num_layers: int = 2,
    bidirectional: bool = True,
    dtype=jnp.float32,
) -> Params:
    layers = []
    keys = iter(jax.random.split(key, num_layers * 2 + 1))
    in_size = num_features
    dirs = 2 if bidirectional else 1
    for _ in range(num_layers):
        layer = {}
        for d, suffix in enumerate(["fwd", "rev"][:dirs]):
            k = next(keys)
            k1, k2, k3, k4 = jax.random.split(k, 4)
            s = 1.0 / np.sqrt(gru_size)
            layer[suffix] = {
                "w_ih": jax.random.uniform(k1, (3 * gru_size, in_size), dtype, -s, s),
                "w_hh": jax.random.uniform(k2, (3 * gru_size, gru_size), dtype, -s, s),
                "b_ih": jax.random.uniform(k3, (3 * gru_size,), dtype, -s, s),
                "b_hh": jax.random.uniform(k4, (3 * gru_size,), dtype, -s, s),
            }
        layers.append(layer)
        in_size = gru_size * dirs
    k = next(keys)
    linear = {
        "w": jax.random.normal(k, (num_classes, in_size), dtype) / np.sqrt(in_size),
        "b": jnp.zeros((num_classes,), dtype),
    }
    return {"layers": layers, "linear": linear}


def _gru_direction(p: Params, x: jnp.ndarray, reverse: bool) -> jnp.ndarray:
    """One GRU direction over [N, T, C] (torch gate order r, z, n)."""
    dtype = x.dtype
    w_ih = p["w_ih"].astype(dtype)
    w_hh = p["w_hh"].astype(dtype)
    b_ih = p["b_ih"].astype(jnp.float32)
    b_hh = p["b_hh"].astype(jnp.float32)
    n, t, _ = x.shape
    h_size = w_hh.shape[1]

    xp = jnp.einsum("ntc,gc->ntg", x, w_ih, preferred_element_type=jnp.float32) + b_ih
    if reverse:
        xp = jnp.flip(xp, axis=1)
    xp_t = jnp.swapaxes(xp, 0, 1)

    def step(h, xg):
        hg = (
            jnp.einsum("nh,gh->ng", h, w_hh, preferred_element_type=jnp.float32)
            + b_hh
        )
        xr, xz, xn = jnp.split(xg, 3, axis=-1)
        hr, hz, hn = jnp.split(hg, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        nn_ = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * nn_ + z * h
        return h_new.astype(dtype), h_new.astype(dtype)

    init = jnp.zeros((n, h_size), dtype)
    _, out_t = jax.lax.scan(step, init, xp_t)
    out = jnp.swapaxes(out_t, 0, 1)
    if reverse:
        out = jnp.flip(out, axis=1)
    return out


def gru_forward(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """[N, T, num_features] -> [N, T, num_classes] logits."""
    for layer in params["layers"]:
        outs = [_gru_direction(layer["fwd"], x, reverse=False)]
        if "rev" in layer:
            outs.append(_gru_direction(layer["rev"], x, reverse=True))
        x = jnp.concatenate(outs, axis=-1)
    lin = params["linear"]
    return (
        jnp.einsum(
            "nth,oh->nto", x, lin["w"].astype(x.dtype), preferred_element_type=jnp.float32
        )
        + lin["b"].astype(jnp.float32)
    )


def decode_consensus(
    logits: np.ndarray, positions_minor: np.ndarray | None = None
) -> str:
    """argmax over "*ACGT"; '*' (gap) positions are dropped
    (secondary/features/decoder_base.cpp decode_batch_bases_impl)."""
    classes = np.asarray(logits).argmax(axis=-1)
    out = []
    for c in classes.reshape(-1):
        if c != 0:
            out.append(SYMBOLS[c])
    return "".join(out)


class TorchScriptConsensusModel:
    """Executes an ONT-shipped TorchScript polish/variant model on host
    torch (CPU eval mode).

    Parity: dorado/secondary/architectures/model_torch_script.h — the
    reference loads ``model.pt`` as an opaque ``torch::jit`` module when the
    model config names it (model_factory.cpp:186-201); its native
    architectures load ``weights.pt`` state dicts instead. Our jax model zoo
    covers the weights path; this covers the opaque-blob path so any ONT
    polish model drops in. The call contract matches gru_forward:
    [N, T, num_features] -> [N, T, num_classes] scores (the `params`
    argument of the pipeline's forward fn is ignored).
    """

    def __init__(self, model_path):
        from dorado_tpu.utils.torchscript import load_torchscript

        self.module = load_torchscript(model_path)

    def __call__(self, params, feats):
        import numpy as np
        import torch

        with torch.no_grad():
            out = self.module(torch.from_numpy(np.asarray(feats, np.float32)))
        return np.asarray(out)
