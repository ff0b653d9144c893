"""Load dorado model directories into JAX parameter pytrees.

Weight-file naming follows the reference exactly
(dorado/basecall/crf_utils.cpp:26-150): each weight lives in its own
``<layer>.<name>.tensor`` TorchScript archive inside the model directory.
LSTM models index layers as ``{conv_idx}`` / ``{n_convs + lstm_idx + 1}`` /
``{n_convs + n_lstms + 1}``; transformer models use ``conv.{i}`` /
``transformer_encoder.{i}`` / ``upsample`` / ``crf`` prefixes.

Torch layouts are converted to ours on load:
  - conv1d weight  [C_out, C_in, K]  -> [K, C_in, C_out]      (HIO)
  - lstm w_ih/w_hh [4H, C]           -> kept (gate order i,f,g,o)
  - linear weight  [out, in]         -> kept
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from dorado_tpu.config import BasecallModelConfig, load_model_config
from dorado_tpu.io.tensor_file import load_tensor, save_tensor_file

Params = dict


def _conv_in(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def _conv_out(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def load_lstm_params(config: BasecallModelConfig) -> Params:
    """Assemble the fast/hac LSTM-CRF parameter pytree from a model dir."""
    d = Path(config.model_path)
    params: Params = {"convs": [], "lstms": []}

    for i in range(len(config.convs)):
        params["convs"].append(
            {
                "w": _conv_in(load_tensor(d / f"{i}.conv.weight.tensor")),
                "b": load_tensor(d / f"{i}.conv.bias.tensor"),
            }
        )

    n_convs = len(config.convs)
    for l in range(config.lstm_layers):
        layer = n_convs + l + 1  # reference skips one index for the fused permute layer
        if config.is_flstm_model:
            # factorised LSTM weights (crf_utils.cpp:36-41)
            params["lstms"].append(
                {
                    "dn_w_ih": load_tensor(d / f"{layer}.rnn.dn_weight_ih.tensor"),
                    "dn_w_hh": load_tensor(d / f"{layer}.rnn.dn_weight_hh.tensor"),
                    "up_w_ih": load_tensor(d / f"{layer}.rnn.up_weight_ih.tensor"),
                    "up_w_hh": load_tensor(d / f"{layer}.rnn.up_weight_hh.tensor"),
                    "up_b_ih": load_tensor(d / f"{layer}.rnn.up_bias_ih.tensor"),
                    "up_b_hh": load_tensor(d / f"{layer}.rnn.up_bias_hh.tensor"),
                }
            )
            continue
        params["lstms"].append(
            {
                "w_ih": load_tensor(d / f"{layer}.rnn.weight_ih_l0.tensor"),
                "w_hh": load_tensor(d / f"{layer}.rnn.weight_hh_l0.tensor"),
                "b_ih": load_tensor(d / f"{layer}.rnn.bias_ih_l0.tensor"),
                "b_hh": load_tensor(d / f"{layer}.rnn.bias_hh_l0.tensor"),
            }
        )

    layer = n_convs + config.lstm_layers + 1
    params["linear1"] = {"w": load_tensor(d / f"{layer}.linear.weight.tensor")}
    if config.bias:
        params["linear1"]["b"] = load_tensor(d / f"{layer}.linear.bias.tensor")
    if config.out_features is not None:
        params["linear2"] = {"w": load_tensor(d / f"{layer + 1}.linear.weight.tensor")}
    return params


def load_tx_params(config: BasecallModelConfig) -> Params:
    """Assemble the sup transformer parameter pytree from a model dir."""
    d = Path(config.model_path)
    params: Params = {"convs": [], "layers": []}

    for i in range(len(config.convs)):
        params["convs"].append(
            {
                "w": _conv_in(load_tensor(d / f"conv.{i}.conv.weight.tensor")),
                "b": load_tensor(d / f"conv.{i}.conv.bias.tensor"),
            }
        )

    for i in range(config.tx.tx.depth):
        p = f"transformer_encoder.{i}"
        params["layers"].append(
            {
                "wqkv": load_tensor(d / f"{p}.self_attn.Wqkv.weight.tensor"),
                "out_proj_w": load_tensor(d / f"{p}.self_attn.out_proj.weight.tensor"),
                "out_proj_b": load_tensor(d / f"{p}.self_attn.out_proj.bias.tensor"),
                "fc1": load_tensor(d / f"{p}.ff.fc1.weight.tensor"),
                "fc2": load_tensor(d / f"{p}.ff.fc2.weight.tensor"),
                "norm1": load_tensor(d / f"{p}.norm1.weight.tensor"),
                "norm2": load_tensor(d / f"{p}.norm2.weight.tensor"),
            }
        )

    params["upsample"] = {
        "w": load_tensor(d / "upsample.linear.weight.tensor"),
        "b": load_tensor(d / "upsample.linear.bias.tensor"),
    }
    params["crf"] = {"w": load_tensor(d / "crf.linear.weight.tensor")}
    return params


def load_model(path: Path | str) -> tuple[BasecallModelConfig, Params]:
    """Parse config.toml and load all weights for a model directory."""
    config = load_model_config(path)
    if config.is_tx_model:
        return config, load_tx_params(config)
    return config, load_lstm_params(config)


# ---------------------------------------------------------------------------
# Export — write a parameter pytree back out as a dorado-layout model dir
# (used by tests to fabricate model directories, and by training/export flows)
# ---------------------------------------------------------------------------


def save_lstm_params(config: BasecallModelConfig, params: Params, path: Path | str) -> None:
    d = Path(path)
    d.mkdir(parents=True, exist_ok=True)
    for i, cv in enumerate(params["convs"]):
        save_tensor_file(d / f"{i}.conv.weight.tensor", [_conv_out(np.asarray(cv["w"]))])
        save_tensor_file(d / f"{i}.conv.bias.tensor", [np.asarray(cv["b"])])
    n_convs = len(params["convs"])
    for l, p in enumerate(params["lstms"]):
        layer = n_convs + l + 1
        for fname, key in (
            ("weight_ih_l0", "w_ih"),
            ("weight_hh_l0", "w_hh"),
            ("bias_ih_l0", "b_ih"),
            ("bias_hh_l0", "b_hh"),
        ):
            save_tensor_file(d / f"{layer}.rnn.{fname}.tensor", [np.asarray(p[key])])
    layer = n_convs + len(params["lstms"]) + 1
    save_tensor_file(d / f"{layer}.linear.weight.tensor", [np.asarray(params["linear1"]["w"])])
    if "b" in params["linear1"]:
        save_tensor_file(d / f"{layer}.linear.bias.tensor", [np.asarray(params["linear1"]["b"])])
    if "linear2" in params:
        save_tensor_file(
            d / f"{layer + 1}.linear.weight.tensor", [np.asarray(params["linear2"]["w"])]
        )


def save_tx_params(config: BasecallModelConfig, params: Params, path: Path | str) -> None:
    d = Path(path)
    d.mkdir(parents=True, exist_ok=True)
    for i, cv in enumerate(params["convs"]):
        save_tensor_file(d / f"conv.{i}.conv.weight.tensor", [_conv_out(np.asarray(cv["w"]))])
        save_tensor_file(d / f"conv.{i}.conv.bias.tensor", [np.asarray(cv["b"])])
    for i, lp in enumerate(params["layers"]):
        p = f"transformer_encoder.{i}"
        save_tensor_file(d / f"{p}.self_attn.Wqkv.weight.tensor", [np.asarray(lp["wqkv"])])
        save_tensor_file(d / f"{p}.self_attn.out_proj.weight.tensor", [np.asarray(lp["out_proj_w"])])
        save_tensor_file(d / f"{p}.self_attn.out_proj.bias.tensor", [np.asarray(lp["out_proj_b"])])
        save_tensor_file(d / f"{p}.ff.fc1.weight.tensor", [np.asarray(lp["fc1"])])
        save_tensor_file(d / f"{p}.ff.fc2.weight.tensor", [np.asarray(lp["fc2"])])
        save_tensor_file(d / f"{p}.norm1.weight.tensor", [np.asarray(lp["norm1"])])
        save_tensor_file(d / f"{p}.norm2.weight.tensor", [np.asarray(lp["norm2"])])
    save_tensor_file(d / "upsample.linear.weight.tensor", [np.asarray(params["upsample"]["w"])])
    save_tensor_file(d / "upsample.linear.bias.tensor", [np.asarray(params["upsample"]["b"])])
    save_tensor_file(d / "crf.linear.weight.tensor", [np.asarray(params["crf"]["w"])])
