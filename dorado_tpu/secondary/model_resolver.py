"""Polish/variant model resolution.

Mirrors the reference's polish model selection (cli_lib/polish.cpp:515-640):
``--model auto`` reads the basecaller model name from the input BAM's @RG DS
``basecall_model=`` field and maps it through the basecaller→polish lookup
tables; an explicit name resolves through the registry/downloader; a path is
used as-is. The resolved directory holds a reference-schema config.toml plus
either ``model.pt`` (TorchScript — executed as an opaque module) or
``weights.pt`` (a torch state dict loaded into the jax model zoo).
"""

from __future__ import annotations

import re
from pathlib import Path

# cli_lib/polish.cpp:517-541 lookup tables (transcribed ONT release metadata)
LUT_LEGACY_POLISH = {
    "dna_r10.4.1_e8.2_400bps_hac@v4.2.0": "dna_r10.4.1_e8.2_400bps_hac@v4.2.0_polish",
    "dna_r10.4.1_e8.2_400bps_sup@v4.2.0": "dna_r10.4.1_e8.2_400bps_sup@v4.2.0_polish",
    "dna_r10.4.1_e8.2_400bps_hac@v4.3.0": "dna_r10.4.1_e8.2_400bps_hac@v4.3.0_polish",
    "dna_r10.4.1_e8.2_400bps_sup@v4.3.0": "dna_r10.4.1_e8.2_400bps_sup@v4.3.0_polish",
}
LUT_POLISH = {
    "dna_r10.4.1_e8.2_400bps_hac@v5.0.0": "dna_r10.4.1_e8.2_400bps_hac@v5.0.0_polish_rl",
    "dna_r10.4.1_e8.2_400bps_sup@v5.0.0": "dna_r10.4.1_e8.2_400bps_sup@v5.0.0_polish_rl",
    "dna_r10.4.1_e8.2_400bps_hac@v5.2.0": "dna_r10.4.1_e8.2_400bps_hac@v5.2.0_polish_rl",
    "dna_r10.4.1_e8.2_400bps_sup@v5.2.0": "dna_r10.4.1_e8.2_400bps_sup@v5.2.0_polish_rl",
}
BACTERIAL_MODEL = "dna_r10.4.1_e8.2_400bps_polish_bacterial_methylation_v5.0.0"


def basecaller_model_from_header(header_text: str) -> str | None:
    """basecall_model=<name> from the first @RG DS field
    (polish.cpp parse_basecaller_model_from_header)."""
    for line in header_text.splitlines():
        if not line.startswith("@RG"):
            continue
        m = re.search(r"basecall_model=([^\s,;]+)", line)
        if m:
            return m.group(1)
    return None


def resolve_polish_model_name(
    basecaller_model: str, bacteria: bool = False
) -> str | None:
    """basecaller model name -> polish model name via the reference LUTs."""
    if bacteria:
        return (
            BACTERIAL_MODEL
            if basecaller_model in (LUT_LEGACY_POLISH | LUT_POLISH)
            else None
        )
    return LUT_POLISH.get(basecaller_model) or LUT_LEGACY_POLISH.get(
        basecaller_model
    )


def resolve_model_dir(
    model_arg: str,
    header_text: str = "",
    bacteria: bool = False,
    models_directory: str | Path | None = None,
) -> Path:
    """--model {auto | name | path} -> on-disk model directory.

    Raises ValueError with an actionable message on any resolution failure
    (unknown basecaller model, unresolvable name, missing download)."""
    p = Path(model_arg)
    if p.is_dir():
        return p
    if model_arg == "auto":
        bc = basecaller_model_from_header(header_text)
        if not bc:
            raise ValueError(
                "--model auto requires a basecall_model= entry in the input "
                "BAM's @RG DS header; pass an explicit model name or path."
            )
        name = resolve_polish_model_name(bc, bacteria=bacteria)
        if not name:
            raise ValueError(
                f"No polish model is known for basecaller model {bc!r}."
            )
    else:
        name = model_arg

    models_directory = Path(models_directory or ".")
    local = models_directory / name
    if local.is_dir():
        return local
    from dorado_tpu.models.downloader import download_model_info
    from dorado_tpu.models.registry import get_model_info

    info = get_model_info(name)
    if info is None:
        raise ValueError(f"Unknown polish model name {name!r}.")
    return download_model_info(info, models_directory)


def load_resolved_model(model_dir: Path):
    """(params, forward, model_config_dict, feature_kind) from a resolved
    model directory: model.pt -> TorchScript executor; weights.pt -> torch
    state dict into the jax zoo (model_factory architectures)."""
    from dorado_tpu.secondary.architectures import model_factory, parse_model_config

    model_dir = Path(model_dir)
    mc = parse_model_config(model_dir / "config.toml")
    feature_kind = "counts" if mc["model_type"] == "GRUModel" else "read_level"

    if (model_dir / "model.pt").exists():
        from dorado_tpu.secondary.model import TorchScriptConsensusModel

        return None, TorchScriptConsensusModel(model_dir / "model.pt"), mc, feature_kind

    weights = model_dir / "weights.pt"
    if not weights.exists():
        raise ValueError(
            f"Model dir {model_dir} has neither model.pt nor weights.pt."
        )
    import torch

    state = torch.load(str(weights), map_location="cpu")
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    arrays = {k: v.numpy() for k, v in state.items()}
    params, forward, _ = model_factory(mc["model_type"], mc["model_kwargs"])
    params = _load_state_dict(params, mc["model_type"], arrays)
    return params, forward, mc, feature_kind


def _load_state_dict(params, model_type: str, arrays: dict):
    """Map a torch state dict onto the jax zoo's param pytree. GRUModel's
    names match the .tensor dump layout the CLI already loads; other
    architectures raise with guidance to use model.pt/TorchScript."""
    if model_type != "GRUModel":
        raise ValueError(
            f"weights.pt loading is implemented for GRUModel; {model_type} "
            "models ship as TorchScript (model.pt) which is supported "
            "directly."
        )
    out = {"layers": [], "linear": {}}
    layer = 0
    while f"gru.weight_ih_l{layer}" in arrays:
        entry = {}
        for key, sfx in (("fwd", ""), ("rev", "_reverse")):
            if f"gru.weight_ih_l{layer}{sfx}" not in arrays:
                continue
            entry[key] = {
                "w_ih": arrays[f"gru.weight_ih_l{layer}{sfx}"],
                "w_hh": arrays[f"gru.weight_hh_l{layer}{sfx}"],
                "b_ih": arrays[f"gru.bias_ih_l{layer}{sfx}"],
                "b_hh": arrays[f"gru.bias_hh_l{layer}{sfx}"],
            }
        out["layers"].append(entry)
        layer += 1
    out["linear"] = {
        "w": arrays["linear.weight"],
        "b": arrays["linear.bias"],
    }
    return out
