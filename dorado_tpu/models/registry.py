"""Model registry: the reference's released-model metadata + selection logic.

Data (names, SHA-256 checksums, chemistries, variants, versions) is
transcribed from the reference tables into ``registry_data.json``
(dorado/models/models.cpp:213-1735, dorado/models/kits.cpp) — it is release
metadata, not code. Selection logic mirrors:

  - chemistry detection from (flow_cell_product_code, sequencing_kit,
    sample_rate) (kits.cpp:413-437, models.cpp:1827-1860);
  - the model-complex grammar ``{fast,hac,sup}[@version][,mods[@version]]*``
    or explicit model names (models/model_complex.cpp:27-186);
  - latest-version resolution when no version is given.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from functools import lru_cache
from pathlib import Path

_DATA_PATH = Path(__file__).parent / "registry_data.json"

MODEL_VARIANTS = ("auto", "fast", "hac", "sup")


@lru_cache(maxsize=1)
def _data() -> dict:
    with open(_DATA_PATH) as f:
        return json.load(f)


@dataclass(frozen=True)
class ModelInfo:
    name: str
    checksum: str | None
    chemistry: str
    model_type: str  # SIMPLEX / STEREO / MODBASE / CORRECT / POLISH / VARIANT
    variant: str | None = None  # FAST / HAC / SUP / NONE
    version: str | None = None  # "v4_2_0"
    mods_variant: str | None = None  # "M_5mCG_5hmCG"
    mods_version: str | None = None

    @property
    def version_tuple(self) -> tuple:
        return _version_tuple(self.version)

    @property
    def mods_name(self) -> str | None:
        if self.mods_variant is None:
            return None
        return self.mods_variant.removeprefix("M_")


def _version_tuple(v: str | None) -> tuple:
    if not v or v == "NONE":
        return ()
    return tuple(int(x) for x in v.removeprefix("v").split("_"))


def _load_models(section: str) -> list[ModelInfo]:
    out = []
    for e in _data()["models"][section]:
        out.append(
            ModelInfo(
                name=e["name"],
                checksum=e.get("checksum"),
                chemistry=e.get("chemistry", "UNKNOWN"),
                model_type=e.get("type", "SIMPLEX"),
                variant=e.get("variant"),
                version=e.get("version"),
                mods_variant=e.get("mods_variant"),
                mods_version=e.get("mods_version"),
            )
        )
    return out


@lru_cache(maxsize=None)
def simplex_models() -> tuple[ModelInfo, ...]:
    return tuple(_load_models("simplex"))


@lru_cache(maxsize=None)
def stereo_models() -> tuple[ModelInfo, ...]:
    return tuple(_load_models("stereo"))


@lru_cache(maxsize=None)
def modified_models() -> tuple[ModelInfo, ...]:
    return tuple(_load_models("modified"))


@lru_cache(maxsize=None)
def correction_models() -> tuple[ModelInfo, ...]:
    return tuple(_load_models("correction"))


@lru_cache(maxsize=None)
def polish_models() -> tuple[ModelInfo, ...]:
    return tuple(_load_models("polisher"))


@lru_cache(maxsize=None)
def variant_models() -> tuple[ModelInfo, ...]:
    return tuple(_load_models("variant_caller"))


def all_models() -> list[ModelInfo]:
    return (
        list(simplex_models())
        + list(stereo_models())
        + list(modified_models())
        + list(correction_models())
        + list(polish_models())
        + list(variant_models())
    )


def list_models() -> list[str]:
    return [m.name for m in all_models()]


@lru_cache(maxsize=1)
def _by_name() -> dict[str, ModelInfo]:
    return {m.name: m for m in all_models()}


def get_model_info(name: str) -> ModelInfo | None:
    return _by_name().get(name)


def mods_variants() -> list[str]:
    return sorted({m.mods_name for m in modified_models() if m.mods_name})


# ---------------------------------------------------------------------------
# Chemistry detection
# ---------------------------------------------------------------------------


def get_chemistry(
    flow_cell_product_code: str, sequencing_kit: str, sample_rate: int
) -> str | None:
    """Chemistry enum name for a run's (flowcell, kit, sample rate), or None
    (kits.cpp ChemistryKey lookup)."""
    fc = flow_cell_product_code.strip().upper().replace("_", "-")
    kit = sequencing_kit.strip().upper().replace("_", "-")
    for chem, info in _data()["chemistries"].items():
        if info["sample_rate"] != sample_rate:
            continue
        for f, k in info["flowcell_kit"]:
            if f == fc and k == kit:
                return chem
    return None


def chemistry_sample_type(chemistry: str) -> str | None:
    info = _data()["chemistries"].get(chemistry)
    return info["sample_type"] if info else None


# ---------------------------------------------------------------------------
# ModelComplex parsing + resolution
# ---------------------------------------------------------------------------


@dataclass
class ModelComplex:
    raw: str
    style: str  # "named" | "variant" | "path"
    simplex_variant: str | None = None  # FAST/HAC/SUP
    simplex_version: str | None = None  # "v4_3_0" or None = latest
    mods: list[tuple[str, str | None]] = field(default_factory=list)  # (variant, ver)
    named_simplex: ModelInfo | None = None
    named_mods: list[ModelInfo] = field(default_factory=list)

    @property
    def is_path(self) -> bool:
        return self.style == "path"


def _parse_version_str(v: str) -> str:
    v = v.lower()
    if not v.startswith("v"):
        raise ValueError(f"model version must start with 'v': {v!r}")
    nums = [int(x) for x in v[1:].split(".") if x != ""]
    while len(nums) < 3:
        nums.append(0)
    return "v" + "_".join(str(n) for n in nums)


def parse_model_complex(arg: str) -> ModelComplex:
    """Parse a model argument: explicit names, variant grammar, or a path
    (model_complex.cpp:27-186)."""
    if not arg:
        raise ValueError("No model argument")
    parts = arg.split(",")

    # 1. named models
    first = get_model_info(parts[0])
    if first is not None:
        mc = ModelComplex(raw=arg, style="named")
        if first.model_type == "SIMPLEX":
            mc.named_simplex = first
        elif first.model_type == "MODBASE":
            mc.named_simplex = _modbase_parent(first)
            mc.named_mods.append(first)
        else:
            raise ValueError(f"a {first.model_type} model is not valid here: {parts[0]}")
        for p in parts[1:]:
            info = get_model_info(p)
            if info is None or info.model_type != "MODBASE":
                raise ValueError(f"not a modbase model: {p!r}")
            if (
                info.chemistry != mc.named_simplex.chemistry
                or info.variant != mc.named_simplex.variant
                or info.version != mc.named_simplex.version
            ):
                raise ValueError(
                    f"modbase model {p!r} does not match simplex {mc.named_simplex.name!r}"
                )
            mc.named_mods.append(info)
        return mc

    # 2. variant grammar
    head, _, head_ver = parts[0].partition("@")
    if head.lower() in ("auto", "fast", "hac", "sup"):
        mc = ModelComplex(raw=arg, style="variant")
        mc.simplex_variant = head.upper()
        if head_ver and head_ver != "latest":
            mc.simplex_version = _parse_version_str(head_ver)
        known_mods = set(mods_variants())
        for p in parts[1:]:
            mod, _, mver = p.partition("@")
            if mod not in known_mods:
                raise ValueError(
                    f"unknown modification variant {mod!r} - choices: "
                    + ", ".join(sorted(known_mods))
                )
            ver = None
            if mver and mver != "latest":
                ver = _parse_version_str(mver)
            mc.mods.append((mod, ver))
        return mc

    # 3. path
    return ModelComplex(raw=arg, style="path")


def _modbase_parent(info: ModelInfo) -> ModelInfo:
    for m in simplex_models():
        if m.version == info.version and m.variant == info.variant:
            return m
    raise ValueError(f"no simplex parent for modbase model {info.name}")


def resolve_simplex_model(
    chemistry: str, variant: str, version: str | None = None
) -> ModelInfo:
    """Latest (or exact-version) simplex model for chemistry+variant
    (models.cpp find_model semantics)."""
    if variant.upper() == "AUTO":
        # auto maps per-chemistry default: sup for RNA004/5khz, hac otherwise
        variant = "HAC"
    candidates = [
        m
        for m in simplex_models()
        if m.chemistry == chemistry and m.variant == variant.upper()
    ]
    if version is not None:
        candidates = [m for m in candidates if m.version == version]
    if not candidates:
        raise ValueError(
            f"no simplex model for chemistry={chemistry} variant={variant}"
            + (f" version={version}" if version else "")
        )
    return max(candidates, key=lambda m: m.version_tuple)


def resolve_mods_models(
    simplex: ModelInfo, mods: list[tuple[str, str | None]]
) -> list[ModelInfo]:
    out = []
    for mod, ver in mods:
        candidates = [
            m
            for m in modified_models()
            if m.chemistry == simplex.chemistry
            and m.variant == simplex.variant
            and m.version == simplex.version
            and m.mods_name == mod
        ]
        if ver is not None:
            candidates = [m for m in candidates if m.mods_version == ver]
        if not candidates:
            raise ValueError(
                f"no {mod} modbase model for simplex {simplex.name}"
                + (f" version {ver}" if ver else "")
            )
        out.append(max(candidates, key=lambda m: _version_tuple(m.mods_version)))
    return out


def resolve_stereo_model(chemistry: str) -> ModelInfo:
    candidates = [m for m in stereo_models() if m.chemistry == chemistry]
    if not candidates:
        raise ValueError(f"no stereo model for chemistry {chemistry}")
    return max(candidates, key=lambda m: m.version_tuple)
