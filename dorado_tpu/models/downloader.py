"""Model downloader: ONT CDN fetch + SHA-256 verification + extraction.

Mirrors dorado/model_downloader/downloader.cpp:141-210 (URL scheme
``https://cdn.oxfordnanoportal.com/software/analysis/dorado/<name>.zip``,
``DORADO_CDN_URL_OVERRIDE`` env override, checksum validation before
extraction). Uses urllib; in network-restricted environments the fetch fails
with a clear error and models can be supplied as local directories instead.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import urllib.error
import urllib.request
import zipfile
from pathlib import Path

from dorado_tpu.models.registry import ModelInfo, get_model_info, list_models


def model_url(name: str) -> str:
    override = os.environ.get("DORADO_CDN_URL_OVERRIDE")
    if override:
        root = override.rstrip("/")
        return f"{root}/dorado/{name}.zip"
    return f"https://cdn.oxfordnanoportal.com/software/analysis/dorado/{name}.zip"


def _sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for block in iter(lambda: f.read(1 << 20), b""):
            h.update(block)
    return h.hexdigest()


def download_model_info(info: ModelInfo, directory: Path) -> Path:
    """Fetch + verify + extract one model; returns the model directory."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    target = directory / info.name
    if target.is_dir() and any(target.iterdir()):
        return target

    with tempfile.TemporaryDirectory(dir=directory) as tmp:
        archive = Path(tmp) / f"{info.name}.zip"
        try:
            with urllib.request.urlopen(model_url(info.name), timeout=120) as r, open(
                archive, "wb"
            ) as out:
                shutil.copyfileobj(r, out)
        except (urllib.error.URLError, OSError) as e:
            raise RuntimeError(
                f"Failed to download model '{info.name}' from {model_url(info.name)}: "
                f"{e}. If this host has no network access, provide the model as a "
                "local directory path instead."
            ) from e

        if info.checksum:
            got = _sha256(archive)
            if got != info.checksum:
                raise RuntimeError(
                    f"Checksum mismatch for {info.name}: expected "
                    f"{info.checksum}, got {got}"
                )
        with zipfile.ZipFile(archive) as z:
            z.extractall(directory)
    if not target.is_dir():
        raise RuntimeError(f"Archive for {info.name} did not contain {info.name}/")
    return target


def download_model(name: str, directory: Path) -> int:
    """CLI entry: download one model or 'all'. Returns process exit code."""
    names = list_models() if name == "all" else [name]
    rc = 0
    for n in names:
        info = get_model_info(n)
        if info is None:
            print(f"> Unknown model: {n}")
            rc = 1
            continue
        try:
            path = download_model_info(info, Path(directory))
            print(f"> Downloaded {n} -> {path}")
        except RuntimeError as e:
            print(f"> {e}")
            rc = 1
    return rc
