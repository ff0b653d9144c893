"""Model downloader over a local HTTP server: URL construction, SHA-256
acceptance/rejection, zip extraction, and idempotency — everything except
the real CDN (network-gated), exercised via DORADO_CDN_URL_OVERRIDE the way
the reference overrides its CDN root (downloader.cpp:141-210)."""

import hashlib
import http.server
import io
import threading
import zipfile

import pytest

from dorado_tpu.models.downloader import download_model_info, model_url
from dorado_tpu.models.registry import ModelInfo

NAME = "dna_test_model@v0.0.0"


def _zip_bytes():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(f"{NAME}/config.toml", "[model]\n")
        z.writestr(f"{NAME}/weights.tensor", b"\x00\x01")
    return buf.getvalue()


@pytest.fixture()
def cdn(monkeypatch):
    payload = _zip_bytes()

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == f"/dorado/{NAME}.zip":
                self.send_response(200)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
            else:
                self.send_response(404)
                self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    monkeypatch.setenv(
        "DORADO_CDN_URL_OVERRIDE", f"http://127.0.0.1:{srv.server_port}"
    )
    yield payload
    srv.shutdown()


def test_model_url_scheme(monkeypatch):
    monkeypatch.delenv("DORADO_CDN_URL_OVERRIDE", raising=False)
    assert model_url(NAME) == (
        f"https://cdn.oxfordnanoportal.com/software/analysis/dorado/{NAME}.zip"
    )
    monkeypatch.setenv("DORADO_CDN_URL_OVERRIDE", "http://example.test/root/")
    assert model_url(NAME) == f"http://example.test/root/dorado/{NAME}.zip"


def test_download_verify_extract(cdn, tmp_path):
    payload = cdn
    info = ModelInfo(name=NAME, checksum=hashlib.sha256(payload).hexdigest(),
                     chemistry="test", model_type="SIMPLEX")
    target = download_model_info(info, tmp_path)
    assert target == tmp_path / NAME
    assert (target / "config.toml").read_text() == "[model]\n"
    assert (target / "weights.tensor").read_bytes() == b"\x00\x01"
    # idempotent: an existing populated dir short-circuits the fetch
    assert download_model_info(info, tmp_path) == target


def test_download_rejects_bad_checksum(cdn, tmp_path):
    info = ModelInfo(name=NAME, checksum="0" * 64, chemistry="test", model_type="SIMPLEX")
    with pytest.raises(RuntimeError, match="Checksum mismatch"):
        download_model_info(info, tmp_path)
    assert not (tmp_path / NAME).exists()


def test_download_missing_model_errors(cdn, tmp_path, monkeypatch):
    info = ModelInfo(name="does_not_exist@v0", checksum="", chemistry="test", model_type="SIMPLEX")
    with pytest.raises(RuntimeError, match="Failed to download"):
        download_model_info(info, tmp_path)
