"""Golden-output regression tests.

Real model weights cannot be downloaded in this environment, so the golden
contract is: fixed-seed random weights + the reference's checked-in POD5
fixtures must keep producing byte-identical basecalls (CPU, f32). Any
numerics/pipeline regression shows up as a golden diff.

Regenerate (after an INTENDED change) with:
    python tests/test_golden.py regenerate
"""

import hashlib
import json
import shutil
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

GOLDEN_PATH = Path(__file__).parent / "golden" / "fast_v40_fixture_calls.json"
REF_CONFIGS = Path("/root/reference/tests/data/model_configs")
FAST = "dna_r10.4.1_e8.2_260bps_fast@v4.0.0"
POD5_DIR = Path("/root/reference/tests/data/pod5/dna_r10.4.1_e8.2_400bps_5khz")


def _run_fixture_calls(tmp_root: Path, decoder: str):
    from dorado_tpu.config import load_model_config
    from dorado_tpu.models.crf_model import init_lstm_crf_params
    from dorado_tpu.models.load import load_model, save_lstm_params
    from dorado_tpu.pipeline.basecaller import BasecallerPipeline

    model_dir = tmp_root / FAST
    if not model_dir.exists():
        model_dir.mkdir(parents=True)
        shutil.copy(REF_CONFIGS / FAST / "config.toml", model_dir / "config.toml")
        config = load_model_config(model_dir)
        save_lstm_params(
            config, init_lstm_crf_params(config, jax.random.PRNGKey(1)), model_dir
        )
    config, params = load_model(model_dir)
    pipeline = BasecallerPipeline(
        config,
        params,
        chunk_size=4000,
        batch_size=4,
        decoder=decoder,
        emit_moves=True,
        split_reads=False,
    )

    records = []

    class W:
        def write(self, rec):
            records.append(rec)

    pipeline.run(POD5_DIR, W())
    out = {}
    for rec in sorted(records, key=lambda r: r.qname):
        mv = next(t for t in rec.tags if t.tag == "mv")
        out[rec.qname] = {
            "seq": rec.seq,
            "qual_sha1": hashlib.sha1(rec.qual.encode()).hexdigest(),
            "moves_sha1": hashlib.sha1(
                np.asarray(mv.value, dtype=np.uint8).tobytes()
            ).hexdigest(),
        }
    return out


def _generate():
    return {
        decoder: _run_fixture_calls(Path("/tmp/golden_model"), decoder)
        for decoder in ("viterbi", "beam")
    }


@pytest.mark.parametrize("decoder", ["viterbi", "beam"])
def test_golden_fixture_calls(decoder, tmp_path):
    if not GOLDEN_PATH.exists():
        pytest.skip("golden file missing; run `python tests/test_golden.py regenerate`")
    golden = json.loads(GOLDEN_PATH.read_text())[decoder]
    got = _run_fixture_calls(tmp_path, decoder)
    assert set(got) == set(golden)
    for read_id in golden:
        assert got[read_id]["seq"] == golden[read_id]["seq"], (
            f"{decoder}/{read_id}: sequence changed — numerics or pipeline "
            "regression (regenerate goldens only for intended changes)"
        )
        assert got[read_id]["qual_sha1"] == golden[read_id]["qual_sha1"]
        assert got[read_id]["moves_sha1"] == golden[read_id]["moves_sha1"]


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regenerate":
        import os

        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        jax.config.update("jax_platforms", "cpu")
        GOLDEN_PATH.parent.mkdir(parents=True, exist_ok=True)
        GOLDEN_PATH.write_text(json.dumps(_generate(), indent=1))
        print(f"wrote {GOLDEN_PATH}")
