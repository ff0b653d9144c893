from pathlib import Path

import pytest

from dorado_tpu.config import (
    Activation,
    BatchParams,
    SampleType,
    ScalingStrategy,
    is_tx_model_config,
    load_model_config,
)


class TestHacV43Config:
    @pytest.fixture(scope="class")
    def cfg(self, reference_model_configs: Path):
        return load_model_config(
            reference_model_configs / "dna_r10.4.1_e8.2_400bps_hac@v4.3.0"
        )

    def test_structure(self, cfg):
        assert cfg.is_lstm_model and not cfg.is_tx_model and not cfg.is_flstm_model
        assert len(cfg.convs) == 3
        assert [c.size for c in cfg.convs] == [16, 16, 384]
        assert [c.stride for c in cfg.convs] == [1, 1, 6]
        assert [c.winlen for c in cfg.convs] == [5, 5, 19]
        assert cfg.convs[2].activation is Activation.TANH
        assert cfg.stride == 6
        assert cfg.lstm_size == 384
        assert cfg.lstm_layers == 5
        assert cfg.bias is False

    def test_crf(self, cfg):
        assert cfg.state_len == 4
        assert cfg.outsize == 4**5 == 1024
        assert cfg.num_states == 256
        assert cfg.blank_score == 2.0
        assert cfg.clamp is True

    def test_scaling(self, cfg):
        assert cfg.signal_norm_params.strategy is ScalingStrategy.PA
        assert cfg.signal_norm_params.standardisation.standardise
        assert cfg.signal_norm_params.standardisation.mean == pytest.approx(91.88)
        assert cfg.signal_norm_params.standardisation.stdev == pytest.approx(22.65)

    def test_qscore(self, cfg):
        assert cfg.qscale == pytest.approx(1.1)
        assert cfg.qbias == pytest.approx(-1.1)

    def test_metadata(self, cfg):
        assert cfg.sample_rate == 5000
        assert cfg.sample_type is SampleType.DNA
        assert not cfg.is_rna_model

    def test_normalised_params(self, cfg):
        cfg.normalise_basecaller_params()
        # default chunksize 10000 -> multiple of stride 6
        assert cfg.basecaller.chunk_size == 9996
        assert cfg.basecaller.overlap == 498
        assert cfg.has_normalised_basecaller_params()


class TestSupV5Config:
    @pytest.fixture(scope="class")
    def cfg(self, reference_model_configs: Path):
        return load_model_config(
            reference_model_configs / "dna_r10.4.1_e8.2_400bps_sup@v5.0.0"
        )

    def test_is_tx(self, cfg, reference_model_configs):
        assert cfg.is_tx_model
        assert is_tx_model_config(
            reference_model_configs / "dna_r10.4.1_e8.2_400bps_sup@v5.0.0"
        )
        assert not is_tx_model_config(
            reference_model_configs / "dna_r10.4.1_e8.2_400bps_hac@v4.3.0"
        )

    def test_convs(self, cfg):
        assert [c.size for c in cfg.convs] == [64, 64, 128, 128, 512]
        assert [c.stride for c in cfg.convs] == [1, 1, 3, 2, 2]
        # conv stride 12, upsample x2 -> overall stride 6
        assert cfg.stride == 6
        assert cfg.stride_inner == 12
        assert cfg.scale_factor == 2

    def test_tx_params(self, cfg):
        tx = cfg.tx.tx
        assert tx.depth == 18
        assert tx.d_model == 512
        assert tx.nhead == 8
        assert tx.dim_feedforward == 2048
        assert tx.attn_window == (127, 128)
        assert tx.deepnorm_alpha == pytest.approx(2.4494897)

    def test_crf(self, cfg):
        assert cfg.state_len == 5
        assert cfg.outsize == 4**6 == 4096
        assert cfg.out_features == 4096
        assert cfg.tx.crf.scale == 5.0
        assert cfg.blank_score == 0.0  # stored on tx.crf for tx models
        assert cfg.tx.crf.blank_score == 2.0

    def test_basecaller_params(self, cfg):
        # model config overrides chunksize/overlap
        assert cfg.basecaller.chunk_size == 12288
        assert cfg.basecaller.overlap == 600
        assert cfg.chunk_size_granularity == 12 * 16
        cfg.normalise_basecaller_params()
        assert cfg.basecaller.chunk_size % cfg.chunk_size_granularity == 0
        assert cfg.basecaller.overlap % cfg.stride_inner == 0


class TestFastV4Config:
    def test_fast(self, reference_model_configs: Path):
        cfg = load_model_config(
            reference_model_configs / "dna_r10.4.1_e8.2_260bps_fast@v4.0.0"
        )
        assert cfg.is_lstm_model
        assert cfg.lstm_size == 96
        assert cfg.stride == 5
        assert cfg.state_len == 3
        assert cfg.outsize == 256


class TestPreV4Config:
    def test_r9_hac(self, reference_model_configs: Path):
        cfg = load_model_config(reference_model_configs / "dna_r9.4.1_e8_hac@v3.3")
        assert cfg.is_lstm_model
        assert len(cfg.convs) == 3
        # pre-v4: implied conv stack with bias+scale on the CRF output
        assert cfg.scale != 1.0 or cfg.bias


class TestRnaConfig:
    def test_rna004(self, reference_model_configs: Path):
        cfg = load_model_config(reference_model_configs / "rna004_130bps_sup@v3.0.1")
        assert cfg.sample_type is SampleType.RNA004
        assert cfg.is_rna_model


class TestBatchParams:
    def test_normalise(self):
        p = BatchParams(chunk_size=10000, overlap=500, batch_size=0)
        p.normalise(6, 6)
        assert p.chunk_size == 9996
        assert p.overlap == 498

    def test_normalise_min_chunk(self):
        p = BatchParams(chunk_size=100, overlap=500, batch_size=0)
        p.normalise(192, 12)
        assert p.overlap == 492
        assert p.chunk_size >= p.overlap
        assert p.chunk_size % 192 == 0


class TestAllReferenceConfigs:
    def test_every_checked_in_config_parses(self, reference_model_configs):
        """Every config in the reference's tests/data/model_configs must
        load (the reference's BasecallModelConfigTest.cpp sweep)."""
        import tomllib

        from dorado_tpu.config import load_model_config
        from dorado_tpu.modbase.config import load_modbase_config

        dirs = sorted(
            d for d in reference_model_configs.iterdir()
            if (d / "config.toml").exists()
        )
        assert len(dirs) >= 15
        for d in dirs:
            with open(d / "config.toml", "rb") as fh:
                raw = tomllib.load(fh)
            if "modbases" in raw:  # modbase model dirs
                mcfg = load_modbase_config(d)
                assert mcfg.kmer_len > 0, d.name
                continue
            cfg = load_model_config(d)
            assert cfg.stride > 0, d.name
            assert cfg.num_states > 0, d.name
            assert cfg.outsize > 0, d.name
            if "sup@v5" in d.name and "rna" not in d.name and "sample" not in d.name:
                assert cfg.is_tx_model, d.name
