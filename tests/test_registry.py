"""Model registry tests: inventory counts, chemistry detection, model-complex
grammar, and selection — checked against facts in the reference tables
(dorado/models/models.cpp, kits.cpp, model_complex.cpp)."""

import pytest

from dorado_tpu.models.registry import (
    all_models,
    get_chemistry,
    get_model_info,
    list_models,
    modified_models,
    mods_variants,
    parse_model_complex,
    resolve_mods_models,
    resolve_simplex_model,
    resolve_stereo_model,
    simplex_models,
)


class TestInventory:
    def test_total_count(self):
        # 180 released models in the reference registry (models.cpp:213-1735)
        assert len(all_models()) == 180

    def test_sections(self):
        assert len(simplex_models()) == 52
        assert len(modified_models()) == 109

    def test_known_model(self):
        info = get_model_info("dna_r10.4.1_e8.2_400bps_hac@v4.3.0")
        assert info is not None
        assert info.chemistry == "DNA_R10_4_1_E8_2_400BPS_5KHZ"
        assert info.variant == "HAC"
        assert len(info.checksum) == 64

    def test_names_unique(self):
        names = list_models()
        assert len(names) == len(set(names))


class TestChemistry:
    def test_kit14_5khz(self):
        assert (
            get_chemistry("FLO-PRO114M", "SQK-LSK114", 5000)
            == "DNA_R10_4_1_E8_2_400BPS_5KHZ"
        )

    def test_kit14_4khz(self):
        assert (
            get_chemistry("FLO-MIN114", "SQK-LSK114", 4000)
            == "DNA_R10_4_1_E8_2_400BPS_4KHZ"
        )

    def test_260bps(self):
        assert (
            get_chemistry("FLO-PRO114", "SQK-NBD114-96-260", 4000)
            == "DNA_R10_4_1_E8_2_260BPS"
        )

    def test_rna004(self):
        assert get_chemistry("FLO-PRO004RA", "SQK-RNA004", 4000) == "RNA004_130BPS"

    def test_unknown(self):
        assert get_chemistry("FLO-XXX", "SQK-YYY", 1234) is None


class TestModelComplex:
    def test_variant_simple(self):
        mc = parse_model_complex("hac")
        assert mc.style == "variant"
        assert mc.simplex_variant == "HAC"
        assert mc.simplex_version is None

    def test_variant_with_version(self):
        mc = parse_model_complex("sup@v4.3.0")
        assert mc.simplex_variant == "SUP"
        assert mc.simplex_version == "v4_3_0"

    def test_variant_latest(self):
        mc = parse_model_complex("fast@latest")
        assert mc.simplex_version is None

    def test_variant_with_mods(self):
        mc = parse_model_complex("hac@v4.3.0,5mCG_5hmCG@v1")
        assert mc.mods == [("5mCG_5hmCG", "v1_0_0")]

    def test_named(self):
        mc = parse_model_complex("dna_r10.4.1_e8.2_400bps_hac@v4.3.0")
        assert mc.style == "named"
        assert mc.named_simplex.name == "dna_r10.4.1_e8.2_400bps_hac@v4.3.0"

    def test_named_modbase_pulls_parent(self):
        mc = parse_model_complex("dna_r10.4.1_e8.2_400bps_hac@v4.3.0_5mCG_5hmCG@v1")
        assert mc.style == "named"
        assert mc.named_simplex.variant == "HAC"
        assert len(mc.named_mods) == 1

    def test_path_fallthrough(self):
        mc = parse_model_complex("/some/model/dir")
        assert mc.is_path

    def test_bad_mod_raises(self):
        with pytest.raises(ValueError, match="unknown modification"):
            parse_model_complex("hac,notamod")


class TestResolution:
    def test_latest_hac_5khz(self):
        info = resolve_simplex_model("DNA_R10_4_1_E8_2_400BPS_5KHZ", "HAC")
        assert info.variant == "HAC"
        # latest hac for 5khz in the reference registry is v5.x
        assert info.version_tuple >= (4, 3, 0)

    def test_exact_version(self):
        info = resolve_simplex_model("DNA_R10_4_1_E8_2_400BPS_5KHZ", "HAC", "v4_3_0")
        assert info.name == "dna_r10.4.1_e8.2_400bps_hac@v4.3.0"

    def test_mods_resolution(self):
        simplex = resolve_simplex_model("DNA_R10_4_1_E8_2_400BPS_5KHZ", "HAC", "v4_3_0")
        mods = resolve_mods_models(simplex, [("5mCG_5hmCG", None)])
        assert len(mods) == 1
        assert mods[0].mods_name == "5mCG_5hmCG"
        assert mods[0].variant == "HAC"

    def test_stereo(self):
        info = resolve_stereo_model("DNA_R10_4_1_E8_2_400BPS_5KHZ")
        assert "stereo" in info.name

    def test_mods_variants_nonempty(self):
        assert "5mCG_5hmCG" in mods_variants()

    def test_missing_raises(self):
        with pytest.raises(ValueError):
            resolve_simplex_model("RNA004_130BPS", "HAC", "v0_0_1")
