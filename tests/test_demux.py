"""Barcode demux tests: kit tables, synthetic-read classification accuracy,
rejection heuristics, mid-strand detection."""

import numpy as np
import pytest

from dorado_tpu.demux import (
    BarcodeClassifier,
    get_barcode_sequence,
    get_kit_info,
    list_kits,
    normalize_barcode_name,
)
from dorado_tpu.utils import reverse_complement


def _random_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


def _mutate(rng, seq, rate):
    out = []
    for c in seq:
        r = rng.rand()
        if r < rate / 3:
            out.append(rng.choice([b for b in "ACGT" if b != c]))
        elif r < 2 * rate / 3:
            continue  # deletion
        elif r < rate:
            out.append(c)
            out.append(rng.choice(list("ACGT")))
        else:
            out.append(c)
    return "".join(out)


def _make_barcoded_read(rng, kit_name, barcode_name, insert_len=600, error=0.0):
    """Synthetic read: front flank+barcode+rear flank + insert (+ rear context
    for double-ended kits)."""
    info = get_kit_info(kit_name)
    bc = get_barcode_sequence(barcode_name)
    front = info["top_front_flank"] + bc + info["top_rear_flank"]
    insert = _random_seq(rng, insert_len)
    read = front + insert
    if info["double_ends"]:
        rear = reverse_complement(front)
        read = read + rear
    lead = _random_seq(rng, 20)
    read = lead + read + _random_seq(rng, 10)
    if error > 0:
        read = _mutate(rng, read, error)
    return read


class TestKitTables:
    def test_kit_count(self):
        # 45 kits transcribed from utils/barcode_kits.cpp kit_info_map
        assert len(list_kits()) == 45

    def test_known_kits(self):
        for kit in ("SQK-NBD114-24", "SQK-RBK114-96", "SQK-16S024", "SQK-PCB114-24"):
            info = get_kit_info(kit)
            assert info is not None
            assert info["barcodes"]
            for b in info["barcodes"]:
                assert len(get_barcode_sequence(b)) > 0

    def test_normalize(self):
        assert normalize_barcode_name("BC01") == "barcode01"
        assert normalize_barcode_name("NB24") == "barcode24"
        assert normalize_barcode_name("BC96") == "barcode96"


class TestClassifier:
    @pytest.mark.parametrize("kit", ["SQK-NBD114-24", "SQK-RBK114-24"])
    def test_perfect_reads(self, kit):
        rng = np.random.RandomState(0)
        classifier = BarcodeClassifier(kit)
        info = get_kit_info(kit)
        for name in info["barcodes"][:6]:
            read = _make_barcoded_read(rng, kit, name)
            res = classifier.classify(read)
            assert res.barcode_name == name, f"{kit}/{name} -> {res.barcode_name}"

    def test_noisy_reads(self):
        kit = "SQK-NBD114-24"
        rng = np.random.RandomState(1)
        classifier = BarcodeClassifier(kit)
        info = get_kit_info(kit)
        correct = 0
        total = 0
        for name in info["barcodes"][:8]:
            for _ in range(2):
                read = _make_barcoded_read(rng, kit, name, error=0.05)
                res = classifier.classify(read)
                total += 1
                if res.barcode_name == name:
                    correct += 1
        assert correct / total >= 0.8

    def test_unbarcoded_read_unclassified(self):
        rng = np.random.RandomState(2)
        classifier = BarcodeClassifier("SQK-NBD114-24")
        n_unclassified = 0
        for _ in range(5):
            res = classifier.classify(_random_seq(rng, 800))
            if res.barcode_name == "unclassified":
                n_unclassified += 1
        assert n_unclassified >= 4

    def test_allowed_barcodes_filter(self):
        rng = np.random.RandomState(3)
        kit = "SQK-NBD114-24"
        classifier = BarcodeClassifier(kit, allowed_barcodes={"barcode03"})
        read = _make_barcoded_read(rng, kit, "NB03")
        assert classifier.classify(read).barcode_name == "NB03"
        read7 = _make_barcoded_read(rng, kit, "NB07")
        assert classifier.classify(read7).barcode_name == "unclassified"

    def test_midstrand_detection(self):
        rng = np.random.RandomState(4)
        kit = "SQK-NBD114-24"
        classifier = BarcodeClassifier(kit)
        info = get_kit_info(kit)
        bc = get_barcode_sequence("NB05")
        context = info["top_front_flank"] + bc + info["top_rear_flank"]
        # barcode context buried mid-read between long inserts
        read = _random_seq(rng, 400) + context + _random_seq(rng, 400)
        res = classifier.classify(read)
        assert res.found_midstrand
        assert res.barcode_name == "unclassified"

    def test_rear_only_kit(self):
        rng = np.random.RandomState(5)
        kit = "SQK-DRB004-24"  # rear_only_barcodes kit
        info = get_kit_info(kit)
        assert info["rear_only_barcodes"]
        classifier = BarcodeClassifier(kit)
        name = info["barcodes"][2]
        bc = get_barcode_sequence(name)
        context = info["top_front_flank"] + bc + info["top_rear_flank"]
        read = _random_seq(rng, 700) + context + _random_seq(rng, 15)
        res = classifier.classify(read)
        assert res.barcode_name == name
