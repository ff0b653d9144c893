from dorado_tpu.demux.barcoder import (
    BarcodeClassifier,
    BarcodeScoreResult,
    add_custom_barcodes,
    get_barcode_sequence,
    get_kit_info,
    list_kits,
    normalize_barcode_name,
)

from dorado_tpu.demux.custom_kit import (
    parse_custom_arrangement,
    parse_custom_sequences,
)

__all__ = [
    "BarcodeClassifier",
    "BarcodeScoreResult",
    "add_custom_barcodes",
    "parse_custom_arrangement",
    "parse_custom_sequences",
    "get_barcode_sequence",
    "get_kit_info",
    "list_kits",
    "normalize_barcode_name",
]
