from dorado_tpu.demux.barcoder import (
    BarcodeClassifier,
    BarcodeScoreResult,
    get_barcode_sequence,
    get_kit_info,
    list_kits,
    normalize_barcode_name,
)

__all__ = [
    "BarcodeClassifier",
    "BarcodeScoreResult",
    "get_barcode_sequence",
    "get_kit_info",
    "list_kits",
    "normalize_barcode_name",
]
