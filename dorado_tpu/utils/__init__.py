from dorado_tpu.utils.sequence import (
    find_rna_polya,
    mean_qscore_from_qstring,
    reverse_complement,
)

__all__ = [
    "find_rna_polya",
    "mean_qscore_from_qstring",
    "reverse_complement",
]
