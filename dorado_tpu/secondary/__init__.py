from dorado_tpu.secondary.model import gru_forward, init_gru_params
from dorado_tpu.secondary.pileup import PileupResult, build_pileup
from dorado_tpu.secondary.polish import PolishPipeline

__all__ = [
    "PileupResult",
    "build_pileup",
    "gru_forward",
    "init_gru_params",
    "PolishPipeline",
]
