from dorado_tpu.polytail.calculator import (
    DNAPolyTailCalculator,
    PolyTailConfig,
    RNAPolyTailCalculator,
    make_calculator,
)

__all__ = [
    "DNAPolyTailCalculator",
    "PolyTailConfig",
    "RNAPolyTailCalculator",
    "make_calculator",
]
