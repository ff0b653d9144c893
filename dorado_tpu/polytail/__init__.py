from dorado_tpu.polytail.calculator import (
    DNAPolyTailCalculator,
    PolyTailConfig,
    RNAPolyTailCalculator,
    load_poly_tail_config,
    make_calculator,
)

__all__ = [
    "DNAPolyTailCalculator",
    "PolyTailConfig",
    "RNAPolyTailCalculator",
    "load_poly_tail_config",
    "make_calculator",
]
