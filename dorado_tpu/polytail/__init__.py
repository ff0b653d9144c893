from dorado_tpu.polytail.calculator import (
    DNAPolyTailCalculator,
    PolyTailConfig,
    RNAPolyTailCalculator,
    load_poly_tail_config,
    load_poly_tail_configs,
    make_calculator,
)

__all__ = [
    "DNAPolyTailCalculator",
    "PolyTailConfig",
    "RNAPolyTailCalculator",
    "load_poly_tail_config",
    "load_poly_tail_configs",
    "make_calculator",
]
