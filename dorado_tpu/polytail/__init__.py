from dorado_tpu.polytail.calculator import (
    DNAPolyTailCalculator,
    PolyTailCalculatorSelector,
    PolyTailConfig,
    RNAPolyTailCalculator,
    load_poly_tail_config,
    load_poly_tail_configs,
    make_calculator,
)

__all__ = [
    "DNAPolyTailCalculator",
    "PolyTailCalculatorSelector",
    "PolyTailConfig",
    "RNAPolyTailCalculator",
    "load_poly_tail_config",
    "load_poly_tail_configs",
    "make_calculator",
]
