from dorado_tpu.correct.corrector import ReadCorrector

__all__ = ["ReadCorrector"]
