from dorado_tpu.signal.chunk import generate_chunks, generate_variable_chunks
from dorado_tpu.signal.scaling import Scaler, ScalingResult
from dorado_tpu.signal.stitch import CalledChunk, stitch_chunks

__all__ = [
    "CalledChunk",
    "Scaler",
    "ScalingResult",
    "generate_chunks",
    "generate_variable_chunks",
    "stitch_chunks",
]
