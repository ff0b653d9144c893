from dorado_tpu.decode.common import DecodedChunk, DecoderOptions, generate_sequence
from dorado_tpu.decode.beam_search import beam_search, beam_search_decode

__all__ = [
    "DecodedChunk",
    "DecoderOptions",
    "beam_search",
    "beam_search_decode",
    "generate_sequence",
]
