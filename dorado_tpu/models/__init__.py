from dorado_tpu.models.crf_model import (
    init_lstm_crf_params,
    lstm_crf_forward,
    make_crf_forward_fn,
)

__all__ = [
    "init_lstm_crf_params",
    "lstm_crf_forward",
    "make_crf_forward_fn",
]
