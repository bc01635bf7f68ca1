from show_tell_tpu.core.config import (
    DEFAULT_CONFIG,
    ATTN_LSTM_CONFIG,
    build_arg_parser,
    load_params,
)

__all__ = [
    "DEFAULT_CONFIG",
    "ATTN_LSTM_CONFIG",
    "build_arg_parser",
    "load_params",
]
