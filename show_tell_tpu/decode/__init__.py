from show_tell_tpu.decode.beam import attn_beam_search_decode, beam_search_decode
from show_tell_tpu.decode.faithful_beam import faithful_beam_decode
from show_tell_tpu.decode.generic import beam_search

__all__ = [
    "attn_beam_search_decode",
    "beam_search",
    "beam_search_decode",
    "faithful_beam_decode",
]
