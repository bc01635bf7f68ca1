from show_tell_tpu.decode.beam import beam_search_decode
from show_tell_tpu.decode.faithful_beam import faithful_beam_decode

__all__ = ["beam_search_decode", "faithful_beam_decode"]
