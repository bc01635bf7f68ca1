from show_tell_tpu.native.fastimage import (
    decode_resize,
    decode_resize_batch,
    is_available,
)

__all__ = ["decode_resize", "decode_resize_batch", "is_available"]
