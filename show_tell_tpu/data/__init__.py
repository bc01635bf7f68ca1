from show_tell_tpu.data.coco import CocoCaptions
from show_tell_tpu.data.dataset import MSCOCO, create_batch, get_data_loader

__all__ = ["CocoCaptions", "MSCOCO", "create_batch", "get_data_loader"]
