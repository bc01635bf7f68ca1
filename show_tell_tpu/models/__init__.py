from show_tell_tpu.models import (  # noqa: F401
    attention,
    captioner,
    convert,
    decoder,
    encoder,
    resnet,
    rnn_cells,
    serving,
)
