from show_tell_tpu.models import rnn_cells, decoder, resnet, encoder, attention, convert  # noqa: F401
