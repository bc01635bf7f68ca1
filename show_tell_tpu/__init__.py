"""show_tell_tpu — a TPU-native (JAX/XLA/Pallas/pjit) image-captioning framework.

A ground-up rebuild of the capabilities of guptakhil/show-tell (PyTorch
"Show and Tell", Vinyals et al. 2015): CNN-encoder -> RNN-decoder captioning
on MS-COCO, with GRU / LSTM / soft-attention decoder families, greedy and
beam decoding, BLEU/CIDEr/ROUGE evaluation, and a training loop with
checkpoint/resume — redesigned TPU-first:

  * all compute paths are jit-compiled XLA programs with static shapes;
  * recurrence runs as `lax.scan` (and optionally fused Pallas kernels),
    never Python-level time loops;
  * variable-length captions are handled with validity masks instead of
    torch's pack_padded_sequence;
  * batch ("data") parallelism is expressed with `jax.sharding.Mesh` +
    NamedSharding so the same train/decode step runs on 1 chip or a pod
    slice, with XLA inserting ICI collectives.

Layout (see SURVEY.md for the reference layer map this mirrors):
  core/        config system (config.json + argparse parity)
  vocab/       tokenizer + DatasetVocabulary (reference vocab_builder.py)
  data/        COCO JSON parsing, dataset, batching, device preprocessing
  models/      ResNet encoders, GRU/LSTM/attention decoders, torch converters
  ops/         Pallas TPU kernels for the hot paths
  decode/      greedy + batched beam search
  train/       train step, optimizers (torch-parity), checkpointing
  parallel/    device mesh + sharding rules
  evaluation/  BLEU / CIDEr / ROUGE-L scorers + test_model flow
  cli/         entry points mirroring main.py / main_lstm.py / main_attn*.py
"""

__version__ = "0.2.0"
