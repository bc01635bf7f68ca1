"""Bit-faithful reproduction of the reference's in-class beam search
(rnn.py:60-108) for parity runs (--faithful_beam, batch=1, GRU only).

The reference beam has three quirks (SURVEY.md §3.3) that this module
reproduces deliberately — they are *behavior*, not bugs to fix here:
  1. candidates are ranked by the LAST-STEP RAW LOGIT only, not the
     cumulative log-probability (rnn.py:102-103);
  2. a single shared hidden state is overwritten inside the beam loop —
     beam k consumes the state left by beam k-1 (rnn.py:87);
  3. <end> never retires a hypothesis.

The standard implementation lives in ``decode/beam.py``; this one is a
host-driven loop (the reference syncs to host every step anyway).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from show_tell_tpu.models.decoder import DecoderConfig
from show_tell_tpu.models.rnn_cells import init_state, stack_step_gru


@jax.jit
def _gru_step(params: Dict[str, Any], x: jax.Array, hs: jax.Array):
    top, hs2 = stack_step_gru(params["rnn"], x, hs)
    logits = jnp.dot(top, params["linear"]["w"], preferred_element_type=jnp.float32) + params["linear"]["b"]
    return logits, hs2


def faithful_beam_decode(
    params: Dict[str, Any],
    cfg: DecoderConfig,
    cnn_feature: jax.Array,  # [1, E]
    beam_size: int,
) -> np.ndarray:
    """Returns token ids [25] (batch of one, like rnn.py:106-108)."""
    if cfg.cell_type != "gru":
        raise ValueError("faithful beam exists only for the GRU model (reference rnn.py)")
    assert cnn_feature.shape[0] == 1, "reference beam works only with batch_size=1 (main.py:81-82)"
    K = beam_size
    T = cfg.max_caption_length

    hs = init_state("gru", cfg.num_layers, 1, cfg.hidden_dim, cnn_feature.dtype)
    logits, hs = _gru_step(params, cnn_feature, hs)
    logits = np.asarray(logits)[0]
    top0 = np.argsort(-logits)[:K]

    beam_words = [int(w) for w in top0]
    beam_sents = [[int(w)] for w in top0]

    idx = 1
    while idx < T:
        idx += 1
        cand_sents, cand_words, cand_probs = [], [], []
        for k in range(K):
            x = params["embedding"][jnp.asarray([beam_words[k]])]
            lg, hs = _gru_step(params, x, hs)  # shared hidden state (quirk 2)
            lg = np.asarray(lg)[0]
            topj = np.argsort(-lg)[:K]
            for j in topj:
                cand_sents.append(beam_sents[k] + [int(j)])
                cand_words.append(int(j))
                cand_probs.append(float(lg[j]))  # raw last-step logit (quirk 1)
        order = sorted(range(len(cand_probs)), key=lambda i: -cand_probs[i])[:K]
        beam_sents = [cand_sents[i] for i in order]
        beam_words = [cand_words[i] for i in order]

    return np.asarray(beam_sents[0], dtype=np.int32)
