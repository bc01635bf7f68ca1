"""Batched top-k beam search as one compiled scan.

The mathematically standard semantics of the reference's *standalone*
beam_search.py:45-97 (cumulative log-probabilities, per-hypothesis state,
<end> retirement) — which the reference documents but never wires in —
vectorized the TPU way: beams live in the batch dimension ([B*K] rows
through the same fused decode step as greedy), each step does one
log-softmax + top-k over k*V candidates per image, and hypothesis states
are gathered with a batched index select.  No host sync inside the loop
(the reference's in-class beam, rnn.py:60-108, syncs every step and only
supports batch=1; its quirks are reproduced separately in
``faithful_beam.py`` behind --faithful_beam).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from show_tell_tpu.models.decoder import DecoderConfig
from show_tell_tpu.models.rnn_cells import init_state, stack_step

NEG_INF = -1e9


def beam_search_decode(
    params: Dict[str, Any],
    cfg: DecoderConfig,
    cnn_feature: jax.Array,  # [B, E]
    beam_size: int,
    end_token: int = 2,
    pad_token: int = 0,
) -> jax.Array:
    """Returns best-hypothesis token ids [B, max_caption_length].

    Finished beams (emitted <end>) are retired: they extend only with
    <pad> at zero cost, so their cumulative score freezes and they keep
    competing in the top-k (beam_search.py:72-76 semantics).
    """
    B, E = cnn_feature.shape
    K, V, T = beam_size, cfg.vocab_size, cfg.max_caption_length
    step_fn = stack_step(cfg.cell_type)

    def project(top):
        return jnp.dot(top, params["linear"]["w"], preferred_element_type=jnp.float32) + params["linear"]["b"]

    # ---- step 0: image feature in, top-K tokens out ----
    state0 = init_state(cfg.cell_type, cfg.num_layers, B, cfg.hidden_dim, cnn_feature.dtype)
    top, state1 = step_fn(params["rnn"], cnn_feature, state0)
    logp0 = jax.nn.log_softmax(project(top), axis=-1)  # [B, V]
    scores, toks0 = jax.lax.top_k(logp0, K)  # [B, K]

    # Broadcast state across beams: [L, B, H] -> [L, B*K, H].
    def tile_state(s):
        return jnp.repeat(s, K, axis=1)

    state = jax.tree.map(tile_state, state1)
    finished = toks0 == end_token  # [B, K]
    tokens0 = toks0.reshape(B * K)

    def gather_state(s, parent):  # s: [L, B*K, H], parent: [B, K]
        sk = s.reshape(s.shape[0], B, K, -1)
        sk = jnp.take_along_axis(sk, parent[None, :, :, None], axis=2)
        return sk.reshape(s.shape[0], B * K, -1)

    def body(carry, _):
        tokens, state, scores, finished = carry
        x = params["embedding"][tokens]  # [B*K, E]
        top, state2 = step_fn(params["rnn"], x, state)
        logp = jax.nn.log_softmax(project(top), axis=-1).reshape(B, K, V)

        # Retired beams: only <pad> continues, at zero cost.
        pad_only = jnp.full((V,), NEG_INF).at[pad_token].set(0.0)
        logp = jnp.where(finished[..., None], pad_only[None, None, :], logp)

        cand = scores[..., None] + logp  # [B, K, V]
        flat = cand.reshape(B, K * V)
        new_scores, idx = jax.lax.top_k(flat, K)  # [B, K]
        parent = idx // V  # [B, K]
        new_tok = idx % V  # [B, K]

        state3 = jax.tree.map(lambda s: gather_state(s, parent), state2)
        new_finished = jnp.take_along_axis(finished, parent, axis=1) | (new_tok == end_token)
        return (new_tok.reshape(B * K), state3, new_scores, new_finished), (parent, new_tok)

    init = (tokens0, state, scores, finished)
    (_, _, final_scores, _), (parents, toks) = jax.lax.scan(body, init, None, length=T - 1)

    # ---- backtrack on device: follow parent pointers from the best beam ----
    best = jnp.argmax(final_scores, axis=1)  # [B]

    def back(carry, pt):
        beam = carry  # [B]
        parent_t, tok_t = pt  # [B, K] each
        tok = jnp.take_along_axis(tok_t, beam[:, None], axis=1)[:, 0]
        beam = jnp.take_along_axis(parent_t, beam[:, None], axis=1)[:, 0]
        return beam, tok

    beam_final, rev_toks = jax.lax.scan(back, best, (parents, toks), reverse=True)
    first = jnp.take_along_axis(toks0, beam_final[:, None], axis=1)  # [B, 1]
    return jnp.concatenate([first, jnp.swapaxes(rev_toks, 0, 1)], axis=1)  # [B, T]
