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

A shared engine (`_beam_engine`) drives both decoder families:
  * ``beam_search_decode`` — GRU/LSTM captioners (step 0 consumes the
    image feature, rnn.py:41);
  * ``attn_beam_search_decode`` — soft-attention decoders (step 0
    consumes <start>; attention context recomputed per hypothesis).
    The reference has no attention beam (greedy only) — this is a
    framework extension.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from show_tell_tpu.models.attention import (
    AttnDecoderConfig,
    _init_hidden,
    _last_h,
    _linear,
    attention_net_hoisted,
)
from show_tell_tpu.models.decoder import DecoderConfig
from show_tell_tpu.models.rnn_cells import init_state, stack_step

NEG_INF = -1e9


def _beam_engine(
    logp0: jax.Array,  # [B, V] log-probs after the first step
    state1: Any,  # per-image state after the first step (leaves [.., B, ..])
    step_fn: Callable,  # (tokens [B*K], state_k) -> (logp [B*K, V], state_k')
    tile_state: Callable,  # state (B rows) -> state (B*K rows)
    gather_state: Callable,  # (state_k, parent [B, K]) -> state_k reordered
    K: int,
    T: int,
    end_token: int,
    pad_token: int,
    sparse: bool = False,
    early_exit: bool = False,
) -> jax.Array:
    """Generic batched beam over a first-step distribution + step fn.
    Returns best-hypothesis token ids [B, T].

    sparse=True: step_fn returns each row's top-K candidates as
    (cand_logp [B*K, K], cand_ids [B*K, K]) instead of the dense
    [B*K, V] distribution (the fused projection+top-k Pallas kernel,
    ops/vocab_pallas.project_topk_pallas).  Mathematically identical:
    the global top-K over K rows is contained in the union of the rows'
    top-Ks, so reducing [B, K*K] candidates == reducing [B, K*V].

    early_exit=True: run the step body under ``lax.while_loop`` and stop
    once every beam of every image has retired.  BIT-IDENTICAL ids: once
    all beams are finished, each further scan step provably emits
    (parent=identity, token=<pad>) and leaves scores unchanged — the
    per-row candidate set collapses to the sorted scores themselves, and
    ``top_k``'s stable tie rule returns them in place — so prefilling
    the trajectory buffers with exactly that makes the skipped tail a
    no-op for backtracking."""
    B, V = logp0.shape
    scores, toks0 = jax.lax.top_k(logp0, K)  # [B, K]
    state = tile_state(state1)
    finished = toks0 == end_token
    tokens0 = toks0.reshape(B * K)

    def body(carry, _):
        tokens, state, scores, finished = carry
        logp, state2 = step_fn(tokens, state)

        if sparse:
            clogp, cids = logp  # [B*K, K] each
            Kc = clogp.shape[1]
            clogp = clogp.reshape(B, K, Kc)
            cids = cids.reshape(B, K, Kc)
            # Retired beams: only <pad> continues, at zero cost
            # (beam_search.py:72-76 end-token retirement semantics).
            pad_logp = jnp.where(jnp.arange(Kc) == 0, 0.0, NEG_INF)
            clogp = jnp.where(finished[..., None], pad_logp[None, None, :], clogp)
            cids = jnp.where(finished[..., None], pad_token, cids)
            cand = scores[..., None] + clogp  # [B, K, Kc]
            new_scores, idx = jax.lax.top_k(cand.reshape(B, K * Kc), K)
            parent = idx // Kc  # [B, K]
            new_tok = jnp.take_along_axis(cids.reshape(B, K * Kc), idx, axis=1)
        else:
            logp = logp.reshape(B, K, V)

            # Retired beams: only <pad> continues, at zero cost
            # (beam_search.py:72-76 end-token retirement semantics).
            pad_only = jnp.full((V,), NEG_INF).at[pad_token].set(0.0)
            logp = jnp.where(finished[..., None], pad_only[None, None, :], logp)

            cand = scores[..., None] + logp  # [B, K, V]
            new_scores, idx = jax.lax.top_k(cand.reshape(B, K * V), K)
            parent = idx // V  # [B, K]
            new_tok = idx % V

        state3 = gather_state(state2, parent)
        new_finished = jnp.take_along_axis(finished, parent, axis=1) | (new_tok == end_token)
        return (new_tok.reshape(B * K), state3, new_scores, new_finished), (parent, new_tok)

    init = (tokens0, state, scores, finished)
    if not early_exit:
        (_, _, final_scores, _), (parents, toks) = jax.lax.scan(body, init, None, length=T - 1)
    else:
        parents_buf = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), (T - 1, B, K))
        toks_buf = jnp.full((T - 1, B, K), pad_token, jnp.int32)

        def cond(c):
            i, carry, _, _ = c
            return (i < T - 1) & ~jnp.all(carry[3])

        def step(c):
            i, carry, parents, toks = c
            carry2, (p, t) = body(carry, None)
            parents = jax.lax.dynamic_update_index_in_dim(parents, p, i, 0)
            toks = jax.lax.dynamic_update_index_in_dim(toks, t, i, 0)
            return (i + 1, carry2, parents, toks)

        _, (_, _, final_scores, _), parents, toks = jax.lax.while_loop(
            cond, step, (jnp.int32(0), init, parents_buf, toks_buf)
        )

    # Backtrack on device: follow parent pointers from the best final beam.
    best = jnp.argmax(final_scores, axis=1)  # [B]

    def back(beam, pt):
        parent_t, tok_t = pt  # [B, K] each
        tok = jnp.take_along_axis(tok_t, beam[:, None], axis=1)[:, 0]
        beam = jnp.take_along_axis(parent_t, beam[:, None], axis=1)[:, 0]
        return beam, tok

    beam_final, toks_seq = jax.lax.scan(back, best, (parents, toks), reverse=True)
    first = jnp.take_along_axis(toks0, beam_final[:, None], axis=1)  # [B, 1]
    return jnp.concatenate([first, jnp.swapaxes(toks_seq, 0, 1)], axis=1)  # [B, T]


def _rnn_state_helpers(B: int, K: int):
    def tile(state):
        return jax.tree.map(lambda s: jnp.repeat(s, K, axis=1), state)

    def gather(state, parent):
        def g(s):  # s: [L, B*K, H]
            sk = s.reshape(s.shape[0], B, K, -1)
            sk = jnp.take_along_axis(sk, parent[None, :, :, None], axis=2)
            return sk.reshape(s.shape[0], B * K, -1)

        return jax.tree.map(g, state)

    return tile, gather


def _sparse_projection(params, beam_size, vocab_sharded=None):
    """The fused projection+top-k step for _beam_engine's sparse mode,
    or None when it must not run (non-TPU backend unless interpreting is
    fine, or an mp(vocab)-sharded projection — GSPMD's vocab-axis
    collectives need the dense XLA path).

    vocab_sharded: statically-known sharding of the projection weight.
    None = inspect params — correct for concrete arrays, but under a
    caller's jit trace the inspection conservatively reports sharded, so
    jitted callers must pass the flag computed on the concrete params
    (evaluation/tester.py does)."""
    if vocab_sharded is None:
        from show_tell_tpu.ops import vocab_projection_is_sharded

        vocab_sharded = vocab_projection_is_sharded(params["linear"])
    if vocab_sharded:
        return None
    from show_tell_tpu.ops.vocab_pallas import prepare_vocab, project_topk_pallas

    interpret = jax.default_backend() != "tpu"
    vocab = prepare_vocab(params["linear"])  # padded ONCE, outside the scan

    def proj(top):
        return project_topk_pallas(vocab, top, beam_size, interpret=interpret)

    return proj


def beam_search_decode(
    params: Dict[str, Any],
    cfg: DecoderConfig,
    cnn_feature: jax.Array,  # [B, E]
    beam_size: int,
    end_token: int = 2,
    pad_token: int = 0,
    use_pallas: "bool | None" = None,
    early_exit: bool = False,
    vocab_sharded: "bool | None" = None,
    fused_step: "str | None | bool" = None,
) -> jax.Array:
    """Beam over the GRU/LSTM captioner; step 0 consumes the image
    feature (rnn.py:41).  Returns [B, max_caption_length] ids.
    early_exit stops the decode loop once every beam retired
    (bit-identical ids, see _beam_engine).

    use_pallas: None = measured auto (ops.pallas_beam_default): route
    the per-step vocab projection through the fused projection+top-k
    kernel — the [B*K, V] logits and the K*V-wide XLA top_k collapse to
    [B*K, K] candidates.  Identical hypotheses (see _beam_engine).
    vocab_sharded: see _sparse_projection (jitted callers pass it).

    fused_step: fuse the L-layer recurrence INTO the projection — the
    beam analogue of the greedy fused decode step (the reference's
    rnn.py:60-108 hot loop in one Mosaic invocation per step,
    ops/fused_beam_pallas.py).  'dense' keeps XLA log_softmax+top_k on
    the kernel's [B*K, V] logits; 'topk' runs the shared per-block
    top-k inside the kernel ([B*K, K] candidates out).  None = measured
    auto (ops.pallas_beam_fused_default — 'dense' on TPU) when
    use_pallas is also auto; an EXPLICIT use_pallas=0/1 pins the whole
    kernel surface the pre-fused way unless fused_step is passed too.
    False = off.  Identical hypotheses every way (tested).  Takes
    precedence over the sparse projection kernel (it subsumes the
    projection); unavailable when the projection is mp(vocab)-sharded."""
    B, _ = cnn_feature.shape
    K, T = beam_size, cfg.max_caption_length
    step = stack_step(cfg.cell_type)

    def project(top):
        return jnp.dot(top, params["linear"]["w"], preferred_element_type=jnp.float32) + params["linear"]["b"]

    if use_pallas is None:
        from show_tell_tpu.ops import pallas_beam_default

        use_pallas = pallas_beam_default()
        if fused_step is None:
            from show_tell_tpu.ops import pallas_beam_fused_default

            fused_step = pallas_beam_fused_default()
    elif fused_step is None:
        # An explicit use_pallas=0/1 pins the WHOLE kernel surface the
        # pre-fused way (1 = the sparse projection kernel, 0 = pure XLA)
        # — --use_pallas 0 must really disable every Mosaic kernel.
        fused_step = False
    if fused_step:
        if vocab_sharded is None:
            from show_tell_tpu.ops import vocab_projection_is_sharded

            fused_ok = not vocab_projection_is_sharded(params["linear"])
        else:
            fused_ok = not vocab_sharded
        # Shape + VMEM envelope, shared with the greedy fused dispatch
        # (ops.fused_pooled_step_fits): E > H can't ride the stacked
        # weight stream; f32 parity shapes exceed the gate budget on a
        # real TPU.  Either way the XLA path is the correct fallback.
        from show_tell_tpu.ops import fused_pooled_step_fits

        if not fused_pooled_step_fits(
            cfg.cell_type, cfg.hidden_dim, params["embedding"].shape[1],
            params["embedding"].dtype, interpret=jax.default_backend() != "tpu",
        ):
            fused_ok = False
        if not fused_ok:
            fused_step = False  # GSPMD keeps the vocab-axis collectives (XLA path)

    state0 = init_state(cfg.cell_type, cfg.num_layers, B, cfg.hidden_dim, cnn_feature.dtype)
    top, state1 = step(params["rnn"], cnn_feature, state0)
    logp0 = jax.nn.log_softmax(project(top), axis=-1)

    if fused_step:
        from show_tell_tpu.ops.fused_beam_pallas import (
            fused_dense_step_pallas,
            fused_topk_step_pallas,
        )
        from show_tell_tpu.ops.rnn_pallas import prepare_rnn_weights
        from show_tell_tpu.ops.vocab_pallas import prepare_vocab

        interpret = jax.default_backend() != "tpu"
        stacked = prepare_rnn_weights(params["rnn"])
        vocab = prepare_vocab(params["linear"])  # padded ONCE, outside the scan
        n_vocab = params["linear"]["w"].shape[1]
        sparse = fused_step == "topk"
        if sparse:

            def step_fn(tokens, state):
                x = params["embedding"][tokens]
                return fused_topk_step_pallas(
                    cfg.cell_type, stacked, vocab, x, state, K, interpret=interpret
                )

        else:

            def step_fn(tokens, state):
                x = params["embedding"][tokens]
                logits, state2 = fused_dense_step_pallas(
                    cfg.cell_type, stacked, vocab, x, state, n_vocab, interpret=interpret
                )
                return jax.nn.log_softmax(logits, axis=-1), state2

        tile, gather = _rnn_state_helpers(B, K)
        return _beam_engine(
            logp0, state1, step_fn, tile, gather, K, T, end_token, pad_token,
            sparse=sparse, early_exit=early_exit,
        )

    sparse_proj = _sparse_projection(params, K, vocab_sharded) if use_pallas else None

    if sparse_proj is not None:

        def step_fn(tokens, state):
            x = params["embedding"][tokens]
            top, state2 = step(params["rnn"], x, state)
            return sparse_proj(top), state2

    else:

        def step_fn(tokens, state):
            x = params["embedding"][tokens]
            top, state2 = step(params["rnn"], x, state)
            return jax.nn.log_softmax(project(top), axis=-1), state2

    tile, gather = _rnn_state_helpers(B, K)
    return _beam_engine(
        logp0, state1, step_fn, tile, gather, K, T, end_token, pad_token,
        sparse=sparse_proj is not None, early_exit=early_exit,
    )


def attn_beam_search_decode(
    params: Dict[str, Any],
    cfg: AttnDecoderConfig,
    cnn_feature: jax.Array,  # [B, C, P]
    beam_size: int,
    start_token: int = 1,
    end_token: int = 2,
    pad_token: int = 0,
    use_pallas: "bool | None" = None,
    early_exit: bool = False,
    vocab_sharded: "bool | None" = None,
    fused_step: "str | None | bool" = None,
) -> jax.Array:
    """Beam over the soft-attention decoders (framework extension; the
    reference decodes attention models greedily only, rnn_attn.py:77-94).
    Attention context is recomputed per hypothesis each step — via the
    fused Pallas context kernel on TPU (use_pallas=None auto, same
    measured policy as greedy decode; batch-parallel GSPMD rule keeps it
    on under dp meshes), XLA elsewhere.

    fused_step: 'dense' runs the WHOLE per-hypothesis step (attention +
    embed-space context + recurrence + projection) as one Mosaic
    invocation with [B*K, V] logits out (ops/fused_attn_pallas.py — the
    greedy fused step's beam form); XLA keeps log_softmax + top_k.
    None = measured auto when use_pallas is also auto; False = off.
    Falls back when the projection is mp(vocab)-sharded or the shapes
    exceed the kernel's VMEM envelope (f32 parity)."""
    B = cnn_feature.shape[0]
    K, T = beam_size, cfg.max_caption_length
    step = stack_step(cfg.cell_type)
    feats_pm = jnp.swapaxes(cnn_feature, 1, 2)  # [B, P, C]
    att1 = _linear(params["attn"]["encoder_att"], feats_pm)  # hoisted, constant over steps

    auto = use_pallas is None
    if auto:
        from show_tell_tpu.ops import pallas_auto_default

        use_pallas = pallas_auto_default()
    if use_pallas:
        from show_tell_tpu.ops.attention_pallas import attention_context_pallas

        interpret = jax.default_backend() != "tpu"

        def context_fn(feats, a1, h):
            ctx, _ = attention_context_pallas(params["attn"], feats, a1, h, interpret=interpret)
            return ctx
    else:

        def context_fn(feats, a1, h):
            ctx, _ = attention_net_hoisted(params["attn"], feats, a1, h)
            return ctx

    def project(top):
        return _linear(params["linear"], top)

    def trunk(w_emb, feats, a1, state):
        context = context_fn(feats, a1, _last_h(state, cfg.cell_type))
        x = jnp.concatenate([w_emb, _linear(params["embed"], context).astype(w_emb.dtype)], axis=-1)
        return step(params["rnn"], x, state)

    state0 = _init_hidden(params, cfg, cnn_feature)
    w0 = params["embedding"][jnp.full((B,), start_token, jnp.int32)]
    top0, state1 = trunk(w0, feats_pm, att1, state0)
    logp0 = jax.nn.log_softmax(project(top0), axis=-1)

    if fused_step is None:
        if auto:
            from show_tell_tpu.ops import pallas_beam_fused_default

            fused_step = pallas_beam_fused_default()
        else:
            fused_step = False  # explicit use_pallas=0/1 pins the pre-fused surface
    if fused_step:
        if vocab_sharded is None:
            from show_tell_tpu.ops import vocab_projection_is_sharded

            fused_ok = not vocab_projection_is_sharded(params["linear"])
        else:
            fused_ok = not vocab_sharded
        # Shape + VMEM envelope, shared with the greedy dispatch
        # (ops.fused_attn_step_fits): f32 parity shapes and H > 2E
        # configs keep the composite path.
        from show_tell_tpu.ops import fused_attn_step_fits

        if not fused_ok or not fused_attn_step_fits(
            cfg.cell_type, cfg.hidden_dim, cfg.embed_dim, params["embedding"].dtype,
            interpret=jax.default_backend() != "tpu",
        ):
            fused_step = False
    if fused_step:
        from show_tell_tpu.ops.fused_attn_pallas import (
            fused_attn_dense_step_pallas,
            prepare_attn_decode,
        )

        interpret = jax.default_backend() != "tpu"
        prep = prepare_attn_decode(params, feats_pm)
        prep = dict(
            prep,
            feats_e=jnp.repeat(prep["feats_e"], K, axis=0),
            att1=jnp.repeat(prep["att1"], K, axis=0),
        )
        n_vocab = params["linear"]["w"].shape[1]

        def step_fn(tokens, state):
            logits, state2 = fused_attn_dense_step_pallas(
                prep, cfg.cell_type, params["embedding"][tokens], state, n_vocab,
                interpret=interpret,
            )
            return jax.nn.log_softmax(logits, axis=-1), state2

        tile, gather = _rnn_state_helpers(B, K)
        return _beam_engine(
            logp0, state1, step_fn, tile, gather, K, T, end_token, pad_token,
            sparse=False, early_exit=early_exit,
        )

    # Composite path only below: the K-tiled per-hypothesis inputs
    # ([B*K, P, C] feats — ~150MB at serving shapes — and att1) and the
    # sparse projection are built only when a step_fn will consume them.
    feats_tiled = jnp.repeat(feats_pm, K, axis=0)  # [B*K, P, C]
    att1_tiled = jnp.repeat(att1, K, axis=0)
    # Sparse projection follows its own measured policy under auto
    # (each kernel is flipped on its own A/B numbers); an explicit
    # use_pallas=1/0 forces all kernels together.
    if auto:
        from show_tell_tpu.ops import pallas_beam_default

        use_sparse = pallas_beam_default()
    else:
        use_sparse = use_pallas
    sparse_proj = _sparse_projection(params, K, vocab_sharded) if use_sparse else None

    if sparse_proj is not None:

        def step_fn(tokens, state):
            top, state2 = trunk(params["embedding"][tokens], feats_tiled, att1_tiled, state)
            return sparse_proj(top), state2

    else:

        def step_fn(tokens, state):
            top, state2 = trunk(params["embedding"][tokens], feats_tiled, att1_tiled, state)
            return jax.nn.log_softmax(project(top), axis=-1), state2

    tile, gather = _rnn_state_helpers(B, K)
    return _beam_engine(
        logp0, state1, step_fn, tile, gather, K, T, end_token, pad_token,
        sparse=sparse_proj is not None, early_exit=early_exit,
    )
