"""Pallas kernel tests (interpret mode on CPU backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from show_tell_tpu.data.transforms import preprocess_images
from show_tell_tpu.models.decoder import DecoderConfig, greedy_decode, init_decoder_params
from show_tell_tpu.models.rnn_cells import init_state, rnn_scan, stack_step_gru
from show_tell_tpu.ops.preprocess_pallas import preprocess_images_pallas
from show_tell_tpu.ops.rnn_pallas import (
    greedy_decode_pallas,
    gru_stack_step_pallas,
    prepare_gru_weights,
)


def test_preprocess_pallas_matches_xla():
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (8, 16, 24, 3), dtype=np.uint8)  # 16*24*3=1152=9*128
    ref = preprocess_images(imgs, jax.random.PRNGKey(0), augment=False, dtype=jnp.float32)
    got = preprocess_images_pallas(jnp.asarray(imgs), dtype=jnp.float32, block_b=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_gru_stack_step_pallas_matches_reference_cell():
    B, E, H, L, V = 16, 128, 128, 3, 50
    cfg = DecoderConfig("gru", E, H, V, L)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    stacked = prepare_gru_weights(params["rnn"])
    x = jnp.asarray(np.random.RandomState(1).randn(B, E).astype(np.float32))
    hs = jnp.asarray(np.random.RandomState(2).randn(L, B, H).astype(np.float32))

    ref_top, ref_hs = stack_step_gru(params["rnn"], x, hs)
    top, new_hs = gru_stack_step_pallas(stacked, x, hs, interpret=True)
    np.testing.assert_allclose(np.asarray(top), np.asarray(ref_top), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_hs), np.asarray(ref_hs), rtol=1e-5, atol=1e-5)


def test_gru_stack_step_pallas_padded_input():
    """E < H: layer-0 padding must not change results."""
    B, E, H, L, V = 16, 64, 128, 2, 50
    cfg = DecoderConfig("gru", E, H, V, L)
    params = init_decoder_params(jax.random.PRNGKey(3), cfg)
    stacked = prepare_gru_weights(params["rnn"])
    x = jnp.asarray(np.random.RandomState(4).randn(B, E).astype(np.float32))
    hs = jnp.zeros((L, B, H), jnp.float32)

    ref_top, ref_hs = stack_step_gru(params["rnn"], x, hs)
    top, new_hs = gru_stack_step_pallas(stacked, x, hs, interpret=True)
    np.testing.assert_allclose(np.asarray(top), np.asarray(ref_top), rtol=1e-5, atol=1e-5)


def test_greedy_decode_pallas_matches_xla():
    B, E, H, L, V = 16, 64, 128, 2, 50
    cfg = DecoderConfig("gru", E, H, V, L, max_caption_length=10)
    params = init_decoder_params(jax.random.PRNGKey(5), cfg)
    feat = jnp.asarray(np.random.RandomState(6).randn(B, E).astype(np.float32))
    ref = np.asarray(greedy_decode(params, cfg, feat))
    got = np.asarray(greedy_decode_pallas(params, cfg, feat, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_lstm_stack_step_pallas_matches_reference_cell():
    from show_tell_tpu.models.rnn_cells import stack_step_lstm
    from show_tell_tpu.ops.rnn_pallas import lstm_stack_step_pallas, prepare_rnn_weights

    B, E, H, L, V = 16, 64, 128, 3, 50
    cfg = DecoderConfig("lstm", E, H, V, L)
    params = init_decoder_params(jax.random.PRNGKey(7), cfg)
    stacked = prepare_rnn_weights(params["rnn"])
    x = jnp.asarray(np.random.RandomState(8).randn(B, E).astype(np.float32))
    hs = jnp.asarray(np.random.RandomState(9).randn(L, B, H).astype(np.float32))
    cs = jnp.asarray(np.random.RandomState(10).randn(L, B, H).astype(np.float32))

    ref_top, (ref_hs, ref_cs) = stack_step_lstm(params["rnn"], x, (hs, cs))
    top, (new_hs, new_cs) = lstm_stack_step_pallas(stacked, x, hs, cs, interpret=True)
    np.testing.assert_allclose(np.asarray(top), np.asarray(ref_top), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_cs), np.asarray(ref_cs), rtol=1e-5, atol=1e-5)


def test_greedy_decode_pallas_lstm_matches_xla():
    B, E, H, L, V = 16, 64, 128, 2, 50
    cfg = DecoderConfig("lstm", E, H, V, L, max_caption_length=10)
    params = init_decoder_params(jax.random.PRNGKey(11), cfg)
    feat = jnp.asarray(np.random.RandomState(12).randn(B, E).astype(np.float32))
    ref = np.asarray(greedy_decode(params, cfg, feat))
    got = np.asarray(greedy_decode_pallas(params, cfg, feat, interpret=True))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_fused_decode_step_matches_xla_step(cell):
    """The fully fused decode-step kernel (recurrence + vocab projection
    + argmax in ONE invocation, ops/fused_step_pallas.py) == the XLA
    stack step followed by argmax(top @ w + b), incl. layer-0 input
    padding (E < H) and vocab padding (V=70 onto the 512-wide block)."""
    from show_tell_tpu.models.rnn_cells import stack_step
    from show_tell_tpu.ops.fused_step_pallas import (
        fused_gru_decode_step_pallas,
        fused_lstm_decode_step_pallas,
    )
    from show_tell_tpu.ops.rnn_pallas import prepare_rnn_weights
    from show_tell_tpu.ops.vocab_pallas import prepare_vocab

    B, E, H, L, V = 16, 64, 128, 3, 70
    cfg = DecoderConfig(cell, E, H, V, L)
    params = init_decoder_params(jax.random.PRNGKey(13), cfg)
    stacked = prepare_rnn_weights(params["rnn"])
    vocab = prepare_vocab(params["linear"])
    x = jnp.asarray(np.random.RandomState(14).randn(B, E).astype(np.float32))
    hs = jnp.asarray(np.random.RandomState(15).randn(L, B, H).astype(np.float32))
    if cell == "lstm":
        cs = jnp.asarray(np.random.RandomState(16).randn(L, B, H).astype(np.float32))
        ref_top, (ref_hs, ref_cs) = stack_step("lstm")(params["rnn"], x, (hs, cs))
        tok, (new_hs, new_cs) = fused_lstm_decode_step_pallas(stacked, vocab, x, hs, cs, interpret=True)
        np.testing.assert_allclose(np.asarray(new_cs), np.asarray(ref_cs), rtol=1e-5, atol=1e-5)
    else:
        ref_top, ref_hs = stack_step("gru")(params["rnn"], x, hs)
        tok, new_hs = fused_gru_decode_step_pallas(stacked, vocab, x, hs, interpret=True)
    ref_tok = jnp.argmax(jnp.dot(ref_top, params["linear"]["w"]) + params["linear"]["b"], axis=-1)
    np.testing.assert_allclose(np.asarray(new_hs), np.asarray(ref_hs), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_tok))


def test_fused_decode_step_batch_blocked():
    """B > block_b: the outer batch-block grid dimension must re-init the
    per-block scratch (x_buf at t==0, argmax state at the first vocab
    block) — forced here by shrinking the block picker to 8 rows."""
    from show_tell_tpu.models.rnn_cells import stack_step_gru
    from show_tell_tpu.ops import fused_step_pallas as fsp
    from show_tell_tpu.ops.rnn_pallas import prepare_rnn_weights
    from show_tell_tpu.ops.vocab_pallas import prepare_vocab

    B, E, H, L, V = 24, 32, 64, 2, 40
    cfg = DecoderConfig("gru", E, H, V, L)
    params = init_decoder_params(jax.random.PRNGKey(17), cfg)
    stacked = prepare_rnn_weights(params["rnn"])
    vocab = prepare_vocab(params["linear"])
    x = jnp.asarray(np.random.RandomState(18).randn(B, E).astype(np.float32))
    hs = jnp.asarray(np.random.RandomState(19).randn(L, B, H).astype(np.float32))
    orig = fsp._pick_block_b
    fsp._pick_block_b = lambda b: 8
    try:
        tok, new_hs = fsp.fused_gru_decode_step_pallas(stacked, vocab, x, hs, interpret=True)
    finally:
        fsp._pick_block_b = orig
    ref_top, ref_hs = stack_step_gru(params["rnn"], x, hs)
    ref_tok = jnp.argmax(jnp.dot(ref_top, params["linear"]["w"]) + params["linear"]["b"], axis=-1)
    np.testing.assert_allclose(np.asarray(new_hs), np.asarray(ref_hs), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_tok))


def test_fused_decode_step_per_shard_row_padding():
    """B > the block envelope and NOT a block multiple: the raw fns pad
    rows internally (per-shard — under GSPMD each shard sees a local B
    that need not be a 512 multiple, e.g. global 1536 over dp=2) and
    slice the pad back off.  Forced here by shrinking the 512-row
    envelope to 16 so B=24 pads to 32 and splits into two 16-row blocks;
    both cells, checked against the unfused XLA step."""
    from show_tell_tpu.models.rnn_cells import stack_step_gru, stack_step_lstm
    from show_tell_tpu.ops import fused_step_pallas as fsp
    from show_tell_tpu.ops.rnn_pallas import prepare_rnn_weights
    from show_tell_tpu.ops.vocab_pallas import prepare_vocab

    B, E, H, L, V = 24, 32, 64, 2, 40
    rng = np.random.RandomState(41)
    x = jnp.asarray(rng.randn(B, E).astype(np.float32))
    hs0 = jnp.asarray(rng.randn(L, B, H).astype(np.float32))
    cs0 = jnp.asarray(rng.randn(L, B, H).astype(np.float32))
    orig_pick, orig_pad = fsp._pick_block_b, fsp._pad_rows
    fsp._pick_block_b = lambda b: b if b <= 16 else 16
    fsp._pad_rows = lambda b: (-b) % 16 if b > 16 else 0
    try:
        for cell, step in (("gru", stack_step_gru), ("lstm", stack_step_lstm)):
            cfg = DecoderConfig(cell, E, H, V, L)
            params = init_decoder_params(jax.random.PRNGKey(7), cfg)
            stacked = prepare_rnn_weights(params["rnn"])
            vocab = prepare_vocab(params["linear"])
            if cell == "lstm":
                tok, (new_hs, new_cs) = fsp.fused_lstm_decode_step_pallas(
                    stacked, vocab, x, hs0, cs0, interpret=True)
                ref_top, (ref_hs, ref_cs) = step(params["rnn"], x, (hs0, cs0))
                np.testing.assert_allclose(np.asarray(new_cs), np.asarray(ref_cs), rtol=1e-5, atol=1e-5)
            else:
                tok, new_hs = fsp.fused_gru_decode_step_pallas(stacked, vocab, x, hs0, interpret=True)
                ref_top, ref_hs = step(params["rnn"], x, hs0)
            ref_tok = jnp.argmax(jnp.dot(ref_top, params["linear"]["w"]) + params["linear"]["b"], axis=-1)
            assert tok.shape == (B,) and new_hs.shape == (L, B, H)
            np.testing.assert_allclose(np.asarray(new_hs), np.asarray(ref_hs), rtol=1e-5, atol=1e-5)
            np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_tok))
    finally:
        fsp._pick_block_b, fsp._pad_rows = orig_pick, orig_pad


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_fused_beam_step_matches_xla_step(cell):
    """The fused beam-step kernels (recurrence + vocab projection in ONE
    invocation, ops/fused_beam_pallas.py) == the XLA stack step followed
    by the projection: dense variant returns the exact logits (sliced
    back to V), topk variant returns lax.top_k(log_softmax(logits), k)
    with identical ids.  Incl. layer-0 input padding (E < H) and vocab
    padding (V=70 onto the block grid)."""
    from show_tell_tpu.models.rnn_cells import stack_step
    from show_tell_tpu.ops.fused_beam_pallas import (
        fused_dense_step_pallas,
        fused_topk_step_pallas,
    )
    from show_tell_tpu.ops.rnn_pallas import prepare_rnn_weights
    from show_tell_tpu.ops.vocab_pallas import prepare_vocab

    B, E, H, L, V, K = 12, 64, 128, 3, 70, 3
    cfg = DecoderConfig(cell, E, H, V, L)
    params = init_decoder_params(jax.random.PRNGKey(23), cfg)
    stacked = prepare_rnn_weights(params["rnn"])
    vocab = prepare_vocab(params["linear"], block_v=32)
    rng = np.random.RandomState(24)
    x = jnp.asarray(rng.randn(B, E).astype(np.float32))
    hs = jnp.asarray(rng.randn(L, B, H).astype(np.float32))
    if cell == "lstm":
        cs = jnp.asarray(rng.randn(L, B, H).astype(np.float32))
        state = (hs, cs)
    else:
        state = hs
    ref_top, ref_state = stack_step(cell)(params["rnn"], x, state)
    ref_logits = jnp.dot(ref_top, params["linear"]["w"]) + params["linear"]["b"]

    logits, st_d = fused_dense_step_pallas(cell, stacked, vocab, x, state, V, block_v=32, interpret=True)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(st_d), jax.tree.leaves(ref_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    (logp, ids), st_k = fused_topk_step_pallas(cell, stacked, vocab, x, state, K, block_v=32, interpret=True)
    ref_lp, ref_ids = jax.lax.top_k(jax.nn.log_softmax(ref_logits, axis=-1), K)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(ref_lp), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))
    for a, b in zip(jax.tree.leaves(st_k), jax.tree.leaves(ref_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_fused_beam_step_per_shard_row_padding():
    """B*K above the row envelope and NOT a block multiple (beam's 768
    rows over the 512 cap): the raw fns pad rows per-shard and slice the
    pad back off — forced by shrinking the envelope to 16 so B=24 pads
    to 32 and splits into two blocks; both kernel variants."""
    from show_tell_tpu.models.rnn_cells import stack_step_gru
    from show_tell_tpu.ops import fused_beam_pallas as fbp
    from show_tell_tpu.ops.rnn_pallas import prepare_rnn_weights
    from show_tell_tpu.ops.vocab_pallas import prepare_vocab

    B, E, H, L, V, K = 24, 32, 64, 2, 40, 2
    cfg = DecoderConfig("gru", E, H, V, L)
    params = init_decoder_params(jax.random.PRNGKey(29), cfg)
    stacked = prepare_rnn_weights(params["rnn"])
    vocab = prepare_vocab(params["linear"], block_v=16)
    rng = np.random.RandomState(31)
    x = jnp.asarray(rng.randn(B, E).astype(np.float32))
    hs = jnp.asarray(rng.randn(L, B, H).astype(np.float32))
    orig_pick, orig_pad = fbp._pick_block_b, fbp._pad_rows
    fbp._pick_block_b = lambda b: b if b <= 16 else 16
    fbp._pad_rows = lambda b: (-b) % 16 if b > 16 else 0
    try:
        ref_top, ref_hs = stack_step_gru(params["rnn"], x, hs)
        ref_logits = jnp.dot(ref_top, params["linear"]["w"]) + params["linear"]["b"]
        logits, new_hs = fbp.fused_dense_step_pallas("gru", stacked, vocab, x, hs, V, block_v=16, interpret=True)
        assert logits.shape == (B, V) and new_hs.shape == (L, B, H)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_hs), np.asarray(ref_hs), rtol=1e-5, atol=1e-5)

        (logp, ids), new_hs2 = fbp.fused_topk_step_pallas("gru", stacked, vocab, x, hs, K, block_v=16, interpret=True)
        ref_lp, ref_ids = jax.lax.top_k(jax.nn.log_softmax(ref_logits, axis=-1), K)
        np.testing.assert_allclose(np.asarray(logp), np.asarray(ref_lp), rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))
        np.testing.assert_allclose(np.asarray(new_hs2), np.asarray(ref_hs), rtol=1e-5, atol=1e-5)
    finally:
        fbp._pick_block_b, fbp._pad_rows = orig_pick, orig_pad


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_fused_attn_decode_matches_xla(cell):
    """The FULLY fused attention decode step (attention + embed-space
    context + L-layer recurrence + projection + argmax in ONE invocation,
    ops/fused_attn_pallas.py) must produce the same ids as the XLA
    attention decode — incl. the feats_e hoist's reassociated math, the
    L=1 no-upper-layers edge, and the early-exit while_loop engine."""
    from show_tell_tpu.models.attention import (
        AttnDecoderConfig,
        attn_greedy_decode,
        init_attn_decoder_params,
    )
    from show_tell_tpu.ops.fused_attn_pallas import attn_greedy_decode_fused_pallas

    for L_ in (1, 3):
        B, E_, C, A, H_, V_, P, T = 6, 12, 20, 14, 16, 37, 5, 7
        acfg = AttnDecoderConfig(cell, E_, C, A, H_, V_, L_, max_caption_length=T)
        params = init_attn_decoder_params(jax.random.PRNGKey(3), acfg)
        feats = jnp.asarray(np.random.RandomState(4).randn(B, C, P).astype(np.float32))
        ref = np.asarray(attn_greedy_decode(params, acfg, feats, 1))
        got = np.asarray(attn_greedy_decode_fused_pallas(params, acfg, feats, 1, interpret=True))
        np.testing.assert_array_equal(got, ref, err_msg="L=%d" % L_)
        ee = np.asarray(
            attn_greedy_decode_fused_pallas(params, acfg, feats, 1, interpret=True, end_token=2)
        )
        ref_ee = np.asarray(attn_greedy_decode(params, acfg, feats, 1, end_token=2))
        np.testing.assert_array_equal(ee, ref_ee, err_msg="L=%d early_exit" % L_)


def test_fused_attn_decode_row_padding_and_sub_blocks():
    """B above the attention row envelope and NOT a multiple: rows pad
    per-shard and slice back off; an 8-divisible block exercises the
    8-row attention sub-stages (sub_b=8), a ragged one the sub_b=1
    fallback."""
    from show_tell_tpu.models.attention import (
        AttnDecoderConfig,
        attn_greedy_decode,
        init_attn_decoder_params,
    )
    from show_tell_tpu.ops import fused_attn_pallas as fap

    orig_pick, orig_pad = fap._attn_pick_block_b, fap._attn_pad_rows
    fap._attn_pick_block_b = lambda b: b if b <= 16 else 16
    fap._attn_pad_rows = lambda b: (-b) % 16 if b > 16 else 0
    try:
        for B in (24, 16):  # 24 -> pads to 32, two 16-row blocks (sub_b=8)
            E_, C, A, H_, V_, P, T, L_ = 12, 20, 14, 16, 37, 5, 6, 2
            acfg = AttnDecoderConfig("gru", E_, C, A, H_, V_, L_, max_caption_length=T)
            params = init_attn_decoder_params(jax.random.PRNGKey(5), acfg)
            feats = jnp.asarray(np.random.RandomState(6).randn(B, C, P).astype(np.float32))
            ref = np.asarray(attn_greedy_decode(params, acfg, feats, 1))
            got = np.asarray(fap.attn_greedy_decode_fused_pallas(params, acfg, feats, 1, interpret=True))
            np.testing.assert_array_equal(got, ref, err_msg="B=%d" % B)
    finally:
        fap._attn_pick_block_b, fap._attn_pad_rows = orig_pick, orig_pad


def test_attention_context_pallas_matches_reference():
    from show_tell_tpu.models.attention import (
        AttnDecoderConfig,
        attention_net,
        init_attn_decoder_params,
    )
    from show_tell_tpu.ops.attention_pallas import attention_context_pallas, precompute_att1

    B, P, C, A, H = 8, 49, 256, 128, 128
    acfg = AttnDecoderConfig("gru", 32, C, A, H, 50, 2)
    params = init_attn_decoder_params(jax.random.PRNGKey(0), acfg)
    rng = np.random.RandomState(0)
    feats_pm = jnp.asarray(rng.randn(B, P, C).astype(np.float32))
    hidden = jnp.asarray(rng.randn(B, H).astype(np.float32))

    ref_ctx, ref_alpha = attention_net(params["attn"], feats_pm, hidden)
    att1 = precompute_att1(params["attn"], feats_pm)
    ctx, alpha = attention_context_pallas(params["attn"], feats_pm, att1, hidden, block_b=4, interpret=True)
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ref_ctx), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref_alpha), rtol=2e-5, atol=2e-5)


def test_stem_fused_pallas_matches_xla_stem():
    """Fully fused stem kernel (normalize + s2d conv1 + eval-BN + relu
    [+ 3x3/s2 maxpool]) == the XLA stem ops, from uint8 pixels."""
    from show_tell_tpu.data.transforms import preprocess_images
    from show_tell_tpu.models.resnet import BN_EPS, _max_pool_3x3s2, init_resnet_params
    from show_tell_tpu.ops.stem_pallas import prepare_stem, stem_fused_pallas

    params, state = init_resnet_params(jax.random.PRNGKey(0), 18)
    imgs = np.random.RandomState(0).randint(0, 255, (2, 224, 224, 3), dtype=np.uint8)

    x = preprocess_images(jnp.asarray(imgs), jax.random.PRNGKey(0), augment=False, dtype=jnp.float32)
    h = jax.lax.conv_general_dilated(
        x, params["conv1.weight"], (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    mult = params["bn1.weight"] * jax.lax.rsqrt(state["bn1.running_var"] + BN_EPS)
    h = jax.nn.relu(h * mult + (params["bn1.bias"] - state["bn1.running_mean"] * mult))

    prepared = prepare_stem(params, state, dtype=jnp.float32)
    got = stem_fused_pallas(jnp.asarray(imgs), prepared, pool=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(h), rtol=2e-5, atol=2e-5)
    got_p = stem_fused_pallas(jnp.asarray(imgs), prepared, pool=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(_max_pool_3x3s2(h)), rtol=2e-5, atol=2e-5)


def test_s2d_stem_matches_conv1():
    from show_tell_tpu.ops.s2d_stem import stem_s2d, transform_conv1_weight

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    w7 = jnp.asarray(rng.randn(7, 7, 3, 16).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w7, (2, 2), ((3, 3), (3, 3)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = stem_s2d(x, transform_conv1_weight(w7))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_project_argmax_pallas_matches_xla():
    """Fused projection+argmax == argmax(top @ w + b) incl. vocab padding
    (V=50 padded to the 16-wide block grid) and bf16 inputs."""
    from show_tell_tpu.ops.vocab_pallas import prepare_vocab, project_argmax_pallas

    B, H, V = 8, 32, 50
    rng = np.random.RandomState(0)
    for dtype in (np.float32, jnp.bfloat16):
        w = jnp.asarray(rng.randn(H, V).astype(np.float32)).astype(dtype)
        b = jnp.asarray(rng.randn(V).astype(np.float32)).astype(dtype)
        top = jnp.asarray(rng.randn(B, H).astype(np.float32)).astype(dtype)
        ref = jnp.argmax(
            jnp.dot(top, w, preferred_element_type=jnp.float32) + b.astype(jnp.float32), axis=-1
        )
        prepared = prepare_vocab({"w": w, "b": b}, block_v=16)
        got = project_argmax_pallas(prepared, top, block_v=16, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_project_argmax_pallas_tie_semantics():
    """Exact jnp.argmax tie-breaking: first max index wins, within a
    block (iota+min) and across blocks (strictly-greater displaces)."""
    from show_tell_tpu.ops.vocab_pallas import prepare_vocab, project_argmax_pallas

    B, H, V, BLK = 4, 8, 64, 16
    w = jnp.zeros((H, V), jnp.float32)
    # duplicate maxima: within block 0 (cols 3,5) and across blocks (col 37)
    b = jnp.zeros((V,), jnp.float32).at[jnp.array([3, 5, 37])].set(7.0)
    top = jnp.ones((B, H), jnp.float32)
    prepared = prepare_vocab({"w": w, "b": b}, block_v=BLK)
    got = project_argmax_pallas(prepared, top, block_v=BLK, interpret=True)
    ref = jnp.argmax(jnp.dot(top, w) + b, axis=-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert (np.asarray(got) == 3).all()
    # a strictly greater value in a later block must displace
    b2 = b.at[37].set(8.0)
    got2 = project_argmax_pallas(prepare_vocab({"w": w, "b": b2}, block_v=BLK), top, block_v=BLK, interpret=True)
    assert (np.asarray(got2) == 37).all()


def _mesh_equal(mesh, fn, batch_args, repl_args, batch_dims):
    """Run fn sharded over the mesh's dp axis vs unsharded; bit-equal."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    ref = jax.jit(fn)(*batch_args, *repl_args)
    sharded = [
        jax.device_put(a, NamedSharding(mesh, P(*(("dp" if i == d else None) for i in range(a.ndim)))))
        for a, d in zip(batch_args, batch_dims)
    ]
    repl = [jax.device_put(a, NamedSharding(mesh, P())) for a in repl_args]
    got = jax.jit(fn)(*sharded, *repl)
    jax.tree.map(
        lambda g, r: np.testing.assert_array_equal(np.asarray(g), np.asarray(r)), got, ref
    )


@pytest.mark.parametrize("dp,mp", [(8, 1), (4, 2)])
def test_pallas_kernels_partition_under_mesh(dp, mp):
    """The batch-parallel GSPMD rules (ops/partition.py): each kernel
    runs per-shard under a dp (and dp x mp) mesh, bit-equal to the
    unsharded kernel — the round-3 fix that keeps the measured kernel
    wins alive in the v5e-8 serving configuration (VERDICT r2 item 1)."""
    from show_tell_tpu.models.attention import AttnDecoderConfig, init_attn_decoder_params
    from show_tell_tpu.ops.attention_pallas import attention_context_pallas, precompute_att1
    from show_tell_tpu.ops.rnn_pallas import lstm_stack_step_pallas, prepare_rnn_weights
    from show_tell_tpu.ops.vocab_pallas import prepare_vocab, project_argmax_pallas
    from show_tell_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=dp, mp=mp)
    rng = np.random.RandomState(1)
    B, H, V = 16, 32, 50

    # fused vocab projection + argmax
    prepared = prepare_vocab(
        {"w": jnp.asarray(rng.randn(H, V).astype(np.float32)),
         "b": jnp.asarray(rng.randn(V).astype(np.float32))}, block_v=16)
    top = jnp.asarray(rng.randn(B, H).astype(np.float32))
    _mesh_equal(
        mesh,
        lambda t, w, b: project_argmax_pallas({"w": w, "b": b}, t, block_v=16, interpret=True),
        [top], [prepared["w"], prepared["b"]], [0],
    )

    # RNN stack step (LSTM exercises the 2-output rule)
    L = 2
    cfg = DecoderConfig("lstm", H, H, V, L)
    stacked = prepare_rnn_weights(init_decoder_params(jax.random.PRNGKey(0), cfg)["rnn"])
    x = jnp.asarray(rng.randn(B, H).astype(np.float32))
    hs = jnp.asarray(rng.randn(L, B, H).astype(np.float32))
    cs = jnp.asarray(rng.randn(L, B, H).astype(np.float32))
    _mesh_equal(
        mesh,
        lambda x_, h_, c_, *w: lstm_stack_step_pallas(
            dict(zip(("w_ih", "w_hh", "b_ih", "b_hh"), w)), x_, h_, c_, interpret=True
        ),
        [x, hs, cs],
        [stacked["w_ih"], stacked["w_hh"], stacked["b_ih"], stacked["b_hh"]],
        [0, 1, 1],
    )

    # fully fused decode step (LSTM: widest rule — 2 batch states, 3 outputs)
    from show_tell_tpu.ops.fused_step_pallas import fused_lstm_decode_step_pallas
    from show_tell_tpu.ops.vocab_pallas import prepare_vocab as _prep_vocab

    vp = _prep_vocab(
        {"w": jnp.asarray(rng.randn(H, V).astype(np.float32)),
         "b": jnp.asarray(rng.randn(V).astype(np.float32))})
    _mesh_equal(
        mesh,
        lambda x_, h_, c_, wv, bv, *w: fused_lstm_decode_step_pallas(
            dict(zip(("w_ih", "w_hh", "b_ih", "b_hh"), w)),
            {"w": wv, "b": bv}, x_, h_, c_, interpret=True,
        ),
        [x, hs, cs],
        [vp["w"], vp["b"], stacked["w_ih"], stacked["w_hh"], stacked["b_ih"], stacked["b_hh"]],
        [0, 1, 1],
    )

    # attention context kernel
    P_, C, A = 49, 64, 32
    acfg = AttnDecoderConfig("gru", 16, C, A, H, V, 2)
    ap = init_attn_decoder_params(jax.random.PRNGKey(1), acfg)["attn"]
    feats_pm = jnp.asarray(rng.randn(B, P_, C).astype(np.float32))
    att1 = precompute_att1(ap, feats_pm)
    hidden = jnp.asarray(rng.randn(B, H).astype(np.float32))
    _mesh_equal(
        mesh,
        lambda f, a1, h, wd, bd, wf: attention_context_pallas(
            {"decoder_att": {"w": wd, "b": bd}, "full_att": {"w": wf[:, None]}},
            f, a1, h, block_b=2, interpret=True,
        ),
        [feats_pm, att1, hidden],
        [ap["decoder_att"]["w"], ap["decoder_att"]["b"], ap["full_att"]["w"][:, 0]],
        [0, 0, 0],
    )


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_attn_greedy_decode_pallas_matches_xla(cell):
    from show_tell_tpu.models.attention import (
        AttnDecoderConfig,
        attn_greedy_decode,
        init_attn_decoder_params,
    )
    from show_tell_tpu.ops.attention_pallas import attn_greedy_decode_pallas

    B, P, C, A, H, E, V, L = 8, 49, 256, 128, 128, 32, 60, 2
    acfg = AttnDecoderConfig(cell, E, C, A, H, V, L, max_caption_length=8)
    params = init_attn_decoder_params(jax.random.PRNGKey(4), acfg)
    feats = jnp.asarray(np.random.RandomState(5).randn(B, C, P).astype(np.float32))
    ref = np.asarray(attn_greedy_decode(params, acfg, feats, 1))
    got = np.asarray(attn_greedy_decode_pallas(params, acfg, feats, 1, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_vocab_projection_sharded_guard_safe_under_tracing():
    """The kernel-policy guard: concrete replicated / host arrays report
    unsharded (kernel allowed); a TRACED weight — sharding undeterminable,
    e.g. params passed through a user's own jit boundary — must report
    sharded (True) so the decode falls back to the XLA projection instead
    of the weight-replicating kernel rule (review r3)."""
    from show_tell_tpu.ops import vocab_projection_is_sharded

    w = jnp.zeros((4, 8), jnp.float32)
    assert vocab_projection_is_sharded({"w": w}) is False
    assert vocab_projection_is_sharded({"w": np.zeros((4, 8), np.float32)}) is False

    seen = []

    def f(w):
        seen.append(vocab_projection_is_sharded({"w": w}))
        return w.sum()

    jax.jit(f)(w)
    assert seen == [True]


def test_vocab_sharded_flag_threads_through_jitted_step(monkeypatch):
    """Inside a jitted eval step the params are Tracers, so the sharding
    inspection conservatively reports sharded and would silently disable
    the vocab/fused-step kernels (r3-continuation review finding).  The
    fix: callers decide on concrete params and pass vocab_sharded — with
    it the fused kernel must actually trace inside jit (counted); without
    it the Tracer fallback must skip the kernel; ids identical both ways."""
    import show_tell_tpu.ops.fused_step_pallas as fsp

    calls = []
    orig = fsp.fused_gru_decode_step_pallas
    monkeypatch.setattr(
        fsp, "fused_gru_decode_step_pallas", lambda *a, **k: calls.append(1) or orig(*a, **k)
    )
    B, E, H, L, V = 8, 16, 32, 2, 50
    cfg = DecoderConfig("gru", E, H, V, L, max_caption_length=6)
    params = init_decoder_params(jax.random.PRNGKey(21), cfg)
    feat = jnp.asarray(np.random.RandomState(22).randn(B, E).astype(np.float32))

    with_flag = jax.jit(
        lambda p, f: greedy_decode_pallas(p, cfg, f, interpret=True, vocab_sharded=False)
    )(params, feat)
    assert calls, "fused kernel did not trace despite vocab_sharded=False"

    calls.clear()
    without_flag = jax.jit(lambda p, f: greedy_decode_pallas(p, cfg, f, interpret=True))(
        params, feat
    )
    assert not calls, "Tracer inspection should have fallen back to the XLA projection"

    ref = greedy_decode(params, cfg, feat)
    np.testing.assert_array_equal(np.asarray(with_flag), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(without_flag), np.asarray(ref))


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_greedy_decode_pallas_early_exit_matches_xla(cell):
    """end_token (early-exit while_loop) around the Pallas step must be
    bit-equal to the XLA early-exit decode AND to the fixed-scan Pallas
    decode up to each row's first <end> (--early_exit composes with
    --use_pallas)."""
    B, E, H, L, V = 16, 64, 128, 2, 50
    cfg = DecoderConfig(cell, E, H, V, L, max_caption_length=10)
    params = init_decoder_params(jax.random.PRNGKey(5), cfg)
    feat = jnp.asarray(np.random.RandomState(6).randn(B, E).astype(np.float32))
    # random params rarely emit token 2 in 10 steps; use the fixed-scan
    # argmax stream itself to pick an end token that DOES occur.
    scan_ids = np.asarray(greedy_decode_pallas(params, cfg, feat, interpret=True))
    end = int(scan_ids[0, 3])  # forces row 0 to retire mid-decode
    ref = np.asarray(greedy_decode(params, cfg, feat, end_token=end))
    got = np.asarray(greedy_decode_pallas(params, cfg, feat, interpret=True, end_token=end))
    np.testing.assert_array_equal(got, ref)
    for b in range(B):
        ends = np.where(scan_ids[b] == end)[0]
        upto = (ends[0] + 1) if len(ends) else scan_ids.shape[1]
        np.testing.assert_array_equal(got[b, :upto], scan_ids[b, :upto])
        assert (got[b, upto:] == 0).all()


def test_attn_greedy_decode_pallas_early_exit_matches_xla():
    from show_tell_tpu.models.attention import (
        AttnDecoderConfig,
        attn_greedy_decode,
        init_attn_decoder_params,
    )
    from show_tell_tpu.ops.attention_pallas import attn_greedy_decode_pallas

    B, P, C, A, H, E, V, L = 8, 49, 256, 128, 128, 32, 60, 2
    acfg = AttnDecoderConfig("gru", E, C, A, H, V, L, max_caption_length=8)
    params = init_attn_decoder_params(jax.random.PRNGKey(4), acfg)
    feats = jnp.asarray(np.random.RandomState(5).randn(B, C, P).astype(np.float32))
    scan_ids = np.asarray(attn_greedy_decode_pallas(params, acfg, feats, 1, interpret=True))
    end = int(scan_ids[0, 2])
    ref = np.asarray(attn_greedy_decode(params, acfg, feats, 1, end_token=end))
    got = np.asarray(attn_greedy_decode_pallas(params, acfg, feats, 1, interpret=True, end_token=end))
    np.testing.assert_array_equal(got, ref)


def test_standalone_kernels_per_shard_row_padding():
    """The 512-row batch envelope (vocab_pallas._pick_block_b/_pad_rows)
    now guards EVERY standalone decode kernel — projection+argmax,
    projection+top-k, and the GRU/LSTM stack steps — not just the fused
    step (r3 review).  Forced here by shrinking the envelope to 16 so
    B=24 pads to 32 and splits into two 16-row blocks; each kernel is
    checked against its XLA formulation."""
    from show_tell_tpu.models.rnn_cells import stack_step_gru, stack_step_lstm
    from show_tell_tpu.ops import rnn_pallas as rp
    from show_tell_tpu.ops import vocab_pallas as vp

    B, E, H, L, V, K = 24, 32, 64, 2, 40, 3
    rng = np.random.RandomState(43)
    top = jnp.asarray(rng.randn(B, H).astype(np.float32))
    lin = {"w": jnp.asarray(rng.randn(H, V).astype(np.float32)),
           "b": jnp.asarray(rng.randn(V).astype(np.float32))}
    logits = jnp.dot(top, lin["w"]) + lin["b"]
    prepared = vp.prepare_vocab(lin)

    saved = [(m, m._pick_block_b, m._pad_rows) for m in (vp, rp)]
    for m in (vp, rp):
        m._pick_block_b = lambda b, cap=16: b if b <= 16 else 16
        m._pad_rows = lambda b, cap=16: (-b) % 16 if b > 16 else 0
    try:
        tok = vp.project_argmax_pallas(prepared, top, interpret=True)
        np.testing.assert_array_equal(np.asarray(tok), np.asarray(jnp.argmax(logits, axis=-1)))

        logp, ids = vp.project_topk_pallas(prepared, top, K, interpret=True)
        rv, ri = jax.lax.top_k(jax.nn.log_softmax(logits, axis=-1), K)
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(ri))
        np.testing.assert_allclose(np.asarray(logp), np.asarray(rv), rtol=1e-5, atol=1e-5)

        x = jnp.asarray(rng.randn(B, E).astype(np.float32))
        hs0 = jnp.asarray(rng.randn(L, B, H).astype(np.float32))
        cs0 = jnp.asarray(rng.randn(L, B, H).astype(np.float32))
        cfg = DecoderConfig("gru", E, H, V, L)
        params = init_decoder_params(jax.random.PRNGKey(9), cfg)
        stacked = rp.prepare_rnn_weights(params["rnn"])
        topg, new_hs = rp.gru_stack_step_pallas(stacked, x, hs0, interpret=True)
        ref_top, ref_hs = stack_step_gru(params["rnn"], x, hs0)
        np.testing.assert_allclose(np.asarray(new_hs), np.asarray(ref_hs), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(topg), np.asarray(ref_top), rtol=1e-5, atol=1e-5)

        cfg_l = DecoderConfig("lstm", E, H, V, L)
        params_l = init_decoder_params(jax.random.PRNGKey(10), cfg_l)
        stacked_l = rp.prepare_rnn_weights(params_l["rnn"])
        topl, (nh, nc) = rp.lstm_stack_step_pallas(stacked_l, x, hs0, cs0, interpret=True)
        ref_topl, (rh, rc) = stack_step_lstm(params_l["rnn"], x, (hs0, cs0))
        np.testing.assert_allclose(np.asarray(nh), np.asarray(rh), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(nc), np.asarray(rc), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(topl), np.asarray(ref_topl), rtol=1e-5, atol=1e-5)
    finally:
        for m, pick, pad in saved:
            m._pick_block_b, m._pad_rows = pick, pad


def test_whole_decode_pallas_matches_xla():
    """The whole-T-step decode kernel (ops/whole_decode_pallas.py) ==
    the XLA greedy scan, token-for-token: multi-layer, E < H padding,
    V not a block multiple, f32 and bf16."""
    from show_tell_tpu.ops.whole_decode_pallas import gru_whole_greedy_decode_pallas

    for seed, (E, H, V, L, B, T) in enumerate([(32, 64, 70, 3, 8, 9), (64, 64, 128, 1, 4, 5)]):
        cfg = DecoderConfig("gru", E, H, V, L, max_caption_length=T)
        params = init_decoder_params(jax.random.PRNGKey(seed), cfg)
        feat = jnp.asarray(np.random.RandomState(seed).randn(B, E).astype(np.float32))
        ref = np.asarray(greedy_decode(params, cfg, feat))
        got = np.asarray(
            gru_whole_greedy_decode_pallas(params, cfg, feat, block_v=32, interpret=True)
        )
        np.testing.assert_array_equal(got, ref)
        # bf16 serving dtype: the one-hot embedding feedback must be an
        # exact row copy (f32 one-hot accumulation of a bf16 row), so
        # the kernel still matches the XLA scan token-for-token.
        pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
        ref16 = np.asarray(greedy_decode(pb, cfg, feat.astype(jnp.bfloat16)))
        got16 = np.asarray(
            gru_whole_greedy_decode_pallas(pb, cfg, feat.astype(jnp.bfloat16), block_v=32, interpret=True)
        )
        np.testing.assert_array_equal(got16, ref16)


def test_whole_decode_pallas_tie_semantics():
    """The best_emb merge must follow the same first-max tie rule as
    best_idx — a tie inside a block and a duplicate max in a later
    block must feed back the FIRST winner's embedding row, steering the
    whole trajectory exactly like jnp.argmax + gather."""
    from show_tell_tpu.ops.whole_decode_pallas import gru_whole_greedy_decode_pallas

    E, H, V, L, B, T, BLK = 16, 16, 64, 1, 4, 6, 16
    cfg = DecoderConfig("gru", E, H, V, L, max_caption_length=T)
    params = init_decoder_params(jax.random.PRNGKey(2), cfg)
    # force exact logit ties: zero projection weights, bias carries
    # duplicate maxima within block 0 (cols 3,5) and across blocks (37)
    params["linear"]["w"] = jnp.zeros((H, V), jnp.float32)
    params["linear"]["b"] = jnp.zeros((V,), jnp.float32).at[jnp.array([3, 5, 37])].set(7.0)
    feat = jnp.asarray(np.random.RandomState(3).randn(B, E).astype(np.float32))
    ref = np.asarray(greedy_decode(params, cfg, feat))
    got = np.asarray(gru_whole_greedy_decode_pallas(params, cfg, feat, block_v=BLK, interpret=True))
    np.testing.assert_array_equal(got, ref)
    assert (got == 3).all()  # every step: first-index winner
    # strictly greater in a later block displaces — and its EMBEDDING
    # must be the one fed back (distinct rows => distinct trajectories
    # would diverge from the XLA scan if the merge picked the wrong row)
    params["linear"]["b"] = params["linear"]["b"].at[37].set(8.0)
    ref2 = np.asarray(greedy_decode(params, cfg, feat))
    got2 = np.asarray(gru_whole_greedy_decode_pallas(params, cfg, feat, block_v=BLK, interpret=True))
    np.testing.assert_array_equal(got2, ref2)
    assert (got2 == 37).all()


def test_whole_decode_pallas_row_padding_and_batch_blocks():
    """B above the (shrunken) block envelope and not a multiple: the raw
    fn pads rows per-shard and splits into batch blocks; scratch state
    (hs, x_buf, argmax trio) must re-initialize per batch block."""
    from show_tell_tpu.ops import whole_decode_pallas as wdp

    E, H, V, L, B, T = 32, 64, 70, 2, 24, 7
    cfg = DecoderConfig("gru", E, H, V, L, max_caption_length=T)
    params = init_decoder_params(jax.random.PRNGKey(4), cfg)
    feat = jnp.asarray(np.random.RandomState(5).randn(B, E).astype(np.float32))
    orig_pick, orig_pad = wdp._pick_block_b, wdp._pad_rows
    wdp._pick_block_b = lambda b: b if b <= 16 else 16
    wdp._pad_rows = lambda b: (-b) % 16 if b > 16 else 0
    try:
        got = np.asarray(wdp.gru_whole_greedy_decode_pallas(params, cfg, feat, block_v=32, interpret=True))
    finally:
        wdp._pick_block_b, wdp._pad_rows = orig_pick, orig_pad
    ref = np.asarray(greedy_decode(params, cfg, feat))
    np.testing.assert_array_equal(got, ref)


def test_whole_decode_wiring_and_guards():
    """greedy_decode_pallas routes to the whole-decode kernel only for
    fixed-T unsharded-vocab GRU decodes; early-exit and forced-off keep
    the per-step path.  All routes produce identical tokens."""
    from show_tell_tpu.ops import whole_decode_pallas as wdp

    E, H, V, L, B, T = 32, 64, 70, 2, 6, 8
    cfg = DecoderConfig("gru", E, H, V, L, max_caption_length=T)
    params = init_decoder_params(jax.random.PRNGKey(6), cfg)
    feat = jnp.asarray(np.random.RandomState(7).randn(B, E).astype(np.float32))
    calls = []
    orig = wdp.gru_whole_greedy_decode_pallas
    wdp.gru_whole_greedy_decode_pallas = lambda *a, **k: calls.append(1) or orig(*a, **k)
    try:
        ref = np.asarray(greedy_decode(params, cfg, feat))
        got = np.asarray(greedy_decode_pallas(params, cfg, feat, interpret=True, whole_decode=True))
        assert calls == [1]
        np.testing.assert_array_equal(got, ref)
        # early-exit must NOT route through the fixed-T kernel
        ee = np.asarray(
            greedy_decode_pallas(params, cfg, feat, interpret=True, whole_decode=True, end_token=2)
        )
        assert calls == [1]
        # forced off: per-step path, same tokens
        off = np.asarray(greedy_decode_pallas(params, cfg, feat, interpret=True, whole_decode=False))
        assert calls == [1]
        np.testing.assert_array_equal(off, ref)
    finally:
        wdp.gru_whole_greedy_decode_pallas = orig


def test_whole_decode_partitions_under_mesh():
    """Batch-parallel GSPMD rule: the whole-decode kernel under a dp=8
    mesh == unsharded, bit-equal (same contract as every other kernel,
    ops/partition.py)."""
    from show_tell_tpu.ops.whole_decode_pallas import gru_whole_greedy_decode_pallas
    from show_tell_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=8, mp=1)
    E, H, V, L, B, T = 32, 64, 70, 2, 16, 6
    cfg = DecoderConfig("gru", E, H, V, L, max_caption_length=T)
    params = init_decoder_params(jax.random.PRNGKey(8), cfg)
    feat = jnp.asarray(np.random.RandomState(9).randn(B, E).astype(np.float32))

    from jax.sharding import NamedSharding, PartitionSpec as P

    fn = lambda f: gru_whole_greedy_decode_pallas(params, cfg, f, block_v=32, interpret=True)
    ref = jax.jit(fn)(feat)
    sharded = jax.device_put(feat, NamedSharding(mesh, P("dp", None)))
    got = jax.jit(fn)(sharded)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_s2d_input_pipeline_exact():
    """The host-emitted s2d serving path (VERDICT r4 item 4): for the
    same flip key, preprocess_images_s2d(host_s2d(u8)) must equal the
    s2d regroup of preprocess_images(u8) EXACTLY (flips rewritten in s2d
    coordinates move the same pixels), and the backbone forward on the
    s2d input must match the stock stem to conv tolerance."""
    from show_tell_tpu.data.transforms import (
        host_space_to_depth,
        preprocess_images,
        preprocess_images_s2d,
    )
    from show_tell_tpu.ops.s2d_stem import space_to_depth

    rng = np.random.RandomState(11)
    u8 = rng.randint(0, 255, (4, 16, 16, 3), dtype=np.uint8)
    u8_s2d = host_space_to_depth(u8)
    assert u8_s2d.shape == (4, 8, 8, 12)
    # host relayout is the pure byte regroup
    np.testing.assert_array_equal(u8_s2d, np.asarray(space_to_depth(jnp.asarray(u8))))
    for augment in (False, True):
        key = jax.random.PRNGKey(7)
        ref = preprocess_images(jnp.asarray(u8), key, augment=augment, dtype=jnp.float32)
        got = preprocess_images_s2d(jnp.asarray(u8_s2d), key, augment=augment, dtype=jnp.float32)
        # same math, but XLA fuses the normalize differently across the
        # two program shapes — 1-ulp, not a layout error
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(space_to_depth(ref)), rtol=0, atol=1e-6
        )

    # backbone: s2d input == stock input through the full ResNet forward
    from show_tell_tpu.models.encoder import EncoderConfig, encoder_forward, init_encoder_params
    cfg = EncoderConfig(18, 24)
    params, state = init_encoder_params(jax.random.PRNGKey(0), cfg)
    u8 = rng.randint(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(1)
    x = preprocess_images(jnp.asarray(u8), key, augment=False, dtype=jnp.float32)
    xs = preprocess_images_s2d(jnp.asarray(host_space_to_depth(u8)), key, augment=False, dtype=jnp.float32)
    ref, _ = encoder_forward(params, state, cfg, x, training=False)
    got, _ = encoder_forward(params, state, cfg, xs, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)
