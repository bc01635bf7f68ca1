"""Attention decoder parity vs a torch oracle that re-enacts the reference
loop semantics (shrinking batch, w_t->w_t alignment, hidden re-init)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from show_tell_tpu.models.attention import (
    AttnDecoderConfig,
    attn_decoder_forward,
    attn_greedy_decode,
    attention_net,
    doubly_stochastic_penalty,
)
from show_tell_tpu.models.convert import attn_decoder_params_from_torch

B, T, E, C, A, H, V, L, P = 3, 6, 10, 12, 14, 16, 40, 2, 9


class TorchAttnOracle(torch.nn.Module):
    """Same parameterization as reference RNN_Attn (built as a test oracle);
    the step loop lives in the test functions below."""

    def __init__(self, cell):
        super().__init__()
        self.embeddings = torch.nn.Embedding(V, E)
        unit_cls = torch.nn.GRU if cell == "gru" else torch.nn.LSTM
        self.unit = unit_cls(2 * E, H, L, batch_first=True)
        self.linear = torch.nn.Linear(H, V)
        self.init_h = torch.nn.Linear(C, H)
        if cell == "lstm":
            self.init_c = torch.nn.Linear(C, H)
        self.embed = torch.nn.Linear(C, E)

        class Attn(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.encoder_att = torch.nn.Linear(C, A)
                self.decoder_att = torch.nn.Linear(H, A)
                self.full_att = torch.nn.Linear(A, 1)

            def forward(self, img_feat, hidden_state):
                a1 = self.encoder_att(img_feat)
                a2 = self.decoder_att(hidden_state)
                e = self.full_att(torch.nn.functional.leaky_relu(a1 + a2.unsqueeze(1), 0.2)).squeeze(2)
                alpha = torch.softmax(e, dim=1)
                ctx = (img_feat * alpha.unsqueeze(2)).sum(dim=1)
                return ctx, alpha

        self.attn = Attn()


def _setup(cell, seed=0):
    torch.manual_seed(seed)
    model = TorchAttnOracle(cell).eval()
    cfg = AttnDecoderConfig(cell, E, C, A, H, V, L)
    params = attn_decoder_params_from_torch(model.state_dict(), L)
    rng = np.random.RandomState(seed)
    feats = rng.randn(B, C, P).astype(np.float32)  # [B, C, positions]
    return model, cfg, params, feats


def _torch_init_hidden(model, cell, feats_t):
    h = model.init_h(feats_t.mean(dim=2)).unsqueeze(1).repeat(1, L, 1)  # [B, L, H]
    if cell == "lstm":
        c = model.init_c(feats_t.mean(dim=2)).unsqueeze(1).repeat(1, L, 1)
        return h, c
    return h


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_attention_net_matches(cell):
    model, cfg, params, feats = _setup(cell)
    hidden = np.random.RandomState(1).randn(B, H).astype(np.float32)
    with torch.no_grad():
        ref_ctx, ref_alpha = model.attn(
            torch.from_numpy(feats).transpose(1, 2), torch.from_numpy(hidden)
        )
    ctx, alpha = attention_net(params["attn"], jnp.asarray(np.swapaxes(feats, 1, 2)), jnp.asarray(hidden))
    np.testing.assert_allclose(np.asarray(ctx), ref_ctx.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), ref_alpha.numpy(), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_train_forward_matches_shrinking_batch_loop(cell):
    """Re-enact reference rnn_iterator train branch (rnn_attn.py:60-76)."""
    model, cfg, params, feats = _setup(cell)
    rng = np.random.RandomState(2)
    lengths = np.array([6, 4, 2], dtype=np.int64)  # descending (sorted batch)
    captions = rng.randint(0, V, (B, T)).astype(np.int64)

    feats_t = torch.from_numpy(feats)
    cap_t = torch.from_numpy(captions)
    with torch.no_grad():
        emb = model.embeddings(cap_t)  # [B, T, E]
        if cell == "gru":
            hidden = _torch_init_hidden(model, cell, feats_t)
        else:
            hidden, cell_state = _torch_init_hidden(model, cell, feats_t)
        preds = torch.zeros(B, T, V)
        alphas = torch.zeros(B, T, P)
        for t in range(T):
            bt = int(sum(l > t for l in lengths))
            ctx, alpha = model.attn(feats_t[:bt].transpose(1, 2), hidden[:bt, -1, :])
            x = torch.cat([emb[:bt, t, :], model.embed(ctx[:bt])], dim=1).unsqueeze(1)
            if cell == "gru":
                out, h2 = model.unit(x, hidden[:bt].transpose(0, 1).contiguous())
                hidden = torch.cat([h2.transpose(0, 1), hidden[bt:]], dim=0)
            else:
                out, (h2, c2) = model.unit(
                    x,
                    (hidden[:bt].transpose(0, 1).contiguous(), cell_state[:bt].transpose(0, 1).contiguous()),
                )
                hidden = torch.cat([h2.transpose(0, 1), hidden[bt:]], dim=0)
                cell_state = torch.cat([c2.transpose(0, 1), cell_state[bt:]], dim=0)
            preds[:bt, t, :] = model.linear(out.squeeze(1))
            alphas[:bt, t, :] = alpha

    ours_p, ours_a = attn_decoder_forward(
        params, cfg, jnp.asarray(feats), jnp.asarray(captions.astype(np.int32)), jnp.asarray(lengths.astype(np.int32))
    )
    np.testing.assert_allclose(np.asarray(ours_p), preds.numpy(), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ours_a), alphas.numpy(), rtol=2e-5, atol=2e-5)

    # Doubly-stochastic penalty parity (main_attn.py:131).
    ref_pen = float(((1.0 - alphas.sum(dim=1)) ** 2).mean())
    our_pen = float(doubly_stochastic_penalty(ours_a))
    assert abs(ref_pen - our_pen) < 1e-6


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_greedy_decode_matches(cell):
    """Re-enact reference rnn_iterator test branch (rnn_attn.py:77-94)."""
    model, cfg, params, feats = _setup(cell, seed=5)
    start = 1
    feats_t = torch.from_numpy(feats)
    with torch.no_grad():
        if cell == "gru":
            hidden = _torch_init_hidden(model, cell, feats_t)
        else:
            hidden, cell_state = _torch_init_hidden(model, cell, feats_t)
        w = model.embeddings(torch.full((B, 1), start, dtype=torch.long))
        ref_tokens = []
        for _ in range(25):
            ctx, _a = model.attn(feats_t.transpose(1, 2), hidden[:, -1, :])
            x = torch.cat([w[:, 0, :], model.embed(ctx)], dim=1).unsqueeze(1)
            if cell == "gru":
                out, h2 = model.unit(x, hidden.transpose(0, 1).contiguous())
                hidden = h2.transpose(0, 1)
            else:
                out, (h2, c2) = model.unit(
                    x, (hidden.transpose(0, 1).contiguous(), cell_state.transpose(0, 1).contiguous())
                )
                hidden, cell_state = h2.transpose(0, 1), c2.transpose(0, 1)
            tok = model.linear(out.squeeze(1)).max(1)[1]
            ref_tokens.append(tok)
            w = model.embeddings(tok).unsqueeze(1)
        ref = torch.stack(ref_tokens, 1).numpy()

    ours = np.asarray(attn_greedy_decode(params, cfg, jnp.asarray(feats), start))
    np.testing.assert_array_equal(ours, ref)


def test_attn_next_token_mode():
    """--attn_next_token computes CE against shifted targets with len-1
    valid steps (the corrected alignment; default stays faithful)."""
    import jax

    from show_tell_tpu.models.captioner import CaptionerConfig, captioner_loss, init_captioner
    from show_tell_tpu.models.attention import attn_decoder_forward
    from show_tell_tpu.models.decoder import masked_cross_entropy
    from show_tell_tpu.models.encoder import encoder_forward

    cfg_f = CaptionerConfig("attn", 18, 16, 24, 40, 1, nos_filters=512, attn_dim=8, alpha_c=0.0)
    cfg_nt = cfg_f._replace(attn_next_token=True)
    params, state = init_captioner(jax.random.PRNGKey(0), cfg_f)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(3, 64, 64, 3).astype(np.float32))
    captions = jnp.asarray(rng.randint(4, 40, (3, 8)).astype(np.int32))
    lengths = jnp.asarray(np.array([8, 6, 4], dtype=np.int32))

    loss_f, _ = captioner_loss(params, state, cfg_f, images, captions, lengths, training=False)
    loss_nt, _ = captioner_loss(params, state, cfg_nt, images, captions, lengths, training=False)
    assert float(loss_f) != float(loss_nt)

    # Manual recomputation of the next-token loss.
    feats, _ = encoder_forward(params["encoder"], state, cfg_nt.encoder_config(), images, training=False)
    lengths_nt = lengths - 1
    preds, _ = attn_decoder_forward(params["decoder"], cfg_nt.decoder_config(), feats, captions, lengths_nt)
    targets = jnp.concatenate([captions[:, 1:], jnp.zeros_like(captions[:, :1])], axis=1)
    want = float(masked_cross_entropy(preds, targets, lengths_nt))
    assert abs(float(loss_nt) - want) < 1e-6


@pytest.mark.parametrize("relpath,cell", [("Attention/rnn_attn.py", "gru"), ("Attention/rnn_attn_LSTM.py", "lstm")])
def test_attn_greedy_matches_live_reference_module(monkeypatch, relpath, cell):
    """Greedy decode differentially against the reference's ACTUAL
    attention modules imported live (sentence_index -> rnn_iterator test
    branch, rnn_attn.py:77-94,120-145): identical weights via
    attn_decoder_params_from_torch, identical ids.  The modules'
    unconditional .cuda() placements are identity-patched (CPU torch
    oracle), everything else runs the reference's own code."""
    from fixtures import load_reference_rnn_module

    ref = load_reference_rnn_module(relpath)
    if ref is None:
        pytest.skip("reference %s not importable here" % relpath)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)

    torch.manual_seed(4)
    m = ref.RNN_Attn(E, C, A, H, V, L).eval()
    params = attn_decoder_params_from_torch(m.state_dict(), L)
    cfg = AttnDecoderConfig(cell, E, C, A, H, V, L, max_caption_length=25)
    feats = np.random.RandomState(5).randn(B, C, P).astype(np.float32)

    class _Vocab:
        def __call__(self, word):
            return {"<start>": 1}[word]

    with torch.no_grad():
        want = m.sentence_index(torch.from_numpy(feats), _Vocab()).numpy()
    got = np.asarray(attn_greedy_decode(params, cfg, jnp.asarray(feats), 1))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("relpath,cell", [("Attention/rnn_attn.py", "gru"), ("Attention/rnn_attn_LSTM.py", "lstm")])
def test_attn_forward_matches_live_reference_module(monkeypatch, relpath, cell):
    """Teacher-forced training forward differentially against the
    reference's ACTUAL attention modules imported live: the w_t -> w_t
    alignment, the shrinking batch_size_t, the doubly-stochastic alphas
    and the packed logits (rnn_attn.py:60-94,96-120) must all match —
    torch's packing applied to our padded [B,T,V] predictions."""
    from fixtures import load_reference_rnn_module

    ref = load_reference_rnn_module(relpath)
    if ref is None:
        pytest.skip("reference %s not importable here" % relpath)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)

    torch.manual_seed(17)
    m = ref.RNN_Attn(E, C, A, H, V, L).eval()
    params = attn_decoder_params_from_torch(m.state_dict(), L)
    cfg = AttnDecoderConfig(cell, E, C, A, H, V, L)

    rng = np.random.RandomState(23)
    feats = rng.randn(B, C, P).astype(np.float32)
    lengths = np.sort(rng.randint(2, T + 1, B))[::-1].copy()
    captions = np.zeros((B, T), np.int64)
    for b in range(B):
        captions[b, : lengths[b]] = rng.randint(0, V, lengths[b])

    with torch.no_grad():
        want_packed, want_alphas = m(
            torch.from_numpy(feats), torch.from_numpy(captions), list(lengths)
        )
        want_packed, want_alphas = want_packed.numpy(), want_alphas.numpy()

    ours_p, ours_a = attn_decoder_forward(
        params, cfg, jnp.asarray(feats),
        jnp.asarray(captions.astype(np.int32)), jnp.asarray(lengths.astype(np.int32)),
    )
    got_packed = (
        torch.nn.utils.rnn.pack_padded_sequence(
            torch.from_numpy(np.asarray(ours_p)), list(lengths), batch_first=True
        )[0].numpy()
    )
    np.testing.assert_allclose(got_packed, want_packed, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_a), want_alphas, atol=2e-5, rtol=1e-5)
