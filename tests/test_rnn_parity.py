"""Numerics parity: our GRU/LSTM cells & decoder vs torch oracles (fp32).

SURVEY.md §4c: port small torch weights and assert per-step logit parity.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from show_tell_tpu.models.convert import (
    decoder_params_from_torch,
    decoder_params_to_torch,
)
from show_tell_tpu.models.decoder import (
    DecoderConfig,
    decoder_forward,
    greedy_decode,
    init_decoder_params,
    masked_cross_entropy,
)
from show_tell_tpu.models.rnn_cells import rnn_scan, init_state

B, T, E, H, V, L = 4, 7, 16, 24, 50, 3


class TorchRNN(torch.nn.Module):
    """Same topology as reference rnn.py:12-25 (built here as an oracle)."""

    def __init__(self, cell, embed_dim=E, hidden=H, vocab=V, layers=L):
        super().__init__()
        self.embeddings = torch.nn.Embedding(vocab, embed_dim)
        unit_cls = torch.nn.GRU if cell == "gru" else torch.nn.LSTM
        self.unit = unit_cls(embed_dim, hidden, layers, batch_first=True)
        self.linear = torch.nn.Linear(hidden, vocab)


def make_pair(cell):
    torch.manual_seed(0)
    model = TorchRNN(cell).eval()
    params = decoder_params_from_torch(model.state_dict(), L)
    cfg = DecoderConfig(cell, E, H, V, L)
    return model, params, cfg


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_rnn_scan_matches_torch(cell):
    model, params, cfg = make_pair(cell)
    x = np.random.RandomState(1).randn(B, T, E).astype(np.float32)
    with torch.no_grad():
        ref, _ = model.unit(torch.from_numpy(x))
    state = init_state(cell, L, B, H)
    ours, _ = rnn_scan(params["rnn"], cell, jnp.asarray(x), state)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_teacher_forced_logits_match_packed_torch(cell):
    """Our masked [B,T,V] logits == torch packed logits at valid positions,
    and masked CE == torch CrossEntropyLoss on packed targets."""
    model, params, cfg = make_pair(cell)
    rng = np.random.RandomState(2)
    feat = rng.randn(B, E).astype(np.float32)
    lengths = np.array([7, 6, 4, 2], dtype=np.int64)  # descending (sorted batch)
    captions = rng.randint(0, V, (B, T)).astype(np.int64)
    for i, l in enumerate(lengths):
        captions[i, l:] = 0

    with torch.no_grad():
        cap_t = torch.from_numpy(captions)
        emb = model.embeddings(cap_t)
        raw = torch.cat((torch.from_numpy(feat).unsqueeze(1), emb), 1)
        packed = torch.nn.utils.rnn.pack_padded_sequence(raw, list(lengths), batch_first=True)
        out_packed = model.unit(packed)[0]
        ref_logits = model.linear(out_packed[0])  # [sum(L), V]
        tgt_packed = torch.nn.utils.rnn.pack_padded_sequence(cap_t, list(lengths), batch_first=True)[0]
        ref_loss = torch.nn.CrossEntropyLoss()(ref_logits, tgt_packed).item()

    ours = decoder_forward(params, cfg, jnp.asarray(feat), jnp.asarray(captions.astype(np.int32)), jnp.asarray(lengths.astype(np.int32)))
    ours_np = np.asarray(ours)

    # Re-pack our [B,T,V] logits in torch's packed order (time-major).
    packed_rows = []
    for t in range(T):
        for b in range(B):
            if t < lengths[b]:
                packed_rows.append(ours_np[b, t])
    packed_rows = np.stack(packed_rows)
    np.testing.assert_allclose(packed_rows, ref_logits.numpy(), rtol=2e-5, atol=2e-5)

    our_loss = float(
        masked_cross_entropy(ours, jnp.asarray(captions.astype(np.int32)), jnp.asarray(lengths.astype(np.int32)))
    )
    assert abs(our_loss - ref_loss) < 1e-5


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_greedy_decode_matches_torch_loop(cell):
    model, params, cfg = make_pair(cell)
    feat = np.random.RandomState(3).randn(B, E).astype(np.float32)

    with torch.no_grad():
        rnn_data = torch.from_numpy(feat).unsqueeze(1)
        hidden = None
        ref_tokens = []
        for _ in range(25):
            next_state, hidden = model.unit(rnn_data, hidden)
            logits = model.linear(next_state.squeeze(1))
            tok = logits.max(1)[1]
            ref_tokens.append(tok)
            rnn_data = model.embeddings(tok).unsqueeze(1)
        ref = torch.stack(ref_tokens, 1).numpy()

    ours = np.asarray(greedy_decode(params, cfg, jnp.asarray(feat)))
    np.testing.assert_array_equal(ours, ref)


def test_state_freezing_with_lengths():
    """rnn_scan with lengths freezes state for finished sequences."""
    _, params, cfg = make_pair("gru")
    rng = np.random.RandomState(4)
    x = rng.randn(B, T, E).astype(np.float32)
    lengths = jnp.asarray([T, 3, 5, 1], dtype=jnp.int32)
    state = init_state("gru", L, B, H)
    _, final_full = rnn_scan(params["rnn"], "gru", jnp.asarray(x), state)
    _, final_masked = rnn_scan(params["rnn"], "gru", jnp.asarray(x), state, lengths=lengths)
    # Sample 1's state must equal a 3-step-only run.
    _, final_3 = rnn_scan(params["rnn"], "gru", jnp.asarray(x[:, :3]), state)
    np.testing.assert_allclose(
        np.asarray(final_masked)[:, 1], np.asarray(final_3)[:, 1], rtol=1e-6, atol=1e-6
    )
    # And differ from the unmasked full run.
    assert not np.allclose(np.asarray(final_masked)[:, 1], np.asarray(final_full)[:, 1])


def test_converter_roundtrip():
    key = jax.random.PRNGKey(0)
    cfg = DecoderConfig("gru", E, H, V, L)
    params = init_decoder_params(key, cfg)
    sd = decoder_params_to_torch(params)
    back = decoder_params_from_torch(sd, L)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)), params, back)


def test_lstm_greedy_matches_live_reference_module():
    """Greedy decode differentially against the reference's ACTUAL
    LSTM/rnn_lstm.py imported live (sentence_index, rnn_lstm.py:38-53):
    identical weights via decoder_params_from_torch, identical ids."""
    from fixtures import load_reference_rnn_module

    ref = load_reference_rnn_module("LSTM/rnn_lstm.py")
    if ref is None:
        pytest.skip("reference LSTM/rnn_lstm.py not importable here")

    torch.manual_seed(9)
    m = ref.RNN(E, H, V, L).eval()
    params = decoder_params_from_torch(m.state_dict(), L)
    cfg = DecoderConfig("lstm", E, H, V, L, max_caption_length=25)
    feat = np.random.RandomState(3).randn(B, E).astype(np.float32)
    with torch.no_grad():
        want = m.sentence_index(torch.from_numpy(feat)).numpy()
    got = np.asarray(greedy_decode(params, cfg, jnp.asarray(feat)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("relpath,cell", [("rnn.py", "gru"), ("LSTM/rnn_lstm.py", "lstm")])
def test_forward_matches_live_reference_module(relpath, cell):
    """Teacher-forced training forward differentially against the
    reference's ACTUAL modules imported live: the packed logits the
    reference computes (prepended image feature, pack_padded_sequence
    dropping the final concat position — rnn.py:29-34) must equal
    torch's packing of our padded [B,T,V] logits."""
    from fixtures import load_reference_rnn_module

    ref = load_reference_rnn_module(relpath)
    if ref is None:
        pytest.skip("reference %s not importable here" % relpath)

    torch.manual_seed(13)
    m = ref.RNN(E, H, V, L).eval()
    params = decoder_params_from_torch(m.state_dict(), L)
    cfg = DecoderConfig(cell, E, H, V, L)

    rng = np.random.RandomState(21)
    feat = rng.randn(B, E).astype(np.float32)
    lengths = np.sort(rng.randint(2, T + 1, B))[::-1].copy()
    captions = np.zeros((B, T), np.int64)
    for b in range(B):
        captions[b, : lengths[b]] = rng.randint(0, V, lengths[b])

    with torch.no_grad():
        want_packed = m(
            torch.from_numpy(feat), torch.from_numpy(captions), list(lengths)
        ).numpy()
    ours = np.asarray(
        decoder_forward(
            params, cfg, jnp.asarray(feat),
            jnp.asarray(captions.astype(np.int32)), jnp.asarray(lengths.astype(np.int32)),
        )
    )
    got_packed = (
        torch.nn.utils.rnn.pack_padded_sequence(
            torch.from_numpy(ours), list(lengths), batch_first=True
        )[0].numpy()
    )
    np.testing.assert_allclose(got_packed, want_packed, atol=2e-5, rtol=1e-5)
