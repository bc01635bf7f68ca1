"""Beam search tests: vectorized beam vs a per-hypothesis numpy oracle,
beam_size=1 == greedy prefix, and the faithful beam vs a torch re-enactment
of reference rnn.py:60-108."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from show_tell_tpu.decode.beam import beam_search_decode
from show_tell_tpu.decode.faithful_beam import faithful_beam_decode
from show_tell_tpu.models.decoder import (
    DecoderConfig,
    greedy_decode,
    init_decoder_params,
)
from show_tell_tpu.models.rnn_cells import init_state, stack_step

E, H, V, L = 8, 12, 20, 2
END, PAD = 2, 0


def setup(cell="gru", T=10, seed=0):
    cfg = DecoderConfig(cell, E, H, V, L, max_caption_length=T)
    params = init_decoder_params(jax.random.PRNGKey(seed), cfg)
    feat = np.random.RandomState(seed).randn(3, E).astype(np.float32)
    return cfg, params, feat


def oracle_beam_single(params, cfg, feat_1, K):
    """Textbook beam (beam_search.py:45-97 semantics) with explicit
    per-hypothesis state, run hypothesis-by-hypothesis."""
    step_fn = stack_step(cfg.cell_type)

    def step(x, st):
        top, st2 = step_fn(params["rnn"], jnp.asarray(x[None]), st)
        logits = np.asarray(
            jnp.dot(top, params["linear"]["w"]) + params["linear"]["b"]
        )[0]
        logp = logits - np.log(np.exp(logits - logits.max()).sum()) - logits.max()
        return logp, st2

    st0 = init_state(cfg.cell_type, cfg.num_layers, 1, cfg.hidden_dim)
    logp, st1 = step(feat_1, st0)
    order = np.argsort(-logp)[:K]
    hyps = [([int(t)], float(logp[t]), st1, int(t) == END) for t in order]

    for _ in range(cfg.max_caption_length - 1):
        cands = []
        for toks, score, st, fin in hyps:
            if fin:
                cands.append((toks + [PAD], score, st, True))
                continue
            x = np.asarray(params["embedding"][toks[-1]])
            logp, st2 = step(x, st)
            for t in np.argsort(-logp)[: K + 1]:
                cands.append((toks + [int(t)], score + float(logp[t]), st2, int(t) == END))
        cands.sort(key=lambda c: -c[1])
        hyps = cands[:K]
    return np.asarray(hyps[0][0]), hyps[0][1]


@pytest.mark.parametrize("cell", ["gru", "lstm"])
@pytest.mark.parametrize("K", [2, 3])
def test_beam_matches_oracle(cell, K):
    cfg, params, feat = setup(cell, T=8)
    got = np.asarray(beam_search_decode(params, cfg, jnp.asarray(feat), K, END, PAD))
    for b in range(feat.shape[0]):
        want, want_score = oracle_beam_single(params, cfg, feat[b], K)
        np.testing.assert_array_equal(got[b], want)


def test_beam1_equals_greedy_prefix():
    cfg, params, feat = setup("gru", T=12)
    beam = np.asarray(beam_search_decode(params, cfg, jnp.asarray(feat), 1, END, PAD))
    greedy = np.asarray(greedy_decode(params, cfg, jnp.asarray(feat)))
    for b in range(feat.shape[0]):
        ends = np.where(greedy[b] == END)[0]
        upto = (ends[0] + 1) if len(ends) else cfg.max_caption_length
        np.testing.assert_array_equal(beam[b, :upto], greedy[b, :upto])
        # After <end>, retired beam emits only <pad>.
        assert (beam[b, upto:] == PAD).all()


def test_faithful_beam_matches_torch_reenactment():
    torch = pytest.importorskip("torch")
    from show_tell_tpu.models.convert import decoder_params_from_torch

    torch.manual_seed(0)
    emb_t = torch.nn.Embedding(V, E)
    unit = torch.nn.GRU(E, H, L, batch_first=True)
    lin = torch.nn.Linear(H, V)
    sd = {"embeddings.weight": emb_t.weight}
    for k, v in unit.state_dict().items():
        sd["unit." + k] = v
    sd["linear.weight"], sd["linear.bias"] = lin.weight, lin.bias
    params = decoder_params_from_torch(sd, L)
    cfg = DecoderConfig("gru", E, H, V, L, max_caption_length=25)

    feat = np.random.RandomState(7).randn(1, E).astype(np.float32)
    K = 3

    # Re-enact reference rnn.py:60-108 exactly.
    with torch.no_grad():
        rnn_data = torch.from_numpy(feat).unsqueeze(1)
        next_state, hidden = unit(rnn_data, None)
        logits = lin(next_state.squeeze(1))
        topk = logits.topk(k=K, dim=1)[1]
        old_words = [topk[:, k] for k in range(K)]
        old_sents = [[topk[:, k]] for k in range(K)]
        idx = 1
        while idx < 25:
            idx += 1
            new_s, new_w, new_p = [], [], []
            for k in range(K):
                rnn_data = emb_t(old_words[k]).unsqueeze(1)
                next_state, hidden = unit(rnn_data, hidden)  # shared hidden
                logits = lin(next_state.squeeze(1))
                tk = logits.topk(k=K, dim=1)
                for j in range(K):
                    s = old_sents[k].copy()
                    s.append(tk[1][:, j])
                    new_s.append(s)
                    new_w.append(tk[1][:, j])
                    new_p.append(float(tk[0][:, j]))
            order = sorted(range(len(new_p)), key=lambda i: -new_p[i])[:K]
            old_sents = [new_s[i] for i in order]
            old_words = [new_w[i] for i in order]
        ref = torch.stack(old_sents[0], 1).squeeze().numpy()

    got = faithful_beam_decode(params, cfg, jnp.asarray(feat), K)
    np.testing.assert_array_equal(got, ref)


def test_faithful_beam_rejects_lstm():
    cfg, params, feat = setup("lstm")
    with pytest.raises(ValueError):
        faithful_beam_decode(params, cfg, jnp.asarray(feat[:1]), 3)


def test_attn_beam_matches_oracle():
    from show_tell_tpu.decode.beam import attn_beam_search_decode
    from show_tell_tpu.models.attention import (
        AttnDecoderConfig,
        _init_hidden,
        _last_h,
        _linear,
        attention_net,
        attn_greedy_decode,
        init_attn_decoder_params,
    )
    from show_tell_tpu.models.rnn_cells import stack_step

    C, A, P, K, T = 10, 12, 6, 3, 7
    acfg = AttnDecoderConfig("gru", E, C, A, H, V, L, max_caption_length=T)
    params = init_attn_decoder_params(jax.random.PRNGKey(1), acfg)
    feats = jnp.asarray(np.random.RandomState(2).randn(2, C, P).astype(np.float32))
    START = 1

    got = np.asarray(attn_beam_search_decode(params, acfg, feats, K, START, END, PAD))

    step = stack_step("gru")

    def one_step(tok, feats_b, st):
        w = params["embedding"][jnp.asarray([tok])]
        ctx, _ = attention_net(params["attn"], feats_b, _last_h(st, "gru"))
        x = jnp.concatenate([w, _linear(params["embed"], ctx)], axis=-1)
        top, st2 = step(params["rnn"], x, st)
        logits = np.asarray(_linear(params["linear"], top))[0]
        logp = logits - np.log(np.exp(logits - logits.max()).sum()) - logits.max()
        return logp, st2

    for b in range(feats.shape[0]):
        fb = feats[b:b + 1]
        fb_pm = jnp.swapaxes(fb, 1, 2)
        st0 = _init_hidden(params, acfg, fb)
        logp, st1 = one_step(START, fb_pm, st0)
        order = np.argsort(-logp)[:K]
        hyps = [([int(t)], float(logp[t]), st1, int(t) == END) for t in order]
        for _ in range(T - 1):
            cands = []
            for toks, score, st, fin in hyps:
                if fin:
                    cands.append((toks + [PAD], score, st, True))
                    continue
                lp, st2 = one_step(toks[-1], fb_pm, st)
                for t in np.argsort(-lp)[: K + 1]:
                    cands.append((toks + [int(t)], score + float(lp[t]), st2, int(t) == END))
            cands.sort(key=lambda c: -c[1])
            hyps = cands[:K]
        np.testing.assert_array_equal(got[b], np.asarray(hyps[0][0]))


def test_attn_beam1_equals_greedy_prefix():
    from show_tell_tpu.decode.beam import attn_beam_search_decode
    from show_tell_tpu.models.attention import (
        AttnDecoderConfig,
        attn_greedy_decode,
        init_attn_decoder_params,
    )

    C, A, P = 10, 12, 6
    acfg = AttnDecoderConfig("lstm", E, C, A, H, V, L, max_caption_length=10)
    params = init_attn_decoder_params(jax.random.PRNGKey(3), acfg)
    feats = jnp.asarray(np.random.RandomState(4).randn(3, C, P).astype(np.float32))
    beam = np.asarray(attn_beam_search_decode(params, acfg, feats, 1, 1, END, PAD))
    greedy = np.asarray(attn_greedy_decode(params, acfg, feats, 1))
    for b in range(3):
        ends = np.where(greedy[b] == END)[0]
        upto = (ends[0] + 1) if len(ends) else acfg.max_caption_length
        np.testing.assert_array_equal(beam[b, :upto], greedy[b, :upto])


# --------- generic callback beam vs reference beam_search.py ----------- #


def _markov_tables(seed, V):
    r = np.random.RandomState(seed)
    logits = r.randn(V, V)
    P = np.exp(logits - logits.max(axis=1, keepdims=True))
    return P / P.sum(axis=1, keepdims=True)


def test_generic_beam_hand_computed_three_steps():
    """Hand-worked 3-step example of the reference algorithm
    (beam_search.py:45-97): per-node top-K expansion, global keep-K by
    cum_cost, final raw-cum_cost ranking of retired hypotheses."""
    from show_tell_tpu.decode.generic import beam_search

    P = np.array(
        [
            [0.10, 0.60, 0.20, 0.10],
            [0.05, 0.05, 0.50, 0.40],
            [0.35, 0.25, 0.20, 0.20],
            [0.25, 0.25, 0.25, 0.25],
        ]
    )

    def gen(state, value):
        return P[value], state

    # Step 1: top-2 of P[0] -> [0,1](0.511), [0,2](1.609)
    # Step 2: expand both; keep [0,1,2](1.204), [0,1,3](1.427, end)
    # Step 3: [0,1,3] retires; fringe [0,1,2] expands but never retires.
    hyps = beam_search(lambda x: 0, gen, None, start_id=0, end_id=3, beam_width=2, max_length=3)
    assert hyps == [[0, 1, 3]]

    # max_length=2: nothing retires — the reference returns []; our
    # documented extension falls back to the cum_cost-best fringe node.
    hyps = beam_search(lambda x: 0, gen, None, start_id=0, end_id=3, beam_width=2, max_length=2)
    assert hyps == [[0, 1, 2]]


def test_generic_beam_differential_vs_reference_module():
    """Fuzz the generic beam against the ACTUAL reference beam_search.py
    (numpy-only, imported live from /root/reference) on random Markov
    token tables — sequences and ranking must agree exactly."""
    import importlib.util

    path = "/root/reference/beam_search.py"
    if not os.path.exists(path):
        pytest.skip("reference checkout not available")
    spec = importlib.util.spec_from_file_location("ref_beam_search", path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from show_tell_tpu.decode.generic import beam_search as ours

    V, END = 6, 5
    for seed in range(5):
        P = _markov_tables(seed, V)

        def init_ref(_x):
            return np.zeros((1, 1), dtype=np.float32)

        def gen_ref(_x, y_tm1, state_tm1):
            p_t = P[np.asarray(y_tm1)]
            return state_tm1.reshape(len(y_tm1), -1), p_t, [None] * len(y_tm1)

        def gen_ours(state, value):
            return P[value], state

        for K in (1, 2, 3, 4):
            for max_len in (3, 8, 30):
                got = ours(
                    lambda x: 0, gen_ours, None, start_id=0, end_id=END,
                    beam_width=K, num_hypotheses=K, max_length=max_len,
                )
                want_nodes = ref.beam_search(
                    init_ref, gen_ref, [0], start_id=0, end_id=END,
                    beam_width=K, num_hypotheses=K, max_length=max_len,
                )
                want = [n.to_sequence_of_values() for n in want_nodes]
                if want:
                    assert got == want, (seed, K, max_len)
                else:  # documented extension: fringe fallback instead of []
                    assert got, (seed, K, max_len)


# ------------------- early-exit greedy decode (serving) ---------------- #


def test_early_exit_greedy_matches_full_decode():
    """greedy_decode(end_token=...) must yield identical captions after
    <end> truncation, with <pad> after each sequence's first <end>."""
    cfg, params, feat = setup("gru", T=12)
    # Bias the output layer toward <end> so sequences finish at varied,
    # early steps (exercising the while_loop exit).
    params = dict(params)
    params["linear"] = dict(params["linear"])
    params["linear"]["b"] = params["linear"]["b"].at[END].add(3.0)

    full = np.asarray(jax.jit(lambda f: greedy_decode(params, cfg, f))(feat))
    ee = np.asarray(jax.jit(lambda f: greedy_decode(params, cfg, f, end_token=END))(feat))

    finished = 0
    for b in range(full.shape[0]):
        ends = np.where(full[b] == END)[0]
        cut = int(ends[0]) + 1 if len(ends) else full.shape[1]
        np.testing.assert_array_equal(ee[b, :cut], full[b, :cut])
        if len(ends):
            finished += 1
            assert (ee[b, cut:] == PAD).all()  # padded, not dont-care argmax
    assert finished > 0  # the bias actually triggered early <end>s


def test_early_exit_greedy_no_end_equals_full():
    """If no sequence ever emits <end>, the early-exit decode runs all T
    steps and is bit-equal to the fixed scan."""
    cfg, params, feat = setup("gru", T=8, seed=3)
    params = dict(params)
    params["linear"] = dict(params["linear"])
    params["linear"]["b"] = params["linear"]["b"].at[END].add(-50.0)  # never <end>
    full = np.asarray(greedy_decode(params, cfg, feat))
    ee = np.asarray(greedy_decode(params, cfg, feat, end_token=END))
    np.testing.assert_array_equal(ee, full)


def test_attn_beam_pallas_context_matches_xla():
    """The Pallas-context attention beam (interpret mode on CPU) must
    produce the same token ids as the XLA path."""
    from show_tell_tpu.decode.beam import attn_beam_search_decode
    from show_tell_tpu.models.attention import AttnDecoderConfig, init_attn_decoder_params

    C, A, P, K, T = 10, 12, 6, 3, 7
    acfg = AttnDecoderConfig("gru", E, C, A, H, V, L, max_caption_length=T)
    params = init_attn_decoder_params(jax.random.PRNGKey(4), acfg)
    feats = jnp.asarray(np.random.RandomState(5).randn(2, C, P).astype(np.float32))
    a = np.asarray(attn_beam_search_decode(params, acfg, feats, K, use_pallas=False))
    b = np.asarray(attn_beam_search_decode(params, acfg, feats, K, use_pallas=True))
    np.testing.assert_array_equal(a, b)


def test_beam_sparse_projection_matches_dense():
    """The fused projection+top-k beam step (sparse candidates) must
    produce the same hypotheses as the dense [B*K, V] path — the global
    top-K over K rows is contained in the union of per-row top-Ks
    (decode/beam.py _beam_engine sparse mode), for both cells and for
    models that retire beams early."""
    from show_tell_tpu.decode.beam import beam_search_decode

    for cell, bias in (("gru", 0.0), ("lstm", 0.0), ("gru", 3.0)):
        cfg = DecoderConfig(cell, E, H, V, L, max_caption_length=9)
        params = init_decoder_params(jax.random.PRNGKey(6), cfg)
        params = dict(params)
        params["linear"] = dict(params["linear"])
        params["linear"]["b"] = params["linear"]["b"].at[END].add(bias)  # bias>0: early retirement
        feat = jnp.asarray(np.random.RandomState(7).randn(4, E).astype(np.float32))
        dense = np.asarray(beam_search_decode(params, cfg, feat, 3, use_pallas=False))
        sparse = np.asarray(beam_search_decode(params, cfg, feat, 3, use_pallas=True))
        np.testing.assert_array_equal(sparse, dense, err_msg="%s bias=%s" % (cell, bias))


def test_beam_fused_step_matches_xla():
    """The fused recurrence+projection beam step (both variants: 'dense'
    logits out, and 'topk' sparse candidates out —
    ops/fused_beam_pallas.py) must produce bit-identical hypotheses to
    the XLA path, for both cells, incl. early-retiring models and the
    early_exit while_loop engine."""
    from show_tell_tpu.decode.beam import beam_search_decode

    for cell, bias in (("gru", 0.0), ("lstm", 0.0), ("gru", 3.0)):
        cfg = DecoderConfig(cell, E, H, V, L, max_caption_length=9)
        params = init_decoder_params(jax.random.PRNGKey(8), cfg)
        params = dict(params)
        params["linear"] = dict(params["linear"])
        params["linear"]["b"] = params["linear"]["b"].at[END].add(bias)
        feat = jnp.asarray(np.random.RandomState(9).randn(4, E).astype(np.float32))
        ref = np.asarray(beam_search_decode(params, cfg, feat, 3, use_pallas=False, fused_step=False))
        for variant in ("dense", "topk"):
            got = np.asarray(beam_search_decode(params, cfg, feat, 3, fused_step=variant))
            np.testing.assert_array_equal(got, ref, err_msg="%s bias=%s %s" % (cell, bias, variant))
        ee = np.asarray(
            beam_search_decode(params, cfg, feat, 3, fused_step="topk", early_exit=True)
        )
        np.testing.assert_array_equal(ee, ref, err_msg="%s bias=%s early_exit" % (cell, bias))


def test_attn_beam_fused_step_matches_xla():
    """The fused attention beam step ('dense': whole per-hypothesis step
    in one invocation, ops/fused_attn_pallas.py) must produce
    bit-identical hypotheses to the XLA path — both cells, incl. the
    early_exit engine."""
    from show_tell_tpu.decode.beam import attn_beam_search_decode
    from show_tell_tpu.models.attention import AttnDecoderConfig, init_attn_decoder_params

    C, A, P, K, T = 10, 12, 6, 3, 7
    for cell in ("gru", "lstm"):
        acfg = AttnDecoderConfig(cell, E, C, A, H, V, L, max_caption_length=T)
        params = init_attn_decoder_params(jax.random.PRNGKey(11), acfg)
        feats = jnp.asarray(np.random.RandomState(12).randn(2, C, P).astype(np.float32))
        ref = np.asarray(attn_beam_search_decode(params, acfg, feats, K, use_pallas=False, fused_step=False))
        got = np.asarray(attn_beam_search_decode(params, acfg, feats, K, fused_step="dense"))
        np.testing.assert_array_equal(got, ref, err_msg=cell)
        ee = np.asarray(
            attn_beam_search_decode(params, acfg, feats, K, fused_step="dense", early_exit=True)
        )
        np.testing.assert_array_equal(ee, ref, err_msg=cell + " early_exit")


def test_fused_step_shape_envelope_falls_back():
    """Configs the fused kernels cannot express — E > H (pooled: the
    layer-0 input cannot pad up to H) and H > 2E (attention: the x_buf
    scratch is 2E wide, the recurrence writes H of its columns) — must
    transparently keep the XLA path with identical ids even when
    fused_step is forced, instead of crashing inside weight stacking /
    scratch writes.  The envelope is the shared seam
    ops.fused_pooled_step_fits / fused_attn_step_fits (one place, every
    dispatch: greedy + beam)."""
    from show_tell_tpu.decode.beam import attn_beam_search_decode
    from show_tell_tpu.models.attention import AttnDecoderConfig, init_attn_decoder_params
    from show_tell_tpu.ops import fused_attn_step_fits, fused_pooled_step_fits
    from show_tell_tpu.ops.rnn_pallas import greedy_decode_pallas

    # The envelope itself: shape constraints bind everywhere, the VMEM
    # budget only off-interpret (CPU tests still exercise f32 kernels).
    assert not fused_pooled_step_fits("gru", 8, 12, np.float32, interpret=True)  # E > H
    assert fused_pooled_step_fits("lstm", 512, 256, np.float32, interpret=True)
    assert not fused_pooled_step_fits("lstm", 512, 256, np.float32)  # f32 gate budget
    assert fused_pooled_step_fits("lstm", 512, 256, jnp.bfloat16)  # bf16 serving shapes
    assert not fused_attn_step_fits("gru", 12, 4, np.float32, interpret=True)  # H > 2E
    assert not fused_attn_step_fits("lstm", 512, 512, np.float32)  # f32 gate budget
    assert fused_attn_step_fits("lstm", 512, 512, jnp.bfloat16)

    # Pooled, E > H: beam (forced fused) and greedy (kernel dispatch).
    cfg = DecoderConfig("gru", 12, 8, V, L, max_caption_length=7)
    params = init_decoder_params(jax.random.PRNGKey(3), cfg)
    feat = jnp.asarray(np.random.RandomState(4).randn(3, 12).astype(np.float32))
    ref = np.asarray(beam_search_decode(params, cfg, feat, 3, use_pallas=False, fused_step=False))
    got = np.asarray(beam_search_decode(params, cfg, feat, 3, fused_step="dense"))
    np.testing.assert_array_equal(got, ref)
    g_ref = np.asarray(greedy_decode(params, cfg, feat))
    g_got = np.asarray(greedy_decode_pallas(params, cfg, feat, interpret=True))
    np.testing.assert_array_equal(g_got, g_ref)

    # Attention, H > 2E: beam with the fused step forced.
    acfg = AttnDecoderConfig("gru", 4, 10, 12, 12, V, L, max_caption_length=7)
    aparams = init_attn_decoder_params(jax.random.PRNGKey(5), acfg)
    feats = jnp.asarray(np.random.RandomState(6).randn(2, 10, 6).astype(np.float32))
    a_ref = np.asarray(attn_beam_search_decode(aparams, acfg, feats, 3, use_pallas=False, fused_step=False))
    a_got = np.asarray(attn_beam_search_decode(aparams, acfg, feats, 3, fused_step="dense"))
    np.testing.assert_array_equal(a_got, a_ref)


def test_beam_early_exit_identical_ids():
    """early_exit beam (while_loop, stops when every beam retired) must
    return bit-identical ids to the full T-step scan — including models
    biased to retire early (the case where steps are actually skipped)
    and the attention engine's tuple state."""
    from show_tell_tpu.decode.beam import attn_beam_search_decode, beam_search_decode
    from show_tell_tpu.models.attention import AttnDecoderConfig, init_attn_decoder_params

    for cell, bias in (("gru", 0.0), ("gru", 3.0), ("lstm", 5.0)):
        cfg = DecoderConfig(cell, E, H, V, L, max_caption_length=9)
        params = init_decoder_params(jax.random.PRNGKey(11), cfg)
        params = dict(params)
        params["linear"] = dict(params["linear"])
        params["linear"]["b"] = params["linear"]["b"].at[END].add(bias)
        feat = jnp.asarray(np.random.RandomState(12).randn(4, E).astype(np.float32))
        full = np.asarray(beam_search_decode(params, cfg, feat, 3))
        fast = np.asarray(beam_search_decode(params, cfg, feat, 3, early_exit=True))
        np.testing.assert_array_equal(fast, full, err_msg="%s bias=%s" % (cell, bias))

    C, A, P = 10, 12, 6
    acfg = AttnDecoderConfig("gru", E, C, A, H, V, L, max_caption_length=8)
    ap = init_attn_decoder_params(jax.random.PRNGKey(13), acfg)
    ap = dict(ap)
    ap["linear"] = dict(ap["linear"])
    ap["linear"]["b"] = ap["linear"]["b"].at[END].add(3.0)
    feats = jnp.asarray(np.random.RandomState(14).randn(3, C, P).astype(np.float32))
    full = np.asarray(attn_beam_search_decode(ap, acfg, feats, 3))
    fast = np.asarray(attn_beam_search_decode(ap, acfg, feats, 3, early_exit=True))
    np.testing.assert_array_equal(fast, full)


def test_attn_lstm_beam1_equals_greedy_prefix():
    """Beam engine handles the attention-LSTM (h, c) state tuple: width-1
    beam equals the greedy decode up to <end> retirement."""
    from show_tell_tpu.decode.beam import attn_beam_search_decode
    from show_tell_tpu.models.attention import (
        AttnDecoderConfig,
        attn_greedy_decode,
        init_attn_decoder_params,
    )

    C, A, P, T = 10, 12, 6, 9
    acfg = AttnDecoderConfig("lstm", E, C, A, H, V, L, max_caption_length=T)
    params = init_attn_decoder_params(jax.random.PRNGKey(6), acfg)
    feats = jnp.asarray(np.random.RandomState(8).randn(3, C, P).astype(np.float32))
    beam = np.asarray(attn_beam_search_decode(params, acfg, feats, 1, 1, END, PAD))
    greedy = np.asarray(attn_greedy_decode(params, acfg, feats, 1))
    for b in range(3):
        ends = np.where(greedy[b] == END)[0]
        upto = (ends[0] + 1) if len(ends) else T
        np.testing.assert_array_equal(beam[b, :upto], greedy[b, :upto])
        assert (beam[b, upto:] == PAD).all()


def test_beam_matches_oracle_fuzz_shapes():
    """Property fuzz: the batched beam equals the per-hypothesis oracle
    across random (cell, K, T, seed) draws — shapes and tie patterns the
    fixed-shape cases don't cover."""
    rng = np.random.RandomState(42)
    for _ in range(4):
        cell = ["gru", "lstm"][rng.randint(2)]
        K = int(rng.randint(2, 5))
        T = int(rng.randint(3, 12))
        cfg, params, feat = setup(cell, T=T, seed=int(rng.randint(1000)))
        got = np.asarray(beam_search_decode(params, cfg, jnp.asarray(feat), K, END, PAD))
        for b in range(feat.shape[0]):
            want, _ = oracle_beam_single(params, cfg, feat[b], K)
            np.testing.assert_array_equal(got[b], want, err_msg="%s K=%d T=%d" % (cell, K, T))

def test_attn_early_exit_greedy_matches_full_decode():
    """attn_greedy_decode(end_token=...) yields identical captions after
    <end> truncation for both attention cells (while_loop over the
    attention carry — the serving early_exit path for attn variants)."""
    from show_tell_tpu.models.attention import (
        AttnDecoderConfig,
        attn_greedy_decode,
        init_attn_decoder_params,
    )

    START = 1
    for cell, bias in (("gru", 2.5), ("lstm", 2.5), ("gru", -50.0)):
        cfg = AttnDecoderConfig(cell, E, 16, 8, H, V, L, max_caption_length=12)
        params = init_attn_decoder_params(jax.random.PRNGKey(4), cfg)
        params = dict(params)
        params["linear"] = dict(params["linear"])
        # +bias: finish early at varied steps; -50: never finish (all 12
        # steps run and the two decodes must be bit-equal).
        params["linear"]["b"] = params["linear"]["b"].at[END].add(bias)
        feats = jnp.asarray(np.random.RandomState(5).randn(3, 16, 6).astype(np.float32))

        full = np.asarray(jax.jit(lambda f: attn_greedy_decode(params, cfg, f, START))(feats))
        ee = np.asarray(
            jax.jit(lambda f: attn_greedy_decode(params, cfg, f, START, end_token=END))(feats)
        )
        finished = 0
        for b in range(full.shape[0]):
            ends = np.where(full[b] == END)[0]
            cut = int(ends[0]) + 1 if len(ends) else full.shape[1]
            np.testing.assert_array_equal(ee[b, :cut], full[b, :cut])
            if len(ends):
                finished += 1
                assert (ee[b, cut:] == PAD).all()
        if bias > 0:
            assert finished > 0, (cell, full)
        else:
            np.testing.assert_array_equal(ee, full)


# --------- live differential vs the reference's own rnn.py ----------- #


def test_decode_paths_match_live_reference_rnn_module():
    """Greedy sentence_index AND the quirky in-class beam, differentially
    against the reference's ACTUAL rnn.py imported live (no torch
    re-enactment in the middle): identical weights via
    decoder_params_from_torch, identical features, identical ids out.
    Greedy: rnn.py:44-58 at B=4.  Beam: rnn.py:60-108 at B=1, K=3
    (shared-hidden-state, last-logit ranking — the quirks
    faithful_beam_decode reproduces)."""
    torch = pytest.importorskip("torch")
    from fixtures import load_reference_rnn_module

    from show_tell_tpu.models.convert import decoder_params_from_torch

    ref = load_reference_rnn_module()
    if ref is None:
        pytest.skip("reference rnn.py not importable here")

    torch.manual_seed(5)
    m = ref.RNN(E, H, V, L).eval()
    params = decoder_params_from_torch(m.state_dict(), L)
    cfg = DecoderConfig("gru", E, H, V, L, max_caption_length=25)

    feat = np.random.RandomState(11).randn(4, E).astype(np.float32)
    with torch.no_grad():
        want_greedy = m.sentence_index(torch.from_numpy(feat), beam_size=0).numpy()
    got_greedy = np.asarray(greedy_decode(params, cfg, jnp.asarray(feat)))
    np.testing.assert_array_equal(got_greedy, want_greedy)

    with torch.no_grad():
        want_beam = m.sentence_index(torch.from_numpy(feat[:1]), beam_size=3).numpy()
    got_beam = np.asarray(faithful_beam_decode(params, cfg, jnp.asarray(feat[:1]), 3))
    np.testing.assert_array_equal(got_beam, want_beam)
