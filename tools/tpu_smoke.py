"""On-chip smoke suite: validates the Pallas kernels and hot paths on the
REAL TPU (the pytest suite runs them in interpreter mode on CPU).

Run: python tools/tpu_smoke.py          (~5-8 min incl. compiles)

Checks (printed PASS/FAIL):
  1. fused GRU stack-step kernel == XLA cell stack (f32 exact-ish)
  2. fused LSTM stack-step kernel == XLA cell stack
  3. pallas greedy decode tokens == XLA scan decode (bf16; ties tolerated)
  4. attention-context kernel == attention_net
  5. preprocessing kernel == XLA preprocess (within FMA noise)
  6. one train step runs finite on-chip
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def check(name, ok, detail=""):
    print("%-45s %s %s" % (name, "PASS" if ok else "FAIL", detail))
    return ok


def main():
    print("devices:", jax.devices())
    ok = True
    rng = np.random.RandomState(0)

    from show_tell_tpu.models.decoder import DecoderConfig, greedy_decode, init_decoder_params
    from show_tell_tpu.models.rnn_cells import stack_step_gru, stack_step_lstm
    from show_tell_tpu.ops.rnn_pallas import (
        greedy_decode_pallas,
        gru_stack_step_pallas,
        lstm_stack_step_pallas,
        prepare_rnn_weights,
    )

    B, E, H, L, V = 128, 256, 512, 5, 9956
    cfg_g = DecoderConfig("gru", E, H, V, L)
    params_g = init_decoder_params(jax.random.PRNGKey(0), cfg_g)
    stacked = prepare_rnn_weights(params_g["rnn"])
    x = jnp.asarray(rng.randn(B, E).astype(np.float32))
    hs = jnp.asarray(rng.randn(L, B, H).astype(np.float32))
    ref_top, _ = stack_step_gru(params_g["rnn"], x, hs)
    top, _ = gru_stack_step_pallas(stacked, x, hs, interpret=False)
    diff = float(jnp.abs(top - ref_top).max())
    ok &= check("gru stack-step kernel", diff < 5e-4, "maxdiff=%.2e" % diff)

    # LSTM kernel in bf16 (the serving dtype): f32 4-gate weights at H=512
    # exceed the double-buffered VMEM budget (see ops/rnn_pallas.py).
    bf16 = jnp.bfloat16
    cfg_l = DecoderConfig("lstm", E, H, V, L)
    params_l = init_decoder_params(jax.random.PRNGKey(1), cfg_l)
    pl16 = jax.tree.map(lambda a: a.astype(bf16), params_l)
    stacked_l = prepare_rnn_weights(pl16["rnn"])
    cs = jnp.asarray(rng.randn(L, B, H).astype(np.float32))
    ref_top, _ = stack_step_lstm(pl16["rnn"], x.astype(bf16), (hs.astype(bf16), cs.astype(bf16)))
    top, _ = lstm_stack_step_pallas(stacked_l, x.astype(bf16), hs.astype(bf16), cs.astype(bf16), interpret=False)
    diff = float(jnp.abs(top.astype(jnp.float32) - ref_top.astype(jnp.float32)).max())
    ok &= check("lstm stack-step kernel (bf16)", diff < 5e-2, "maxdiff=%.2e" % diff)

    bf = jnp.bfloat16
    pg = jax.tree.map(lambda a: a.astype(bf), params_g)
    feat = jnp.asarray(rng.randn(B, E).astype(np.float32)).astype(bf)
    a = np.asarray(jax.jit(lambda f: greedy_decode(pg, cfg_g, f))(feat))
    b = np.asarray(jax.jit(lambda f: greedy_decode_pallas(pg, cfg_g, f, interpret=False))(feat))
    agree = (a == b).mean()
    ok &= check("pallas greedy decode (bf16)", agree > 0.95, "token agreement=%.3f" % agree)

    from show_tell_tpu.ops.vocab_pallas import (
        prepare_vocab,
        project_argmax_pallas,
        project_topk_pallas,
    )

    lin32 = {"w": jnp.asarray(rng.randn(H, V).astype(np.float32)).astype(bf),
             "b": jnp.asarray(rng.randn(V).astype(np.float32)).astype(bf)}
    top_in = jnp.asarray(rng.randn(128, H).astype(np.float32)).astype(bf)
    logits = jnp.dot(top_in, lin32["w"], preferred_element_type=jnp.float32) + lin32["b"].astype(jnp.float32)
    prepared = prepare_vocab(lin32)
    tok = np.asarray(jax.jit(lambda t: project_argmax_pallas(prepared, t))(top_in))
    agree = (tok == np.asarray(jnp.argmax(logits, axis=-1))).mean()
    ok &= check("vocab projection+argmax kernel", agree == 1.0, "agreement=%.3f" % agree)

    tv, ti = jax.jit(lambda t: project_topk_pallas(prepared, t, 3))(top_in)
    rv, ri = jax.lax.top_k(jax.nn.log_softmax(logits, axis=-1), 3)
    ids_ok = (np.asarray(ti) == np.asarray(ri)).mean()
    vdiff = float(jnp.abs(tv - rv).max())
    ok &= check("vocab projection+top-k kernel", ids_ok == 1.0 and vdiff < 1e-3,
                "ids=%.3f lsediff=%.1e" % (ids_ok, vdiff))

    from show_tell_tpu.models.attention import AttnDecoderConfig, attention_net, init_attn_decoder_params
    from show_tell_tpu.ops.attention_pallas import attention_context_pallas, precompute_att1

    acfg = AttnDecoderConfig("gru", 512, 2048, 512, 512, V, L)
    ap = init_attn_decoder_params(jax.random.PRNGKey(2), acfg)
    feats_pm = jnp.asarray(rng.randn(64, 49, 2048).astype(np.float32))
    hidden = jnp.asarray(rng.randn(64, 512).astype(np.float32))
    rc, ra = attention_net(ap["attn"], feats_pm, hidden)
    att1 = precompute_att1(ap["attn"], feats_pm)
    c, al = attention_context_pallas(ap["attn"], feats_pm, att1, hidden, interpret=False)
    diff = float(jnp.abs(c - rc).max())
    ok &= check("attention-context kernel", diff < 1e-2, "ctx maxdiff=%.2e" % diff)

    from show_tell_tpu.data.transforms import preprocess_images
    from show_tell_tpu.ops.preprocess_pallas import preprocess_images_pallas

    imgs = jnp.asarray(rng.randint(0, 255, (32, 224, 224, 3), dtype=np.uint8))
    ref = preprocess_images(imgs, jax.random.PRNGKey(0), augment=False, dtype=jnp.float32)
    got = preprocess_images_pallas(imgs, dtype=jnp.float32, interpret=False)
    diff = float(jnp.abs(got - ref).max())
    ok &= check("preprocess kernel", diff < 1e-5, "maxdiff=%.2e" % diff)

    from show_tell_tpu.models.resnet import BN_EPS, _max_pool_3x3s2, init_resnet_params
    from show_tell_tpu.ops.stem_pallas import prepare_stem, stem_fused_pallas

    rp, rs = init_resnet_params(jax.random.PRNGKey(5), 18)
    x32 = preprocess_images(imgs, jax.random.PRNGKey(0), augment=False, dtype=jnp.float32)
    h = jax.lax.conv_general_dilated(
        x32, rp["conv1.weight"], (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    mult = rp["bn1.weight"] * jax.lax.rsqrt(rs["bn1.running_var"] + BN_EPS)
    ref_stem = _max_pool_3x3s2(jax.nn.relu(h * mult + (rp["bn1.bias"] - rs["bn1.running_mean"] * mult)))
    got_stem = jax.jit(lambda u: stem_fused_pallas(u, prepare_stem(rp, rs, dtype=jnp.float32)))(imgs)
    diff = float(jnp.abs(got_stem - ref_stem).max())
    ok &= check("fused stem kernel", diff < 1e-2, "maxdiff=%.2e" % diff)

    from show_tell_tpu.models.captioner import CaptionerConfig
    from show_tell_tpu.train.optim import make_optimizer
    from show_tell_tpu.train.train_step import create_train_state, make_train_step

    tcfg = CaptionerConfig("gru", 50, 64, 128, 500, 2)
    opt = make_optimizer("SGD", 0.01, 0.9)
    ts = create_train_state(jax.random.PRNGKey(3), tcfg, opt)
    step = make_train_step(tcfg, opt)
    images = rng.randint(0, 255, (16, 224, 224, 3), dtype=np.uint8)
    caps = rng.randint(4, 500, (16, 16)).astype(np.int32)
    lens = np.sort(rng.randint(4, 17, 16))[::-1].astype(np.int32).copy()
    _, loss = step(ts, images, caps, lens)
    ok &= check("train step on-chip", bool(np.isfinite(float(loss))), "loss=%.3f" % float(loss))

    print("\nsmoke:", "ALL PASS" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


def bench_decode():
    """`python tools/tpu_smoke.py --bench`: Pallas hybrid decode vs the
    XLA scan at serving shapes (VERDICT r1 item 4).  Each timing is a
    median of 5 reps x 5 iters after 12 warmups; run in a fresh process.
    (bench.py's HEADLINE throughput uses min-of-7 instead — see
    bench._best_time.  The smoke table keeps median because each row is
    an A/B RATIO measured under one estimator on both sides, where
    median's robustness matters more than absolute calibration.)

    Besides the printed table, writes one JSON line per kernel A/B to
    smoke_bench.json at the repo root so round-over-round kernel
    regressions are diffable (`git diff smoke_bench.json`)."""
    import json
    import time

    rows = []

    def record(kernel, B, t_xla, t_pallas):
        rows.append({
            "kernel": kernel, "batch": B,
            "xla_ms": round(t_xla * 1e3, 2), "pallas_ms": round(t_pallas * 1e3, 2),
            "speedup": round(t_xla / t_pallas, 2),
        })

    from show_tell_tpu.models.decoder import DecoderConfig, greedy_decode, init_decoder_params
    from show_tell_tpu.ops.rnn_pallas import greedy_decode_pallas
    from show_tell_tpu.models.attention import (
        AttnDecoderConfig,
        attn_greedy_decode,
        init_attn_decoder_params,
    )
    from show_tell_tpu.ops.attention_pallas import attn_greedy_decode_pallas

    bf = jnp.bfloat16
    rng = np.random.RandomState(0)

    def timeit(fn, args_list):
        """Median of 5 reps of 5 back-to-back calls, cycling DISTINCT
        argument arrays — repeated identical executions through the
        remote-compile tunnel can return absurdly fast (CLAUDE.md), the
        same reason bench.py's _best_time cycles its inputs."""
        n = 0
        for _ in range(12):
            jax.block_until_ready(fn(args_list[n % len(args_list)]))
            n += 1
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(5):
                out = fn(args_list[n % len(args_list)])
                n += 1
            jax.block_until_ready(out)
            ts.append((time.perf_counter() - t0) / 5)
        return sorted(ts)[2]

    def variants(arr, k=6):
        """k distinct same-shape inputs (fresh random draws)."""
        return [jnp.asarray(rng.randn(*arr.shape).astype(np.float32)).astype(arr.dtype) for _ in range(k)]

    E, H, V, L = 256, 512, 9956, 5
    # whole_decode=False pins these rows to the per-STEP fused kernel so
    # they stay comparable round-over-round; the whole-decode kernel (a
    # measured negative, default OFF) gets its own A/B rows below.
    print("Pooled greedy decode (fully fused step kernel), 25 steps, H=512 L=5 V=9956 bf16:")
    for cell, batches in (("gru", (256, 512)), ("lstm", (512,))):
        for B in batches:
            cfg = DecoderConfig(cell, E, H, V, L)
            params = jax.tree.map(lambda a: a.astype(bf), init_decoder_params(jax.random.PRNGKey(0), cfg))
            feat_set = variants(jnp.zeros((B, E), bf))
            xla_fn = jax.jit(lambda f: greedy_decode(params, cfg, f))
            pls_fn = jax.jit(lambda f: greedy_decode_pallas(params, cfg, f, interpret=False, whole_decode=False))
            t_x, t_p = timeit(xla_fn, feat_set), timeit(pls_fn, feat_set)
            record(f"{cell}_greedy", B, t_x, t_p)
            print(f"  {cell} B={B}: xla {t_x*1e3:6.2f} ms   pallas {t_p*1e3:6.2f} ms   ({t_x/t_p:.2f}x)")

    # T-amplified row: at T=25 the per-decode kernel deltas (~0.1ms) sit
    # inside the tunnel's +-0.4ms run-to-run noise; 200 steps amplify the
    # per-step difference 8x above it, which is how the fused-step win
    # was established (ARCHITECTURE.md "Measured limits").
    print("GRU greedy decode, T=200 amplification (kernel-delta resolution):")
    for B in (512,):
        cfg = DecoderConfig("gru", E, H, V, L, max_caption_length=200)
        params = jax.tree.map(lambda a: a.astype(bf), init_decoder_params(jax.random.PRNGKey(0), cfg))
        feat_set = variants(jnp.zeros((B, E), bf))
        xla_fn = jax.jit(lambda f: greedy_decode(params, cfg, f))
        pls_fn = jax.jit(lambda f: greedy_decode_pallas(params, cfg, f, interpret=False, whole_decode=False))
        t_x, t_p = timeit(xla_fn, feat_set), timeit(pls_fn, feat_set)
        record("gru_greedy_t200", B, t_x, t_p)
        print(f"  B={B}: xla {t_x*1e3:6.2f} ms   pallas {t_p*1e3:6.2f} ms   ({t_x/t_p:.2f}x)")

    # Whole-decode kernel (ops/whole_decode_pallas.py): ALL T steps in
    # ONE Mosaic invocation.  Baseline column = the per-step fused
    # kernel (the previous best), so 'speedup' reads whole-over-step.
    # Both T=25 (serving shape) and T=200 (delta resolution) rows; the
    # on-chip outputs are asserted bit-equal before timing.
    print("GRU greedy decode, WHOLE-decode kernel vs per-step fused kernel:")
    for T, tag in ((25, "gru_greedy_whole"), (200, "gru_greedy_whole_t200")):
        B = 512
        cfg = DecoderConfig("gru", E, H, V, L, max_caption_length=T)
        params = jax.tree.map(lambda a: a.astype(bf), init_decoder_params(jax.random.PRNGKey(0), cfg))
        feat_set = variants(jnp.zeros((B, E), bf))
        step_fn = jax.jit(lambda f: greedy_decode_pallas(params, cfg, f, interpret=False, whole_decode=False))
        whole_fn = jax.jit(lambda f: greedy_decode_pallas(params, cfg, f, interpret=False, whole_decode=True))
        same = bool((step_fn(feat_set[0]) == whole_fn(feat_set[0])).all())
        t_s, t_w = timeit(step_fn, feat_set), timeit(whole_fn, feat_set)
        record(tag, B, t_s, t_w)
        print(f"  T={T} B={B}: per-step {t_s*1e3:6.2f} ms   WHOLE {t_w*1e3:6.2f} ms   ({t_s/t_w:.2f}x)  bit-equal={same}")

    print("Attention GRU greedy decode, 25 steps, E=H=A=512 V=9956 bf16:")
    for B in (256,):
        acfg = AttnDecoderConfig("gru", 512, 2048, 512, 512, V, L)
        ap = jax.tree.map(lambda a: a.astype(bf), init_attn_decoder_params(jax.random.PRNGKey(2), acfg))
        feat_set = variants(jnp.zeros((B, 2048, 49), bf))
        xla_fn = jax.jit(lambda f: attn_greedy_decode(ap, acfg, f, 1))
        pls_fn = jax.jit(lambda f: attn_greedy_decode_pallas(ap, acfg, f, 1, interpret=False))
        t_x, t_p = timeit(xla_fn, feat_set), timeit(pls_fn, feat_set)
        record("attn_greedy", B, t_x, t_p)
        print(f"  B={B}: xla {t_x*1e3:6.2f} ms   pallas {t_p*1e3:6.2f} ms   ({t_x/t_p:.2f}x)")

    # FULLY fused attention step (ops/fused_attn_pallas.py) vs the
    # composite context+projection kernels — T=200 amplification; the
    # baseline column here is the COMPOSITE (the previous best), so
    # 'speedup' reads as fused-over-composite.
    from show_tell_tpu.ops.fused_attn_pallas import attn_greedy_decode_fused_pallas

    print("Attention greedy decode, T=200, FULLY fused step vs composite kernels:")
    for cell in ("gru", "lstm"):
        acfg = AttnDecoderConfig(cell, 512, 2048, 512, 512, V, L, max_caption_length=200)
        ap = jax.tree.map(lambda a: a.astype(bf), init_attn_decoder_params(jax.random.PRNGKey(2), acfg))
        feat_set = variants(jnp.zeros((256, 2048, 49), bf))
        comp_fn = jax.jit(lambda f: attn_greedy_decode_pallas(ap, acfg, f, 1, interpret=False))
        fused_fn = jax.jit(lambda f: attn_greedy_decode_fused_pallas(ap, acfg, f, 1, interpret=False))
        t_c, t_f = timeit(comp_fn, feat_set), timeit(fused_fn, feat_set)
        record(f"attn_{cell}_greedy_fused_t200", 256, t_c, t_f)
        print(f"  {cell} B=256: composite {t_c*1e3:7.2f} ms   FUSED {t_f*1e3:7.2f} ms   ({t_c/t_f:.2f}x)")

    from show_tell_tpu.decode.beam import beam_search_decode

    print("GRU beam-3 decode, 25 steps (sparse projection+top-k kernel):")
    for B in (256,):
        cfg = DecoderConfig("gru", E, H, V, L)
        params = jax.tree.map(lambda a: a.astype(bf), init_decoder_params(jax.random.PRNGKey(0), cfg))
        feat_set = variants(jnp.zeros((B, E), bf))
        xla_fn = jax.jit(lambda f: beam_search_decode(params, cfg, f, 3, use_pallas=False))
        pls_fn = jax.jit(lambda f: beam_search_decode(params, cfg, f, 3, use_pallas=True))
        t_x, t_p = timeit(xla_fn, feat_set), timeit(pls_fn, feat_set)
        record("gru_beam3", B, t_x, t_p)
        print(f"  B={B}: xla {t_x*1e3:6.2f} ms   pallas {t_p*1e3:6.2f} ms   ({t_x/t_p:.2f}x)")

    # Fused recurrence+projection beam step (ops/fused_beam_pallas.py),
    # T=200 amplification like gru_greedy_t200 — per-step kernel deltas
    # need ~8x headroom over the tunnel's +-0.4ms noise.  Both published
    # beam widths (BASELINE.json configs row 3); 'dense' keeps XLA
    # log_softmax+top_k, 'topk' extracts per-block candidates in-kernel.
    print("GRU beam decode, T=200 amplification, fused recurrence+projection:")
    for K in (3, 5):
        cfg = DecoderConfig("gru", E, H, V, L, max_caption_length=200)
        params = jax.tree.map(lambda a: a.astype(bf), init_decoder_params(jax.random.PRNGKey(0), cfg))
        feat_set = variants(jnp.zeros((256, E), bf))
        base_fn = jax.jit(lambda f, K=K: beam_search_decode(params, cfg, f, K, use_pallas=False, fused_step=False))
        dense_fn = jax.jit(lambda f, K=K: beam_search_decode(params, cfg, f, K, fused_step="dense"))
        topk_fn = jax.jit(lambda f, K=K: beam_search_decode(params, cfg, f, K, fused_step="topk"))
        t_b = timeit(base_fn, feat_set)
        t_d = timeit(dense_fn, feat_set)
        t_k = timeit(topk_fn, feat_set)
        record(f"gru_beam{K}_fused_dense_t200", 256, t_b, t_d)
        record(f"gru_beam{K}_fused_topk_t200", 256, t_b, t_k)
        print(f"  K={K} B=256: xla {t_b*1e3:7.2f} ms   fused-dense {t_d*1e3:7.2f} ms ({t_b/t_d:.2f}x)   fused-topk {t_k*1e3:7.2f} ms ({t_b/t_k:.2f}x)")

    from show_tell_tpu.decode.beam import attn_beam_search_decode

    print("Attention GRU beam-3 decode, 25 steps (context per hypothesis):")
    for B in (128,):
        acfg = AttnDecoderConfig("gru", 512, 2048, 512, 512, V, L)
        ap = jax.tree.map(lambda a: a.astype(bf), init_attn_decoder_params(jax.random.PRNGKey(2), acfg))
        feat_set = variants(jnp.zeros((B, 2048, 49), bf))
        xla_fn = jax.jit(lambda f: attn_beam_search_decode(ap, acfg, f, 3, use_pallas=False))
        pls_fn = jax.jit(lambda f: attn_beam_search_decode(ap, acfg, f, 3, use_pallas=True))
        t_x, t_p = timeit(xla_fn, feat_set), timeit(pls_fn, feat_set)
        record("attn_beam3", B, t_x, t_p)
        print(f"  B={B}: xla {t_x*1e3:6.2f} ms   pallas {t_p*1e3:6.2f} ms   ({t_x/t_p:.2f}x)")

    # Fused attention beam step (whole per-hypothesis step in one
    # invocation, dense logits out) vs the previous best (context
    # kernel), T=200 amplification; baseline column = composite.  Both
    # published widths (BASELINE.json configs x beam widths 3/5).
    print("Attention GRU beam, T=200, fused step vs context-kernel composite:")
    for K in (3, 5):
        B = 128
        acfg = AttnDecoderConfig("gru", 512, 2048, 512, 512, V, L, max_caption_length=200)
        ap = jax.tree.map(lambda a: a.astype(bf), init_attn_decoder_params(jax.random.PRNGKey(2), acfg))
        feat_set = variants(jnp.zeros((B, 2048, 49), bf))
        comp_fn = jax.jit(lambda f, K=K: attn_beam_search_decode(ap, acfg, f, K, use_pallas=True, fused_step=False))
        fused_fn = jax.jit(lambda f, K=K: attn_beam_search_decode(ap, acfg, f, K, fused_step="dense"))
        t_c, t_f = timeit(comp_fn, feat_set), timeit(fused_fn, feat_set)
        record(f"attn_beam{K}_fused_t200", B, t_c, t_f)
        print(f"  K={K} B={B}: composite {t_c*1e3:7.2f} ms   FUSED {t_f*1e3:7.2f} ms   ({t_c/t_f:.2f}x)")

    print("early_exit while_loop vs fixed 25-step scan (GRU, B=256):")
    # Two bounding cases: a random model never emits <end> (the while_loop
    # runs all 25 steps — pure loop overhead vs the scan) and an
    # END-biased model retires the whole batch after ~1 step (the floor).
    # Real savings sit between: decode time follows the longest caption,
    # ~12 tokens on trained COCO models.
    for B in (256,):
        cfg = DecoderConfig("gru", E, H, V, L)
        base = jax.tree.map(lambda a: a.astype(bf), init_decoder_params(jax.random.PRNGKey(0), cfg))
        biased = dict(base)
        biased["linear"] = dict(biased["linear"])
        biased["linear"]["b"] = biased["linear"]["b"].at[2].add(50.0)
        feat_set = variants(jnp.zeros((B, E), bf))
        for tag, p in (("noexit", base), ("floor", biased)):
            fix_fn = jax.jit(lambda f, p=p: greedy_decode(p, cfg, f))
            ee_fn = jax.jit(lambda f, p=p: greedy_decode(p, cfg, f, end_token=2))
            t_f, t_e = timeit(fix_fn, feat_set), timeit(ee_fn, feat_set)
            record("gru_greedy_ee_" + tag, B, t_f, t_e)
            print(f"  greedy {tag:6s}: scan {t_f*1e3:6.2f} ms   early_exit {t_e*1e3:6.2f} ms   ({t_f/t_e:.2f}x)")
            bfix_fn = jax.jit(lambda f, p=p: beam_search_decode(p, cfg, f, 3, use_pallas=False))
            bee_fn = jax.jit(
                lambda f, p=p: beam_search_decode(p, cfg, f, 3, use_pallas=False, early_exit=True)
            )
            t_f, t_e = timeit(bfix_fn, feat_set), timeit(bee_fn, feat_set)
            record("gru_beam3_ee_" + tag, B, t_f, t_e)
            print(f"  beam-3 {tag:6s}: scan {t_f*1e3:6.2f} ms   early_exit {t_e*1e3:6.2f} ms   ({t_f/t_e:.2f}x)")

    print("early_exit x use_pallas composition (attention GRU greedy, B=256):")
    # The shared while_loop engine wraps the SAME step either way; this
    # row shows the fused context+projection kernels keep their win when
    # nothing retires (pure engine overhead case — the worst case for
    # the composition).
    for B in (256,):
        acfg = AttnDecoderConfig("gru", 512, 2048, 512, 512, V, L)
        ap = jax.tree.map(lambda a: a.astype(bf), init_attn_decoder_params(jax.random.PRNGKey(2), acfg))
        feat_set = variants(jnp.zeros((B, 2048, 49), bf))
        xla_fn = jax.jit(lambda f: attn_greedy_decode(ap, acfg, f, 1, end_token=2))
        pls_fn = jax.jit(lambda f: attn_greedy_decode_pallas(ap, acfg, f, 1, interpret=False, end_token=2))
        t_x, t_p = timeit(xla_fn, feat_set), timeit(pls_fn, feat_set)
        record("attn_greedy_ee_pallas", B, t_x, t_p)
        print(f"  B={B}: xla-ee {t_x*1e3:6.2f} ms   pallas-ee {t_p*1e3:6.2f} ms   ({t_x/t_p:.2f}x)")

    out_path = os.path.join(os.path.dirname(__file__), "..", "smoke_bench.json")
    with open(out_path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print("wrote", os.path.normpath(out_path))
    return 0


if __name__ == "__main__":
    if "--bench" in sys.argv:
        raise SystemExit(bench_decode())
    raise SystemExit(main())
