"""Benchmark: COCO-style captions/sec at batched greedy decode on one chip.

The pipeline measured is the full serving path of the flagship model
(reference default config: ResNet-101 + 5-layer GRU-512, vocab 9956):
uint8 image in -> device preprocessing (/255, normalize) -> ResNet-101
encode -> 25-step greedy GRU decode -> token ids out.

Prints ONE JSON line:
  {"metric": "captions_per_sec_per_chip_greedy", "value": N,
   "unit": "captions/s/chip", "vs_baseline": N}

vs_baseline is measured throughput / 1250 captions/s/chip — the per-chip
share of the north-star target (>=10k captions/s on a v5e-8 slice,
BASELINE.json; the reference itself publishes no throughput numbers).
"""

import json
import os
import sys
import time

import numpy as np


def _best_time(fn, args_list, iters: int = 5, reps: int = 7):
    """Returns (min, median) over reps of (iters back-to-back calls) /
    iters; the last call of each rep is blocked on.  args_list supplies
    one argument tuple per call (cycled) so RNG keys can vary.

    The HEADLINE estimator is min ("min_of_7x5" in the emitted JSON):
    this chip sits on a SHARED pool behind a remote tunnel, where
    interference is strictly additive — a rep is only ever slower than
    the machine, never faster (each rep is 5 real back-to-back
    executions on fixed shapes; there is nothing to cache-luck).  The
    median regresses with pool weather (r02 7,369 vs r03 7,299 cap/s on
    the SAME build, inside the documented ±1.5 ms swing), while min-of-7
    estimates the uncontended capability the same way `timeit` documents
    min as "the lowest value gives a lower bound ... higher values are
    typically caused by other processes".

    HISTORY (ADVICE r4): rounds 1-3 headlines were median-of-5; round 4
    switched to min-of-7 without recording it, so r04's 7,400.58 is not
    comparable to r01-r03.  From round 5 on, both estimators are emitted
    in the same JSON line (value=min, median_value=median) so every
    cross-round comparison can be made under a matching estimator."""
    import jax

    times = []
    n = 0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args_list[n % len(args_list)])
            n += 1
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters)
    times.sort()
    return times[0], times[len(times) // 2]


def _flagship_cfg(variant: str = "gru"):
    """Flagship config per variant (reference defaults: ResNet-101,
    5-layer hidden-512 decoder, vocab 9956; embed 256 for GRU, 512 for
    the LSTM/attention CLIs)."""
    from show_tell_tpu.models.captioner import CaptionerConfig

    return CaptionerConfig(
        variant=variant,
        resnet_version=101,
        embed_dim=256 if variant == "gru" else 512,
        hidden_dim=512,
        vocab_size=9956,
        num_layers=5,
    )


def _analytic_macs(cfg):
    """Analytic decode MACs for the MFU lines: (per-step, per-image-once).

    Decoder step: gates*(in0*H + H*H) for layer 0 + 2*H*H per upper
    layer, + the H*V vocab projection; attention adds the per-step
    context math, with att1 hoisted once per image (models/attention.py).
    Encoder (ResNet-101@224) is a separate 7.80e9 MACs/image constant at
    the call sites (torchvision-reported madds)."""
    E, H, V_ = cfg.embed_dim, cfg.hidden_dim, cfg.vocab_size
    gates = 3 if cfg.cell_type == "gru" else 4  # GRU r,z,n / LSTM i,f,g,o
    in0 = 2 * E if cfg.is_attention else E  # attn concatenates word+context
    step_macs = gates * (in0 * H + H * H) + (cfg.num_layers - 1) * gates * (2 * H * H) + H * V_
    once_macs = 0.0
    if cfg.is_attention:  # per-step attention/context/embed-proj + hoisted att1
        C, A, P = cfg.nos_filters, cfg.attn_dim, 49
        step_macs += H * A + P * A + 2 * P * C + C * E  # dec_att, full_att, alpha+ctx, embed proj
        once_macs = P * C * A  # hoisted att1 (per image, not per step)
    return step_macs, once_macs


def _flagship_params(variant: str = "gru"):
    """Flagship config + params/state cast to the bf16 serving dtype —
    shared by every serving bench."""
    import jax
    import jax.numpy as jnp

    from show_tell_tpu.models.captioner import init_captioner

    cfg = _flagship_cfg(variant)
    params, state = init_captioner(jax.random.PRNGKey(0), cfg)
    bf = jnp.bfloat16
    params = jax.tree.map(lambda x: x.astype(bf) if x.dtype == jnp.float32 else x, params)
    state = jax.tree.map(lambda x: x.astype(bf), state)
    return cfg, params, state


def _device_watchdog(seconds: float = 1200.0):
    """The axon tunnel can wedge (observed: a 5h+ outage where even a
    tiny matmul never returned).  A hung bench leaves NO artifact; this
    prints a diagnostic JSON line and exits instead, once `seconds`
    passes without the first device execution completing.  The bound is
    ~6x a congested-hour first compile (~200s), so a slow-but-alive pool
    never trips it.  Call cancel() after the first block_until_ready."""
    import os
    import threading

    def fire():
        print(
            json.dumps(
                {
                    "metric": "bench_error",
                    "value": 0,
                    "unit": "device unresponsive",
                    "vs_baseline": 0,
                    "error": "first device execution did not complete in %ds (axon tunnel wedged?)" % seconds,
                }
            ),
            flush=True,
        )
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def _warmup(serve, batch: int, warmup: int = 12, s2d: bool = False):
    """Compile + steady-state warmup (the first ~10 executions through
    the axon tunnel run slower than steady state)."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    warm = jnp.zeros((batch, 112, 112, 12) if s2d else (batch, 224, 224, 3), jnp.uint8)
    dog = _device_watchdog()
    for i in range(warmup):
        serve(warm, jax.random.fold_in(key, i)).block_until_ready()
        if i == 0:
            dog.cancel()
    return key


def _flagship_serve(batch: int, warmup: int = 12, variant: str = "gru", s2d: bool = False):
    """Shared setup for the serving benches: flagship bf16 params and a
    warmed-up jitted uint8->caption-ids greedy decode.  s2d=True takes
    host-emitted space-to-depth input ([B,112,112,12] uint8 — the
    relayout-free stem path, ops/s2d_stem.py / VERDICT r4 item 4)."""
    import jax
    import jax.numpy as jnp

    from show_tell_tpu.data.transforms import preprocess_images, preprocess_images_s2d
    from show_tell_tpu.models.captioner import captioner_greedy_decode

    cfg, params, state = _flagship_params(variant)
    pre = preprocess_images_s2d if s2d else preprocess_images

    @jax.jit
    def serve(images_u8, key):
        return captioner_greedy_decode(
            params, state, cfg, pre(images_u8, key, augment=False, dtype=jnp.bfloat16)
        )

    key = _warmup(serve, batch, warmup, s2d=s2d)
    return cfg, serve, key


def bench_train(batch: int = 256, variant: str = "gru", bf16: bool = False):
    """Secondary mode (`python bench.py --train [B]` / `--train_attn`):
    full train-step throughput in f32 (parity dtype); add `--bf16` for
    the mixed-precision mode (`--train_dtype bfloat16`: bf16 compute,
    f32 master weights/optimizer — train_step.py).  Reference
    baseline: ~402 samples/s on an RTX 2080 (28.6h for 100 epochs x 414k
    samples, BASELINE.md).
    Note: measure in a FRESH process, and expect run-to-run variance on
    this shared TPU pool (~1.5x absolute swing hour-to-hour; an early
    round-2 session saw 31-730ms/step at identical B=256 work).  Across
    later fresh-run pairs B=256 consistently beats B=128 (best 9,310
    samples/s @ 0.851 MFU vs 8,100); B=384+ degrades."""
    import jax

    from show_tell_tpu.train.optim import make_optimizer
    from show_tell_tpu.train.train_step import create_train_state, make_train_step

    import jax.numpy as jnp

    cfg = _flagship_cfg(variant)
    opt = make_optimizer("SGD", 0.001, 0.9)
    ts = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = make_train_step(cfg, opt, augment=True, compute_dtype=jnp.bfloat16 if bf16 else None)

    rng = np.random.RandomState(0)
    T = 32
    images = rng.randint(0, 255, (batch, 224, 224, 3), dtype=np.uint8)
    captions = rng.randint(4, 9956, (batch, T)).astype(np.int32)
    lengths = np.sort(rng.randint(8, T + 1, batch))[::-1].astype(np.int32).copy()

    dog = _device_watchdog()
    for i in range(12):
        ts, loss = step(ts, images, captions, lengths)
        if i == 0:
            jax.block_until_ready(loss)
            dog.cancel()
    jax.block_until_ready(loss)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, loss = step(ts, images, captions, lengths)
    jax.block_until_ready(loss)
    sps = batch * iters / (time.perf_counter() - t0)
    # Analytic MFU vs the v5e bf16 peak: frozen encoder fwd only
    # (backbone takes no backward, cnn.py:47) + decoder fwd+bwd (3x fwd
    # matmul FLOPs) over the padded T steps.  Matmuls under jax default
    # precision run bf16-pass on TPU even for f32 arrays.
    step_macs, once_macs = _analytic_macs(cfg)
    if cfg.is_attention:
        once_macs += cfg.nos_filters * cfg.hidden_dim  # init_h (trains, unlike decode)
    flops_per_sample = 2 * 7.80e9 + 3 * 2 * (step_macs * T + once_macs)
    mfu = flops_per_sample * sps / 197e12
    print(
        json.dumps(
            {
                "metric": "train_samples_per_sec_per_chip"
                + ("" if variant == "gru" else "_" + variant)
                + ("_bf16" if bf16 else ""),
                "value": round(sps, 2),
                "unit": "samples/s/chip",
                "vs_baseline": round(sps / 402.0, 3),
                "mfu": round(mfu, 3),
            }
        )
    )


def main(variant: str = "gru", batch_default: int = 512, s2d: bool = False):
    import jax
    import jax.numpy as jnp

    batch_args = [a for a in sys.argv[1:] if a.isdigit()]
    batch = int(batch_args[0]) if batch_args else batch_default
    cfg, serve, key = _flagship_serve(batch, variant=variant, s2d=s2d)
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 255, (batch, 224, 224, 3), dtype=np.uint8)
    if s2d:
        from show_tell_tpu.data.transforms import host_space_to_depth

        raw = host_space_to_depth(raw)  # the host pipeline emits this layout
    images = jnp.asarray(raw)

    dt_iter, dt_median = _best_time(serve, [(images, jax.random.fold_in(key, i)) for i in range(25)])

    cps = batch / dt_iter
    metric = "captions_per_sec_per_chip_greedy"
    if variant != "gru":
        metric += "_" + variant
    if s2d:
        metric += "_s2d"
    # Analytic-FLOPs MFU vs the v5e bf16 peak (197 TFLOP/s).  Encoder:
    # ResNet-101@224 = 7.80 GMACs/image (torchvision-reported madds).
    # Decoder step: 5-layer GRU-512 (layer0 in-dim 256) + vocab proj.
    step_macs, once_macs = _analytic_macs(cfg)
    flops_per_img = 2 * (7.80e9 + step_macs * cfg.max_caption_length + once_macs)
    mfu = flops_per_img * batch / dt_iter / 197e12
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(cps, 2),
                "unit": "captions/s/chip",
                "vs_baseline": round(cps / 1250.0, 3),
                "mfu": round(mfu, 3),
                "estimator": "min_of_7x5",
                "median_value": round(batch / dt_median, 2),
            }
        )
    )


def bench_latency(batch: int = 8):
    """`python bench.py --latency [B]`: p50 per-image serving latency at a
    small batch (north-star secondary metric, BASELINE.json)."""
    import jax
    import jax.numpy as jnp

    cfg, serve, key = _flagship_serve(batch, warmup=15)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (batch, 224, 224, 3), dtype=np.uint8))
    lats = []
    for i in range(30):
        t0 = time.perf_counter()
        serve(images, jax.random.fold_in(key, 100 + i)).block_until_ready()
        lats.append(time.perf_counter() - t0)
    p50 = sorted(lats)[len(lats) // 2]
    print(
        json.dumps(
            {
                "metric": "p50_batch%d_serve_latency_ms" % batch,
                "value": round(p50 * 1e3, 2),
                "unit": "ms",
                # vs_baseline stays a dimensionless ratio like every other
                # mode: the implied throughput over the 1250/chip target.
                "vs_baseline": round((batch / p50) / 1250.0, 3),
                "ms_per_image": round((p50 / batch) * 1e3, 3),
            }
        )
    )


def bench_latency_suite(only_batch: int = 0):
    """`python bench.py --latency_suite [B]`: the BASELINE.json p50
    per-image latency grid — greedy and beam-3, B=1 and B=8, early-exit
    off/on — one JSON line per config (8 rows; pass B to run one
    batch-size half, 8 compiles can exceed a 10-min window when the
    tunnel is congested).  Early-exit rows use an
    UNTRAINED model whose captions never emit <end>, so they measure the
    while_loop engine's worst case (pure overhead), not the caption-
    length win a trained model sees (see smoke_bench gru_*_ee_floor for
    the retire-early bound)."""
    import jax
    import jax.numpy as jnp

    from show_tell_tpu.data.transforms import preprocess_images
    from show_tell_tpu.decode.beam import beam_search_decode
    from show_tell_tpu.models.captioner import captioner_greedy_decode
    from show_tell_tpu.models.encoder import encoder_forward

    cfg, params, state = _flagship_params("gru")
    rng = np.random.RandomState(0)
    for batch in ((only_batch,) if only_batch else (1, 8)):
        images = jnp.asarray(rng.randint(0, 255, (batch, 224, 224, 3), dtype=np.uint8))
        for mode in ("greedy", "beam3"):
            for ee in (0, 1):

                @jax.jit
                def serve(images_u8, key, mode=mode, ee=ee):
                    imgs = preprocess_images(images_u8, key, augment=False, dtype=jnp.bfloat16)
                    if mode == "greedy":
                        return captioner_greedy_decode(
                            params, state, cfg, imgs, end_token=2 if ee else None
                        )
                    feats, _ = encoder_forward(
                        params["encoder"], state, cfg.encoder_config(), imgs, training=False
                    )
                    return beam_search_decode(
                        params["decoder"], cfg.decoder_config(), feats, 3, early_exit=bool(ee)
                    )

                key = _warmup(serve, batch, warmup=15)
                lats = []
                for i in range(30):
                    t0 = time.perf_counter()
                    serve(images, jax.random.fold_in(key, 100 + i)).block_until_ready()
                    lats.append(time.perf_counter() - t0)
                p50 = sorted(lats)[len(lats) // 2]
                print(
                    json.dumps(
                        {
                            "metric": "p50_latency_ms_%s_b%d_ee%d" % (mode, batch, ee),
                            "value": round(p50 * 1e3, 2),
                            "unit": "ms",
                            "vs_baseline": round((batch / p50) / 1250.0, 3),
                            "ms_per_image": round((p50 / batch) * 1e3, 3),
                        }
                    ),
                    flush=True,
                )


def bench_beam(beam: int = 3, batch: int = 256, variant: str = "gru"):
    """`python bench.py --beam [K] [B] [--attn|--lstm|--attn_lstm]`:
    batched beam-search serving throughput for every model family
    (BASELINE.json north-star beam configs are widths 3/5, crossed with
    all four variants).  The beam rides the batch dimension: one
    log-softmax + top-k over k*V per step, per-hypothesis state gathered
    on device (decode/beam.py); the attention families recompute context
    per hypothesis through the fused step kernel (attn_beam_search_decode)
    — the reference's beam runs batch=1 on host-synced steps and its
    attention models have no beam at all (rnn_attn.py:120-145)."""
    import jax
    import jax.numpy as jnp

    from show_tell_tpu.data.transforms import preprocess_images
    from show_tell_tpu.decode.beam import attn_beam_search_decode, beam_search_decode
    from show_tell_tpu.models.encoder import encoder_forward

    cfg, params, state = _flagship_params(variant)

    @jax.jit
    def serve(images_u8, key):
        images = preprocess_images(images_u8, key, augment=False, dtype=jnp.bfloat16)
        feats, _ = encoder_forward(params["encoder"], state, cfg.encoder_config(), images, training=False)
        if cfg.is_attention:
            return attn_beam_search_decode(params["decoder"], cfg.decoder_config(), feats, beam)
        return beam_search_decode(params["decoder"], cfg.decoder_config(), feats, beam)

    key = _warmup(serve, batch)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (batch, 224, 224, 3), dtype=np.uint8))
    dt, dt_median = _best_time(serve, [(images, jax.random.fold_in(key, 100 + i)) for i in range(25)])
    cps = batch / dt
    # Analytic MFU, same treatment as the greedy line: encoder once per
    # image; decode step 0 runs B rows, steps 1..T-1 run B*K hypothesis
    # rows through the identical step math (decode/beam.py).
    step_macs, once_macs = _analytic_macs(cfg)
    T = cfg.max_caption_length
    flops_per_img = 2 * (7.80e9 + step_macs * (1 + (T - 1) * beam) + once_macs)
    mfu = flops_per_img * batch / dt / 197e12
    print(
        json.dumps(
            {
                "metric": "captions_per_sec_per_chip_beam%d" % beam
                + ("" if variant == "gru" else "_" + variant),
                "value": round(cps, 2),
                "unit": "captions/s/chip",
                "vs_baseline": round(cps / 1250.0, 3),
                "mfu": round(mfu, 3),
                "estimator": "min_of_7x5",
                "median_value": round(batch / dt_median, 2),
            }
        )
    )


def _make_jpeg_dataset(n_images: int, prefix: str = "bench_input_"):
    """Synthetic COCO-shaped dataset of 640x480 q90 JPEGs (one caption
    per image).  Smooth gradient + noise approximates photo JPEG entropy
    (pure noise decodes ~2x slower than photos; pure gradients ~2x
    faster).  Returns (ann_path, img_dir, images_meta).  The tree is
    atexit-registered for removal so an aborted bench (compile error,
    ^C) doesn't strand tens of MB in /tmp; the benches still rmtree
    eagerly on their normal path."""
    import atexit
    import os
    import shutil
    import tempfile

    from PIL import Image

    root = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    images_meta, anns = [], []
    yy, xx = np.mgrid[0:480, 0:640]
    for i in range(n_images):
        base = (yy[..., None] * 0.3 + xx[..., None] * 0.2 + np.array([i % 97, i % 53, i % 31]) * 2)
        arr = (base % 256 + rng.randint(0, 60, (480, 640, 3))).astype(np.uint8)
        fname = "img_%05d.jpg" % i
        Image.fromarray(arr).save(os.path.join(img_dir, fname), quality=90)
        images_meta.append({"id": i, "file_name": fname})
        anns.append({"id": i, "image_id": i, "caption": "a synthetic benchmark image number %d" % i})
    ann_path = os.path.join(root, "ann.json")
    with open(ann_path, "w") as f:
        json.dump({"images": images_meta, "annotations": anns}, f)
    return ann_path, img_dir, images_meta


class _MiniVocab:  # minimal vocab: ids irrelevant to throughput
    word_to_index = {"<pad>": 0, "<start>": 1, "<end>": 2, "<unk>": 3}

    def __call__(self, w):
        return self.word_to_index.get(w, 3)


class _ServeVocab:
    """Full-width stand-in vocab for serve.Captioner benches (ids ->
    synthetic words; formatting cost is identical to a real vocab)."""

    def __init__(self, size: int):
        self.index_to_word = ["<pad>", "<start>", "<end>", "<unk>"] + [
            "w%d" % i for i in range(4, size)
        ]
        self.word_to_index = {w: i for i, w in enumerate(self.index_to_word)}

    def start_token(self):
        return "<start>"

    def end_token(self):
        return "<end>"

    def __call__(self, w):
        return self.word_to_index.get(w, 3)

    def __len__(self):
        return len(self.index_to_word)


def bench_serve_e2e(batch: int = 64, n_images: int = 512):
    """`python bench.py --serve_e2e [B]`: the deployment CLI's pipeline
    (serve.caption_paths) from JPEG files to caption strings, three ways:

      serial     load batch -> caption batch, strictly alternating
      overlap    the CLI default: host decodes batch k+1 while the chip
                 captions batch k (background thread)
      cache warm --image_cache second pass: pixels from .npy, no decode

    On a 1-core host the decode dominates (~150-250 img/s), so overlap's
    ceiling is hiding the ~7% of chip time; the cache removes the decode
    entirely and recovers chip-bound serving for repeated corpora."""
    import os
    import shutil

    import jax

    from show_tell_tpu.data.serve_cache import ServeImageCache
    from show_tell_tpu.models.captioner import init_captioner
    from show_tell_tpu.serve import Captioner, caption_paths

    ann_path, img_dir, _ = _make_jpeg_dataset(n_images, prefix="bench_serve_")
    root = os.path.dirname(ann_path)
    paths = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir))

    cfg = _flagship_cfg()
    params, bn_state = init_captioner(jax.random.PRNGKey(0), cfg)
    cap = Captioner(
        {"encoder": params["encoder"], "decoder": params["decoder"]},
        bn_state, cfg, _ServeVocab(cfg.vocab_size),
    )
    # compile + warm the serving program off the clock
    warm = cap.load_files(paths[:batch])
    for _ in range(12):
        cap.caption(warm)

    def run(**kw):
        t0 = time.perf_counter()
        n = sum(1 for _ in caption_paths(cap, paths, batch, **kw))
        return n / (time.perf_counter() - t0)

    serial = run(overlap=False)
    overlap = run(overlap=True)
    cache_dir = os.path.join(root, "serve_cache")
    from show_tell_tpu.data.dataset import IMAGE_SIZE

    cache = ServeImageCache(cache_dir, IMAGE_SIZE, fast_jpeg=False)
    run(overlap=True, cache=cache)  # fill pass (decodes + writes .npy)
    warm_rate = run(overlap=True, cache=cache)
    shutil.rmtree(root)

    print(
        json.dumps(
            {
                "metric": "serve_e2e_captions_per_sec",
                "value": round(warm_rate, 2),
                "unit": "captions/s (1 host core, warm image cache)",
                "vs_baseline": round(warm_rate / 1250.0, 3),
                "serial_captions_per_sec": round(serial, 2),
                "overlap_captions_per_sec": round(overlap, 2),
                "overlap_speedup": round(overlap / serial, 3),
                "cache_speedup": round(warm_rate / overlap, 3),
            }
        )
    )


def bench_input(batch: int = 64, n_images: int = 512):
    """`python bench.py --input [B]`: host input pipeline end-to-end —
    JPEG bytes on disk -> native threaded decode+resize -> uint8 H2D ->
    preprocess+encode+greedy decode on chip -> caption ids (SURVEY.md §7
    "input pipeline throughput").

    On this sandbox the host has ONE core: the C++ decoder measures
    ~180 COCO-sized img/s/core (thread-scalable by design, nothing to
    scale onto here), so end-to-end is host-bound far below the chip's
    ~7.3k cap/s.  The JSON line carries both numbers so the host-core
    requirement for chip saturation is explicit.
    """
    import os
    import shutil

    import jax
    import jax.numpy as jnp

    from show_tell_tpu.data.dataset import MSCOCO, DataLoader

    batch = max(1, min(batch, n_images))
    ann_path, img_dir, images_meta = _make_jpeg_dataset(n_images)
    root = os.path.dirname(ann_path)

    ds = MSCOCO(ann_path, img_dir, _MiniVocab(), train=False)
    loader = DataLoader(ds, batch_size=batch, shuffle=False, drop_last=True, prefetch=2)

    _, serve, key = _flagship_serve(batch)

    # Host-only pass (decode+collate, page-cached files).
    t0 = time.perf_counter()
    n_host = sum(b[1].shape[0] for b in loader)
    host_rate = n_host / (time.perf_counter() - t0)

    # Same pass with --fast_jpeg (DCT-domain scaled decode).
    ds.fast_jpeg = True
    t0 = time.perf_counter()
    n_fast = sum(b[1].shape[0] for b in loader)
    host_rate_fast = n_fast / (time.perf_counter() - t0)
    ds.fast_jpeg = False

    # Steady-state epoch with --image_cache (decode once per dataset; every
    # later epoch reads the memmap).
    from show_tell_tpu.data.image_cache import ImageCache

    cache_dir = os.path.join(root, "cache")
    ds.image_cache = ImageCache(cache_dir, [m["file_name"] for m in images_meta], 224)
    for _ in loader:  # fill pass (epoch 1 decodes + writes rows)
        pass
    t0 = time.perf_counter()
    n_cached = sum(b[1].shape[0] for b in loader)
    host_rate_cached = n_cached / (time.perf_counter() - t0)
    ds.image_cache = None
    shutil.rmtree(cache_dir)

    # End-to-end pass: loader -> H2D (double-buffered one batch ahead,
    # data/device_prefetch.py, same as the train loop) -> chip decode.
    from show_tell_tpu.data.device_prefetch import device_prefetch

    t0 = time.perf_counter()
    n_e2e = 0
    out = None
    for i, (_, imgs, _, _) in enumerate(device_prefetch(loader)):
        out = serve(imgs, jax.random.fold_in(key, 100 + i))
        n_e2e += imgs.shape[0]
    out.block_until_ready()
    e2e_rate = n_e2e / (time.perf_counter() - t0)
    loader.close()
    shutil.rmtree(root)  # ~35MB of synthetic JPEGs per run otherwise

    print(
        json.dumps(
            {
                "metric": "e2e_jpeg_to_captions_per_sec",
                "value": round(e2e_rate, 2),
                "unit": "captions/s (1 host core)",
                "vs_baseline": round(e2e_rate / 402.0, 3),  # ref train-side img/s as scale
                "host_decode_imgs_per_sec": round(host_rate, 2),
                "host_decode_imgs_per_sec_fast_jpeg": round(host_rate_fast, 2),
                "host_imgs_per_sec_image_cache": round(host_rate_cached, 2),
                "note": "host-bound: chip serves ~7.3k cap/s; decoder thread-scales ~180/s/core (--fast_jpeg ~2x; --image_cache steady-state epochs skip decode entirely)",
            }
        )
    )


def bench_eval(batch: int = 256, n_images: int = 2048):
    """`python bench.py --eval [B]`: the REFERENCE-PARITY eval loop
    end-to-end — the north-star val2014 workload (utils.py:147-247).
    test_model per batch: teacher-forced loss + batched greedy decode
    (jitted; dp-sharded under a mesh on multi-chip hosts), ids -> words,
    per-batch evaluate() (BLEU/CIDEr/ROUGE on the host), then the
    metric pickles and the final per-image nltk corpus-BLEU pass.

    Reported value = captions/sec through that COMPLETE flow including
    all host-side scoring.  The flow runs twice: pass 1 pays the XLA
    compiles (make_test_step memoizes), pass 2 is timed — matching how a
    full COCO val epoch amortizes its one-time compile over 40k images.
    """
    import os
    import shutil

    import jax

    from show_tell_tpu.data.dataset import MSCOCO, DataLoader
    from show_tell_tpu.evaluation.tester import test_model
    from show_tell_tpu.train.optim import make_optimizer
    from show_tell_tpu.train.train_step import create_train_state

    batch = max(1, min(batch, n_images))
    ann_path, img_dir, _ = _make_jpeg_dataset(n_images, prefix="bench_eval_")
    root = os.path.dirname(ann_path)
    out_dir = os.path.join(root, "out")
    os.makedirs(out_dir, exist_ok=True)

    cfg = _flagship_cfg()
    vocab = _ServeVocab(cfg.vocab_size)
    # --image_cache semantics: pass 1 (the compile pass) decodes each
    # JPEG once and fills the memmap cache; the TIMED pass streams pixels
    # at memory speed, so the number measures the decode+scoring flow a
    # production host sees (this sandbox has ONE core — raw host JPEG
    # decode caps at ~150 img/s and would swamp the measurement, exactly
    # the bottleneck --input quantifies).
    ds = MSCOCO(ann_path, img_dir, vocab, train=False, image_cache=os.path.join(root, "cache"))
    loader = DataLoader(ds, batch_size=batch, shuffle=False, drop_last=False, prefetch=2)

    ts = create_train_state(jax.random.PRNGKey(0), cfg, make_optimizer("SGD", 0.001, 0.9))
    params = {
        "output_dir": out_dir,
        "compute_dtype": "bfloat16",  # the serving dtype (f32 = parity runs)
        "use_pallas": -1,  # measured auto policy
        "dp": 0,  # all visible devices (1 on this bench host)
        "mp": 1,
    }

    # test_model's reference-parity progress prints go to stderr so the
    # bench's stdout stays one JSON line.
    import contextlib

    from show_tell_tpu.evaluation import tester

    dog = _device_watchdog()
    with contextlib.redirect_stdout(sys.stderr):
        test_model(ts, cfg, loader, vocab, params)  # compile pass
        dog.cancel()
        t0 = time.perf_counter()
        scores = test_model(ts, cfg, loader, vocab, params)
        dt = time.perf_counter() - t0
        # A/B the software pipelining: same flow with each batch scored
        # before the next decode dispatch (the reference's serial order).
        tester.PIPELINE_SCORING = False
        try:
            t0 = time.perf_counter()
            test_model(ts, cfg, loader, vocab, params)
            dt_serial = time.perf_counter() - t0
        finally:
            tester.PIPELINE_SCORING = True
        # A/B the H2D staging: same flow with each batch transferred when
        # consumed instead of one batch ahead (device_prefetch
        # stage_ahead=False — the reference's serial H2D order).
        tester.STAGE_H2D = False
        try:
            t0 = time.perf_counter()
            test_model(ts, cfg, loader, vocab, params)
            dt_unstaged = time.perf_counter() - t0
        finally:
            tester.STAGE_H2D = True
    loader.close()
    shutil.rmtree(root)

    cps = n_images / dt
    print(
        json.dumps(
            {
                "metric": "eval_captions_per_sec_test_model_flow",
                "value": round(cps, 2),
                "unit": "captions/s (test_model: decode + host scoring + corpus pass)",
                "vs_baseline": round(cps / 1250.0, 3),
                "n_images": n_images,
                "test_loss_finite": bool(np.isfinite(scores["test_loss"])),
                "serial_captions_per_sec": round(n_images / dt_serial, 2),
                "pipeline_speedup": round(dt_serial / dt, 3),
                "unstaged_captions_per_sec": round(n_images / dt_unstaged, 2),
                "h2d_staging_speedup": round(dt_unstaged / dt, 3),
            }
        )
    )


def bench_train_e2e(batch: int = 128, n_images: int = 1024):
    """`python bench.py --train_e2e [B]`: the COMPLETE training pipeline
    — JPEG bytes on disk -> loader (native decode, --image_cache) ->
    uint8 H2D -> jitted train step (flagship GRU, f32) — measured for
    the fill epoch (decode + cache write + train) and a steady-state
    cached epoch.  The steady-state number is the honest "what does a
    100-epoch COCO run sustain" rate: with the cache, epochs 2+ are
    chip-bound even on this 1-core host."""
    import os
    import shutil

    import jax

    from show_tell_tpu.data.dataset import MSCOCO, DataLoader
    from show_tell_tpu.data.device_prefetch import device_prefetch
    from show_tell_tpu.train.optim import make_optimizer
    from show_tell_tpu.train.train_step import create_train_state, make_train_step

    batch = max(1, min(batch, n_images))
    ann_path, img_dir, _ = _make_jpeg_dataset(n_images, prefix="bench_train_e2e_")
    root = os.path.dirname(ann_path)
    cache_dir = os.path.join(root, "cache")

    ds = MSCOCO(ann_path, img_dir, _MiniVocab(), train=True, image_cache=cache_dir)
    loader = DataLoader(ds, batch_size=batch, shuffle=False, drop_last=True, prefetch=2, pad_length=12)

    cfg = _flagship_cfg()  # training runs f32
    opt = make_optimizer("SGD", 0.001, 0.9)
    ts = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = make_train_step(cfg, opt, augment=True)

    def epoch():
        nonlocal ts
        n = 0
        loss = None
        for _, images, captions, lengths in device_prefetch(loader):
            ts, loss = step(ts, images, captions, lengths)
            n += images.shape[0]
        jax.block_until_ready(loss)
        return n

    epoch()  # compile + warm
    shutil.rmtree(cache_dir)
    ds.image_cache = None
    from show_tell_tpu.data.image_cache import ImageCache

    ds.image_cache = ImageCache(cache_dir, [m["file_name"] for m in ds.annotation_obj.imgs.values()], 224)

    t0 = time.perf_counter()
    n_fill = epoch()  # decode + cache fill + train
    fill_rate = n_fill / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    n_cached = epoch()  # steady state: cache + train
    cached_rate = n_cached / (time.perf_counter() - t0)
    shutil.rmtree(root)

    print(
        json.dumps(
            {
                "metric": "e2e_train_samples_per_sec_cached_epoch",
                "value": round(cached_rate, 2),
                "unit": "samples/s (JPEGs on disk, 1 host core, 1 chip)",
                "vs_baseline": round(cached_rate / 402.0, 3),
                "fill_epoch_samples_per_sec": round(fill_rate, 2),
            }
        )
    )


def _trained_checkpoint(epochs: int = 10, images: int = 400, root: str = "/tmp/bench_trained"):
    """Train (once; cached on disk) a flagship-dims checkpoint on the
    synthetic grounded dataset (tools/demo_synthetic.py's task):
    ResNet-101 + 5-layer GRU-512, Adam, `epochs` epochs.  Returns
    (ckpt_path, vocab_path, img_dir).  The ONE delta vs the headline
    config is the vocab (~30 task words instead of 9,956) — flagged in
    every emitted row; decode cost scales with V, so trained rows are
    about RETIREMENT behavior, not absolute cap/s parity with the
    headline."""
    import os
    import subprocess

    ckpt = os.path.join(root, "out", "model_%d.ckpt" % epochs)
    vocab = os.path.join(root, "out", "vocab.pkl")
    img_dir = os.path.join(root, "data", "train2014")
    if os.path.isfile(ckpt) and os.path.isfile(vocab):
        return ckpt, vocab, img_dir
    # Train in a SUBPROCESS so the measuring process stays compile-fresh.
    code = """
import sys
sys.path.insert(0, %r)
sys.path.insert(0, %r)
from demo_synthetic import build_dataset
import os
root = %r
build_dataset(os.path.join(root, "data"), %d)
os.makedirs(os.path.join(root, "out"), exist_ok=True)
from show_tell_tpu.cli.run import run
run("gru", [
    "--data_dir", os.path.join(root, "data"), "--output_dir", os.path.join(root, "out"),
    "--train_ann_path", "annotations/captions_train2014.json",
    "--test_ann_path", "annotations/captions_train2014.json",
    "--train_img_dir", "train2014", "--test_img_dir", "train2014",
    "--vocab_threshold", "1", "--embedding_length", "256",
    "--num_hidden_units", "512", "--num_layers", "5",
    "--batch_size", "32", "--num_epochs", "%d", "--resnet_version", "101",
    "--lr", "0.002", "--optimizer_type", "Adam",
    "--is_training", "1", "--is_testing", "0", "--keep_checkpoints", "1",
])
""" % (
        os.path.dirname(os.path.abspath(__file__)),
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"),
        root, images, epochs,
    )
    print(json.dumps({"note": "training the synthetic flagship checkpoint (one-time, cached)"}),
          file=sys.stderr, flush=True)
    subprocess.run([sys.executable, "-c", code], check=True, timeout=3600)
    assert os.path.isfile(ckpt), ckpt
    return ckpt, vocab, img_dir


def bench_trained(epochs: int = 10):
    """`python bench.py --trained`: the serving/latency surface on
    TRAINED weights (VERDICT r4 item 2) — a 10-epoch flagship-dims
    checkpoint on the synthetic grounded task, measured with its real
    <end>-retirement behavior on in-distribution images:

      * retirement profile (mean / p90 / max caption length over 512
        decoded in-distribution images)
      * B=512 greedy throughput, early-exit off vs on
      * p50 latency grid: greedy / beam-3 x B=1 / B=8, early-exit
        off/on (the trained analogue of --latency_suite's untrained
        worst/best-case rows)

    Rows carry vocab_size so the ~30-word task vocab (vs the 9,956
    headline) is explicit; retirement-driven DELTAS (ee on/off at equal
    weights) are the point of this mode."""
    import os

    import jax
    import jax.numpy as jnp

    from show_tell_tpu.data.transforms import preprocess_images
    from show_tell_tpu.decode.beam import beam_search_decode
    from show_tell_tpu.models.captioner import captioner_greedy_decode
    from show_tell_tpu.models.encoder import encoder_forward
    from show_tell_tpu.serve import Captioner

    ckpt, vocab_path, _ = _trained_checkpoint(epochs=epochs)
    cap = Captioner.from_checkpoint(ckpt, vocab_path, resnet_version=101,
                                    embed_dim=256, hidden_dim=512, num_layers=5)
    cfg, params, state = cap.cfg, cap.params, cap.bn_state
    end_id = cap.vocab.word_to_index.get("<end>", 2)

    # in-distribution images (the demo's generator, unseen seed)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    import random as _random

    from demo_synthetic import draw_sample

    rng = _random.Random(12345)
    imgs = np.stack([np.asarray(draw_sample(rng)[0], dtype=np.uint8) for _ in range(512)])
    # DISTINCT device buffers per timed call: with augment=False the jit
    # key is dead, so identical input buffers make every timed execution
    # bit-identical — which this sandbox's tunnel dedupes into absurdly
    # fast returns (CLAUDE.md; first observed here as a 28M cap/s "row").
    # Distinct permutations of the same image set keep the measured work
    # identical while making every buffer unique.
    nrng = np.random.RandomState(7)
    batches512 = [jnp.asarray(imgs[nrng.permutation(512)]) for _ in range(8)]

    rows = []

    def emit(metric, value, unit, extra=None):
        row = {"metric": metric, "value": value, "unit": unit,
               "vs_baseline": round(value / 1250.0, 3) if "cap" in unit else 0,
               "vocab_size": cfg.vocab_size, "trained_epochs": epochs}
        row.update(extra or {})
        rows.append(row)
        print(json.dumps(row), flush=True)

    # retirement profile from one greedy decode (no early exit)
    @jax.jit
    def decode512(images_u8, key, ee=None):
        x = preprocess_images(images_u8, key, augment=False, dtype=jnp.bfloat16)
        return captioner_greedy_decode(params, state, cfg, x, end_token=ee)

    key = jax.random.PRNGKey(0)
    dog = _device_watchdog()
    ids = np.asarray(decode512(jnp.asarray(imgs), key))
    dog.cancel()
    T = cfg.max_caption_length
    first_end = np.where((ids == end_id).any(1), (ids == end_id).argmax(1) + 1, T)
    emit("trained_retirement_steps_mean", round(float(first_end.mean()), 2), "steps (of %d)" % T,
         {"p90": int(np.percentile(first_end, 90)), "max": int(first_end.max())})

    # B=512 throughput, ee off/on
    for ee in (None, end_id):
        f = jax.jit(lambda u, k, ee=ee: decode512(u, k, ee))
        for i in range(12):
            f(batches512[i % len(batches512)], jax.random.fold_in(key, i)).block_until_ready()
        dt, dt_med = _best_time(
            f, [(batches512[i % len(batches512)], jax.random.fold_in(key, 100 + i)) for i in range(25)]
        )
        emit("trained_captions_per_sec_b512_ee%d" % (ee is not None), round(512 / dt, 2),
             "captions/s/chip", {"estimator": "min_of_7x5", "median_value": round(512 / dt_med, 2)})

    # latency grid on trained weights — a distinct image subset per
    # timed iteration (same dedupe hazard as above).
    for batch in (1, 8):
        sels = [jnp.asarray(imgs[nrng.choice(len(imgs), batch, replace=False)]) for _ in range(45)]
        for mode in ("greedy", "beam3"):
            for ee in (0, 1):

                @jax.jit
                def serve(images_u8, k, mode=mode, ee=ee):
                    x = preprocess_images(images_u8, k, augment=False, dtype=jnp.bfloat16)
                    if mode == "greedy":
                        return captioner_greedy_decode(
                            params, state, cfg, x, end_token=end_id if ee else None)
                    feats, _ = encoder_forward(params["encoder"], state, cfg.encoder_config(), x, training=False)
                    return beam_search_decode(params["decoder"], cfg.decoder_config(), feats, 3,
                                              end_token=end_id, early_exit=bool(ee))

                for i in range(15):
                    serve(sels[i], jax.random.fold_in(key, 200 + i)).block_until_ready()
                lats = []
                for i in range(30):
                    t0 = time.perf_counter()
                    serve(sels[15 + i], jax.random.fold_in(key, 300 + i)).block_until_ready()
                    lats.append(time.perf_counter() - t0)
                p50 = sorted(lats)[len(lats) // 2]
                emit("trained_p50_latency_ms_%s_b%d_ee%d" % (mode, batch, ee),
                     round(p50 * 1e3, 2), "ms", {"ms_per_image": round(p50 / batch * 1e3, 3)})


def bench_grid(out_path: str = "BENCH_GRID.json"):
    """`python bench.py --grid [OUT.json]`: the consolidated per-round
    bench artifact (VERDICT r4 item 5) — every tracked serving / decode
    / training / eval metric measured in its own FRESH process (the
    only trustworthy protocol on this tunnel, CLAUDE.md) and written as
    ONE JSON file, so round-over-round regressions are a mechanical
    diff instead of a README archaeology exercise.  A mode that fails
    or wedges records an error row; the rest of the grid still lands.
    Runtime: ~16 modes x (compile + measure) — budget 1-2 h through a
    congested tunnel."""
    import subprocess

    modes = [
        ("greedy_gru", []),
        ("greedy_gru_s2d", ["--s2d"]),
        ("greedy_lstm", ["--lstm"]),
        ("greedy_attn", ["--attn"]),
        ("greedy_attn_lstm", ["--attn_lstm"]),
        ("beam3_gru", ["--beam", "3"]),
        ("beam5_gru", ["--beam", "5"]),
        ("beam3_attn", ["--beam", "3", "--attn"]),
        ("beam5_attn", ["--beam", "5", "--attn"]),
        ("beam3_attn_lstm", ["--beam", "3", "--attn_lstm"]),
        ("beam5_attn_lstm", ["--beam", "5", "--attn_lstm"]),
        ("latency_suite", ["--latency_suite"]),
        ("train", ["--train"]),
        ("train_bf16", ["--train", "--bf16"]),
        ("train_attn", ["--train_attn"]),
        ("train_e2e", ["--train_e2e"]),
        ("eval", ["--eval"]),
        ("input", ["--input"]),
        # trained-weights surface: reuses the cached /tmp checkpoint when
        # `--trained` already ran this round; else trains one (slow, the
        # longer timeout below).
        ("trained", ["--trained"]),
    ]
    # Resume-from-partial: the tunnel can wedge for hours mid-grid
    # (CLAUDE.md), so each completed mode is written to out_path
    # IMMEDIATELY, and a re-run skips modes that already have good rows
    # (error rows are retried).  Delete out_path for a from-scratch run.
    done = {}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                done = {
                    g["mode"]: g for g in json.load(f)["grid"]
                    if "rows" in g
                    and not any(r.get("metric") == "bench_error" for r in g["rows"])
                }
            print(json.dumps({"note": "resuming grid, %d modes cached" % len(done)}),
                  file=sys.stderr, flush=True)
        except Exception:
            done = {}
    grid = []

    def _flush():
        with open(out_path, "w") as f:
            json.dump({"grid": grid + [g for m, g in done.items()
                                       if m not in {x["mode"] for x in grid}]}, f, indent=1)

    for name, args in modes:
        if name in done:
            grid.append(done[name])
            continue
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, __file__, *args],
                capture_output=True, text=True,
                timeout=4800 if name == "trained" else 2400,
            )
            rows = []
            for line in proc.stdout.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    try:
                        rows.append(json.loads(line))
                    except ValueError:
                        pass
            if not rows:
                raise RuntimeError(
                    "no JSON rows (exit %d): %s" % (proc.returncode, proc.stderr[-400:])
                )
            grid.append({"mode": name, "rows": rows, "wall_s": round(time.perf_counter() - t0, 1)})
        except Exception as e:  # one wedged mode must not kill the grid
            grid.append({"mode": name, "error": str(e)[:500], "wall_s": round(time.perf_counter() - t0, 1)})
        print(json.dumps(grid[-1]), file=sys.stderr, flush=True)
        _flush()
    _flush()
    ok = sum(1 for g in grid if "rows" in g)
    print(
        json.dumps(
            {
                "metric": "bench_grid_modes_ok",
                "value": ok,
                "unit": "of %d modes -> %s" % (len(modes), out_path),
                "vs_baseline": round(ok / len(modes), 3),
            }
        )
    )


if __name__ == "__main__":
    if "--grid" in sys.argv:
        args = [a for a in sys.argv[1:] if a.endswith(".json")]
        bench_grid(args[0] if args else "BENCH_GRID.json")
    elif "--trained" in sys.argv:
        args = [a for a in sys.argv[1:] if a.isdigit()]
        bench_trained(int(args[0]) if args else 10)
    elif "--train_e2e" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--train_e2e"]
        bench_train_e2e(int(args[0]) if args else 128)
    elif "--train_attn" in sys.argv:
        args = [a for a in sys.argv[1:] if a.isdigit()]
        bench_train(int(args[0]) if args else 128, variant="attn", bf16="--bf16" in sys.argv)
    elif "--train" in sys.argv:
        args = [a for a in sys.argv[1:] if a.isdigit()]
        bench_train(int(args[0]) if args else 256, bf16="--bf16" in sys.argv)
    elif "--eval" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--eval"]
        bench_eval(int(args[0]) if args else 256)
    elif "--latency_suite" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--latency_suite"]
        bench_latency_suite(int(args[0]) if args else 0)
    elif "--latency" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--latency"]
        bench_latency(int(args[0]) if args else 8)
    elif "--serve_e2e" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--serve_e2e"]
        bench_serve_e2e(int(args[0]) if args else 64)
    elif "--input" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--input"]
        bench_input(int(args[0]) if args else 64)
    elif "--beam" in sys.argv:
        variant = "gru"
        for flag, v in (("--attn", "attn"), ("--lstm", "lstm"), ("--attn_lstm", "attn_lstm")):
            if flag in sys.argv:
                variant = v
        args = [a for a in sys.argv[1:] if a.isdigit()]
        bench_beam(
            int(args[0]) if args else 3,
            int(args[1]) if len(args) > 1 else 256,
            variant=variant,
        )
    elif "--s2d" in sys.argv:
        # Headline A/B with host-emitted space-to-depth input (the
        # relayout-free stem; VERDICT r4 item 4).
        main(s2d=True)
    elif "--attn" in sys.argv:
        # Soft-attention GRU serving throughput (main_attn.py flagship).
        main(variant="attn", batch_default=256)
    elif "--lstm" in sys.argv:
        # LSTM baseline serving throughput (main_lstm.py flagship).
        main(variant="lstm", batch_default=512)
    elif "--attn_lstm" in sys.argv:
        # Soft-attention LSTM serving throughput (main_attn_LSTM.py).
        main(variant="attn_lstm", batch_default=256)
    else:
        main()
