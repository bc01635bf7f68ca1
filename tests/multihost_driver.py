"""Subprocess driver for tests/test_multihost.py.

One OS process of a 2-process multi-host run: 4 virtual CPU devices per
process form a single dp=8 mesh; cross-process collectives ride Gloo
(the CPU stand-in for DCN).  Runs 3 deterministic train steps through
the REAL train-step machinery and prints a RESULT json line the test
compares across processes and against the single-process dp=8 run.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=4 \
       python multihost_driver.py <process_id> <coordinator_port>
"""

import json
import sys


def make_batch(rng, vocab_size, B=8, T=12, img=32):
    """Identical to tests/test_train_step.make_batch (kept standalone so
    the driver does not import the pytest module tree)."""
    import numpy as np

    images = rng.randint(0, 255, (B, img, img, 3), dtype=np.uint8)
    lengths = np.sort(rng.randint(3, T + 1, B))[::-1].astype(np.int32)
    captions = rng.randint(4, vocab_size, (B, T)).astype(np.int32)
    for i, l in enumerate(lengths):
        captions[i, l:] = 0
        captions[i, 0] = 1
        captions[i, l - 1] = 2
    return images, captions, np.ascontiguousarray(lengths)


class EvalVocab:
    """Minimal eval vocab (ids -> words) for the sharded-eval check."""

    def __init__(self, size=40):
        self.index_to_word = ["<pad>", "<start>", "<end>", "<unk>"] + [
            "w%d" % i for i in range(4, size)
        ]
        self.word_to_index = {w: i for i, w in enumerate(self.index_to_word)}

    def start_token(self):
        return "<start>"

    def end_token(self):
        return "<end>"

    def __len__(self):
        return len(self.index_to_word)


class EvalLoader:
    """2 full batches of 8 + a 3-row tail (replicated on the mesh),
    deterministic — every host builds the identical global stream."""

    batch_size = 8

    def __init__(self, vocab_size=40, seed=11):
        import numpy as np

        rng = np.random.RandomState(seed)
        self.batches = []
        n = 0
        for rows in (8, 8, 3):
            imgs = rng.randint(0, 255, (rows, 32, 32, 3), dtype=np.uint8)
            lengths = np.sort(rng.randint(4, 10, rows))[::-1].astype(np.int32).copy()
            caps = np.zeros((rows, 12), np.int32)
            for b in range(rows):
                caps[b, : lengths[b]] = rng.randint(4, vocab_size, lengths[b])
            paths = tuple("img_%d.jpg" % (n + i) for i in range(rows))
            n += rows
            self.batches.append((paths, imgs, caps, lengths))

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def run_sharded_eval(out_dir, dp=0):
    """test_model over the (possibly multi-host) eval mesh; returns the
    final score dict.  dp=0 -> all global devices (the CLI default)."""
    import os

    import jax

    from show_tell_tpu.evaluation.tester import test_model
    from show_tell_tpu.models.captioner import CaptionerConfig
    from show_tell_tpu.train.optim import make_optimizer
    from show_tell_tpu.train.train_step import create_train_state

    os.makedirs(out_dir, exist_ok=True)

    cfg = CaptionerConfig(
        variant="gru", resnet_version=18, embed_dim=24, hidden_dim=32,
        vocab_size=40, num_layers=2, max_caption_length=8,
    )
    ts = create_train_state(jax.random.PRNGKey(5), cfg, make_optimizer("SGD", 0.01, 0.9))
    params = {"output_dir": out_dir, "dp": dp, "mp": 1, "use_pallas": 0}
    return test_model(ts, cfg, EvalLoader(), EvalVocab(), params, seed=7)


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    # argv[4]: process count (default 2; the 4-process test passes 4 with
    # 2 virtual devices per process — same dp=8 global mesh either way).
    nproc = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    import jax

    jax.config.update("jax_platforms", "cpu")  # before any backend call
    from show_tell_tpu.parallel.multihost import initialize, is_primary

    initialize("127.0.0.1:%s,%d,%d" % (port, nproc, pid))
    assert jax.device_count() == 8 and jax.local_device_count() == 8 // nproc

    import numpy as np
    import jax.numpy as jnp

    from show_tell_tpu.models.captioner import CaptionerConfig
    from show_tell_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from show_tell_tpu.train.optim import make_optimizer
    from show_tell_tpu.train.train_step import create_train_state, make_train_step

    cfg = CaptionerConfig(
        variant="gru", resnet_version=18, embed_dim=24, hidden_dim=32,
        vocab_size=40, num_layers=2,
    )
    opt = make_optimizer("SGD", 0.01, 0.9)
    step = make_train_step(cfg, opt, augment=False)
    rng = np.random.RandomState(4)  # the SAME logical stream on every host
    batches = [make_batch(rng, cfg.vocab_size) for _ in range(3)]

    mesh = make_mesh(dp=8)
    ts0 = replicate(mesh, create_train_state(jax.random.PRNGKey(5), cfg, opt))

    ts, losses = ts0, []
    for images, captions, lengths in batches:
        ts, loss = step(ts, *shard_batch(mesh, images, captions, lengths))
        losses.append(float(loss))
    checksum = float(
        sum(float(jnp.sum(jnp.abs(x.astype(jnp.float32)))) for x in jax.tree.leaves(ts.trainable))
    )

    # Same steps again through the process-sharded (local-rows) input
    # path: each host contributes ONLY its slice of the image batch
    # (mesh.put_sharded local_rows=True — what the multi-host loader
    # emits).  Must reproduce the identical-global-batch losses exactly.
    from show_tell_tpu.parallel.mesh import batch_sharding, put_sharded

    sh = batch_sharding(mesh)
    ts, losses_local = ts0, []
    for images, captions, lengths in batches:
        B = images.shape[0]
        lo, hi = pid * B // nproc, (pid + 1) * B // nproc
        gi = put_sharded(images[lo:hi], sh, local_rows=True)
        gc = put_sharded(captions, sh)
        gl = put_sharded(lengths, sh)
        ts, loss = step(ts, gi, gc, gl)
        losses_local.append(float(loss))

    # The train loop's cross-host preemption agreement (train/loop.py
    # _preempt_agreed): SIGTERM lands on ONE host, so the flag must
    # all-gather to an OR every process sees.  Simulate "only process 0
    # was signaled" and "nobody was signaled" over the real 2-process
    # runtime.
    from jax.experimental import multihost_utils

    agreed_one = bool(multihost_utils.process_allgather(np.asarray(pid == 0)).any())
    agreed_none = bool(multihost_utils.process_allgather(np.asarray(False)).any())

    # Orbax fallback under multi-host (checkpoint.py): ckpt_format=orbax
    # must fall back to the process-0 pickle save (orbax's distributed
    # protocol would deadlock on a one-process save), and EVERY process
    # must then be able to resume from the shared file — checked over the
    # real N-process runtime, not a monkeypatched process_count.
    import os

    from show_tell_tpu.train.checkpoint import (
        create_checkpoint,
        load_checkpoint,
        restore_train_state,
    )

    ckpt_dir = sys.argv[3]
    ckpt_path = os.path.join(ckpt_dir, "model_1.ckpt")
    if is_primary():  # the train loop's contract: only process 0 saves
        saved = create_checkpoint(ts, 1, 3, [1.0], {"output_dir": ckpt_dir, "ckpt_format": "orbax"})
        assert saved == ckpt_path, saved  # pickle fallback, NOT model_1.orbax/
    multihost_utils.sync_global_devices("ckpt_saved")
    restored = restore_train_state(ts0, load_checkpoint(ckpt_path))
    ckpt_checksum = float(
        sum(float(jnp.sum(jnp.abs(x.astype(jnp.float32)))) for x in jax.tree.leaves(restored.trainable))
    )
    orbax_fallback_ok = (not os.path.isdir(os.path.join(ckpt_dir, "model_1.orbax"))) and (
        abs(ckpt_checksum - checksum) < 1e-4 * abs(checksum)
    )

    # Sharded EVAL over the same 2-process runtime: the eval mesh spans
    # both hosts, decode dp-shards, ids all-gather back on device, every
    # host scores the identical full captions, only the primary writes
    # the metric pickles (SURVEY.md §5 / VERDICT r3 ask 5).  out_dir is
    # shared across processes (argv) — like a real shared filesystem.
    eval_out = sys.argv[3] if len(sys.argv) > 3 else None
    # Count the expensive per-batch evaluate() calls: the host-side
    # scoring is SHARDED by batch across processes (tester.py), so each
    # process must score only ~1/nproc of the batches — while the final
    # score dict still matches the single-process run bit-for-bit.
    n_scored = 0
    if eval_out:
        from show_tell_tpu.evaluation import tester as _tester

        _real_evaluate = _tester.evaluate

        def _counting_evaluate(*a, **kw):
            nonlocal_count[0] += 1
            return _real_evaluate(*a, **kw)

        nonlocal_count = [0]
        _tester.evaluate = _counting_evaluate
        try:
            scores = run_sharded_eval(eval_out)
        finally:
            _tester.evaluate = _real_evaluate
        n_scored = nonlocal_count[0]
    else:
        scores = None

    print(
        "RESULT " + json.dumps(
            {"pid": pid, "primary": is_primary(), "losses": losses,
             "checksum": checksum, "losses_local": losses_local,
             "preempt_agreed_one": agreed_one, "preempt_agreed_none": agreed_none,
             "orbax_fallback_ok": orbax_fallback_ok,
             "eval_scores": scores, "eval_batches_scored": n_scored}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
