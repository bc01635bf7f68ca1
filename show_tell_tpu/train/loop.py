"""The training loop — reference main.py:116-170 cadence on a jitted step.

Per epoch: iterate the (prefetching) loader, one compiled XLA step per
batch; print every 500 steps and at epoch end; checkpoint every 5000
steps and each epoch end; for the GRU entry point, run a sub-batch eval
every 5 epochs (main.py:161-168).  Resume restores weights + optimizer
state but restarts at epoch 0, faithfully (SURVEY.md §3.5).

Data parallelism: when the visible device count (or --dp) is > 1 the
state is replicated and batches sharded over the dp mesh axis; the step
itself is unchanged (GSPMD inserts the gradient psum over ICI).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict

import jax
import numpy as np

from show_tell_tpu.models.captioner import CaptionerConfig
from show_tell_tpu.parallel.mesh import make_mesh, replicate
from show_tell_tpu.train.checkpoint import create_checkpoint, load_checkpoint, restore_train_state
from show_tell_tpu.train.optim import make_optimizer
from show_tell_tpu.train.train_step import create_train_state, make_train_step


def captioner_config_from_params(params: Dict[str, Any], vocab_size: int) -> CaptionerConfig:
    return CaptionerConfig(
        variant=params.get("variant", "gru"),
        resnet_version=params["resnet_version"],
        embed_dim=params["embedding_length"],
        hidden_dim=params["num_hidden_units"],
        vocab_size=vocab_size,
        num_layers=params["num_layers"],
        nos_filters=params.get("nos_cnn_filters", 2048),
        attn_dim=params.get("attn_dim", 512),
        alpha_c=params.get("alpha_c", 1.0),
        max_caption_length=params.get("max_caption_length", 25),
        # The train/eval CLIs always see a builder vocab (or a reference
        # vocab.pkl): both pin <start> at id 1, like the reference
        # hard-codes.  Foreign vocabs only reach the serve CLI, whose
        # from_checkpoint derives start_token from the loaded vocab.
        start_token=1,
        attn_next_token=bool(params.get("attn_next_token", 0)),
    )


def train(
    params: Dict[str, Any],
    vocab,
    train_data_loader,
    test_data_loader=None,
    eval_every_epochs: int = 0,
    init_params_state=None,
):
    """Run the full training regime; returns the final TrainState."""
    cfg = captioner_config_from_params(params, len(vocab))
    optimizer = make_optimizer(params["optimizer_type"], params["lr"], params.get("momentum", 0.9))
    key = jax.random.PRNGKey(params.get("seed", 1))
    ts = create_train_state(key, cfg, optimizer)

    if init_params_state is not None:
        # e.g. pretrained backbone weights imported from a torch .pth.
        from show_tell_tpu.models.captioner import split_trainable
        from show_tell_tpu.train.train_step import TrainState

        p, s = init_params_state
        trainable, frozen = split_trainable(p)
        ts = TrainState(trainable, frozen, s, optimizer.init(trainable), ts.rng, ts.step)

    if params.get("resume_training"):
        if params["resume_model_train"] == "auto":
            from show_tell_tpu.train.checkpoint import find_latest_checkpoint

            ckpt_path = find_latest_checkpoint(params["output_dir"])
            if ckpt_path is None:
                raise FileNotFoundError("no model_<N>.ckpt in %s to auto-resume from" % params["output_dir"])
        else:
            from show_tell_tpu.train.checkpoint import resolve_checkpoint_path

            ckpt_path = resolve_checkpoint_path(params["output_dir"], params["resume_model_train"])
        print("Loading the model - %s" % os.path.basename(ckpt_path))
        ts = restore_train_state(ts, load_checkpoint(ckpt_path))
        print("Models loaded.")

    n_dev = params.get("dp", 0) or len(jax.devices())
    mesh = None
    if n_dev > 1 and params["batch_size"] % n_dev == 0:
        mesh = make_mesh(dp=n_dev)  # multi-host: raises unless it spans every process
        ts = replicate(mesh, ts)
        print("Data-parallel over %d devices." % n_dev)
    elif jax.process_count() > 1:
        # Meshless multi-host: every process runs the identical full-batch
        # step on its own first device — correct (same data stream, same
        # updates) but pure duplicate work; almost certainly a misconfig.
        print("Warning: multi-host run without a mesh (dp=%d, batch_size=%d); "
              "every process duplicates the full step." % (n_dev, params["batch_size"]))
    # Multi-host (parallel/multihost.py): every process runs this same
    # loop over the same logical data stream; only process 0 touches the
    # output dir (checkpoints, JSONL metrics, retention) — params are
    # replicated, so its copy is the global state.
    from show_tell_tpu.parallel.multihost import is_primary

    primary = is_primary()
    if jax.process_count() > 1:
        print("Multi-host: process %d/%d (%s)." % (
            jax.process_index(), jax.process_count(),
            "primary - owns checkpoints/logs" if primary else "worker"))

    train_dtype = None
    if str(params.get("train_dtype", "float32")) == "bfloat16":
        import jax.numpy as jnp

        train_dtype = jnp.bfloat16
        print("Training compute dtype: bfloat16 (f32 master weights/optimizer).")
    step = make_train_step(cfg, optimizer, augment=True, compute_dtype=train_dtype)

    os.makedirs(params["output_dir"], exist_ok=True)
    from show_tell_tpu.utils import MetricsLogger, StepTimer

    logger = MetricsLogger(params["output_dir"])
    timer = StepTimer()
    start_time = time.time()
    print("Training started.")
    # --profile_dir: capture a jax profiler trace of steps 2-6 of the
    # first epoch (step 1 is compile) — view with tensorboard/xprof.
    profile_dir = str(params.get("profile_dir", "") or "")
    tracing = False
    # Preemption safety (the reference loses everything since its last
    # 5000-step save): on SIGTERM, checkpoint at the next batch boundary
    # and exit cleanly — `--resume_model_train auto` picks it up.
    import signal

    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        preempted["flag"] = True

    # SIGTERM is delivered per-host (a cloud preemption TERMs one VM, not
    # the job): if the signaled process exited alone, the others would
    # hang forever in the next step's gradient psum waiting for it.  All
    # processes must agree on preemption at the same batch boundary — one
    # tiny allgather per step, amortized against the step's own DCN psums.
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        def _preempt_agreed(flag: bool) -> bool:
            return bool(multihost_utils.process_allgather(np.asarray(flag)).any())
    else:
        _preempt_agreed = bool

    prev_handler, handler_installed = None, False
    try:
        prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        handler_installed = True
    except ValueError:
        pass  # not the main thread (e.g. called from a test harness)

    def _restore_handler():
        if handler_installed:
            # Unconditional: prev_handler is None when the previous
            # handler was installed at the C level; fall back to SIG_DFL
            # rather than leaving our dead closure installed.
            signal.signal(signal.SIGTERM, prev_handler if prev_handler is not None else signal.SIG_DFL)

    idx = -1
    try:
        for epoch in range(params["num_epochs"]):
            print("Epoch %d started." % (epoch + 1))
            train_loss = []
            # Batches are device_put (sharded over dp when meshed) one step
            # ahead, overlapping H2D transfer with the previous step's compute.
            from show_tell_tpu.data.device_prefetch import device_prefetch

            loader_iter = device_prefetch(
                train_data_loader,
                mesh=mesh,
                # process-sharded loader (multi-host): images hold only
                # this host's rows of each batch
                local_indices=(1,) if getattr(train_data_loader, "process_shard", None) else (),
            )
            while True:
                with timer.stage("data"):
                    batch = next(loader_iter, None)
                if batch is None:
                    break
                idx = len(train_loss)
                _, images, captions, lengths = batch
                with timer.stage("step"):
                    ts, loss = step(ts, images, captions, lengths)
                    loss = float(loss)  # device sync: keeps timings honest
                train_loss.append(loss)
                if profile_dir and epoch == 0:
                    if idx + 1 == 1:
                        jax.profiler.start_trace(profile_dir)
                        tracing = True
                    elif tracing and idx + 1 >= 6:
                        jax.profiler.stop_trace()
                        tracing = False
                if _preempt_agreed(preempted["flag"]):
                    if tracing:
                        jax.profiler.stop_trace()
                    if primary:
                        create_checkpoint(ts, epoch + 1, idx + 1, train_loss, params)
                        print("Preempted (SIGTERM): checkpoint saved at epoch %d step %d; resume with --resume_training 1 --resume_model_train auto." % (epoch + 1, idx + 1))
                    else:
                        # Workers save nothing — the checkpoint lives on the
                        # primary's output dir; saying "saved" here would
                        # send an operator resuming on this host to a
                        # missing (or stale) file.
                        print("Preempted (SIGTERM): worker process %d exiting; the checkpoint is on the primary host." % jax.process_index())
                    # Terminate, don't fall through: a preempted process must
                    # not continue into the test phase or a sweep's next run
                    # during its grace period.  Exit 143 (= 128+SIGTERM, the
                    # shell convention for a TERM death) so supervisors can
                    # tell a preempted half-run from a completed one.
                    raise SystemExit(143)
                if (idx + 1) % 5000 == 0 and primary:
                    create_checkpoint(ts, epoch + 1, idx + 1, train_loss, params)
                if (idx + 1) % 500 == 0 or (idx + 1) == len(train_data_loader):
                    print(
                        "Epoch %d (Step %d) - %0.4f train loss, %0.2f time."
                        % (epoch + 1, idx + 1, train_loss[-1], time.time() - start_time)
                    )
                    if primary:
                        logger.log("train_step", step=idx + 1, epoch=epoch + 1, loss=train_loss[-1], timing=timer.summary())
            if tracing:  # epoch shorter than the 6-step trace window
                jax.profiler.stop_trace()
                tracing = False
            print("Epoch %d - %0.4f loss, %.2f time. " % (epoch + 1, np.mean(train_loss), time.time() - start_time))
            if primary:
                logger.log(
                    "epoch",
                    step=idx + 1,
                    epoch=epoch + 1,
                    mean_loss=float(np.mean(train_loss)),
                    timing=timer.summary(),
                )
                create_checkpoint(ts, epoch + 1, idx + 1, train_loss, params)
                if params.get("keep_checkpoints", 0):
                    from show_tell_tpu.train.checkpoint import prune_checkpoints

                    prune_checkpoints(params["output_dir"], int(params["keep_checkpoints"]))
            timer.reset()

            if eval_every_epochs and (epoch + 1) % eval_every_epochs == 0 and test_data_loader is not None:
                # Multi-host included: every process enters test_model
                # together — its eval mesh spans all hosts' devices, each
                # host's test loader yields the identical batch stream
                # (shuffle=False), and the decoded ids all-gather back to
                # every host (evaluation/tester.py).
                from show_tell_tpu.evaluation.tester import test_model

                print("Steps to be taken - %d\n" % params.get("sub_batch_test", 10))
                test_model(
                    ts,
                    cfg,
                    test_data_loader,
                    vocab,
                    params,
                    sub_batch_size=params.get("sub_batch_test", 10),
                )

    finally:
        _restore_handler()
    print("Training completed.")
    return ts
