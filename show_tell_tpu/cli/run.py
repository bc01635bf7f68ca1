"""Shared CLI runner behind the four entry points.

Phase selection and flow mirror reference main.py:116-176: build vocab and
loaders, construct models, train when --is_training, then test when
--is_testing by loading --load_model_test and running the test_model flow.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax

from show_tell_tpu.core.config import load_params
from show_tell_tpu.data.dataset import get_data_loader
from show_tell_tpu.evaluation.tester import test_model
from show_tell_tpu.train.checkpoint import load_checkpoint, resolve_checkpoint_path, restore_train_state
from show_tell_tpu.train.loop import captioner_config_from_params, train
from show_tell_tpu.train.optim import make_optimizer
from show_tell_tpu.train.train_step import create_train_state
from show_tell_tpu.vocab.vocabulary import get_vocabulary


def apply_device(device: str, check_backend: bool = True) -> None:
    """Honor ``--device`` (reference main.py:62,104-113 places on cpu/gpu).

    ``cpu`` forces the JAX CPU backend — must run before the backend
    initializes (see tests/conftest.py for the same pattern).  ``gpu`` and
    ``tpu`` both mean "the default accelerator": the reference's ``.cuda()``
    placement maps to whatever accelerator JAX sees, so they are aliases.

    ``check_backend=False`` skips the did-it-take verification, which
    itself initializes the backend — required before
    ``jax.distributed.initialize`` (``--multihost``), which must run
    while NO backend exists; run() re-checks after that.
    """
    if device == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:  # backend already initialized
            pass
        if check_backend and jax.default_backend() != "cpu":
            print("Warning: --device cpu requested but the %s backend was already initialized." % jax.default_backend())
    elif device not in ("gpu", "tpu"):
        raise ValueError("Please specify a valid device - gpu/cpu/tpu. %s doesn't exist." % (device,))


def _init_from_backbone(path: str, cfg, seed: int):
    """--backbone_weights: torchvision .pth -> frozen backbone params,
    everything else freshly initialized like the reference (cnn.py:37-42
    head init, torch-default decoder init).  Replaces torchvision's
    pretrained=True download (cnn.py:23-31)."""
    import torch

    from show_tell_tpu.models.captioner import init_captioner
    from show_tell_tpu.models.resnet import resnet_params_from_torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    res_params, res_state = resnet_params_from_torch(sd)
    p, s = init_captioner(jax.random.PRNGKey(seed), cfg)
    p = {**p, "encoder": {**p["encoder"], "resnet": res_params}}
    s = {**s, "resnet": res_state}
    print("Backbone weights loaded from %s." % path)
    return p, s


def run(variant: str, argv: Optional[List[str]] = None, data_source: str = "MSCOCO") -> Dict[str, Any]:
    params = load_params(argv, variant=variant, data_source=data_source)
    data_source = params["data_source"]  # --data_source flag may override
    multihost = params.get("multihost")
    # --device must only set config before --multihost init: its backend
    # verification would itself initialize a backend, and
    # jax.distributed.initialize refuses to run after that.
    apply_device(params.get("device", "gpu"), check_backend=not multihost)
    if multihost:
        # Must precede any backend-initializing call: after it,
        # jax.devices() is the GLOBAL (all-hosts) topology and the dp
        # mesh spans it (parallel/multihost.py).
        from show_tell_tpu.parallel.multihost import initialize

        initialize(multihost)
        print("Multi-host runtime: process %d of %d, %d global devices."
              % (jax.process_index(), jax.process_count(), jax.device_count()))
        # Re-run the did-it-take check that was skipped above (idempotent:
        # the config update is swallowed post-init, only the warning runs).
        apply_device(params.get("device", "gpu"))
    print("Parameters being used by the Model - ", params)

    vocab = get_vocabulary(data_source, params)
    print("Vocabulary loaded.")

    train_data_loader = get_data_loader(vocab, params, "train")
    print("Training data loaded.")
    # The Flickr config block ships test_ann_path="" (no val split in the
    # reference's layout): skip the test loader — and the GRU CLI's
    # 5-epoch eval — rather than opening a directory as an annotation file.
    have_test_ann = bool(params.get("test_ann_path"))
    if params.get("is_testing") and not have_test_ann:
        raise ValueError("--is_testing 1 requires --test_ann_path (the %s config block has none)" % params["data_source"])
    test_data_loader = (
        get_data_loader(vocab, params, "test")
        if have_test_ann and (params.get("is_testing") or variant == "gru")
        else None
    )
    if test_data_loader is not None:
        print("Testing data loaded.")

    cfg = captioner_config_from_params(params, len(vocab))
    results: Dict[str, Any] = {"params": params, "config": cfg}

    ts = None
    if params["is_training"]:
        init_ps = None
        if params.get("backbone_weights"):
            init_ps = _init_from_backbone(params["backbone_weights"], cfg, params.get("seed", 1))
        ts = train(
            params,
            vocab,
            train_data_loader,
            test_data_loader,
            eval_every_epochs=5 if variant == "gru" else 0,
            init_params_state=init_ps,
        )
        results["train_state"] = ts

    if params["is_testing"] and jax.process_count() > 1:
        # Multi-host test phase: every process runs test_model together —
        # the eval mesh spans all hosts' devices (decode dp-shards over
        # DCN+ICI, ids all-gather back), each host scores the identical
        # gathered captions, and only the primary writes the metric
        # pickles (evaluation/tester.py).  Requires the checkpoint to be
        # readable on every host (shared filesystem, or copy it) — the
        # restore below runs per-process.
        print("Multi-host test phase: process %d of %d joins the sharded eval."
              % (jax.process_index(), jax.process_count()))

    if params["is_testing"]:
        optimizer = make_optimizer(params["optimizer_type"], params["lr"], params.get("momentum", 0.9))
        ts = create_train_state(jax.random.PRNGKey(params.get("seed", 1)), cfg, optimizer)
        ckpt_path = resolve_checkpoint_path(params["output_dir"], params["load_model_test"])
        ts = restore_train_state(ts, load_checkpoint(ckpt_path))
        print("Model loaded.")
        print("Steps to be taken - %d\n" % len(test_data_loader))
        results["scores"] = test_model(
            ts,
            cfg,
            test_data_loader,
            vocab,
            params,
            sub_batch_size=-1,
            beam_size=params.get("beam_size", 0),
            faithful_beam=bool(params.get("faithful_beam", 0)),
        )
    return results
