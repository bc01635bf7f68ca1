"""Checkpointing with reference-compatible logical keys + torch import.

The reference writes ``model_<epoch>.ckpt`` = torch.save of
{encoder_state_dict, decoder_state_dict, optimizer_state_dict, epoch, step}
and ``model_<epoch>_metrics.ckpt`` = {train_loss} (utils.py:125-145).  We
keep the same file names and logical keys, serialized as a plain pickle of
numpy pytrees, written atomically (tmp + rename — the reference has no
atomicity).  ``import_torch_checkpoint`` loads a *reference-trained*
torch checkpoint and converts it into our params.

Resume semantics follow the reference faithfully: weights + optimizer
state are restored, but training restarts at epoch 0 (the saved epoch/step
are written yet never read back, SURVEY.md §3.5).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _atomic_pickle(obj, path: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(obj, f)
    os.replace(tmp, path)


def create_checkpoint(
    train_state,
    epoch: int,
    step: int,
    train_loss,
    params: Dict[str, Any],
    extra: Optional[Dict[str, Any]] = None,
) -> str:
    """Write model_<epoch>.ckpt (+ metrics) into params['output_dir'].

    ``params['ckpt_format']`` selects the backend: ``pickle`` (default,
    reference-compatible single file) or ``orbax`` (TensorStore-backed
    ``model_<epoch>.orbax/`` directory — the TPU-idiomatic path, handles
    sharded arrays natively at multi-chip scale).

    Multi-host (parallel/multihost.py): only process 0 calls this, with
    replicated params — the pickle path is used regardless of
    ckpt_format, because orbax's distributed-save protocol expects every
    process to participate (a one-process save of multi-process arrays
    would deadlock its coordination; with replicated params the pickle
    file is the identical global state anyway)."""
    if params.get("ckpt_format", "pickle") == "orbax" and jax.process_count() > 1:
        print("Multi-host: ckpt_format=orbax falls back to pickle (process-0 save of replicated params).")
    if params.get("ckpt_format", "pickle") == "orbax" and jax.process_count() == 1:
        model_file = _create_checkpoint_orbax(train_state, epoch, step, params, extra)
    else:
        model_file = os.path.join(params["output_dir"], "model_%d.ckpt" % epoch)
        payload = {
            "format": "show_tell_tpu.v1",
            "encoder_state_dict": {
                "trainable": _to_numpy(train_state.trainable["encoder"]),
                "frozen": _to_numpy(train_state.frozen["encoder"]),
                "bn_state": _to_numpy(train_state.bn_state),
            },
            "decoder_state_dict": _to_numpy(train_state.trainable["decoder"]),
            "optimizer_state_dict": _to_numpy(train_state.opt_state),
            "epoch": epoch,
            "step": step,
        }
        if extra:
            payload.update(extra)
        _atomic_pickle(payload, model_file)
    metrics_file = os.path.join(params["output_dir"], "model_%d_metrics.ckpt" % epoch)
    _atomic_pickle({"train_loss": list(train_loss)}, metrics_file)
    print("Checkpoint created for Epoch %d (Step %d)." % (epoch, step))
    return model_file


def _create_checkpoint_orbax(
    train_state, epoch: int, step: int, params: Dict[str, Any], extra: Optional[Dict[str, Any]] = None
) -> str:
    """model_<epoch>.orbax/ via orbax StandardCheckpointer.

    The optimizer state is stored as a flat leaf list (optax chain states
    are namedtuples orbax would round-trip as dicts; the live treedef
    reconstructs them on restore).  Written atomically like the pickle
    backend: save lands in a .tmp directory which replaces any existing
    same-epoch checkpoint only once complete — a crash mid-save never
    destroys the previous copy."""
    import shutil

    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(params["output_dir"], "model_%d.orbax" % epoch))
    tmp = path + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    payload = {
        "encoder_trainable": _to_numpy(train_state.trainable["encoder"]),
        "encoder_frozen": _to_numpy(train_state.frozen["encoder"]),
        "bn_state": _to_numpy(train_state.bn_state),
        "decoder": _to_numpy(train_state.trainable["decoder"]),
        "opt_leaves": [np.asarray(x) for x in jax.tree.leaves(train_state.opt_state)],
        "epoch": np.int64(epoch),
        "step": np.int64(step),
    }
    if extra:
        payload["extra"] = {k: np.asarray(v) for k, v in extra.items()}
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(tmp, payload)
    ckptr.wait_until_finished()
    old = path + ".old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(path):
        # Directory renames can't atomically replace a non-empty target;
        # the .old copy stays resolvable (_list_checkpoints falls back to
        # it) so a crash between these renames still leaves a complete
        # same-epoch checkpoint discoverable.
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
    else:
        os.rename(tmp, path)
    return path


def _load_checkpoint_orbax(path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    raw = ckptr.restore(os.path.abspath(path))
    out = {
        "format": "show_tell_tpu.orbax",
        "encoder_state_dict": {
            "trainable": raw["encoder_trainable"],
            "frozen": raw["encoder_frozen"],
            "bn_state": raw["bn_state"],
        },
        "decoder_state_dict": raw["decoder"],
        "optimizer_state_dict": {"__leaves__": list(raw["opt_leaves"])},
        "epoch": int(raw["epoch"]),
        "step": int(raw["step"]),
    }
    out.update(raw.get("extra") or {})  # same surface as the pickle backend
    return out


def resolve_checkpoint_path(output_dir: str, name: str) -> str:
    """``model_N`` -> the existing ``model_N.ckpt`` file or
    ``model_N.orbax`` directory (pickle wins when both exist).
    ``model_N.orbax.old`` is the crash-recovery fallback: a kill between
    the two directory renames of an orbax same-epoch rewrite leaves the
    previous complete copy there."""
    pickle_path = os.path.join(output_dir, name + ".ckpt")
    if os.path.isfile(pickle_path):
        return pickle_path
    orbax_path = os.path.join(output_dir, name + ".orbax")
    if os.path.isdir(orbax_path):
        return orbax_path
    if os.path.isdir(orbax_path + ".old"):
        return orbax_path + ".old"
    return pickle_path  # default error surface: missing-file message


def load_checkpoint(path: str) -> Dict[str, Any]:
    if os.path.isdir(path):  # orbax checkpoint directory
        return _load_checkpoint_orbax(path)
    with open(path, "rb") as f:
        return pickle.load(f)


def _list_checkpoints(output_dir: str):
    """{epoch: [paths]} for model_<N>.ckpt files and model_<N>.orbax
    directories.  A same-epoch .ckpt/.orbax pair (format switched
    mid-run) is ONE epoch with two paths — retention and auto-resume
    count epochs, not files."""
    import re

    out: Dict[int, list] = {}
    recovery: Dict[int, str] = {}
    for name in sorted(os.listdir(output_dir)):
        m = re.fullmatch(r"model_(\d+)\.(ckpt|orbax)", name)
        if m:
            out.setdefault(int(m.group(1)), []).append(os.path.join(output_dir, name))
            continue
        m = re.fullmatch(r"model_(\d+)\.orbax\.old", name)
        if m:  # crash-recovery copy (see _create_checkpoint_orbax)
            recovery[int(m.group(1))] = os.path.join(output_dir, name)
    for epoch, path in recovery.items():
        out.setdefault(epoch, []).append(path)
    return out


def find_latest_checkpoint(output_dir: str) -> Optional[str]:
    """Newest-epoch checkpoint, for --resume_model_train auto (the
    reference's recovery story is manual name-picking, SURVEY.md §5).
    When the newest epoch exists in both formats, the pickle wins —
    same preference as resolve_checkpoint_path."""
    ckpts = _list_checkpoints(output_dir)
    if not ckpts:
        return None
    return resolve_checkpoint_path(output_dir, "model_%d" % max(ckpts))


def prune_checkpoints(output_dir: str, keep_last: int) -> None:
    """Retention policy (the reference has none): keep the newest
    ``keep_last`` checkpoint *epochs* (+ their metrics files)."""
    if keep_last <= 0:
        return
    import shutil

    ckpts = _list_checkpoints(output_dir)
    for epoch in sorted(ckpts)[:-keep_last]:
        for p in ckpts[epoch] + [os.path.join(output_dir, "model_%d_metrics.ckpt" % epoch)]:
            if os.path.isdir(p):
                shutil.rmtree(p)
            elif os.path.isfile(p):
                os.remove(p)


def restore_train_state(train_state, ckpt: Dict[str, Any]):
    """Rebuild a TrainState from a checkpoint (shapes must match)."""
    from show_tell_tpu.train.train_step import TrainState

    enc = ckpt["encoder_state_dict"]
    trainable = {
        "decoder": ckpt["decoder_state_dict"],
        "encoder": enc["trainable"],
    }
    frozen = {"encoder": enc["frozen"]}
    # Keep pytree structure from the live state, values from the ckpt.
    trainable = jax.tree.map(lambda _, v: jax.numpy.asarray(v), train_state.trainable, trainable)
    frozen = jax.tree.map(lambda _, v: jax.numpy.asarray(v), train_state.frozen, frozen)
    bn_state = jax.tree.map(lambda _, v: jax.numpy.asarray(v), train_state.bn_state, enc["bn_state"])
    opt_ckpt = ckpt["optimizer_state_dict"]
    try:
        if isinstance(opt_ckpt, dict) and "__leaves__" in opt_ckpt:
            # orbax backend stores a flat leaf list; rebuild with the
            # live treedef (leaf shapes must line up).
            leaves = [jax.numpy.asarray(v) for v in opt_ckpt["__leaves__"]]
            live, treedef = jax.tree.flatten(train_state.opt_state)
            if len(leaves) != len(live) or any(
                np.shape(a) != np.shape(b) for a, b in zip(leaves, live)
            ):
                raise ValueError("optimizer leaf mismatch")
            opt_state = jax.tree.unflatten(treedef, leaves)
        else:
            opt_state = jax.tree.map(lambda _, v: jax.numpy.asarray(v), train_state.opt_state, opt_ckpt)
    except ValueError:
        # Checkpoint was written with a different optimizer (e.g. Adam ckpt
        # restored into an SGD run, common when only evaluating). Weights
        # still restore; momentum state starts fresh.
        print("Optimizer state in checkpoint does not match the current optimizer; resetting it.")
        opt_state = train_state.opt_state
    return TrainState(trainable, frozen, bn_state, opt_state, train_state.rng, train_state.step)


def import_torch_checkpoint(path: str, cfg) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a reference torch checkpoint (utils.py:131-138) -> (params, state).

    Requires torch (CPU) for deserialization.  Optimizer state is not
    imported (torch/optax trees differ; resume momentum from zero).
    """
    import torch

    from show_tell_tpu.models.convert import (
        attn_decoder_params_from_torch,
        decoder_params_from_torch,
    )
    from show_tell_tpu.models.encoder import encoder_params_from_torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    enc_params, enc_state = encoder_params_from_torch(ckpt["encoder_state_dict"], cfg.encoder_config())
    if cfg.is_attention:
        dec_params = attn_decoder_params_from_torch(ckpt["decoder_state_dict"], cfg.num_layers)
    else:
        dec_params = decoder_params_from_torch(ckpt["decoder_state_dict"], cfg.num_layers)
    return {"encoder": enc_params, "decoder": dec_params}, enc_state
