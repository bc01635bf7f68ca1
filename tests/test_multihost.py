"""Multi-host (multi-process) execution: a REAL 2-process run.

The reference is strictly single-process (SURVEY §2.4); the framework's
multi-host layer (parallel/multihost.py) must make the same dp-sharded
train step span OS processes.  This test spawns two subprocesses with 4
virtual CPU devices each; they form one dp=8 mesh whose collectives ride
Gloo (the CPU stand-in for DCN), run 3 train steps through the real
machinery, and must agree with each other AND with the single-process
dp=8 run bit-for-bit up to cross-backend reduction tolerance.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from multihost_driver import make_batch  # tests/ is on sys.path under pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_reference():
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
    rng = np.random.RandomState(4)
    batches = [make_batch(rng, cfg.vocab_size) for _ in range(3)]
    mesh = make_mesh(dp=8)
    ts = replicate(mesh, create_train_state(jax.random.PRNGKey(5), cfg, opt))
    losses = []
    for images, captions, lengths in batches:
        ts, loss = step(ts, *shard_batch(mesh, images, captions, lengths))
        losses.append(float(loss))
    checksum = float(
        sum(float(jnp.sum(jnp.abs(x.astype(jnp.float32)))) for x in jax.tree.leaves(ts.trainable))
    )
    return losses, checksum


def _run_multihost(tmp_path, nproc: int, timeout: int = 420):
    """Spawn nproc driver processes (8 // nproc virtual devices each —
    always one dp=8 global mesh) and return {pid: RESULT dict}."""
    eval_dir = str(tmp_path / "eval_out")
    os.makedirs(eval_dir, exist_ok=True)
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=%d" % (8 // nproc)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    driver = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multihost_driver.py")
    procs = [
        subprocess.Popen(
            [sys.executable, driver, str(pid), str(port), eval_dir, str(nproc)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost subprocess timed out")
        outs.append(out)
        assert p.returncode == 0, out

    results = {}
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out
        r = json.loads(lines[-1][len("RESULT "):])
        results[r["pid"]] = r
    return results, eval_dir


def _assert_multihost_results(tmp_path, results, eval_dir, ref_losses, ref_checksum):
    pids = sorted(results)
    assert results[0]["primary"] is True
    for pid in pids[1:]:
        assert results[pid]["primary"] is False
    # every process runs ONE program: identical losses and params
    for pid in pids[1:]:
        np.testing.assert_allclose(results[0]["losses"], results[pid]["losses"], rtol=0, atol=0)
        assert results[0]["checksum"] == results[pid]["checksum"]
    # and it reproduces the single-process dp=8 step (Gloo vs single-
    # process reductions may differ in the last ulps)
    np.testing.assert_allclose(results[0]["losses"], ref_losses, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(results[0]["checksum"], ref_checksum, rtol=1e-5)
    # the process-sharded (local-rows) input path — what the multi-host
    # loader emits — must reproduce the identical-global-batch losses
    np.testing.assert_allclose(
        results[0]["losses_local"], results[0]["losses"], rtol=1e-6, atol=1e-7
    )
    # preemption agreement (train/loop.py): a flag raised on ONE process
    # must be seen by ALL; no flag anywhere stays False everywhere
    for r in results.values():
        assert r["preempt_agreed_one"] is True
        assert r["preempt_agreed_none"] is False
    # orbax fallback (checkpoint.py:58): ckpt_format=orbax under
    # multi-host saves the process-0 pickle (no model_1.orbax/ dir) and
    # every process resumes the identical state from the shared file
    for r in results.values():
        assert r["orbax_fallback_ok"] is True

    # ---- multi-host sharded EVAL (VERDICT r3 ask 5): the N-process
    # test_model run must produce the single-process score dict.  Decoded
    # ids all-gather on device, so the word-level metrics are bit-equal;
    # the teacher-forced loss crosses Gloo reductions (tolerance).
    from multihost_driver import run_sharded_eval

    single = run_sharded_eval(str(tmp_path / "eval_single"), dp=8)
    for r in results.values():
        got = r["eval_scores"]
        assert got is not None
        for k in single:
            if k == "test_loss":
                np.testing.assert_allclose(got[k], single[k], rtol=1e-5)
            else:
                assert got[k] == single[k], (k, got[k], single[k])
    # every process ran the eval but only the PRIMARY wrote the pickles
    # into the shared out dir (worker writes would race/tear them)
    for f in ("Target_Words_Dict.pickle", "Candidate_Words_Dict.pickle"):
        assert os.path.isfile(os.path.join(eval_dir, f)), f
    # the HOST-SIDE scoring is sharded by batch: the 3 eval batches are
    # scored exactly once across processes, round-robin (idx % nproc), so
    # no process scores more than ceil(3/nproc) — the scalable half of
    # multi-host eval (decode dp-shards on device, scoring shards on hosts)
    nproc = len(pids)
    scored = [results[pid]["eval_batches_scored"] for pid in pids]
    assert sum(scored) == 3, scored
    assert max(scored) == -(-3 // nproc), scored


def test_two_process_dp8_matches_single_process(tmp_path):
    assert len(jax.devices()) >= 8
    ref_losses, ref_checksum = _single_process_reference()
    results, eval_dir = _run_multihost(tmp_path, nproc=2)
    _assert_multihost_results(tmp_path, results, eval_dir, ref_losses, ref_checksum)


def test_four_process_dp8_matches_single_process(tmp_path):
    """4 processes x 2 virtual devices: the same dp=8 program over twice
    the process fan-out — 4-way Gloo collectives, 4-way preemption
    agreement, quarter-batch local-rows input, 4-way sharded eval with
    one pickle writer.  Identical assertions to the 2-process run."""
    assert len(jax.devices()) >= 8
    ref_losses, ref_checksum = _single_process_reference()
    results, eval_dir = _run_multihost(tmp_path, nproc=4, timeout=560)
    assert sorted(results) == [0, 1, 2, 3]
    _assert_multihost_results(tmp_path, results, eval_dir, ref_losses, ref_checksum)


def test_make_mesh_rejects_processless_multihost_mesh(monkeypatch):
    """A multi-host mesh whose dp*mp prefix leaves some process with zero
    devices must be rejected up front (make_mesh) — otherwise that
    process fails obscurely in put_sharded and the others hang in their
    first collective.  Simulated single-process: all 8 virtual devices
    report process_index 0, so claiming 2 processes makes ANY mesh
    processless for the phantom process 1."""
    from show_tell_tpu.parallel.mesh import make_mesh

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="every process must own the same number"):
        make_mesh(dp=4)
    # single-process: the same shape is fine
    monkeypatch.undo()
    assert make_mesh(dp=4).shape["dp"] == 4


def test_make_mesh_rejects_uneven_and_oversized_meshes(monkeypatch):
    """Round-3 review: EQUAL per-process device counts are required (the
    process-sharded loader and put_sharded(local_rows=True) assume each
    host owns exactly 1/Nth of every batch), and dp*mp beyond the device
    count must fail with a clear message, not a numpy reshape error."""
    from show_tell_tpu.parallel.mesh import make_mesh

    class FakeDev:
        def __init__(self, pid):
            self.process_index = pid

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    # covers both processes but unevenly: 2 devices from proc0, 1 from proc1
    with pytest.raises(ValueError, match="unevenly"):
        make_mesh(dp=3, mp=1, devices=[FakeDev(0), FakeDev(0), FakeDev(1)])
    monkeypatch.undo()
    with pytest.raises(ValueError, match="devices"):
        make_mesh(dp=len(jax.devices()) + 1, mp=1)


def test_shard_train_state_multihost_mp_guard(monkeypatch):
    """parallel/mesh.py's multi-host mp scope guard: tensor parallelism
    is single-host only (mp traffic is per-decode-step and belongs on
    ICI; dp is the only axis that should cross DCN — SURVEY §2.4).  The
    error surface is part of the contract: pin its type and message."""
    from show_tell_tpu.models.captioner import CaptionerConfig
    from show_tell_tpu.parallel.mesh import make_mesh, shard_train_state
    from show_tell_tpu.train.optim import make_optimizer
    from show_tell_tpu.train.train_step import create_train_state

    cfg = CaptionerConfig(
        variant="gru", resnet_version=18, embed_dim=24, hidden_dim=32,
        vocab_size=40, num_layers=2,
    )
    ts = create_train_state(jax.random.PRNGKey(0), cfg, make_optimizer("SGD", 0.01, 0.9))
    mesh = make_mesh(dp=4, mp=2)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(NotImplementedError, match="tensor parallelism .*single-host only"):
        shard_train_state(mesh, ts, tensor_parallel=True)
    monkeypatch.undo()
    # single-host: the same call succeeds
    shard_train_state(mesh, ts, tensor_parallel=True)


def test_cli_uneven_multihost_mesh_fails_fast(tmp_path):
    """CLI-level negative over REAL processes: two hosts joining with
    UNEVEN device counts (5 + 3 virtual) must fail fast in make_mesh
    with the clear uneven-coverage message — on every process — instead
    of one process dying obscurely in put_sharded while the other hangs
    in its first collective."""
    import sys as _sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import build_mini_coco

    data_dir = str(tmp_path / "data")
    build_mini_coco(data_dir)
    port = _free_port()
    script = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from show_tell_tpu.cli.run import run
pid = sys.argv[1]
try:
    run("gru", argv=[
        "--data_dir", sys.argv[2], "--output_dir", sys.argv[3],
        "--train_ann_path", "annotations/captions_train2014.json",
        "--test_ann_path", "annotations/captions_train2014.json",
        "--train_img_dir", "train2014", "--test_img_dir", "train2014",
        "--vocab_threshold", "1", "--embedding_length", "8",
        "--num_hidden_units", "12", "--num_layers", "1", "--batch_size", "8",
        "--num_epochs", "1", "--resnet_version", "18", "--is_training", "1",
        "--is_testing", "0", "--device", "cpu",
        "--multihost", "127.0.0.1:%s,2,%s" % (sys.argv[4], pid),
    ])
except ValueError as e:
    print("GOT_ERROR:", e)
    sys.exit(42)
sys.exit(0)
"""
    procs = []
    for pid, ndev in ((0, 5), (1, 3)):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=%d" % ndev
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = os.pathsep.join(
            [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
            + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
        )
        out_dir = str(tmp_path / ("out%d" % pid))
        os.makedirs(out_dir, exist_ok=True)
        procs.append(subprocess.Popen(
            [_sys.executable, "-c", script, str(pid), data_dir, out_dir, str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        ))
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("uneven-mesh CLI subprocess hung instead of failing fast")
        assert p.returncode == 42, out
        assert "covers processes unevenly" in out, out
