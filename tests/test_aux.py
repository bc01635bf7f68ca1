"""Aux subsystems: torch checkpoint import, generic beam, profiling,
metrics logging, loss-analysis tool."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_import_torch_checkpoint(tmp_path):
    """A reference-format torch.save checkpoint loads and reproduces the
    torch model's logits through our stack."""
    torch = pytest.importorskip("torch")
    from show_tell_tpu.models.captioner import CaptionerConfig, captioner_greedy_decode
    from show_tell_tpu.train.checkpoint import import_torch_checkpoint

    sys.path.insert(0, os.path.dirname(__file__))
    from torch_resnet_oracle import TorchResNet

    torch.manual_seed(0)
    backbone = TorchResNet(18)
    lin = torch.nn.Linear(512, 20)
    bn = torch.nn.BatchNorm1d(20, momentum=0.01)
    idx_map = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5", "layer3": "6", "layer4": "7"}
    enc_sd = {}
    for k, v in backbone.state_dict().items():
        if k.startswith("fc."):
            continue
        root = k.split(".")[0]
        enc_sd["model." + idx_map[root] + k[len(root):]] = v
    for k, v in lin.state_dict().items():
        enc_sd["linear_secondlast_layer." + k] = v
    for k, v in bn.state_dict().items():
        enc_sd["last_layer." + k] = v

    emb = torch.nn.Embedding(30, 20)
    unit = torch.nn.GRU(20, 24, 2, batch_first=True)
    out_lin = torch.nn.Linear(24, 30)
    dec_sd = {"embeddings.weight": emb.weight}
    for k, v in unit.state_dict().items():
        dec_sd["unit." + k] = v
    dec_sd["linear.weight"], dec_sd["linear.bias"] = out_lin.weight, out_lin.bias

    ckpt_path = str(tmp_path / "model_1.ckpt")
    torch.save(
        {
            "encoder_state_dict": enc_sd,
            "decoder_state_dict": dec_sd,
            "optimizer_state_dict": {},
            "epoch": 1,
            "step": 10,
        },
        ckpt_path,
    )

    cfg = CaptionerConfig("gru", 18, 20, 24, 30, 2)
    params, state = import_torch_checkpoint(ckpt_path, cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32))
    ids = captioner_greedy_decode(params, state, cfg, x)
    assert ids.shape == (2, 25)

    # Cross-check decode against the torch modules run eval-style.
    backbone.eval(), lin.eval(), bn.eval(), unit.eval()
    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(np.asarray(x), (0, 3, 1, 2)))
        feat = bn(lin(backbone.avgpool(backbone.features(xt)).flatten(1)))
        rnn_data = feat.unsqueeze(1)
        hidden = None
        toks = []
        for _ in range(25):
            o, hidden = unit(rnn_data, hidden)
            tok = out_lin(o.squeeze(1)).max(1)[1]
            toks.append(tok)
            rnn_data = emb(tok).unsqueeze(1)
        ref = torch.stack(toks, 1).numpy()
    np.testing.assert_array_equal(np.asarray(ids), ref)


def test_generic_beam_search():
    """Deterministic 3-state toy LM: beam must find the highest-prob path."""
    from show_tell_tpu.decode.generic import beam_search

    V = 5
    END = 4

    def initial_state(_x):
        return 0

    def generate(state, _value):
        probs = np.full(V, 0.01)
        if state == 0:
            probs[1] = 0.9
        elif state == 1:
            probs[2] = 0.8
        else:
            probs[END] = 0.9
        probs /= probs.sum()
        return probs, min(state + 1, 2)

    hyps = beam_search(initial_state, generate, None, start_id=3, end_id=END, beam_width=3)
    assert hyps[0] == [3, 1, 2, END]


def test_step_timer_and_metrics_logger(tmp_path):
    from show_tell_tpu.utils import MetricsLogger, StepTimer

    timer = StepTimer()
    with timer.stage("data"):
        pass
    with timer.stage("step"):
        pass
    with timer.stage("step"):
        pass
    s = timer.summary()
    assert s["step"]["count"] == 2 and s["data"]["count"] == 1

    logger = MetricsLogger(str(tmp_path))
    logger.log("train_step", step=1, loss=3.2)
    logger.log("eval", step=1, bleu4=0.3)
    records = logger.read()
    assert len(records) == 2 and records[0]["loss"] == 3.2


def test_metrics_bench_tool():
    # tools/metrics_bench.py times our evaluate() against the reference's
    # live scorer module on identical corpora; the JSON line must report
    # exact score agreement (the fuzz test is the real numerics gate —
    # this pins the tool itself against bit-rot).
    if not os.path.exists("/root/reference/evaluation/evaluation_metrics.py"):
        pytest.skip("reference checkout not available")
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "tools", "metrics_bench.py"), "3", "4"],
        capture_output=True,
        text=True,
    )
    assert out.returncode == 0, out.stderr
    line = json.loads(out.stdout.strip().splitlines()[-1])
    assert line["metric"] == "evaluate_batches_per_sec"
    assert line["max_score_delta"] == 0.0
    assert line["value"] > 0 and line["reference_batches_per_sec"] > 0


def test_loss_analysis_tool(tmp_path):
    run = tmp_path / "GRU_512_lr_0_001"
    run.mkdir()
    for epoch in (1, 2):
        with open(run / ("model_%d_metrics.ckpt" % epoch), "wb") as f:
            pickle.dump({"train_loss": [3.0 - epoch, 2.9 - epoch]}, f)
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "tools", "loss_analysis.py"), str(tmp_path)],
        capture_output=True,
        text=True,
    )
    assert out.returncode == 0, out.stderr
    assert "GRU_512_lr_0_001" in out.stdout
    assert "epoch   1" in out.stdout


def test_checkpoint_retention_and_auto_resume(tmp_path):
    from show_tell_tpu.train.checkpoint import (
        find_latest_checkpoint,
        prune_checkpoints,
    )

    for epoch in range(1, 6):
        for suffix in (".ckpt", "_metrics.ckpt"):
            with open(tmp_path / ("model_%d%s" % (epoch, suffix)), "wb") as f:
                pickle.dump({"epoch": epoch}, f)
    assert find_latest_checkpoint(str(tmp_path)).endswith("model_5.ckpt")
    prune_checkpoints(str(tmp_path), keep_last=2)
    remaining = sorted(p.name for p in tmp_path.iterdir())
    assert remaining == [
        "model_4.ckpt", "model_4_metrics.ckpt", "model_5.ckpt", "model_5_metrics.ckpt",
    ]
    prune_checkpoints(str(tmp_path), keep_last=0)  # 0 = keep all
    assert len(list(tmp_path.iterdir())) == 4


def test_auto_resume_cli(tmp_path):
    """--resume_training with --resume_model_train auto trains from the
    newest checkpoint end-to-end."""
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import build_mini_coco
    from show_tell_tpu.cli.run import run

    data_root = str(tmp_path / "data")
    out_dir = str(tmp_path / "out")
    build_mini_coco(data_root)
    os.makedirs(out_dir, exist_ok=True)
    argv = [
        "--data_dir", data_root, "--output_dir", out_dir,
        "--train_ann_path", "annotations/captions_train2014.json",
        "--test_ann_path", "annotations/captions_train2014.json",
        "--train_img_dir", "train2014", "--test_img_dir", "train2014",
        "--vocab_threshold", "1", "--embedding_length", "12",
        "--num_hidden_units", "16", "--num_layers", "1", "--batch_size", "4",
        "--num_epochs", "1", "--resnet_version", "18", "--optimizer_type", "Adam",
        "--is_training", "1", "--is_testing", "0",
    ]
    run("gru", argv)
    assert os.path.isfile(os.path.join(out_dir, "model_1.ckpt"))
    run("gru", argv + ["--resume_training", "1", "--resume_model_train", "auto",
                       "--keep_checkpoints", "1"])
    # keep_checkpoints=1 pruned nothing extra here (same epoch count), but
    # the resume path exercised find_latest_checkpoint end-to-end.
    assert os.path.isfile(os.path.join(out_dir, "model_1.ckpt"))


def test_orbax_checkpoint_roundtrip(tmp_path):
    """orbax backend: save/restore rebuilds weights, optimizer state (via
    the flat-leaf list + live treedef), and epoch/step exactly."""
    import jax
    import jax.numpy as jnp

    from show_tell_tpu.models.captioner import CaptionerConfig
    from show_tell_tpu.train.checkpoint import (
        create_checkpoint,
        load_checkpoint,
        resolve_checkpoint_path,
        restore_train_state,
    )
    from show_tell_tpu.train.optim import make_optimizer
    from show_tell_tpu.train.train_step import create_train_state, make_train_step

    cfg = CaptionerConfig("gru", 18, 8, 12, 40, 1)
    opt = make_optimizer("Adam", 0.01)
    ts = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    # One real step so the optimizer state is non-trivial.
    step = make_train_step(cfg, opt, augment=False)
    imgs = np.zeros((2, 64, 64, 3), np.uint8)
    caps = np.array([[1, 5, 6, 2, 0, 0], [1, 7, 2, 0, 0, 0]], np.int32)
    lens = np.array([4, 3], np.int32)
    ts, _ = step(ts, imgs, jnp.asarray(caps), jnp.asarray(lens))

    params = {"output_dir": str(tmp_path), "ckpt_format": "orbax"}
    create_checkpoint(ts, 3, 17, [1.0, 0.5], params)
    path = resolve_checkpoint_path(str(tmp_path), "model_3")
    assert path.endswith("model_3.orbax") and os.path.isdir(path)

    ckpt = load_checkpoint(path)
    assert ckpt["epoch"] == 3 and ckpt["step"] == 17

    ts2 = create_train_state(jax.random.PRNGKey(1), cfg, opt)  # different init
    ts2 = restore_train_state(ts2, ckpt)
    for a, b in zip(jax.tree.leaves(ts.trainable), jax.tree.leaves(ts2.trainable)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ts.opt_state), jax.tree.leaves(ts2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # bn running stats restore too
    for a, b in zip(jax.tree.leaves(ts.bn_state), jax.tree.leaves(ts2.bn_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_retention_and_auto_resume(tmp_path):
    """prune_checkpoints removes orbax dirs; find_latest sees them."""
    import jax

    from show_tell_tpu.models.captioner import CaptionerConfig
    from show_tell_tpu.train.checkpoint import (
        create_checkpoint,
        find_latest_checkpoint,
        prune_checkpoints,
    )
    from show_tell_tpu.train.optim import make_optimizer
    from show_tell_tpu.train.train_step import create_train_state

    cfg = CaptionerConfig("gru", 18, 8, 12, 40, 1)
    ts = create_train_state(jax.random.PRNGKey(0), cfg, make_optimizer("SGD", 0.01))
    params = {"output_dir": str(tmp_path), "ckpt_format": "orbax"}
    for epoch in (1, 2, 3):
        create_checkpoint(ts, epoch, epoch, [1.0], params)
    assert find_latest_checkpoint(str(tmp_path)).endswith("model_3.orbax")
    prune_checkpoints(str(tmp_path), keep_last=1)
    names = sorted(os.listdir(str(tmp_path)))
    assert "model_3.orbax" in names and "model_1.orbax" not in names and "model_2.orbax" not in names


def test_reproduce_reference_dry_run():
    """The reproduction runbook assembles the reference's published-row
    hyperparams into the right CLI invocation (dry run, no training)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "tools/reproduce_reference.py", "--row", "gru_512_lr001_sgd"],
        capture_output=True, text=True, cwd=repo, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "cli.main" in out.stdout
    for frag in ["--lr 0.001", "--embedding_length 512", "--optimizer_type SGD",
                 "--num_epochs 100", "--resnet_version 101", "dry run"]:
        assert frag in out.stdout, frag
    out = subprocess.run(
        [sys.executable, "tools/reproduce_reference.py", "--row", "lstm_512_lr0001_adam"],
        capture_output=True, text=True, cwd=repo, timeout=120,
    )
    assert "cli.main_lstm" in out.stdout and "--optimizer_type Adam" in out.stdout


def test_mixed_format_retention_counts_epochs(tmp_path):
    """A same-epoch .ckpt/.orbax pair is ONE epoch for retention and
    auto-resume; the pickle wins format-preference at the same epoch
    (matching resolve_checkpoint_path)."""
    import os

    from show_tell_tpu.train.checkpoint import (
        find_latest_checkpoint,
        prune_checkpoints,
    )

    for epoch in (1, 2, 3):
        with open(tmp_path / ("model_%d.ckpt" % epoch), "wb") as f:
            pickle.dump({"epoch": epoch}, f)
    os.makedirs(tmp_path / "model_3.orbax")  # epoch 3 in both formats

    assert find_latest_checkpoint(str(tmp_path)).endswith("model_3.ckpt")

    prune_checkpoints(str(tmp_path), keep_last=2)
    remaining = sorted(p.name for p in tmp_path.iterdir())
    # Two *epochs* kept (2 and 3) — not two directory entries of epoch 3.
    assert remaining == ["model_2.ckpt", "model_3.ckpt", "model_3.orbax"]


def test_orbax_extra_payload_and_atomic_rewrite(tmp_path, tiny_cfg_state=None):
    """Orbax backend keeps the `extra` payload (pickle-backend parity)
    and re-saving the same epoch replaces the old copy via tmp+rename
    (no window with zero checkpoints)."""
    import jax

    from show_tell_tpu.models.captioner import CaptionerConfig
    from show_tell_tpu.train.checkpoint import create_checkpoint, load_checkpoint
    from show_tell_tpu.train.optim import make_optimizer
    from show_tell_tpu.train.train_step import create_train_state

    cfg = CaptionerConfig(variant="gru", resnet_version=18, embed_dim=8,
                          hidden_dim=12, vocab_size=20, num_layers=1)
    ts = create_train_state(jax.random.PRNGKey(0), cfg, make_optimizer("SGD", 0.1, 0.9))
    params = {"output_dir": str(tmp_path), "ckpt_format": "orbax"}

    path = create_checkpoint(ts, 1, 10, [1.0], params, extra={"best_bleu": 0.5})
    ckpt = load_checkpoint(path)
    assert float(ckpt["best_bleu"]) == 0.5

    # Same-epoch rewrite: succeeds and leaves exactly one model_1.orbax.
    create_checkpoint(ts, 1, 20, [1.0, 0.9], params, extra={"best_bleu": 0.7})
    names = sorted(p.name for p in tmp_path.iterdir())
    assert names == ["model_1.orbax", "model_1_metrics.ckpt"]
    assert float(load_checkpoint(path)["best_bleu"]) == 0.7
    assert load_checkpoint(path)["step"] == 20


def test_profile_dir_writes_trace(tmp_path):
    """--profile_dir captures a jax profiler trace of early train steps."""
    import os

    from fixtures import build_mini_coco
    from show_tell_tpu.cli.run import run

    data_root = str(tmp_path / "data")
    out_dir = str(tmp_path / "out")
    prof_dir = str(tmp_path / "prof")
    build_mini_coco(data_root)
    run(
        "gru",
        [
            "--data_dir", data_root, "--output_dir", out_dir,
            "--train_ann_path", "annotations/captions_train2014.json",
            "--test_ann_path", "annotations/captions_train2014.json",
            "--train_img_dir", "train2014", "--test_img_dir", "train2014",
            "--vocab_threshold", "1", "--embedding_length", "8",
            "--num_hidden_units", "12", "--num_layers", "1", "--batch_size", "4",
            "--num_epochs", "1", "--resnet_version", "18",
            "--is_training", "1", "--is_testing", "0",
            "--profile_dir", prof_dir,
        ],
    )
    traces = [os.path.join(r, f) for r, _, fs in os.walk(prof_dir) for f in fs]
    assert traces, "no profiler trace written"


def test_orbax_crash_recovery_old_copy_resolves(tmp_path):
    """A kill between the two directory renames of an orbax same-epoch
    rewrite leaves model_N.orbax.old; resolve/find_latest must fall back
    to it instead of silently resuming an older epoch."""
    import os

    from show_tell_tpu.train.checkpoint import (
        find_latest_checkpoint,
        resolve_checkpoint_path,
    )

    os.makedirs(tmp_path / "model_2.orbax.old")  # crash window artifact
    with open(tmp_path / "model_1.ckpt", "wb") as f:
        pickle.dump({"epoch": 1}, f)
    assert find_latest_checkpoint(str(tmp_path)).endswith("model_2.orbax.old")
    assert resolve_checkpoint_path(str(tmp_path), "model_2").endswith("model_2.orbax.old")


def test_test_step_is_cached_across_test_model_calls():
    """Repeated evals with identical config reuse one jitted step (no
    recompile per in-training eval)."""
    import jax.numpy as jnp

    from show_tell_tpu.evaluation.tester import make_test_step
    from show_tell_tpu.models.captioner import CaptionerConfig

    cfg = CaptionerConfig(variant="gru", resnet_version=18, embed_dim=8,
                          hidden_dim=12, vocab_size=20, num_layers=1)
    a = make_test_step(cfg, 0, augment=True, compute_dtype=jnp.float32)
    b = make_test_step(cfg, 0, augment=True, compute_dtype=jnp.float32)
    assert a is b
    c = make_test_step(cfg, 2, augment=True, compute_dtype=jnp.float32)
    assert c is not a


def test_sigterm_preemption_checkpoints_and_resumes(tmp_path):
    """SIGTERM mid-training -> checkpoint at the next batch boundary,
    clean exit, and `--resume_model_train auto` resumes from it (the
    reference loses everything since its last 5000-step save)."""
    import signal
    import subprocess
    import time as _time

    from fixtures import build_mini_coco

    data_root = str(tmp_path / "data")
    out_dir = str(tmp_path / "out")
    build_mini_coco(data_root)
    args = [
        sys.executable, "-u", "-m", "show_tell_tpu.cli.main",
        "--data_dir", data_root, "--output_dir", out_dir,
        "--train_ann_path", "annotations/captions_train2014.json",
        "--test_ann_path", "annotations/captions_train2014.json",
        "--train_img_dir", "train2014", "--test_img_dir", "train2014",
        "--vocab_threshold", "1", "--embedding_length", "8",
        "--num_hidden_units", "12", "--num_layers", "1", "--batch_size", "4",
        "--num_epochs", "100000", "--resnet_version", "18",
        "--is_training", "1", "--is_testing", "0", "--device", "cpu",
    ]
    import threading

    proc = subprocess.Popen(args, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    # Hard backstop: the child trains --num_epochs 100000; never leave it
    # running if any assertion below fails or the startup read stalls.
    killer = threading.Timer(240, proc.kill)
    killer.start()
    try:
        lines = []
        for line in proc.stdout:  # killer unblocks this if the child wedges
            lines.append(line)
            if "Epoch 1 started." in line:
                break
        assert any("Epoch 1 started." in l for l in lines), "".join(lines)
        _time.sleep(2.0)  # let at least one step land
        proc.send_signal(signal.SIGTERM)
        rest = proc.communicate(timeout=180)[0]
    finally:
        killer.cancel()
        proc.kill()
    out = "".join(lines) + rest
    # 143 = 128+SIGTERM: a preempted half-run must be distinguishable
    # from a completed one by supervisors chaining on the exit status.
    assert proc.returncode == 143, out
    assert "Preempted (SIGTERM)" in out, out
    ckpts = [f for f in os.listdir(out_dir) if f.startswith("model_") and f.endswith(".ckpt") and "metrics" not in f]
    assert ckpts, out

    # Auto-resume from the preemption checkpoint (explicit argv, not a
    # slice of the training one).
    base = args[: args.index("--num_epochs")]
    resumed = subprocess.run(
        base + ["--num_epochs", "1", "--resnet_version", "18",
                "--is_training", "1", "--is_testing", "0", "--device", "cpu",
                "--resume_training", "1", "--resume_model_train", "auto"],
        capture_output=True, text=True, timeout=240,
    )
    assert resumed.returncode == 0, resumed.stdout + resumed.stderr
    assert "Models loaded." in resumed.stdout


def test_reference_checkpoint_roundtrip_live_modules(tmp_path):
    """End-to-end checkpoint-compat oracle with ZERO transcription: the
    reference's own cnn.ResNet + rnn.RNN (imported live, backbone
    download faked with our torch oracle) build a checkpoint via their
    real state_dicts (Sequential 'model.N' keys and all, utils.py:131-138
    format); import_torch_checkpoint loads it and our serving stack must
    reproduce the reference modules' own greedy ids exactly."""
    torch = pytest.importorskip("torch")
    from fixtures import load_reference_cnn_module, load_reference_rnn_module

    from show_tell_tpu.models.captioner import CaptionerConfig, captioner_greedy_decode
    from show_tell_tpu.train.checkpoint import import_torch_checkpoint

    sys.path.insert(0, os.path.dirname(__file__))
    from torch_resnet_oracle import TorchResNet

    ref_cnn = load_reference_cnn_module({18: lambda pretrained=True: TorchResNet(18)})
    ref_rnn = load_reference_rnn_module()
    if ref_cnn is None or ref_rnn is None:
        pytest.skip("reference cnn.py/rnn.py not importable here")

    torch.manual_seed(2)
    enc = ref_cnn.ResNet(resnet_version=18, embed_dim=20).eval()
    dec = ref_rnn.RNN(20, 24, 30, 2).eval()
    ckpt_path = str(tmp_path / "model_1.ckpt")
    torch.save(
        {
            "encoder_state_dict": enc.state_dict(),
            "decoder_state_dict": dec.state_dict(),
            "optimizer_state_dict": {},
            "epoch": 1,
            "step": 10,
        },
        ckpt_path,
    )

    cfg = CaptionerConfig("gru", 18, 20, 24, 30, 2)
    params, state = import_torch_checkpoint(ckpt_path, cfg)
    x = np.random.RandomState(5).randn(2, 64, 64, 3).astype(np.float32)
    ids = captioner_greedy_decode(params, state, cfg, jnp.asarray(x))

    with torch.no_grad():
        feat = enc(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        want = dec.sentence_index(feat, beam_size=0).numpy()
    np.testing.assert_array_equal(np.asarray(ids), want)


def test_reference_attention_checkpoint_roundtrip_live_modules(tmp_path):
    """Attention-variant twin of the live checkpoint roundtrip: the
    reference's own Attention/cnn_attn.py ([:-2] slice, [B,C,P] reshape,
    dead-but-saved head) + Attention/rnn_attn.py build the checkpoint;
    import_torch_checkpoint + our serving stack must reproduce their
    greedy ids exactly."""
    torch = pytest.importorskip("torch")
    from fixtures import load_reference_cnn_module, load_reference_rnn_module

    from show_tell_tpu.models.captioner import CaptionerConfig, captioner_greedy_decode
    from show_tell_tpu.train.checkpoint import import_torch_checkpoint

    sys.path.insert(0, os.path.dirname(__file__))
    from torch_resnet_oracle import TorchResNet

    ref_cnn = load_reference_cnn_module(
        {18: lambda pretrained=True: TorchResNet(18)}, relpath="Attention/cnn_attn.py")
    ref_rnn = load_reference_rnn_module("Attention/rnn_attn.py")
    if ref_cnn is None or ref_rnn is None:
        pytest.skip("reference attention modules not importable here")

    torch.manual_seed(6)
    E, C, A, H, V, L = 20, 512, 16, 24, 30, 2
    enc = ref_cnn.ResNet(resnet_version=18, embed_dim=E).eval()
    dec = ref_rnn.RNN_Attn(E, C, A, H, V, L).eval()
    ckpt_path = str(tmp_path / "model_1.ckpt")
    torch.save(
        {
            "encoder_state_dict": enc.state_dict(),
            "decoder_state_dict": dec.state_dict(),
            "optimizer_state_dict": {},
            "epoch": 1,
            "step": 10,
        },
        ckpt_path,
    )

    cfg = CaptionerConfig("attn", 18, E, H, V, L, nos_filters=C, attn_dim=A)
    params, state = import_torch_checkpoint(ckpt_path, cfg)
    x = np.random.RandomState(8).randn(2, 64, 64, 3).astype(np.float32)
    ids = captioner_greedy_decode(params, state, cfg, jnp.asarray(x), use_pallas=False)

    class _Vocab:
        def __call__(self, word):
            return {"<start>": 1}[word]

    import unittest.mock as mock

    with torch.no_grad(), mock.patch.object(torch.Tensor, "cuda", lambda self, *a, **k: self):
        feats = enc(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        want = dec.sentence_index(feats, _Vocab()).numpy()
    np.testing.assert_array_equal(np.asarray(ids), want)
