"""End-to-end: CLI train + test phases on the mini-COCO fixture
(SURVEY.md §4d) — exercises vocab, loaders, train loop, checkpointing,
decode, metrics, and the pickle outputs."""

import os
import pickle

import numpy as np
import pytest

from fixtures import build_mini_coco

from show_tell_tpu.cli.run import run


def _argv(data_root, out_dir, extra=()):
    return [
        "--data_dir", data_root,
        "--output_dir", out_dir,
        "--train_ann_path", "annotations/captions_train2014.json",
        "--test_ann_path", "annotations/captions_train2014.json",
        "--train_img_dir", "train2014",
        "--test_img_dir", "train2014",
        "--vocab_threshold", "1",
        "--embedding_length", "16",
        "--num_hidden_units", "24",
        "--num_layers", "1",
        "--batch_size", "4",
        "--num_epochs", "1",
        "--resnet_version", "18",
        "--lr", "0.01",
        "--optimizer_type", "Adam",
    ] + list(extra)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    data_root = os.path.join(root, "data")
    out_dir = os.path.join(root, "out")
    build_mini_coco(data_root)
    os.makedirs(out_dir, exist_ok=True)
    res = run("gru", _argv(data_root, out_dir, ["--is_training", "1", "--is_testing", "0"]))
    return data_root, out_dir, res


def test_train_phase_writes_checkpoints(trained):
    _, out_dir, res = trained
    assert os.path.isfile(os.path.join(out_dir, "model_1.ckpt"))
    assert os.path.isfile(os.path.join(out_dir, "model_1_metrics.ckpt"))
    assert os.path.isfile(os.path.join(out_dir, "vocab.pkl"))
    with open(os.path.join(out_dir, "model_1_metrics.ckpt"), "rb") as f:
        metrics = pickle.load(f)
    assert len(metrics["train_loss"]) == 4  # 16 captions / batch 4, drop_last
    assert all(np.isfinite(metrics["train_loss"]))


def test_test_phase_produces_scores_and_pickles(trained):
    data_root, out_dir, _ = trained
    res = run(
        "gru",
        _argv(
            data_root,
            out_dir,
            ["--is_training", "0", "--is_testing", "1", "--load_model_test", "model_1"],
        ),
    )
    scores = res["scores"]
    for k in ["Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "CIDEr", "ROUGE_L",
              "Final_Bleu_1", "Final_Bleu_4", "test_loss"]:
        assert k in scores and np.isfinite(scores[k]), k
    assert 0.0 <= scores["Bleu_1"] <= 1.0
    for name in ["Target_Words_Dict.pickle", "Candidate_Words_Dict.pickle"]:
        with open(os.path.join(out_dir, name), "rb") as f:
            d = pickle.load(f)
        assert len(d) == 8  # 8 distinct images


def test_beam_test_phase(trained):
    data_root, out_dir, _ = trained
    res = run(
        "gru",
        _argv(
            data_root,
            out_dir,
            ["--is_training", "0", "--is_testing", "1", "--load_model_test", "model_1",
             "--beam_size", "2"],
        ),
    )
    # beam_size forces batch_size=1 (reference main.py:81-82).
    assert res["params"]["batch_size"] == 1
    assert np.isfinite(res["scores"]["Bleu_1"])


def test_resume_training(trained):
    data_root, out_dir, _ = trained
    res = run(
        "gru",
        _argv(
            data_root,
            out_dir,
            ["--is_training", "1", "--is_testing", "0",
             "--resume_training", "1", "--resume_model_train", "model_1"],
        ),
    )
    assert os.path.isfile(os.path.join(out_dir, "model_1.ckpt"))


def test_pallas_and_bf16_test_phase(trained):
    data_root, out_dir, _ = trained
    res = run(
        "gru",
        _argv(
            data_root,
            out_dir,
            ["--is_training", "0", "--is_testing", "1", "--load_model_test", "model_1",
             "--use_pallas", "1", "--compute_dtype", "bfloat16"],
        ),
    )
    assert np.isfinite(res["scores"]["Bleu_1"])


@pytest.mark.parametrize("variant", ["lstm", "attn", "attn_lstm"])
def test_other_variants_train_and_test(tmp_path, variant):
    data_root = str(tmp_path / "data")
    out_dir = str(tmp_path / "out")
    build_mini_coco(data_root)
    os.makedirs(out_dir, exist_ok=True)
    extra = ["--is_training", "1", "--is_testing", "1", "--load_model_test", "model_1"]
    if variant.startswith("attn"):
        extra += ["--nos_cnn_filters", "512", "--attn_dim", "16", "--alpha_c", "0.01"]
    res = run(variant, _argv(data_root, out_dir, extra))
    scores = res["scores"]
    assert np.isfinite(scores["Bleu_1"]) and np.isfinite(scores["test_loss"])
    assert os.path.isfile(os.path.join(out_dir, "model_1.ckpt"))


def test_early_exit_eval_metrics_identical(trained):
    # --early_exit 1 switches eval decode to the serving while_loop paths
    # (greedy and beam); captions and therefore every metric must be
    # identical to the fixed-25-step parity decode.  --eval_augment 0
    # pins the flip RNG so the two runs see the same pixels.
    data_root, out_dir, _ = trained
    for extra in ([], ["--beam_size", "2"]):
        base = _argv(
            data_root, out_dir,
            ["--is_training", "0", "--is_testing", "1", "--load_model_test", "model_1",
             "--eval_augment", "0"] + extra,
        )
        ref = run("gru", base)["scores"]
        fast = run("gru", base + ["--early_exit", "1"])["scores"]
        assert ref == fast, extra


def test_eval_augment_disabled_is_deterministic(trained):
    data_root, out_dir, _ = trained
    args = _argv(
        data_root, out_dir,
        ["--is_training", "0", "--is_testing", "1", "--load_model_test", "model_1",
         "--eval_augment", "0"],
    )
    s1 = run("gru", args)["scores"]
    s2 = run("gru", args)["scores"]
    assert s1 == s2


def test_dp_training_via_cli(tmp_path):
    """batch_size divisible by device count triggers the dp mesh branch in
    the training loop (8 virtual CPU devices in tests)."""
    import jax

    assert len(jax.devices()) >= 8
    data_root = str(tmp_path / "data")
    out_dir = str(tmp_path / "out")
    build_mini_coco(data_root)
    os.makedirs(out_dir, exist_ok=True)
    res = run(
        "gru",
        _argv(data_root, out_dir, ["--is_training", "1", "--is_testing", "0",
                                   "--batch_size", "8", "--dp", "8"]),
    )
    assert os.path.isfile(os.path.join(out_dir, "model_1.ckpt"))
    ts = res["train_state"]
    # Replicated params live on the mesh; loss was finite.
    import pickle
    with open(os.path.join(out_dir, "model_1_metrics.ckpt"), "rb") as f:
        metrics = pickle.load(f)
    assert all(np.isfinite(metrics["train_loss"]))


def test_faithful_beam_cli(trained):
    """--faithful_beam reproduces the reference in-class beam flow through
    the CLI (batch forced to 1, GRU only)."""
    data_root, out_dir, _ = trained
    res = run(
        "gru",
        _argv(
            data_root,
            out_dir,
            ["--is_training", "0", "--is_testing", "1", "--load_model_test", "model_1",
             "--beam_size", "2", "--faithful_beam", "1"],
        ),
    )
    assert res["params"]["batch_size"] == 1
    assert np.isfinite(res["scores"]["test_loss"])


def test_faithful_beam_loss_matches_greedy_eval(trained):
    """The faithful-beam eval path honors --eval_augment and reuses the
    same per-batch flip draw as the jitted loss step, so the teacher-forced
    test loss is identical between greedy and faithful-beam eval modes."""
    data_root, out_dir, _ = trained
    base = ["--is_training", "0", "--is_testing", "1", "--load_model_test", "model_1",
            "--batch_size", "1"]
    res_g = run("gru", _argv(data_root, out_dir, base))
    res_f = run(
        "gru",
        _argv(data_root, out_dir, base + ["--beam_size", "2", "--faithful_beam", "1"]),
    )
    np.testing.assert_allclose(
        res_f["scores"]["test_loss"], res_g["scores"]["test_loss"], rtol=1e-6
    )


def test_bf16_serving_quality_pinned(trained):
    """bf16 is the serving/bench dtype (docs/ARCHITECTURE.md dtype policy)
    — pin its decode quality against f32 on the fixture instead of
    hand-waving: BLEU/CIDEr/loss deltas bounded, deterministic eval."""
    data_root, out_dir, _ = trained
    base = ["--is_training", "0", "--is_testing", "1", "--load_model_test", "model_1",
            "--eval_augment", "0"]
    res32 = run("gru", _argv(data_root, out_dir, base))
    res16 = run("gru", _argv(data_root, out_dir, base + ["--compute_dtype", "bfloat16"]))
    for k in ("Bleu_1", "Bleu_4", "CIDEr", "ROUGE_L"):
        assert abs(res16["scores"][k] - res32["scores"][k]) <= 0.05, (
            k, res16["scores"][k], res32["scores"][k]
        )
    assert abs(res16["scores"]["test_loss"] - res32["scores"]["test_loss"]) <= 0.05


def test_orbax_checkpoint_cli_roundtrip(tmp_path):
    """--ckpt_format orbax: train writes model_N.orbax/, resume and the
    test phase both load it through the CLI path resolution."""
    data_root = str(tmp_path / "data")
    out_dir = str(tmp_path / "out")
    build_mini_coco(data_root)
    os.makedirs(out_dir, exist_ok=True)
    extra = ["--ckpt_format", "orbax"]
    run("gru", _argv(data_root, out_dir, ["--is_training", "1", "--is_testing", "0"] + extra))
    assert os.path.isdir(os.path.join(out_dir, "model_1.orbax"))
    assert os.path.isfile(os.path.join(out_dir, "model_1_metrics.ckpt"))
    res = run(
        "gru",
        _argv(data_root, out_dir,
              ["--is_training", "1", "--is_testing", "1", "--load_model_test", "model_1",
               "--resume_training", "1", "--resume_model_train", "model_1"] + extra),
    )
    assert np.isfinite(res["scores"]["test_loss"])


def test_backbone_weights_cli(tmp_path):
    """--backbone_weights loads a torchvision-style .pth into the frozen
    backbone (the reference's pretrained=True, cnn.py:23-31) while the
    head/decoder get the reference init; the backbone stays frozen."""
    torch = pytest.importorskip("torch")
    import jax

    from torch_resnet_oracle import TorchResNet
    from show_tell_tpu.models.resnet import resnet_params_from_torch

    torch.manual_seed(7)
    backbone = TorchResNet(18)
    pth = str(tmp_path / "resnet18.pth")
    torch.save(backbone.state_dict(), pth)
    want_params, want_state = resnet_params_from_torch(backbone.state_dict())

    data_root = str(tmp_path / "data")
    out_dir = str(tmp_path / "out")
    build_mini_coco(data_root)
    os.makedirs(out_dir, exist_ok=True)
    res = run(
        "gru",
        _argv(data_root, out_dir,
              ["--is_training", "1", "--is_testing", "0", "--backbone_weights", pth]),
    )
    frozen = res["train_state"].frozen["encoder"]["resnet"]
    # Conv weights are frozen: still exactly the imported values.
    np.testing.assert_array_equal(
        np.asarray(frozen["conv1.weight"]), np.asarray(want_params["conv1.weight"])
    )
    # BN running stats DRIFTED during training (train-mode frozen
    # backbone, reference semantics) — they must differ from the import.
    bn = res["train_state"].bn_state["resnet"]["bn1.running_mean"]
    assert not np.allclose(np.asarray(bn), np.asarray(want_state["bn1.running_mean"]))


def test_flickr_end_to_end(tmp_path):
    """--data_source Flickr (framework extension; the reference hardcodes
    MSCOCO at main.py:29 and its Dataset is COCO-only): vocab from the
    TSV, train 1 epoch, eval — through the real GRU CLI."""
    from fixtures import build_mini_flickr
    from show_tell_tpu.cli.run import run

    data_root = str(tmp_path / "flickr")
    out_dir = str(tmp_path / "out")
    build_mini_flickr(data_root)
    res = run(
        "gru",
        [
            "--data_source", "Flickr",
            "--data_dir", data_root, "--output_dir", out_dir,
            "--test_ann_path", "annotations/captions.tsv",
            "--vocab_threshold", "1", "--embedding_length", "8",
            "--num_hidden_units", "12", "--num_layers", "1", "--batch_size", "4",
            "--num_epochs", "1", "--resnet_version", "18",
            "--optimizer_type", "Adam", "--is_training", "1", "--is_testing", "1",
            "--load_model_test", "model_1",
        ],
    )
    assert os.path.isfile(os.path.join(out_dir, "model_1.ckpt"))
    assert os.path.isfile(os.path.join(out_dir, "vocab.pkl"))
    scores = res.get("scores") or {}
    assert "Bleu_1" in scores


def test_multihost_worker_joins_test_phase_without_writing_pickles(trained, monkeypatch):
    """Under multi-host, every process runs the test phase (the eval mesh
    spans all hosts; ids all-gather back so each host scores the full
    captions), but only the PRIMARY writes the metric pickles — N
    processes racing the same files on a shared filesystem would tear
    them.  Simulated single-process via monkeypatched
    process_count/is_primary; the real 2-process sharded-eval equality
    run lives in test_multihost.py."""
    import jax

    from show_tell_tpu.parallel import multihost

    data_root, out_dir, _ = trained
    for f in ("Target_Words_Dict.pickle", "Candidate_Words_Dict.pickle"):
        p = os.path.join(out_dir, f)
        if os.path.exists(p):
            os.remove(p)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(multihost, "is_primary", lambda: False)
    # The scoring shard's allgather needs a REAL 2-process runtime (that
    # equality run lives in test_multihost.py); under this single-process
    # simulation the combine seam is an identity — the peer's rows stay
    # zero, which only this test's finiteness assertion sees.
    from show_tell_tpu.evaluation import tester

    monkeypatch.setattr(tester, "_combine_score_table", lambda t: t)
    res = run(
        "gru",
        _argv(
            data_root,
            out_dir,
            ["--is_training", "0", "--is_testing", "1", "--load_model_test", "model_1"],
        ),
    )
    assert np.isfinite(res["scores"]["Bleu_1"])  # worker ran the eval...
    for f in ("Target_Words_Dict.pickle", "Candidate_Words_Dict.pickle"):
        assert not os.path.exists(os.path.join(out_dir, f)), f  # ...primary owns the pickles
